"""Benchmark: full-chain RX throughput, real-ingest streaming, LDPC rate.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., ...extras}

Baseline (BASELINE.md): the reference C chain decodes a 95 s Fs=921416
capture in ~12 s on x86 => ~7.3 Msamples/s end-to-end, single core.

Stage order (headline FIRST so a slow-compile day still lands it within the
watchdog; every stage checkpoints partial results as it measures):
  1. full_chain_msps   — batched v2 Monte-Carlo chain (demod scan -> UW
                         top-k deframe -> descramble -> BP decode -> CRC),
                         B independent streams x R noise rounds in ONE
                         dispatch (WENET_BENCH_CHAIN_ROUNDS, default 16) so
                         per-dispatch tunnel latency cannot dominate even on
                         a degraded-backend day; dispatch overhead is
                         measured and reported separately
  2. stream_ingest     — REAL ingest (benchmarking/test_demod.py:82-118
                         contract): a 95 s cu8 capture at v2 flight rate in
                         host memory -> CRC-valid packets.  Measured paths:
                         (a) decode_iq_fused — ONE H2D + ONE device program
                         (demod+deframe+LDPC+CRC) + one small D2H;
                         (b) slab-pipelined decode_iq_fused_overlap;
                         (c) FusedReceiver push (full capture, 2 s cu8
                         buckets, depth-2 slab pipelining) + cold/warm
                         time-to-first-packet;
                         (d) classic exact-FSM Receiver.push (8 s prefix),
                         pipelined and serial.
                         The headline stream_ingest_msps takes the fastest
                         path that also decoded the expected packet count
                         (throughput with missing packets doesn't count).
  3. wideband          — channelized N=8/16 fused pipeline scaling
  4. ldpc rate         — decoder-only codewords/s (+ min-sum; pallas
                         optional via WENET_BENCH_PALLAS=1)

Robustness: compile latency on tunnelled TPU backends can be pathological
(measured: the same program that compiles in 9 s on a good day ran >900 s
on a bad one, and one D2H fetch stalled 545 s mid-session on 2026-08-20),
so EACH STAGE runs in its own subprocess with a time budget carved out of
the global watchdog; a stage that stalls is terminated (SIGTERM -> its
partial, already-checkpointed measurements survive) and the remaining
stages still run.  A persistent JAX compilation cache (.jax_cache/) makes
retried runs (and the driver's end-of-round run) compile from cache.
"""
import json
import os
import signal
import subprocess
import sys
import tempfile
import threading
import time

import numpy as np

RESULTS = {}
BASELINE_MSPS = 7.3
DONE = threading.Event()
OUT_PATH = None          # set in child mode: incremental checkpoint target
STAGE_DEADLINE = None    # child mode: wall-clock deadline for this stage


def _remaining() -> float:
    """Seconds left in this stage's budget (inf when not budgeted)."""
    if STAGE_DEADLINE is None:
        return float("inf")
    return STAGE_DEADLINE - time.time()


def _checkpoint():
    """Dump RESULTS-so-far to the child's out file (atomic) so a stage
    killed at its budget still lands everything it measured."""
    if OUT_PATH is None:
        return
    # thread-unique temp name: daemon probe threads (_h2d_probe) may
    # checkpoint concurrently with the main thread; a shared .tmp could
    # interleave writes and land torn JSON via os.replace
    tmp = f"{OUT_PATH}.{threading.get_ident()}.tmp"
    with open(tmp, "w") as f:
        # snapshot: daemon probe threads mutate RESULTS concurrently, and
        # iterating the live dict mid-insert raises RuntimeError (ADVICE r4)
        json.dump(dict(RESULTS), f)
    os.replace(tmp, OUT_PATH)


def emit():
    chain = RESULTS.get("full_chain_msps")
    stream = RESULTS.get("stream_ingest_msps")
    if chain:
        metric, value, unit = ("full_chain_iq_throughput", round(chain, 2),
                               "Msamples/s/chip")
        vs = round(chain / BASELINE_MSPS, 2)
    elif stream:
        metric, value, unit = ("stream_ingest_throughput", round(stream, 2),
                               "Msamples/s/chip")
        vs = round(stream / BASELINE_MSPS, 2)
    else:
        metric, value, unit = ("ldpc_decode_rate",
                               round(RESULTS.get("ldpc_codewords_per_s", 0.0),
                                     0), "codewords/s")
        vs = 0.0
    out = {"metric": metric, "value": value, "unit": unit, "vs_baseline": vs}
    out.update({k: v for k, v in RESULTS.items()})
    print(json.dumps(out), flush=True)


def watchdog(seconds: float):
    if not DONE.wait(seconds):
        RESULTS["timeout"] = True
        emit()
        os._exit(0)


def _stage(name):
    """Decorator: run a stage, record its failure instead of dying."""
    def wrap(fn):
        def run(*a, **k):
            try:
                return fn(*a, **k)
            except Exception as e:            # tunnelled-TPU flakiness
                RESULTS[f"{name}_error"] = repr(e)[:160]
                _checkpoint()
                return None
        return run
    return wrap


_D2H_WARM = threading.Event()


def _warm_d2h():
    """Open the device->host fetch channel in a DAEMON thread.

    Measured on the axon tunnel (2026-08-20): the FIRST D2H fetch of a
    process can stall for minutes (545 s and ~295 s observed) while
    dispatch/H2D/execution are all healthy — a stage that begins with a
    blocking fetch dies at its budget having measured nothing.  Warming
    in the background overlaps that stall with compile work; fetchless
    measurements (block_until_ready timing loops) proceed regardless."""
    def work():
        try:
            import jax
            import jax.numpy as jnp
            tiny = jax.jit(lambda x: x + 1.0)
            np.asarray(tiny(jnp.ones(8, jnp.float32)))
            _D2H_WARM.set()
        except Exception:
            pass
    threading.Thread(target=work, daemon=True).start()


def _dispatch_overhead(key: str, budget_s: float = 45.0):
    """Round-trip time of a trivial program: the tunnel's per-dispatch floor
    (measured 0.1 ms on a good day, ~26 ms degraded).  Runs in a daemon
    thread with a budget so a D2H stall records itself instead of eating
    the stage."""
    import jax
    import jax.numpy as jnp

    def work():
        tiny = jax.jit(lambda x: x * 2.0 + 1.0)
        z = jnp.ones((8, 128), jnp.float32)
        np.asarray(tiny(z))                    # compile + warm
        t0 = time.perf_counter()
        for _ in range(5):
            np.asarray(tiny(z))
        RESULTS[key] = round((time.perf_counter() - t0) / 5, 4)

    th = threading.Thread(target=work, daemon=True)
    th.start()
    th.join(budget_s)
    if th.is_alive():
        RESULTS[key] = f"d2h stalled >{budget_s:.0f}s"
    _checkpoint()
    return RESULTS.get(key)


LEAD_BITS = 2048     # stream lead-in before the first frame (see below)
FRAME_BITS_V2 = 343 * 8
PKT_CYCLE_V2 = FRAME_BITS_V2 + 512           # frame + gap bits


def make_packet_bits(cfg, n_packets, rng, gap_bits=512, lead_bits=LEAD_BITS):
    """Framed random packets with noise-bit gaps, padded to whole frames.

    The capture begins with `lead_bits` of random filler BEFORE the first
    frame: tools/loss_census.py showed 100% of the r3 parity-band losses
    were packet index 0 — pure estimator-warmup loss on a frame starting
    at sample 0, a situation no real capture has (the reference TX idles
    between packets and its benchmark capture starts with noise;
    reference benchmarking/README.md:63-86 measures from such captures).
    """
    from wenet_tpu.core import framing
    from wenet_tpu.ops import ldpc
    frames_bits = [rng.integers(0, 2, lead_bits).astype(np.uint8)]
    for _ in range(n_packets):
        p = rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
        frame = framing.frame_packet(p, ldpc.encode_bytes, mode="v2")
        frames_bits.append(framing.frame_to_bits(frame, "v2"))
        frames_bits.append(rng.integers(0, 2, gap_bits).astype(np.uint8))
    bits = np.concatenate(frames_bits)
    return np.concatenate(
        [bits, np.zeros((-len(bits)) % cfg.Nbits, np.uint8)])


def decodable_packets(n_bits: int, n_packets: int,
                      lead_bits: int = LEAD_BITS) -> int:
    """EXACT count of frames fully contained in the first n_bits of a
    make_packet_bits stream (frame i spans [lead + i*cycle,
    lead + i*cycle + FRAME_BITS))."""
    fit = (n_bits - lead_bits - FRAME_BITS_V2) // PKT_CYCLE_V2 + 1
    return max(0, min(n_packets, fit))


def stream_capture(secs: float, ebno_db: float = 12.0, seed: int = 3,
                   with_cache_flag: bool = False):
    """The deterministic bench ingest capture: (raw cu8 bytes, n_packets).
    With with_cache_flag, returns (raw, n_packets, was_cached) — the ground
    truth for the bench record instead of a wall-time heuristic (ADVICE r4).

    THE canonical builder+disk-cache — tools/stream_tune.py and
    tools/fused_profile.py call this so tuning measures EXACTLY the bench
    bytes (ADVICE r4: the key recipe was previously copy-pasted).  The
    cache key covers every input to the bytes: rates, ebno, seed, and a
    hash of the generator sources, so edits can never silently reuse a
    stale capture.
    """
    import hashlib
    import inspect
    from wenet_tpu.ops import channel as _chan
    from wenet_tpu.ops import fsk
    cfg = fsk.V2_CONFIG
    rng = np.random.default_rng(seed)
    n_bits = int(secs * cfg.Rs)
    n_packets = max((n_bits - LEAD_BITS) // PKT_CYCLE_V2 - 1, 1)
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    gen_fp = hashlib.sha1(
        (f"{ebno_db}_{LEAD_BITS}_" +
         inspect.getsource(make_packet_bits) +
         inspect.getsource(fsk.fsk_mod_np) +
         inspect.getsource(_chan.add_awgn) +
         inspect.getsource(fsk.iq_to_cu8)).encode()).hexdigest()[:10]
    cap_path = os.path.join(
        cache_dir,
        f"stream_cap_{int(secs)}s_{cfg.Fs}_{cfg.Rs}_seed{seed}_{gen_fp}.npy")
    if os.path.exists(cap_path):
        try:
            cap = np.load(cap_path)
            return (cap, n_packets, True) if with_cache_flag else (cap, n_packets)
        except Exception:
            pass
    bits = make_packet_bits(cfg, n_packets, rng)
    sig, _ = fsk.fsk_mod_np(cfg, bits, 2 * cfg.Rs, cfg.Rs)
    from wenet_tpu.ops import channel
    iq = channel.add_awgn(sig.astype(np.complex64), ebno_db, cfg.Fs,
                          cfg.Rs, rng=rng)
    del sig
    raw = fsk.iq_to_cu8(iq / np.abs(iq).max())
    del iq
    try:
        tmp = f"{cap_path}.{os.getpid()}.tmp.npy"
        np.save(tmp, raw)
        os.replace(tmp, cap_path)
    except Exception:
        pass
    return (raw, n_packets, False) if with_cache_flag else (raw, n_packets)


@_stage("chain")
def stage_chain(reps=2):
    """Headline: B streams x R noise rounds through the WHOLE chain, one
    dispatch.  R rounds run as a lax.scan INSIDE the program so the work
    per dispatch scales without scaling memory — on a degraded day the
    fixed ~1.5 s dispatch cost amortizes over R x B x len(sig) samples."""
    import jax
    import jax.numpy as jnp
    from wenet_tpu.ops import deframe, fsk
    from wenet_tpu.utils import compat
    from wenet_tpu.utils.rng import prng_key

    _warm_d2h()                # overlap the first-fetch stall with compile

    cfg = fsk.V2_CONFIG                      # Fs=960000, Rs=96000
    n_packets = 12
    rng = np.random.default_rng(0)
    bits = make_packet_bits(cfg, n_packets, rng)
    sig, _ = fsk.fsk_mod_np(cfg, bits, 2 * cfg.Rs, cfg.Rs)
    var = float(np.mean(np.abs(sig) ** 2))
    RESULTS["chain_capture_built"] = True      # forensics: where a wedged
    _checkpoint()                              # backend stalled the stage
    sig_j = compat.put_complex(sig)
    RESULTS["chain_h2d_done"] = True
    _checkpoint()
    nf = cfg.num_frames(len(sig))
    # B=256 saturates the chip (tools/chain_scaling.py: 3.1 GS/s @ B=8,
    # 212 GS/s @ B>=256); R rounds amortize per-dispatch tunnel latency
    B = int(os.environ.get("WENET_BENCH_STREAMS", "256"))
    R = int(os.environ.get("WENET_BENCH_CHAIN_ROUNDS", "16"))
    # frames per scan step (bit-exact; amortizes the per-lane window
    # gather F-fold — r5 scan-cost work: F=8 514 MS/s, F=16 634 MS/s)
    FSTEP = int(os.environ.get("WENET_CHAIN_FSTEP", "16"))
    ebnos = jnp.linspace(8.0, 15.0, B)

    @jax.jit
    def chain(sig, keys, ebno_db):
        # sig as an ARGUMENT: the axon backend rejects large embedded
        # array constants (tools/tpu_bisect vmap_noise vs vmap_chain_arg)
        # The WHOLE chain runs on device: demod scan -> UW top-k deframe
        # -> descramble -> BP decode -> CRC gate.  NOTE (audit): only the
        # CRC-ok count is fetched, so XLA dead-code-eliminates FrameOut
        # fields that feed neither the soft bits nor the scan carry —
        # that is the production sweep configuration, stated explicitly.
        def one(k, e):
            nvar = var * cfg.Fs / (cfg.Rs * 10.0 ** (e / 10.0))
            z = jax.random.normal(k, (sig.shape[0], 2), jnp.float32)
            iq = sig + jnp.sqrt(nvar / 2) * jax.lax.complex(z[:, 0], z[:, 1])
            iq = iq / jnp.max(jnp.abs(iq))
            _, outs = fsk.demod_stream(cfg, iq, nf, frames_per_step=FSTEP)
            _, ok, _, _ = deframe.deframe_topk(
                outs.soft.reshape(-1), mode="v2", k=n_packets)
            return jnp.sum(ok.astype(jnp.int32))

        def one_round(acc, ks):
            return acc + jax.vmap(one)(ks, ebno_db), None
        acc, _ = jax.lax.scan(one_round, jnp.zeros((ebno_db.shape[0],),
                                                   jnp.int32), keys)
        return acc

    def round_keys(seed):
        return jax.random.split(prng_key(seed), R * B).reshape(R, B, -1)

    keys = round_keys(1)
    # Lowering a big program on the tunnelled backend is STOCHASTIC:
    # measured 1.2 s and 282 s for the identical program on 2026-08-21
    # (the axon client seems to round-trip during lowering).  A serialized
    # jax.export artifact deserializes + wrapper-lowers in <2 s, so cache
    # it: every later process (including the driver's end-of-round run)
    # skips the lowering lottery.
    from wenet_tpu.utils import jaxcache
    plat = jax.devices()[0].platform        # exports are platform-specific
    fp = jaxcache.source_fingerprint(
        extra_files=(os.path.abspath(__file__),))   # stale-guard: keyed to
    exp_path = os.path.join(                        # bench+package sources
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache",
        f"chain_export_{plat}_B{B}_R{R}_F{FSTEP}_{fp}.jaxexp")
    t0 = time.perf_counter()
    lowered = None
    if os.path.exists(exp_path):
        try:
            exp = jax.export.deserialize(
                bytearray(open(exp_path, "rb").read()))
            lowered = jax.jit(exp.call).lower(sig_j, keys, ebnos)
            RESULTS["chain_export_cached"] = True
        except Exception:
            lowered = None
    write_export = lowered is None
    if lowered is None:
        lowered = chain.lower(sig_j, keys, ebnos)
    compiled = lowered.compile()
    RESULTS["chain_compile_s"] = round(time.perf_counter() - t0, 1)
    def start_export():
        # write-behind in a daemon thread, started only AFTER the timed
        # regions (ADVICE r3): the export pays its own lowering spin over
        # the same tunnel, which would depress the cold/warm measurements
        # it ran concurrently with — the artifact only serves FUTURE
        # processes, so it can start last and even die with the stage.
        if not write_export:
            return
        def _write():
            try:
                data = jax.export.export(chain)(sig_j, keys, ebnos
                                                ).serialize()
                os.makedirs(os.path.dirname(exp_path), exist_ok=True)
                tmp = f"{exp_path}.{os.getpid()}.tmp"
                with open(tmp, "wb") as f:
                    f.write(bytes(data))
                os.replace(tmp, exp_path)
            except Exception:
                pass
        threading.Thread(target=_write, daemon=True).start()
    try:   # XLA's own FLOP count of the optimized program (audit artifact)
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        RESULTS["chain_xla_gflops"] = round(ca["flops"] / 1e9, 1)
    except Exception:
        pass
    _checkpoint()
    # TIMING INTEGRITY: block_until_ready can return WITHOUT waiting on
    # this backend in some states (measured 2026-08-21: 3.8 ms "exec"
    # followed by a 367 s stall on the first result fetch).  Every timed
    # region therefore ENDS with the (tiny, (B,) int32) result fetch, so
    # a recorded rate can never be inflated by the async lie; the
    # fetchless variant is reported alongside for good-day comparison.
    samples = R * B * len(sig)
    t0 = time.perf_counter()
    ok = compiled(sig_j, keys, ebnos)
    ok.block_until_ready()
    first_block = time.perf_counter() - t0
    ok_host = np.asarray(ok)
    first = time.perf_counter() - t0
    RESULTS["chain_first_run_s"] = round(first, 2)
    RESULTS["chain_first_run_fetchless_s"] = round(first_block, 2)
    # provisional headline from the first (cold) run: a real throughput
    # sample that survives even if the budget dies during the warm reps
    RESULTS["full_chain_msps"] = round(samples / first / 1e6, 1)
    RESULTS["realtime_x"] = round(samples / first / cfg.Fs, 1)
    RESULTS["full_chain_provisional"] = True
    RESULTS["batch_streams"] = B
    RESULTS["chain_rounds"] = R
    _checkpoint()
    reps = reps if _remaining() > 1.3 * reps * first + 10 else (
        1 if _remaining() > 1.3 * first + 10 else 0)
    if reps == 0:
        start_export()
        return
    t0 = time.perf_counter()
    for r in range(reps):
        ok = compiled(sig_j, round_keys(2 + r), ebnos)
    ok.block_until_ready()
    dt_block = (time.perf_counter() - t0) / reps
    ok_host = np.asarray(ok)                       # fetch INSIDE the timer
    dt = (time.perf_counter() - t0) / reps
    del RESULTS["full_chain_provisional"]
    RESULTS["chain_reps"] = reps
    msps = samples / dt / 1e6
    RESULTS["full_chain_msps"] = round(msps, 1)
    RESULTS["full_chain_msps_fetchless"] = round(samples / dt_block / 1e6, 1)
    RESULTS["realtime_x"] = round(msps * 1e6 / cfg.Fs, 1)
    if "chain_xla_gflops" in RESULTS:
        RESULTS["chain_xla_tflops_per_s"] = round(
            RESULTS["chain_xla_gflops"] / dt / 1e3, 3)
    _checkpoint()
    start_export()                 # timed regions done; seed the artifact

    ok = ok_host                                   # (B,) per-stream counts
    RESULTS["packets_ok"] = int(ok.sum())
    RESULTS["packets_sent"] = R * B * n_packets
    # streams deliberately span Eb/N0 8-15 dB ACROSS the decode cliff
    # (~9.5 dB, BASELINE.md) to exercise max-iteration churn; the parity
    # band >= 10.5 dB is where full decode is expected
    band = np.asarray(ebnos) >= 10.5
    RESULTS["packets_ok_parity_band"] = int(ok[band].sum())
    RESULTS["packets_sent_parity_band"] = int(R * n_packets * band.sum())
    RESULTS["packets_note"] = (
        "streams span EbN0 8-15 dB across the ~9.5 dB decode cliff by "
        "design; sub-cliff losses are expected (parity band reported "
        "separately). Capture has a 2048-bit lead-in before frame 0 "
        "(tools/loss_census.py: the r3 3.6% parity-band deficit was 100% "
        "packet-0 estimator-warmup loss on a lead-in-free capture)")
    _checkpoint()
    overhead = _dispatch_overhead("chain_dispatch_overhead_s")
    if isinstance(overhead, float):
        RESULTS["full_chain_msps_program"] = round(
            samples / max(dt - overhead, 1e-9) / 1e6, 1)  # minus tunnel floor
    _checkpoint()


def _degraded_stream_program_rate(cfg, raw, n_packets):
    """Wire-limited-day fallback: program-rate bound of the fused chain on
    DEVICE-RESIDENT data (VERDICT r3 weak#1 — the r3 driver record
    contained no real-ingest number at all after an H2D stall).  A 12 s
    prefix crosses with a budgeted put; the one-dispatch program is then
    timed without per-call H2D, so the record carries `stream_program_*`
    (what the chip can ingest) alongside the h2d ceiling (what the wire
    allowed that day)."""
    import jax
    import jax.numpy as jnp
    from wenet_tpu.rx import pipeline as P

    secs_p = 12.0
    sub = raw[: 2 * int(secs_p * cfg.Fs)]
    data, n, fmt = P._normalize_fused_input(sub, "cu8")
    n_chunks = 32      # ~360k-sample chunks: the c128-on-95s lane density
    syms_pp, chunk_len, starts, skips = P._fused_geometry(
        cfg, "v2", n, n_chunks, 8)
    nf = cfg.num_frames(chunk_len)
    k = int(np.ceil(chunk_len / cfg.Ts / syms_pp)) + 2
    fn = P._fused_program(cfg, "v2", chunk_len, nf, k, 10, fmt,
                          P._fused_unroll(None), P._fused_fstep(None),
                          tuple(int(s) for s in starts))
    box = {}
    done = threading.Event()

    def put():
        try:
            d = jax.device_put(np.ascontiguousarray(data))
            np.asarray(d[-4:])      # block_until_ready lies on device_put
            box["d"] = d
            done.set()
        except Exception:
            pass
    th = threading.Thread(target=put, daemon=True)
    th.start()
    th.join(max(min(_remaining() - 90, 180), 10))
    if not done.is_set():
        RESULTS["stream_program_rate_status"] = "prefix H2D stalled too"
        _checkpoint()
        return
    d = box["d"]
    sj, kj = jnp.asarray(starts), jnp.asarray(skips)
    t0 = time.perf_counter()
    packed = np.asarray(fn(d, sj, kj))
    RESULTS["stream_program_first_call_s"] = round(time.perf_counter() - t0, 1)
    RESULTS["stream_program_prefix_s"] = secs_p
    _checkpoint()
    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        packed = np.asarray(fn(d, sj, kj))       # ends with the result fetch
    dt = (time.perf_counter() - t0) / reps
    res = P._dedup_payloads(P._unpack_fused(packed, starts, cfg), syms_pp)
    RESULTS["stream_program_msps"] = round(n / dt / 1e6, 2)
    RESULTS["stream_program_realtime_x"] = round(n / dt / cfg.Fs, 1)
    RESULTS["stream_program_packets_ok"] = len(res)
    RESULTS["stream_program_packets_expected"] = decodable_packets(
        n * cfg.Rs // cfg.Fs, n_packets)
    _checkpoint()


@_stage("stream")
def stage_stream():
    """Real-ingest: raw cu8 bytes in host memory -> CRC-valid packets,
    wall-clock including H2D (the benchmarking/test_demod.py:82-118
    contract).  The capture is built host-side (numpy) before timing
    starts."""
    import jax
    import jax.numpy as jnp
    from wenet_tpu.ops import fsk
    from wenet_tpu.rx.pipeline import Receiver, decode_iq_fused
    from wenet_tpu.utils.rng import prng_key

    cfg = fsk.V2_CONFIG
    tpu = jax.devices()[0].platform == "tpu"
    secs = float(os.environ.get("WENET_BENCH_STREAM_SECS",
                                "95" if tpu else "6"))
    ebno_db = 12.0                           # above the ~9.5 dB cliff
    _warm_d2h()        # overlap a possible first-fetch stall with the
    #                    host-side bit/capture construction below

    # ---- capture generation (HOST, numpy): deterministic (~45-100 s for
    # the default 95 s capture on this box), so it is CACHED on disk —
    # every bench invocation (including the driver's end-of-round run)
    # regenerates the identical bytes otherwise.  A device-side generator
    # is ~1 s on a healthy backend but was measured eating 190-320 s of
    # the stage budget in compile/warmup on degraded days (bench_runs/
    # 2026-08-20) — and the ingest contract starts from host bytes anyway.
    # ---- capture via the canonical shared builder (bench.stream_capture:
    # keyed cache covering rates + ebno + generator-source hash; also used
    # by tools/stream_tune.py and tools/fused_profile.py so tuning runs
    # measure EXACTLY these bytes)
    t0 = time.perf_counter()
    raw, n_packets, was_cached = stream_capture(secs, ebno_db,
                                                with_cache_flag=True)
    RESULTS["stream_capture_cached"] = bool(was_cached)
    RESULTS["stream_capture_gen_s"] = round(time.perf_counter() - t0, 1)
    n_samples = len(raw) // 2
    RESULTS["stream_capture_s"] = round(n_samples / cfg.Fs, 1)
    RESULTS["stream_packets_sent"] = n_packets
    _checkpoint()

    # ---- H2D bandwidth of the raw bytes (context for the ingest numbers),
    # in a budget-boxed daemon thread: a wedged device_put (observed eating
    # a whole 243 s stage on 2026-08-21) must not starve the actual
    # candidates below, which carry their own H2D costs anyway
    h2d_done = threading.Event()                 # ADVICE r3: no sentinel
    #   race — the thread signals completion; h2d_mbps stays numeric and a
    #   separate status key records a stall

    def _h2d_probe():
        # block_until_ready LIES for device_put as well (measured: a
        # "0.18 s" 182 MB put whose data actually arrived during the next
        # call): end with a tail fetch, which requires the whole buffer
        d = jax.device_put(raw)
        np.asarray(d[-8:])
        t0 = time.perf_counter()
        d = jax.device_put(raw)
        np.asarray(d[-8:])
        RESULTS["h2d_mbps"] = round(
            len(raw) / (time.perf_counter() - t0) / 1e6, 0)
        # hard ceiling the tunnel imposes on ANY real-ingest path: the cu8
        # bytes must cross host->device once (2 B/sample); on degraded
        # days this, not the program, binds (measured 17-46 MB/s vs
        # 1.4 GB/s within single sessions)
        RESULTS["stream_h2d_ceiling_x"] = round(
            RESULTS["h2d_mbps"] * 1e6 / 2 / cfg.Fs, 1)
        h2d_done.set()
        _checkpoint()
    th = threading.Thread(target=_h2d_probe, daemon=True)
    th.start()
    th.join(45.0)
    if not h2d_done.is_set():
        RESULTS["h2d_probe_status"] = "stalled >45s"
    _checkpoint()

    candidates = []      # (msps, gate_ok, label)
    # r5 re-tune (tools/chain_fstep_tune.py, static-slice chunking): c128
    # f16 = 426 MS/s device-resident; c256 crashes the remote compiler
    n_chunks = int(os.environ.get("WENET_BENCH_PAR_CHUNKS", "128"))

    if not h2d_done.is_set():
        # H2D is wedged: the host-ingest candidates below all begin with a
        # full-capture device_put and would eat the stage budget measuring
        # nothing (the r3 record's empty stream stage).  Degrade to the
        # PROGRAM-RATE bound: move a 12 s prefix with a budgeted put (small
        # enough to land even at single-MB/s), then time the fused chain on
        # device-resident data — together with the (eventually-recorded)
        # h2d ceiling this fully characterizes a wire-limited day.
        _degraded_stream_program_rate(cfg, raw, n_packets)
        if not h2d_done.is_set():
            _finish_stream(candidates, cfg)
            # wire-limited records must still self-describe the tunnel
            # floor so stream_program_* can be read against it
            _dispatch_overhead("dispatch_overhead_s")
            return

    # ---- fused ONE-dispatch path (the production file/batch ingest)
    t0 = time.perf_counter()
    pk = decode_iq_fused(raw, mode="v2", n_chunks=n_chunks,
                         input_format="cu8")
    RESULTS["stream_fused_first_call_s"] = round(time.perf_counter() - t0, 1)
    _checkpoint()
    dts = []
    for _ in range(2):
        if dts and _remaining() < 1.5 * dts[0] + 20:
            break                      # keep budget for the gate + push
        t0 = time.perf_counter()
        pk = decode_iq_fused(raw, mode="v2", n_chunks=n_chunks,
                             input_format="cu8")
        dts.append(time.perf_counter() - t0)
    dt_fused = min(dts)
    # correctness gate: a fast path that lost packets doesn't set the
    # headline (cold-start warmup can cost the first packet; seams none)
    fused_gate = len(pk) >= n_packets - 2
    RESULTS["stream_fused_chunks"] = n_chunks
    RESULTS["stream_fused_msps"] = round(n_samples / dt_fused / 1e6, 2)
    RESULTS["stream_fused_packets_ok"] = len(pk)
    RESULTS["stream_fused_gate"] = bool(fused_gate)
    candidates.append((n_samples / dt_fused, fused_gate, "fused"))
    _checkpoint()

    # ---- slab-pipelined fused path: same one-program chain, capture cut
    # into slabs kept 2-in-flight so H2D of slab s+1 overlaps execution of
    # slab s — on H2D-bandwidth-degraded days (the recorded 35 MB/s mode,
    # where moving the bytes IS the wall) this approaches the h2d ceiling
    # instead of ceiling/2
    if _remaining() > 75:
        from wenet_tpu.rx.pipeline import decode_iq_fused_overlap
        n_slabs = int(os.environ.get("WENET_BENCH_SLABS", "4"))
        cps = int(os.environ.get("WENET_BENCH_SLAB_CPS",
                                 str(max(n_chunks // 2, 1))))
        t0 = time.perf_counter()
        pk2 = decode_iq_fused_overlap(raw, mode="v2", n_slabs=n_slabs,
                                      chunks_per_slab=cps,
                                      input_format="cu8")
        RESULTS["stream_overlap_first_call_s"] = round(
            time.perf_counter() - t0, 1)
        _checkpoint()
        dts2 = []
        for _ in range(2):
            if dts2 and _remaining() < 1.5 * dts2[0] + 20:
                break
            t0 = time.perf_counter()
            pk2 = decode_iq_fused_overlap(raw, mode="v2", n_slabs=n_slabs,
                                          chunks_per_slab=cps,
                                          input_format="cu8")
            dts2.append(time.perf_counter() - t0)
        dt_ov = min(dts2)
        ov_gate = len(pk2) >= n_packets - 2
        RESULTS["stream_overlap_slabs"] = n_slabs
        RESULTS["stream_overlap_msps"] = round(n_samples / dt_ov / 1e6, 2)
        RESULTS["stream_overlap_packets_ok"] = len(pk2)
        RESULTS["stream_overlap_gate"] = bool(ov_gate)
        candidates.append((n_samples / dt_ov, ov_gate, "fused_overlap"))
        _checkpoint()
    else:
        RESULTS["stream_overlap_skipped"] = "budget"

    # ---- device-resident program rate of the PRODUCTION fused config
    # (the c128-f16 = 426 MS/s r5 record): same program the fused
    # candidate just ran, timed without per-call H2D — what the chip can
    # ingest when the wire isn't the wall (real PCIe deployment)
    if _remaining() > 75:
        try:
            from wenet_tpu.rx import pipeline as P
            data, n, fmt = P._normalize_fused_input(raw, "cu8")
            syms_pp, chunk_len, starts, skips = P._fused_geometry(
                cfg, "v2", n, n_chunks, 8)
            nf = cfg.num_frames(chunk_len)
            kpc = int(np.ceil(chunk_len / cfg.Ts / syms_pp)) + 2
            fn = P._fused_program(cfg, "v2", chunk_len, nf, kpc, 10, fmt,
                                  P._fused_unroll(None), P._fused_fstep(None),
                                  tuple(int(s) for s in starts))
            d = jax.device_put(np.ascontiguousarray(data))
            np.asarray(d[-4:])
            sj, kj = jnp.asarray(starts), jnp.asarray(skips)
            packed = np.asarray(fn(d, sj, kj))       # warm (exec-cached)
            t0 = time.perf_counter()
            for _ in range(2):
                packed = np.asarray(fn(d, sj, kj))   # ends with the fetch
            dt = (time.perf_counter() - t0) / 2
            got = len(P._dedup_payloads(
                P._unpack_fused(packed, starts, cfg), syms_pp))
            RESULTS["stream_program_full_msps"] = round(n / dt / 1e6, 2)
            RESULTS["stream_program_full_rt_x"] = round(n / dt / cfg.Fs, 1)
            RESULTS["stream_program_full_packets_ok"] = got
            RESULTS["stream_program_full_chunks"] = n_chunks
            del d
        except Exception as e:
            RESULTS["stream_program_full_error"] = repr(e)[:160]
        _checkpoint()

    # ---- LIVE push path, throughput configuration: FusedReceiver (r5) —
    # chunk-parallel slabs + halo recompute, device deframe, depth-2
    # pipelining (H2D of slab s+1 overlaps execution of slab s).  Fed the
    # FULL capture in 2 s cu8 buckets: the realtime-pipeline contract of
    # start_rx_headless.sh:130-133.
    if _remaining() < 90:
        RESULTS["stream_push_fused_skipped"] = "budget"
        RESULTS["stream_push_fsm_skipped"] = "budget"
        _checkpoint()
        _finish_stream(candidates, cfg)
        return
    from wenet_tpu.rx.pipeline import FusedReceiver
    chunk = 2 * int(cfg.Fs * 2.0)            # 2 s of cu8 bytes per push

    def run_fused_push():
        rx = FusedReceiver(mode="v2", input_format="cu8",
                           push_samples=4 * cfg.Fs,
                           n_chunks=int(os.environ.get(
                               "WENET_BENCH_PUSH_CHUNKS", "16")), depth=2)
        got = 0
        t0 = time.perf_counter()
        for i in range(0, len(raw), chunk):
            got += len(rx.push(raw[i:i + chunk]))
        got += len(rx.flush())
        return time.perf_counter() - t0, got

    t0 = time.perf_counter()
    _, got_w = run_fused_push()                 # compile pass
    RESULTS["stream_push_fused_compile_s"] = round(time.perf_counter() - t0, 1)
    _checkpoint()
    dt_f, got_f = run_fused_push()
    RESULTS["stream_push_fused_msps"] = round(n_samples / dt_f / 1e6, 2)
    RESULTS["stream_push_fused_packets_ok"] = got_f
    RESULTS["stream_push_fused_packets_sent"] = n_packets
    candidates.append((n_samples / dt_f, got_f >= n_packets - 2,
                       "push_fused"))
    _checkpoint()

    # ---- cold/warm time-to-first-packet (VERDICT r4 #7): the C chain
    # decodes within ~a second of process start (start_rx.sh:125-150);
    # ours pays compile/artifact-load.  "Cold" here is THIS process's
    # first use of the low-latency receiver configuration (disk artifact
    # caches allowed — they ship with a deployment); "warm" re-uses the
    # in-process compiled program.
    def ttfp():
        rx = FusedReceiver(mode="v2", input_format="cu8",
                           push_samples=1 * cfg.Fs, n_chunks=4, depth=0)
        t0 = time.perf_counter()
        for i in range(0, len(raw), chunk):
            if rx.push(raw[i:i + chunk]):
                return time.perf_counter() - t0
        if rx.flush():
            return time.perf_counter() - t0
        return None
    c = ttfp()
    w = ttfp()
    if c is not None:
        RESULTS["time_to_first_packet_cold_s"] = round(c, 2)
    if w is not None:
        RESULTS["time_to_first_packet_warm_s"] = round(w, 2)
    _checkpoint()

    # ---- classic exact-FSM streaming path: Receiver.push of raw cu8
    # chunks (device-side conversion), pipelined (PP) vs serial, on a
    # short prefix — the bit-for-bit C-chain-parity live mode
    if _remaining() < 90:
        RESULTS["stream_push_fsm_skipped"] = "budget"
        _checkpoint()
        _finish_stream(candidates, cfg)
        return
    push_secs = min(secs, 8.0)
    sub = raw[: 2 * int(push_secs * cfg.Fs)]
    push_samples = len(sub) // 2
    # EXACT decodable count for the prefix (VERDICT r3 weak#4: the old
    # estimate under-counted by one, so records showed ok > sent)
    push_expected = decodable_packets(push_samples * cfg.Rs // cfg.Fs,
                                      n_packets)

    def run(pipelined):
        rx = Receiver(mode="v2", pipelined=pipelined, with_eye=False,
                      input_format="cu8")
        got = 0
        t0 = time.perf_counter()
        for i in range(0, len(sub), chunk):
            got += len(rx.push(sub[i:i + chunk]))
        got += len(rx.flush())
        return time.perf_counter() - t0, got

    t0 = time.perf_counter()
    _, got_warm = run(True)                    # compile pass
    RESULTS["stream_push_compile_s"] = round(time.perf_counter() - t0, 1)
    RESULTS["stream_push_packets_ok"] = got_warm
    RESULTS["stream_push_packets_sent"] = push_expected
    _checkpoint()
    dt_pp, got_pp = run(True)
    dt_serial, got_serial = run(False)
    RESULTS["stream_pp_msps"] = round(push_samples / dt_pp / 1e6, 2)
    RESULTS["stream_serial_msps"] = round(push_samples / dt_serial / 1e6, 2)
    RESULTS["pp_speedup"] = round(dt_serial / dt_pp, 2)
    candidates.append((push_samples / dt_pp, got_pp >= push_expected - 2,
                       "push_pp"))
    candidates.append((push_samples / dt_serial,
                       got_serial >= push_expected - 2, "push_serial"))

    _finish_stream(candidates, cfg)
    # wire-limited day: the ingest number above is bounded by H2D, not the
    # program — record the device-resident program-rate bound alongside
    # (VERDICT r3 #1b asks for program rate + ceiling on degraded days)
    if RESULTS.get("stream_realtime_x", 0) < 50 and _remaining() > 60:
        _degraded_stream_program_rate(cfg, raw, n_packets)
    _dispatch_overhead("dispatch_overhead_s")


def _finish_stream(candidates, cfg):
    """Headline: fastest CORRECT path (ADVICE r2: never let a path that
    decoded fewer packets set the number)."""
    gated = [c for c in candidates if c[1]]
    if gated:
        rate, _, label = max(gated)
        RESULTS["stream_ingest_msps"] = round(rate / 1e6, 2)
        RESULTS["stream_ingest_path"] = label
        RESULTS["stream_realtime_x"] = round(rate / cfg.Fs, 1)
    else:
        RESULTS["stream_ingest_gate_failed"] = [
            {"path": c[2], "msps": round(c[0] / 1e6, 2)} for c in candidates]
    _checkpoint()


@_stage("wideband")
def stage_wideband():
    """Channelized wideband scaling (BASELINE config 4 / VERDICT r4 #3):
    the fused wideband pipeline — polyphase filterbank + N demods + N
    deframes + batched LDPC, one dispatch — at N channels.  Captures are
    disk-cached (host synthesis at wideband rates is minutes for N=16)."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools"))
    import wideband_scaling

    _warm_d2h()
    for nch in (int(x) for x in os.environ.get(
            "WENET_BENCH_WIDEBAND_N", "8,16").split(",")):
        if _remaining() < 60:
            RESULTS[f"wideband_n{nch}_skipped"] = "budget"
            _checkpoint()
            continue
        rec = wideband_scaling.measure(nch)
        RESULTS[f"wideband_msps_n{nch}"] = rec["wideband_msps"]
        RESULTS[f"wideband_rt_x_n{nch}"] = rec["band_realtime_x"]
        RESULTS[f"wideband_channels_ok_n{nch}"] = (
            f"{rec['channels_complete']}/{nch}")
        _checkpoint()


@_stage("ldpc")
def stage_ldpc(reps=3):
    import jax.numpy as jnp
    from wenet_tpu.ops import ldpc

    nB = 2048          # B-scaling sweet spot (tools/minsum_scaling.py r5)
    r2 = np.random.default_rng(1)
    ib = np.unpackbits(r2.integers(0, 256, (nB, 258), dtype=np.uint8), axis=1)
    cw = np.concatenate([ib, ldpc.encode_bits_np(ib)], axis=1)
    esn0 = 10 ** 0.75 * 0.8
    sd = (1 - 2.0 * cw) + r2.normal(0, np.sqrt(1 / (2 * esn0)), cw.shape)
    llr = jnp.asarray(ldpc.sd_to_llr(jnp.asarray(sd, jnp.float32)))
    t0 = time.perf_counter()
    bits_out, _, _ = ldpc.decode(llr)
    bits_out.block_until_ready()
    RESULTS["ldpc_compile_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    for _ in range(reps):
        bits_out, _, _ = ldpc.decode(llr)
    np.asarray(bits_out[:1])   # honest tail: a slice of the output buffer
    #   still requires the whole batch executed (r5 fetch discipline),
    #   without making the timer a D2H wire benchmark
    RESULTS["ldpc_codewords_per_s"] = round(
        nB * reps / (time.perf_counter() - t0), 0)
    _checkpoint()

    # normalized min-sum (transcendental-free Monte-Carlo engine)
    b2, _, _ = ldpc.decode_minsum(llr)
    b2.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        b2, _, _ = ldpc.decode_minsum(llr)
    np.asarray(b2[:1])
    RESULTS["minsum_codewords_per_s"] = round(
        nB * reps / (time.perf_counter() - t0), 0)
    _checkpoint()

    if os.environ.get("WENET_BENCH_PALLAS") == "1":
        try:
            from wenet_tpu.ops import ldpc_pallas
            t0 = time.perf_counter()
            b, _, _ = ldpc_pallas.decode_pallas(llr, batch_tile=64)
            b.block_until_ready()
            RESULTS["pallas_compile_s"] = round(time.perf_counter() - t0, 1)
            t0 = time.perf_counter()
            for _ in range(reps):
                b, _, _ = ldpc_pallas.decode_pallas(llr, batch_tile=64)
            b.block_until_ready()
            RESULTS["pallas_codewords_per_s"] = round(
                nB * reps / (time.perf_counter() - t0), 0)
        except Exception as e:              # backend Pallas gaps: keep going
            RESULTS["pallas_error"] = repr(e)[:160]
        _checkpoint()


def _configure_jax():
    import jax
    # persistent compilation cache: a retried bench (or a second run after a
    # watchdog kill) compiles from cache instead of paying tunnel-compile
    from wenet_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    return jax


STAGES = {"chain": stage_chain, "stream": stage_stream,
          "wideband": stage_wideband, "ldpc": stage_ldpc}


def run_stage_child(name: str, out_path: str, budget: float | None = None):
    """Child mode: run ONE stage, checkpointing RESULTS to out_path after
    every measurement; SIGTERM (parent budget) flushes and exits.  The
    stage budget lets measurements degrade gracefully (provisional
    first-run numbers instead of nothing) when compiles eat the budget —
    on some backend days executable-cache loads do not work and every
    fresh process pays a ~3 min remote compile per program."""
    global OUT_PATH, STAGE_DEADLINE
    OUT_PATH = out_path
    if budget is not None:
        STAGE_DEADLINE = time.time() + budget - 5.0

    def on_term(signum, frame):
        RESULTS[f"{name}_stage_timeout"] = True
        _checkpoint()
        os._exit(1)
    signal.signal(signal.SIGTERM, on_term)

    jax = _configure_jax()
    RESULTS["platform"] = jax.devices()[0].platform
    STAGES[name]()
    _checkpoint()


def main(total_budget: float):
    """Orchestrate: each stage in its own subprocess with a time budget.

    A stage whose compile stalls (tunnelled-TPU bad days: >900 s observed
    for a program that takes 9 s on a good day) is SIGTERMed at its budget
    — its checkpointed partial results survive — and the NEXT stage still
    runs, so a bad day lands the cheap stages and a good day lands
    everything.  Budget split: chain <= 40% of total, stream 65% of the
    remainder, wideband 55% of what is left after that, ldpc the rest."""
    t_end = time.time() + total_budget - 15.0        # reserve for emit
    order = [("chain", 0.40 * total_budget),
             ("stream", None),                        # 65% of what's left
             ("wideband", None),                      # 55% of what's left
             ("ldpc", None)]
    fracs = {"stream": 0.65, "wideband": 0.55}
    for i, (name, budget) in enumerate(order):
        remaining = t_end - time.time()
        if remaining < 20:
            RESULTS[f"{name}_skipped"] = "budget exhausted"
            continue
        if budget is None:
            budget = (remaining if i == len(order) - 1
                      else fracs[name] * remaining)
        budget = min(budget, remaining)
        out = tempfile.NamedTemporaryFile(suffix=".json", delete=False).name
        t0 = time.time()
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--stage", name, "--out", out, "--budget", str(int(budget))],
            stdout=subprocess.DEVNULL, stderr=subprocess.PIPE, text=True)
        try:
            _, err = proc.communicate(timeout=budget)
            if proc.returncode != 0:
                RESULTS[f"{name}_error"] = (err or "")[-160:]
        except subprocess.TimeoutExpired:
            proc.terminate()                  # SIGTERM: child checkpoints
            try:
                proc.communicate(timeout=10)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.communicate()
            RESULTS[f"{name}_stage_timeout_s"] = round(time.time() - t0, 0)
        try:
            with open(out) as f:
                RESULTS.update(json.load(f))
        except Exception:
            pass
        finally:
            try:
                os.unlink(out)
            except OSError:
                pass


if __name__ == "__main__":
    if "--stage" in sys.argv:
        name = sys.argv[sys.argv.index("--stage") + 1]
        out_path = sys.argv[sys.argv.index("--out") + 1]
        budget = (float(sys.argv[sys.argv.index("--budget") + 1])
                  if "--budget" in sys.argv else None)
        try:
            run_stage_child(name, out_path, budget)
        except Exception as e:
            RESULTS[f"{name}_error"] = repr(e)[:160]
            OUT_PATH = out_path
            _checkpoint()
        raise SystemExit(0)

    total = float(os.environ.get("WENET_BENCH_TIMEOUT", 480))
    threading.Thread(target=watchdog, args=(total + 30,),
                     daemon=True).start()              # belt-and-braces
    try:
        main(total)
    except Exception as e:                      # tunnelled-TPU flakiness:
        RESULTS["error"] = repr(e)[:160]        # report what was measured
    finally:
        DONE.set()
        emit()
