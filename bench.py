"""Benchmark: full-chain RX throughput, real-ingest streaming, LDPC rate.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., ...extras}

Baseline (BASELINE.md): the reference C chain decodes a 95 s Fs=921416
capture in ~12 s on x86 => ~7.3 Msamples/s end-to-end, single core.

Stage order (headline FIRST so a slow-compile day still lands it within the
watchdog; every stage records partials as it finishes):
  1. full_chain_msps   — batched v2 Monte-Carlo chain (demod scan -> UW
                         top-k deframe -> descramble -> BP decode -> CRC),
                         B independent streams in one dispatch
  2. stream_ingest     — REAL ingest: a cu8 capture at v2 flight rate pumped
                         chunk-by-chunk through Receiver.push (host u8 ->
                         complex conversion + H2D transfer included), both
                         pipelined (PP: demod k+1 overlaps deframe k) and
                         serial for comparison
  3. ldpc rate         — decoder-only codewords/s
  4. pallas rate       — optional (WENET_BENCH_PALLAS=1)

Robustness: compile latency on tunnelled TPU backends can be pathological
(measured: the same program that compiles in 9 s on a good day ran >900 s
on a bad one), so EACH STAGE runs in its own subprocess with a time budget
carved out of the global watchdog; a stage that stalls in compile is
killed and the remaining stages still run and land their numbers.  A
persistent JAX compilation cache (.jax_cache/) makes retried runs (and
the driver's end-of-round run) compile from cache.
"""
import json
import os
import subprocess
import sys
import tempfile
import threading
import time

import numpy as np

RESULTS = {}
BASELINE_MSPS = 7.3
DONE = threading.Event()


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
                return None
        return run
    return wrap


def make_packet_bits(cfg, n_packets, rng, gap_bits=512):
    """Framed random packets with noise-bit gaps, padded to whole frames."""
    from wenet_tpu.core import framing
    from wenet_tpu.ops import ldpc
    frames_bits = []
    for _ in range(n_packets):
        p = rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
        frame = framing.frame_packet(p, ldpc.encode_bytes, mode="v2")
        frames_bits.append(framing.frame_to_bits(frame, "v2"))
        frames_bits.append(rng.integers(0, 2, gap_bits).astype(np.uint8))
    bits = np.concatenate(frames_bits)
    return np.concatenate(
        [bits, np.zeros((-len(bits)) % cfg.Nbits, np.uint8)])


@_stage("chain")
def stage_chain(reps=3):
    """Headline: B independent v2 streams through the WHOLE chain on device."""
    import jax
    import jax.numpy as jnp
    from wenet_tpu.ops import deframe, fsk
    from wenet_tpu.utils import compat
    from wenet_tpu.utils.rng import prng_key

    cfg = fsk.V2_CONFIG                      # Fs=960000, Rs=96000
    n_packets = 12
    rng = np.random.default_rng(0)
    bits = make_packet_bits(cfg, n_packets, rng)
    sig, _ = fsk.fsk_mod_np(cfg, bits, 2 * cfg.Rs, cfg.Rs)
    var = float(np.mean(np.abs(sig) ** 2))
    sig_j = compat.put_complex(sig)
    nf = cfg.num_frames(len(sig))
    # B=256 saturates the chip (tools/chain_scaling.py: 3.1 GS/s @ B=8,
    # 212 GS/s @ B>=256 -- per-dispatch tunnel latency amortizes out)
    B = int(os.environ.get("WENET_BENCH_STREAMS", "256"))
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
            _, outs = fsk.demod_stream(cfg, iq, nf)
            _, ok, _, _ = deframe.deframe_topk(
                outs.soft.reshape(-1), mode="v2", k=n_packets)
            return jnp.sum(ok.astype(jnp.int32))
        return jax.vmap(one)(keys, ebno_db)

    keys = jax.random.split(prng_key(1), B)
    t0 = time.perf_counter()
    lowered = chain.lower(sig_j, keys, ebnos)
    compiled = lowered.compile()
    RESULTS["chain_compile_s"] = round(time.perf_counter() - t0, 1)
    try:   # XLA's own FLOP count of the optimized program (audit, VERDICT #2)
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        RESULTS["chain_xla_gflops"] = round(ca["flops"] / 1e9, 1)
    except Exception:
        pass
    t0 = time.perf_counter()
    ok = compiled(sig_j, keys, ebnos)
    ok.block_until_ready()
    RESULTS["chain_first_run_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    for r in range(reps):
        ok = compiled(sig_j, jax.random.split(prng_key(2 + r), B), ebnos)
    ok.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    RESULTS["packets_ok"] = int(np.asarray(ok).sum())
    RESULTS["packets_sent"] = B * n_packets
    msps = B * len(sig) / dt / 1e6
    RESULTS["full_chain_msps"] = round(msps, 1)
    RESULTS["realtime_x"] = round(msps * 1e6 / cfg.Fs, 1)
    RESULTS["batch_streams"] = B
    if "chain_xla_gflops" in RESULTS:
        RESULTS["chain_xla_tflops_per_s"] = round(
            RESULTS["chain_xla_gflops"] / dt / 1e3, 3)


@_stage("stream")
def stage_stream(seconds=None):
    """Real-ingest streaming: cu8 capture -> Receiver.push at flight rate.

    Measures wall time INCLUDING host u8->complex conversion and H2D
    transfer (the benchmarking/test_demod.py:82-118 contract), on the same
    capture for pipelined (PP) and serial push paths."""
    from wenet_tpu.ops import channel, fsk
    from wenet_tpu.rx.pipeline import Receiver

    cfg = fsk.V2_CONFIG
    seconds = seconds or float(os.environ.get("WENET_BENCH_STREAM_SECS", 12))
    rng = np.random.default_rng(3)
    n_bits = int(seconds * cfg.Rs)
    n_packets = max(n_bits // (343 * 8 + 512) - 1, 1)
    bits = make_packet_bits(cfg, n_packets, rng)
    sig, _ = fsk.fsk_mod_np(cfg, bits, 2 * cfg.Rs, cfg.Rs)
    iq = channel.add_awgn(sig.astype(np.complex64), 12.0, cfg.Fs, cfg.Rs,
                          rng=rng)
    raw = fsk.iq_to_cu8(iq)                    # the rtl_sdr byte stream
    RESULTS["stream_capture_s"] = round(len(iq) / cfg.Fs, 1)
    RESULTS["stream_packets_sent"] = n_packets
    chunk = int(cfg.Fs * 2.0) * 2              # 2 s of cu8 bytes per push

    def run(pipelined):
        # with_eye=False: the pure-decode program (stats consumers keep the
        # default True; the eye carry is only worth paying when emitted)
        rx = Receiver(mode="v2", pipelined=pipelined, with_eye=False)
        got = 0
        t0 = time.perf_counter()
        for i in range(0, len(raw), chunk):
            got += len(rx.push(fsk.iq_from_cu8(raw[i:i + chunk])))
        got += len(rx.flush())
        return time.perf_counter() - t0, got

    t0 = time.perf_counter()
    _, got_warm = run(True)                    # compile pass
    RESULTS["stream_compile_s"] = round(time.perf_counter() - t0, 1)
    RESULTS["stream_packets_ok"] = got_warm
    dt_pp, _ = run(True)
    dt_serial, _ = run(False)
    RESULTS["stream_pp_msps"] = round(len(iq) / dt_pp / 1e6, 2)
    RESULTS["stream_serial_msps"] = round(len(iq) / dt_serial / 1e6, 2)
    RESULTS["pp_speedup"] = round(dt_serial / dt_pp, 2)

    # overlap-save parallel ingest (the production file/batch path): raw
    # rtl_sdr bytes to the device, u8->complex conversion + chunk gather +
    # 16 concurrent scan demods in ONE dispatch; host deframe + one decode
    # dispatch.  Same capture, same contract (includes H2D of the bytes).
    from wenet_tpu.rx.pipeline import decode_iq_parallel
    dt_par = None
    n_chunks = int(os.environ.get("WENET_BENCH_PAR_CHUNKS", "16"))
    try:
        t0 = time.perf_counter()
        pk = decode_iq_parallel(raw, mode="v2", n_chunks=n_chunks,
                                input_format="cu8")
        RESULTS["stream_parallel_compile_s"] = round(
            time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        pk = decode_iq_parallel(raw, mode="v2", n_chunks=n_chunks,
                                input_format="cu8")
        dt_par = time.perf_counter() - t0
        RESULTS["stream_parallel_chunks"] = n_chunks
        RESULTS["stream_parallel_msps"] = round(len(iq) / dt_par / 1e6, 2)
        RESULTS["stream_parallel_packets_ok"] = len(pk)
    except Exception as e:
        RESULTS["stream_parallel_error"] = repr(e)[:160]

    best = min(d for d in (dt_pp, dt_serial, dt_par) if d)
    msps = len(iq) / best / 1e6                # best real-ingest path
    RESULTS["stream_ingest_msps"] = round(msps, 2)
    RESULTS["stream_realtime_x"] = round(msps * 1e6 / cfg.Fs, 1)


@_stage("ldpc")
def stage_ldpc(reps=3):
    import jax.numpy as jnp
    from wenet_tpu.ops import ldpc

    nB = 512
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
    bits_out.block_until_ready()
    RESULTS["ldpc_codewords_per_s"] = round(
        nB * reps / (time.perf_counter() - t0), 0)

    # normalized min-sum (transcendental-free Monte-Carlo engine)
    b2, _, _ = ldpc.decode_minsum(llr)
    b2.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        b2, _, _ = ldpc.decode_minsum(llr)
    b2.block_until_ready()
    RESULTS["minsum_codewords_per_s"] = round(
        nB * reps / (time.perf_counter() - t0), 0)

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


def _configure_jax():
    import jax
    # persistent compilation cache: a retried bench (or a second run after a
    # watchdog kill) compiles from cache instead of paying tunnel-compile
    from wenet_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    return jax


STAGES = {"chain": stage_chain, "stream": stage_stream, "ldpc": stage_ldpc}


def run_stage_child(name: str, out_path: str):
    """Child mode: run ONE stage, write its RESULTS to out_path."""
    jax = _configure_jax()
    RESULTS["platform"] = jax.devices()[0].platform
    STAGES[name]()
    with open(out_path, "w") as f:
        json.dump(RESULTS, f)


def main(total_budget: float):
    """Orchestrate: each stage in its own subprocess with a time budget.

    A stage whose compile stalls (tunnelled-TPU bad days: >900 s observed
    for a program that takes 9 s on a good day) is killed at its budget and
    the NEXT stage still runs — so a bad day lands the cheap stages and a
    good day lands everything.  Budget split leaves headroom for the
    later stages: chain <= 55%, stream <= 30% of remaining, ldpc the rest."""
    t_end = time.time() + total_budget - 15.0        # reserve for emit
    order = [("chain", 0.55 * total_budget),
             ("stream", None),                        # 60% of what's left
             ("ldpc", None)]
    for i, (name, budget) in enumerate(order):
        remaining = t_end - time.time()
        if remaining < 20:
            RESULTS[f"{name}_skipped"] = "budget exhausted"
            continue
        if budget is None:
            budget = remaining if i == len(order) - 1 else 0.6 * remaining
        budget = min(budget, remaining)
        out = tempfile.NamedTemporaryFile(suffix=".json", delete=False).name
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--stage", name, "--out", out],
                timeout=budget, capture_output=True, text=True)
            if proc.returncode != 0:
                RESULTS[f"{name}_error"] = (proc.stderr or "")[-160:]
        except subprocess.TimeoutExpired:
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
        try:
            run_stage_child(name, out_path)
        except Exception as e:
            with open(out_path, "w") as f:
                json.dump({f"{name}_error": repr(e)[:160]}, f)
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
