"""Benchmark: full-chain RX throughput + LDPC decode rate on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., ...extras}

Baseline (BASELINE.md): the reference C chain decodes a 95 s Fs=921416
capture in ~12 s on x86 => ~7.3 Msamples/s end-to-end, single core.
Headline: end-to-end IQ Msamples/s through the full TPU chain (scan demod
over a batch of independent v2-rate streams — the production sweep
configuration), plus LDPC codewords/s.

Robustness: compile latency on tunnelled TPU backends can be pathological,
so stages run under a watchdog — measured-so-far results are emitted and
the process exits rather than hanging the driver.
"""
import json
import os
import threading
import time

import numpy as np

RESULTS = {}
BASELINE_MSPS = 7.3
DONE = threading.Event()


def emit():
    chain = RESULTS.get("full_chain_msps")
    out = {
        "metric": "full_chain_iq_throughput" if chain else "ldpc_decode_rate",
        "value": round(chain, 2) if chain else
        round(RESULTS.get("ldpc_codewords_per_s", 0.0), 0),
        "unit": "Msamples/s/chip" if chain else "codewords/s",
        "vs_baseline": round(chain / BASELINE_MSPS, 2) if chain else 0.0,
    }
    out.update({k: v for k, v in RESULTS.items()})
    print(json.dumps(out), flush=True)


def watchdog(seconds: float):
    if not DONE.wait(seconds):
        RESULTS["timeout"] = True
        emit()
        os._exit(0)


def main():
    import jax
    import jax.numpy as jnp
    from wenet_tpu.core import framing
    from wenet_tpu.utils import compat
    from wenet_tpu.ops import fsk, ldpc
    from wenet_tpu.parallel import sweep
    from wenet_tpu.utils.rng import prng_key

    dev = jax.devices()[0]
    RESULTS["platform"] = dev.platform

    # ---------------- stage 1: LDPC decode rate (small, known-good compile)
    nB = 512
    r2 = np.random.default_rng(1)
    ib = np.unpackbits(r2.integers(0, 256, (nB, 258), dtype=np.uint8), axis=1)
    cw = np.concatenate([ib, ldpc.encode_bits_np(ib)], axis=1)
    esn0 = 10 ** 0.75 * 0.8
    sd = (1 - 2.0 * cw) + r2.normal(0, np.sqrt(1 / (2 * esn0)), cw.shape)
    llr = jnp.asarray(sweep.ldpc.sd_to_llr(jnp.asarray(sd, jnp.float32)))
    reps = 3
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

    # ---------------- stage 2: full-chain throughput (batched v2 streams)
    cfg = fsk.V2_CONFIG                      # Fs=960000, Rs=96000
    n_packets = 12
    rng = np.random.default_rng(0)
    frames_bits = []
    for _ in range(n_packets):
        p = rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
        frame = framing.frame_packet(p, ldpc.encode_bytes, mode="v2")
        frames_bits.append(framing.frame_to_bits(frame, "v2"))
        frames_bits.append(rng.integers(0, 2, 512).astype(np.uint8))
    bits = np.concatenate(frames_bits)
    bits = np.concatenate([bits, np.zeros((-len(bits)) % cfg.Nbits, np.uint8)])
    sig, _ = fsk.fsk_mod_np(cfg, bits, 2 * cfg.Rs, cfg.Rs)
    var = float(np.mean(np.abs(sig) ** 2))
    sig_j = compat.put_complex(sig)
    nf = cfg.num_frames(len(sig))
    # B=256 saturates the chip (tools/chain_scaling.py: 3.1 GS/s @ B=8,
    # 212 GS/s @ B>=256 -- per-dispatch tunnel latency amortizes out)
    B = int(os.environ.get("WENET_BENCH_STREAMS", "256"))
    ebnos = jnp.linspace(8.0, 15.0, B)

    from wenet_tpu.ops import deframe

    @jax.jit
    def chain(sig, keys, ebno_db):
        # sig as an ARGUMENT: the axon backend rejects large embedded
        # array constants (tools/tpu_bisect vmap_noise vs vmap_chain_arg)
        # The WHOLE chain runs on device: demod scan -> UW top-k deframe
        # -> descramble -> BP decode -> CRC gate.
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
    ok = chain(sig_j, keys, ebnos)
    ok.block_until_ready()
    RESULTS["chain_compile_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    for r in range(reps):
        ok = chain(sig_j, jax.random.split(prng_key(2 + r), B), ebnos)
    ok.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    RESULTS["packets_ok"] = int(np.asarray(ok).sum())
    RESULTS["packets_sent"] = B * n_packets
    msps = B * len(sig) / dt / 1e6
    RESULTS["full_chain_msps"] = msps
    RESULTS["realtime_x"] = round(msps * 1e6 / cfg.Fs, 1)
    RESULTS["batch_streams"] = B


if __name__ == "__main__":
    threading.Thread(target=watchdog,
                     args=(float(os.environ.get("WENET_BENCH_TIMEOUT", 480)),),
                     daemon=True).start()
    try:
        main()
    except Exception as e:                      # tunnelled-TPU flakiness:
        RESULTS["error"] = repr(e)[:160]        # report what was measured
    finally:
        DONE.set()
        emit()
