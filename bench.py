"""Benchmark: full-chain RX throughput + LDPC decode rate on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., ...extras}

Baseline (BASELINE.md): the reference C chain decodes a 95 s Fs=921416
capture in ~12 s on x86 => ~7.3 Msamples/s end-to-end, single core.
Our headline number is end-to-end IQ Msamples/s through the full TPU chain
(scan demod -> UW -> batched BP decode -> CRC), data-parallel over a batch
of independent streams — the production sweep configuration.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from wenet_tpu.core import framing
    from wenet_tpu.ops import fsk, ldpc
    from wenet_tpu.parallel import sweep

    dev = jax.devices()[0]
    platform = dev.platform

    # ---------------- full-chain throughput (batch of v2-rate streams)
    cfg = fsk.V2_CONFIG                      # Fs=960000, Rs=96000 — real rates
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
    sig_j = jnp.asarray(sig.astype(np.complex64))
    nf = cfg.num_frames(len(sig))
    B = 8
    ebnos = jnp.linspace(8.0, 15.0, B)

    @jax.jit
    def chain(keys, ebno_db):
        def one(k, e):
            nvar = var * cfg.Fs / (cfg.Rs * 10.0 ** (e / 10.0))
            z = jax.random.normal(k, (sig_j.shape[0], 2), jnp.float32)
            iq = sig_j + jnp.sqrt(nvar / 2) * jax.lax.complex(z[:, 0], z[:, 1])
            iq = iq / jnp.max(jnp.abs(iq))
            _, outs = fsk.demod_stream(cfg, iq, nf)
            return outs.soft
        return jax.vmap(one)(keys, ebno_db)

    keys = jax.random.split(jax.random.PRNGKey(1), B)
    soft = chain(keys, ebnos)
    soft.block_until_ready()                      # compile + warmup
    t0 = time.perf_counter()
    reps = 3
    for r in range(reps):
        soft = chain(jax.random.split(jax.random.PRNGKey(2 + r), B), ebnos)
    soft.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    samples = B * len(sig)
    msps = samples / dt / 1e6
    realtime_x = msps * 1e6 / cfg.Fs              # x real-time per chip

    # ---------------- LDPC decode rate (batched BP, near-threshold LLRs)
    nB = 512
    r2 = np.random.default_rng(1)
    ib = np.unpackbits(r2.integers(0, 256, (nB, 258), dtype=np.uint8), axis=1)
    cw = np.concatenate([ib, ldpc.encode_bits_np(ib)], axis=1)
    esn0 = 10 ** 0.75 * 0.8
    sd = (1 - 2.0 * cw) + r2.normal(0, np.sqrt(1 / (2 * esn0)), cw.shape)
    llr = jnp.asarray(sweep.ldpc.sd_to_llr(jnp.asarray(sd, jnp.float32)))
    bits_out, _, _ = ldpc.decode(llr)
    bits_out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        bits_out, _, _ = ldpc.decode(llr)
    bits_out.block_until_ready()
    cw_per_s = nB * reps / (time.perf_counter() - t0)

    baseline_msps = 7.3                            # C chain, BASELINE.md
    print(json.dumps({
        "metric": "full_chain_iq_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / baseline_msps, 2),
        "realtime_x": round(realtime_x, 1),
        "ldpc_codewords_per_s": round(cw_per_s, 0),
        "platform": platform,
        "batch_streams": B,
    }))


if __name__ == "__main__":
    main()
