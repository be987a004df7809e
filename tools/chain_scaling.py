"""Measure full-chain demod throughput vs batch width on the real chip.

Usage: timeout 580 python tools/chain_scaling.py [B ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from wenet_tpu.core import framing
    from wenet_tpu.ops import fsk, ldpc
    from wenet_tpu.utils.rng import prng_key

    cfg = fsk.V2_CONFIG
    rng = np.random.default_rng(0)
    frames_bits = []
    for _ in range(12):
        p = rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
        frame = framing.frame_packet(p, ldpc.encode_bytes, mode="v2")
        frames_bits.append(framing.frame_to_bits(frame, "v2"))
        frames_bits.append(rng.integers(0, 2, 512).astype(np.uint8))
    bits = np.concatenate(frames_bits)
    bits = np.concatenate([bits, np.zeros((-len(bits)) % cfg.Nbits, np.uint8)])
    sig, _ = fsk.fsk_mod_np(cfg, bits, 2 * cfg.Rs, cfg.Rs)
    var = float(np.mean(np.abs(sig) ** 2))
    # complex64 H2D is unsupported on the axon backend (the reason
    # utils/compat.put_complex exists); a direct jnp.asarray(complex)
    # enqueues an async UNIMPLEMENTED that only surfaces at the first
    # result fetch — which the old fetchless timing never did
    from wenet_tpu.utils import compat
    sig_j = compat.put_complex(sig.astype(np.complex64))
    nf = cfg.num_frames(len(sig))

    from wenet_tpu.ops import deframe

    @jax.jit
    def chain(sig, keys, ebno_db):
        # the FULL chain (demod -> UW top-k deframe -> LDPC -> CRC), same
        # program shape as bench.py's stage_chain: the demod-only variant
        # returning a f32 soft-sum hit a deterministic axon-backend
        # UNIMPLEMENTED on its result fetch (3 runs across hours, while
        # this form runs fine), and the full chain is the more meaningful
        # scaling object anyway.  Timed regions END with the (B,) int32
        # fetch — block_until_ready alone can return without waiting.
        def one(k, e):
            nvar = var * cfg.Fs / (cfg.Rs * 10.0 ** (e / 10.0))
            z = jax.random.normal(k, (sig.shape[0], 2), jnp.float32)
            iq = sig + jnp.sqrt(nvar / 2) * jax.lax.complex(z[:, 0], z[:, 1])
            iq = iq / jnp.max(jnp.abs(iq))
            _, outs = fsk.demod_stream(cfg, iq, nf)
            _, ok, _, _ = deframe.deframe_topk(
                outs.soft.reshape(-1), mode="v2", k=12)
            return jnp.sum(ok.astype(jnp.int32))
        return jax.vmap(one)(keys, ebno_db)

    for B in [int(a) for a in (sys.argv[1:] or ["8", "16", "32", "64"])]:
        ebnos = jnp.linspace(8.0, 15.0, B)
        keys = jax.random.split(prng_key(1), B)
        t0 = time.perf_counter()
        np.asarray(chain(sig_j, keys, ebnos))
        comp = time.perf_counter() - t0
        reps = 3
        t0 = time.perf_counter()
        for r in range(reps):
            soft = chain(sig_j, jax.random.split(prng_key(2 + r), B), ebnos)
        np.asarray(soft)                       # fetch INSIDE the timer
        dt = (time.perf_counter() - t0) / reps
        msps = B * len(sig) / dt / 1e6
        print(f"B={B:3d}: {msps:,.0f} Msamp/s ({msps*1e6/cfg.Fs:,.0f}x rt, "
              f"compile {comp:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
