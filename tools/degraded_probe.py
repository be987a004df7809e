"""Characterize a degraded-backend window: what exactly is slow?

Times (warm, cached): tiny dispatch, H2D, LDPC decode, demod_stream at
small/large batch with scan unroll 1 vs 8.  Distinguishes per-dispatch
latency vs per-scan-iteration overhead vs raw FLOP-rate collapse —
each implies a different bench/program shaping fix.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def t(fn, reps=3):
    fn()                                   # warm/compile
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    try:
        r.block_until_ready()
    except AttributeError:
        pass
    return (time.perf_counter() - t0) / reps


def main():
    from wenet_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from wenet_tpu.ops import fsk, ldpc

    out = {"platform": jax.devices()[0].platform,
           "ts": time.strftime("%H:%M:%S")}

    tiny = jax.jit(lambda x: x * 2.0 + 1.0)
    z = jnp.ones((8, 128), jnp.float32)
    out["tiny_dispatch_s"] = round(t(lambda: np.asarray(tiny(z)), 5), 4)

    a = np.random.randint(0, 256, 32 << 20, dtype=np.uint8)
    t0 = time.perf_counter()
    jax.device_put(a).block_until_ready()
    out["h2d_32mb_mbps"] = round(32 / (time.perf_counter() - t0), 1)

    r2 = np.random.default_rng(1)
    ib = np.unpackbits(r2.integers(0, 256, (512, 258), dtype=np.uint8), axis=1)
    cw = np.concatenate([ib, ldpc.encode_bits_np(ib)], axis=1)
    sd = (1 - 2.0 * cw) + r2.normal(0, 0.3, cw.shape)
    llr = jnp.asarray(ldpc.sd_to_llr(jnp.asarray(sd, jnp.float32)))
    out["ldpc_512_s"] = round(t(lambda: ldpc.decode(llr)[0]), 4)

    cfg = fsk.V2_CONFIG
    n = 48 * cfg.N                          # 48 frames ~ 230k samples
    sig = np.exp(2j * np.pi * 0.2 * np.arange(n)).astype(np.complex64)
    for B in (8, 128):
        x = jnp.asarray(np.tile(sig[None], (B, 1)).view(np.float32)
                        .reshape(B, n, 2))
        for unroll in (1, 8):
            def make(unr):
                @jax.jit
                def f(xx):
                    z = jax.lax.complex(xx[..., 0], xx[..., 1])
                    _, outs = jax.vmap(
                        lambda s: fsk.demod_stream(cfg, s, 48,
                                                   unroll=unr))(z)
                    return jnp.sum(outs.soft)
                return f
            try:
                f = make(unroll)
                dt = t(lambda: f(x).block_until_ready())
                out[f"demod_B{B}_u{unroll}_s"] = round(dt, 4)
                out[f"demod_B{B}_u{unroll}_msps"] = round(
                    B * n / dt / 1e6, 1)
            except TypeError:
                out[f"demod_B{B}_u{unroll}_s"] = "no-unroll-param"
                break

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
