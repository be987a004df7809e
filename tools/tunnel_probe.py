"""Probe the axon TPU backend: dispatch latency + H2D bandwidth.

Writes JSON to stdout.  Run as a batch job (compiles are tiny but the
tunnel can be slow); informs bench shaping — the one-dispatch ingest path
is dispatch-latency-bound unless H2D of the raw cu8 bytes dominates.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main():
    from wenet_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    out = {"platform": jax.devices()[0].platform}

    # tiny program dispatch latency (the per-dispatch tunnel cost)
    @jax.jit
    def tiny(x):
        return jnp.sum(x * 2.0)

    x = jnp.ones(128, jnp.float32)
    tiny(x).block_until_ready()
    for name, reps in [("dispatch_latency_s", 5)]:
        t0 = time.perf_counter()
        for _ in range(reps):
            tiny(x).block_until_ready()
        out[name] = round((time.perf_counter() - t0) / reps, 4)

    # H2D bandwidth: uint8 arrays like the rtl_sdr byte stream
    for mb in (8, 64, 256):
        a = np.random.randint(0, 256, mb << 20, dtype=np.uint8)
        d = jax.device_put(a)          # warm any lazy path
        d.block_until_ready()
        t0 = time.perf_counter()
        d = jax.device_put(a)
        d.block_until_ready()
        dt = time.perf_counter() - t0
        out[f"h2d_{mb}mb_mbps"] = round(mb / dt, 1)
        del d

    # D2H for a small result (what the decode path fetches back)
    r = jax.device_put(np.zeros((64, 258), np.uint8))
    r.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(r)
    out["d2h_small_s"] = round((time.perf_counter() - t0) / 5, 4)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
