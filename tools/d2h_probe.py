"""Characterize D2H fetch cost on the axon backend: dtype x size matrix.

The tunnel_probe measured 15 s to fetch a tiny uint8 array — if real,
result-fetch shape/dtype choices dominate the ingest path's wall clock.
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

    out = {}

    from functools import partial

    @partial(jax.jit, static_argnums=(1,))
    def make(x, dtype):
        return (x * 0 + 1).astype(dtype)

    for dtype, tag in [(jnp.float32, "f32"), (jnp.uint8, "u8"),
                       (jnp.int32, "i32"), (jnp.bool_, "bool")]:
        for n, ntag in [(256, "256"), (65536, "64k"), (1 << 22, "4m")]:
            a = make(jnp.zeros(n, jnp.float32), dtype)
            a.block_until_ready()
            t0 = time.perf_counter()
            np.asarray(a)
            dt1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(a)
            dt2 = time.perf_counter() - t0
            out[f"d2h_{tag}_{ntag}_s"] = (round(dt1, 4), round(dt2, 4))

    # the exact shape the fused decoder fetches
    pb = make(jnp.zeros((16, 40, 258), jnp.float32), jnp.uint8)
    pb.block_until_ready()
    t0 = time.perf_counter()
    np.asarray(pb)
    out["d2h_packets_s"] = round(time.perf_counter() - t0, 4)

    # device_put'd array fetch (what tunnel_probe actually timed)
    d = jax.device_put(np.zeros((64, 258), np.uint8))
    d.block_until_ready()
    t0 = time.perf_counter()
    np.asarray(d)
    out["d2h_deviceput_u8_s"] = round(time.perf_counter() - t0, 4)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
