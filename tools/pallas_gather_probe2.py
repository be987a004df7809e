"""Probe 2: Mosaic take_along_axis with SAME-shaped input/indices/output.

Probe 1 showed the lowering rule exists but asserts shape equality
(tpu.dynamic_gather semantics).  Here x, idx, out all share one shape;
tests both axes and several sizes to find the supported envelope.

    timeout 1200 python tools/pallas_gather_probe2.py
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def trial(axis, rows, cols, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(rows, cols)).astype(np.float32)
    n_idx = rows if axis == 0 else cols
    idx = rng.integers(0, n_idx, (rows, cols)).astype(np.int32)

    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=axis)

    got = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32))(
            jnp.asarray(x), jnp.asarray(idx))
    want = np.take_along_axis(x, idx, axis=axis)
    return np.array_equal(np.asarray(got), want)


if __name__ == "__main__":
    print("jax", jax.__version__, jax.devices())
    for axis in (0, 1):
        for rows, cols in [(8, 128), (64, 128), (512, 128), (8, 512),
                           (2584, 128), (7280, 128), (7296, 128)]:
            try:
                ok = trial(axis, rows, cols)
                print(f"axis={axis} ({rows:5d},{cols:4d})  "
                      f"{'OK' if ok else 'WRONG RESULT'}")
            except Exception as e:
                msg = " / ".join(str(e).splitlines()[:1])[:110]
                print(f"axis={axis} ({rows:5d},{cols:4d})  "
                      f"FAIL {type(e).__name__}: {msg}")
