"""Feasibility probe: which gather formulations does Mosaic lower on TPU?

VERDICT r1 #9 asks for a gather-native VMEM-resident BP kernel (edge
messages resident, no one-hot HBM streaming).  That kernel needs, inside
a Pallas TPU kernel body, a *static-index* gather along either the lane
or the sublane dimension of a VMEM-resident array:

  lane    : q_e[b, e]  = qi[b, var_of_edge[e]]     (Bt, 2688) -> (Bt, 10240)
  sublane : q_e[e, b]  = qi[var_of_edge[e], b]     (2688, Bt) -> (10240, Bt)

This probe tries each formulation on tiny shapes and prints which ones
Mosaic accepts + whether results match numpy.  Run it as a TPU batch job
(ONE tpu client at a time per CLAUDE.md):

    timeout 600 python tools/pallas_gather_probe.py
"""
import functools
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, V, E = 8, 256, 512          # batch, "vars", "edges" (lane-multiples)
rng = np.random.default_rng(0)
IDX = rng.integers(0, V, E).astype(np.int32)
X = rng.normal(size=(B, V)).astype(np.float32)
WANT = X[:, IDX]


def report(name, fn):
    try:
        got = np.asarray(fn())
        ok = np.allclose(got, WANT)
        print(f"{name:28s} {'OK' if ok else 'WRONG RESULT'}")
        return ok
    except Exception as e:
        msg = " / ".join(str(e).splitlines()[:2])[:160]
        print(f"{name:28s} FAIL: {type(e).__name__}: {msg}")
        if "--trace" in __import__("sys").argv:
            traceback.print_exc()
        return False


# --- 1. lane gather: jnp.take along axis=-1, idx broadcast to (B, E) -----
def lane_take_along():
    idx2 = jnp.broadcast_to(jnp.asarray(IDX)[None, :], (B, E))

    def _pad_lanes(x, n):          # take_along_axis wants same lane count?
        return jnp.pad(x, ((0, 0), (0, n - x.shape[1])))

    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(
            _pad_lanes(x_ref[:], E), i_ref[:], axis=-1, mode="clip")

    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((B, E), jnp.float32))(
            jnp.asarray(X), idx2)


# --- 1b. lane gather, unpadded source ------------------------------------
def lane_take_along_raw():
    idx2 = jnp.broadcast_to(jnp.asarray(IDX)[None, :], (B, E))

    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=-1,
                                       mode="clip")

    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((B, E), jnp.float32))(
            jnp.asarray(X), idx2)


# --- 2. jnp.take (flat index vector input) along lanes -------------------
def lane_take_const():
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], i_ref[0], axis=-1)

    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((B, E), jnp.float32))(
            jnp.asarray(X), jnp.asarray(IDX)[None, :])


# --- 3. sublane gather: x (V, B), take along axis=0 ----------------------
def sublane_take_along():
    xt = jnp.asarray(X.T)                       # (V, B)
    idx2 = jnp.broadcast_to(jnp.asarray(IDX)[:, None], (E, B))

    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0,
                                       mode="clip")

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((E, B), jnp.float32))(xt, idx2)
    return out.T


# --- 4. pltpu.dynamic_gather if exposed ----------------------------------
def pltpu_dyn_gather():
    fn = getattr(pltpu, "dynamic_gather", None)
    if fn is None:
        raise AttributeError("pltpu.dynamic_gather not exposed")
    idx2 = jnp.broadcast_to(jnp.asarray(IDX)[None, :], (B, E))

    def k(x_ref, i_ref, o_ref):
        o_ref[:] = fn(x_ref[:], i_ref[:], axis=-1)

    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((B, E), jnp.float32))(
            jnp.asarray(X), idx2)


# --- 5. gather via lax.gather (XLA-style) --------------------------------
def lax_gather():
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = x_ref[:][:, i_ref[0]]

    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((B, E), jnp.float32))(
            jnp.asarray(X), jnp.asarray(IDX)[None, :])


if __name__ == "__main__":
    print("jax", jax.__version__, jax.devices())
    results = {}
    for name, fn in [("lane_take_along(padded)", lane_take_along),
                     ("lane_take_along(raw)", lane_take_along_raw),
                     ("lane_take_const", lane_take_const),
                     ("sublane_take_along", sublane_take_along),
                     ("pltpu.dynamic_gather", pltpu_dyn_gather),
                     ("fancy_index/lax.gather", lax_gather)]:
        results[name] = report(name, fn)
    print("ANY_OK:", any(results.values()))
