"""Calibrate the backend's lax.scan step cost with synthetic bodies.

The fused demod runs ~6k scan steps in ~2.3 s (~380 us/step) while its
total FLOPs (~53 G) would take ~1 ms at hardware rates — something per
step dominates.  This probe times scans with controlled bodies to split
the per-step cost into: bare scan overhead, dynamic_slice gather, DFT
matvec, transcendental block, cumsum, and batch scaling — on the actual
backend, fetch-honest.

Usage: python tools/scan_cost_probe.py [--steps 3000] [--batch 32]
Appends to bench_runs/scan_cost.jsonl.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import numpy as np
    from wenet_tpu.utils.jaxcache import enable_persistent_cache
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    enable_persistent_cache(os.path.join(repo, ".jax_cache"))
    import jax
    import jax.numpy as jnp

    out_path = os.path.join(repo, "bench_runs", "scan_cost.jsonl")
    B, S = args.batch, args.steps

    def emit(rec):
        rec.update(t=round(time.time(), 0), steps=S, batch=B,
                   platform=jax.devices()[0].platform)
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    buf = jnp.asarray(np.random.randn(B, 2 ** 20).astype(np.float32))
    dft_c = jnp.asarray(np.random.randn(256, 128).astype(np.float32))

    def timed(name, fn, *a):
        t0 = time.perf_counter()
        np.asarray(fn(*a))
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.reps):
            r = np.asarray(fn(*a))
        dt = (time.perf_counter() - t0) / args.reps
        emit({"body": name, "first_s": round(first, 2),
              "exec_s": round(dt, 4),
              "us_per_step": round(dt / S * 1e6, 1)})

    def scan(body, carry0):
        @jax.jit
        def run(buf):
            def step(c, _):
                return body(c, buf), None
            c, _ = jax.lax.scan(step, carry0, None, length=S)
            return c
        return run

    # 1. bare: one add per step
    timed("bare_add", scan(lambda c, buf: c + 1.0, jnp.float32(0.0)), buf)

    # 2. dynamic_slice of 512 per step (pos-carried gather, like the demod)
    def body_slice(c, buf):
        pos, acc = c
        w = jax.lax.dynamic_slice(buf, (0, pos), (B, 512))
        return (pos + 480, acc + jnp.sum(w)), None

    @jax.jit
    def run_slice(buf):
        def step(c, _):
            (nc, _) = body_slice(c, buf)
            return nc, None
        c, _ = jax.lax.scan(step, (jnp.int32(0), jnp.float32(0.0)),
                            None, length=S)
        return c[1]
    timed("dyn_slice512", run_slice, buf)

    # 3. DFT matvec (B,256)@(256,128) per step
    def run_factory(body, carry0=0.0):
        @jax.jit
        def run(buf):
            def step(c, _):
                return body(c, buf), None
            c, _ = jax.lax.scan(step, jnp.float32(carry0), None, length=S)
            return c
        return run
    timed("dft_matvec", run_factory(
        lambda c, buf: c + jnp.sum(buf[:, :256] @ dft_c)), buf)

    # 4. transcendental block: cos+sin over (B, 2, 500)
    timed("cos_sin_1k", run_factory(
        lambda c, buf: c + jnp.sum(jnp.cos(buf[:, :1000] + c)
                                   + jnp.sin(buf[:, :1000] - c))), buf)

    # 5. cumsum over (B, 500)
    timed("cumsum500", run_factory(
        lambda c, buf: c + jnp.cumsum(buf[:, :500] + c, axis=-1)[:, -1]
        .sum()), buf)

    # 6. ~10 chained elementwise ops on (B, 500)
    def body_elem(c, buf):
        x = buf[:, :500] + c
        for _ in range(10):
            x = x * 1.0001 + 0.1
        return c + jnp.sum(x)
    timed("elem10x500", run_factory(body_elem), buf)


if __name__ == "__main__":
    main()
