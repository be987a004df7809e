"""Split the fused-chain exec time into demod-scan vs deframe-topk parts.

Times, on device-resident bench-capture data at a given chunk count:
  (a) conversion + overlap-save gather + demod scan ONLY
  (b) the full fused chain (demod + UW top-k + descramble + LDPC + CRC)
  (c) top-k deframe alone on precomputed soft bits
and for the demod, scan unroll variants (the per-step dispatch overhead is
the serial wall at high chunk counts).

Usage: python tools/fused_profile.py [--chunks 32] [--reps 2] [--unroll 1,2,4]
Appends to bench_runs/fused_profile.jsonl.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=32)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--unroll", default="1,2,4")
    ap.add_argument("--secs", type=float, default=95.0)
    args = ap.parse_args()

    import numpy as np
    from wenet_tpu.utils.jaxcache import enable_persistent_cache
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    enable_persistent_cache(os.path.join(repo, ".jax_cache"))
    import jax
    import jax.numpy as jnp
    from wenet_tpu.ops import deframe, fsk
    from wenet_tpu.rx import pipeline as P

    out_path = os.path.join(repo, "bench_runs", "fused_profile.jsonl")

    def emit(rec):
        rec["t"] = round(time.time(), 0)
        rec["platform"] = jax.devices()[0].platform
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    cfg = fsk.V2_CONFIG
    caps = sorted(
        p for p in os.listdir(os.path.join(repo, ".jax_cache"))
        if p.startswith(f"stream_cap_{int(args.secs)}s_{cfg.Fs}_{cfg.Rs}_")
        and p.endswith(".npy"))
    assert caps, "run tools/stream_tune.py first to build the capture"
    raw = np.load(os.path.join(repo, ".jax_cache", caps[-1]))

    nc = args.chunks
    data, n, fmt = P._normalize_fused_input(raw, "cu8")
    syms_pp, chunk_len, starts, skips = P._fused_geometry(cfg, "v2", n, nc, 8)
    nf = cfg.num_frames(chunk_len)
    k = int(np.ceil(chunk_len / cfg.Ts / syms_pp)) + 2
    t0 = time.perf_counter()
    d = jax.device_put(np.ascontiguousarray(data))
    d.block_until_ready()
    emit({"stage": "h2d", "h2d_s": round(time.perf_counter() - t0, 2),
          "chunks": nc})
    sj, kj = jnp.asarray(starts), jnp.asarray(skips)

    def timed(label, fn, *a, **extra):
        t0 = time.perf_counter()
        r = fn(*a)
        jax.tree.map(lambda x: x.block_until_ready(), r)
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.reps):
            r = fn(*a)
        jax.tree.map(lambda x: x.block_until_ready(), r)
        np.asarray(jax.tree.leaves(r)[0])          # end with a result fetch
        dt = (time.perf_counter() - t0) / args.reps
        emit({"stage": label, "first_s": round(first, 2),
              "exec_s": round(dt, 3),
              "msps": round(n / dt / 1e6, 2), "chunks": nc, **extra})
        return r

    # (a) demod-only, at several scan unrolls
    for unroll in (int(u) for u in args.unroll.split(",")):
        @jax.jit
        def demod_only(data, starts, skips, _u=unroll):
            pad = jnp.full((chunk_len, 2), 127, data.dtype)
            buf = jnp.concatenate([data, pad], axis=0)
            ix = starts[:, None] + jnp.arange(chunk_len, dtype=jnp.int32)
            chunks = buf[ix]

            def one(chunk, skip):
                x = (chunk.astype(jnp.float32) - 127.0) * (1.0 / 128.0)
                z = jax.lax.complex(x[..., 0], x[..., 1])
                _, outs = fsk.demod_stream(cfg, z, nf, unroll=_u)
                keep = outs.valid & (jnp.arange(nf, dtype=jnp.int32) >= skip)
                soft = jnp.where(keep[:, None], outs.soft, 1.0).reshape(-1)
                return soft
            return jax.vmap(one)(chunks, skips)

        soft = timed(f"demod_only_u{unroll}", demod_only, d, sj, kj,
                     unroll=unroll)

    # (c) top-k deframe alone on the precomputed soft bits
    soft_dev = jax.device_put(np.asarray(soft))

    @jax.jit
    def topk_only(soft):
        def one(s):
            pb, ok, _, pos = deframe.deframe_topk(s, mode="v2", k=k)
            return ok
        return jax.vmap(one)(soft)
    timed("topk_only", topk_only, soft_dev, k=k)

    # (b) the full fused chain (the production program, export-cached)
    fn = P._fused_program(cfg, "v2", chunk_len, nf, k, 10, fmt,
                             P._fused_unroll(None))
    timed("full_chain", fn, d, sj, kj, k=k)


if __name__ == "__main__":
    main()
