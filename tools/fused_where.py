"""Where does the fused program's time go at F=8? Times, fetch-honest
(scalar fetch), on the device-resident 95 s capture:
  (a) ingest: u8 pad+gather+convert only (sum of |z|)
  (b) demod:  (a) + vmapped demod_stream at fstep (sum of soft)
  (c) chain:  the full fused program (packed fetch)
Appends to bench_runs/fused_profile.jsonl."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=32)
    ap.add_argument("--fstep", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    import numpy as np
    from wenet_tpu.utils.jaxcache import enable_persistent_cache
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    enable_persistent_cache(os.path.join(repo, ".jax_cache"))
    import jax, jax.numpy as jnp
    from wenet_tpu.ops import fsk
    from wenet_tpu.rx import pipeline as P
    import bench
    out_path = os.path.join(repo, "bench_runs", "fused_profile.jsonl")
    def emit(rec):
        rec["t"] = round(time.time(), 0); rec["platform"] = jax.devices()[0].platform
        with open(out_path, "a") as f: f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    cfg = fsk.V2_CONFIG
    raw, _ = bench.stream_capture(95.0)
    data, n, fmt = P._normalize_fused_input(raw, "cu8")
    nc, fs = args.chunks, args.fstep
    syms_pp, chunk_len, starts, skips = P._fused_geometry(cfg, "v2", n, nc, 8)
    nf = cfg.num_frames(chunk_len)
    d = jax.device_put(np.ascontiguousarray(data)); np.asarray(d[-4:])
    sj, kj = jnp.asarray(starts), jnp.asarray(skips)

    def timed(label, fn, *a, **extra):
        t0 = time.perf_counter(); r = np.asarray(fn(*a)); first = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.reps): r = np.asarray(fn(*a))
        dt = (time.perf_counter() - t0) / args.reps
        emit({"stage": label, "first_s": round(first, 2), "exec_s": round(dt, 3),
              "msps": round(n / dt / 1e6, 2), "chunks": nc, "fstep": fs, **extra})

    @jax.jit
    def ingest_only(data, starts):
        pad = jnp.full((chunk_len, 2), 127, data.dtype)
        buf = jnp.concatenate([data, pad], axis=0)
        ix = starts[:, None] + jnp.arange(chunk_len, dtype=jnp.int32)
        chunks = buf[ix]
        x = (chunks.astype(jnp.float32) - 127.0) * (1.0 / 128.0)
        z = jax.lax.complex(x[..., 0], x[..., 1])
        return jnp.sum(jnp.abs(z))
    timed("where_ingest", ingest_only, d, sj)

    @jax.jit
    def demod_only(data, starts):
        pad = jnp.full((chunk_len, 2), 127, data.dtype)
        buf = jnp.concatenate([data, pad], axis=0)
        ix = starts[:, None] + jnp.arange(chunk_len, dtype=jnp.int32)
        chunks = buf[ix]
        def one(chunk):
            x = (chunk.astype(jnp.float32) - 127.0) * (1.0 / 128.0)
            z = jax.lax.complex(x[..., 0], x[..., 1])
            _, outs = fsk.demod_stream(cfg, z, nf, frames_per_step=fs)
            return jnp.sum(outs.soft)
        return jnp.sum(jax.vmap(one)(chunks))
    timed("where_demod", demod_only, d, sj)

    k = int(np.ceil(chunk_len / cfg.Ts / syms_pp)) + 2
    fn = P._fused_program(cfg, "v2", chunk_len, nf, k, 10, fmt, 1, fs,
                          tuple(int(s) for s in starts))
    timed("where_chain", fn, d, sj, kj, k=k)

if __name__ == "__main__":
    main()
