"""Full-chain fused-program tuner: fstep x chunks grid, device-resident,
fetch-honest (packed-result fetch ends every timed region).
Appends to bench_runs/fused_profile.jsonl."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", default="32,64")
    ap.add_argument("--fstep", default="8,16")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--secs", type=float, default=95.0)
    args = ap.parse_args()

    import numpy as np
    from wenet_tpu.utils.jaxcache import enable_persistent_cache
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    enable_persistent_cache(os.path.join(repo, ".jax_cache"))
    import jax
    import jax.numpy as jnp
    from wenet_tpu.ops import fsk
    from wenet_tpu.rx import pipeline as P
    import bench

    out_path = os.path.join(repo, "bench_runs", "fused_profile.jsonl")
    def emit(rec):
        rec["t"] = round(time.time(), 0)
        rec["platform"] = jax.devices()[0].platform
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    cfg = fsk.V2_CONFIG
    raw, n_pkts = bench.stream_capture(args.secs)
    data, n, fmt = P._normalize_fused_input(raw, "cu8")
    t0 = time.perf_counter()
    d = jax.device_put(np.ascontiguousarray(data))
    np.asarray(d[-4:])
    emit({"stage": "h2d", "h2d_s": round(time.perf_counter() - t0, 2)})

    for nc in (int(c) for c in args.chunks.split(",")):
        syms_pp, chunk_len, starts, skips = P._fused_geometry(cfg, "v2", n, nc, 8)
        nf = cfg.num_frames(chunk_len)
        k = int(np.ceil(chunk_len / cfg.Ts / syms_pp)) + 2
        sj, kj = jnp.asarray(starts), jnp.asarray(skips)
        for fs in (int(f) for f in args.fstep.split(",")):
            try:
                fn = P._fused_program(cfg, "v2", chunk_len, nf, k, 10, fmt, 1, fs,
                                      tuple(int(s) for s in starts))
                t0 = time.perf_counter()
                packed = np.asarray(fn(d, sj, kj))
                first = time.perf_counter() - t0
                t0 = time.perf_counter()
                for _ in range(args.reps):
                    packed = np.asarray(fn(d, sj, kj))
                dt = (time.perf_counter() - t0) / args.reps
                res = P._dedup_payloads(P._unpack_fused(packed, starts, cfg), syms_pp)
                emit({"stage": f"chain_c{nc}_f{fs}", "first_s": round(first, 2),
                      "exec_s": round(dt, 3), "msps": round(n / dt / 1e6, 2),
                      "chunks": nc, "fstep": fs, "packets": len(res),
                      "expected": n_pkts})
            except Exception as e:
                emit({"stage": f"chain_c{nc}_f{fs}", "error": repr(e)[:200]})

if __name__ == "__main__":
    main()
