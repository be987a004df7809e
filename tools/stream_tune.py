"""Sweep the fused real-ingest configuration on TPU (round-4 headline).

The stream stage's program rate is set by chunk parallelism: the scan
demod is sequential within a chunk, so more/shorter chunks = more parallel
scans = better chip utilization, at the cost of halo recompute (a ~30k
sample halo on a ~1.4M sample chunk core at 64 chunks — negligible).
This tool measures, for several (n_chunks,) one-dispatch configs and
(n_slabs, chunks_per_slab) overlap configs on the REAL 95 s bench capture:

  - program rate on device-resident data (pure chip, no wire)
  - real-ingest wall clock from host bytes (the benchmark contract)

Two-phase usage (tunnel windows are minutes-short; compiles are one-time):
  python tools/stream_tune.py --compile-only     # any window: seed caches
  python tools/stream_tune.py                    # healthy window: measure

Appends JSON lines to bench_runs/stream_tune.jsonl.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--compile-only", action="store_true")
    ap.add_argument("--secs", type=float, default=95.0)
    ap.add_argument("--fused", default="16,32,64",
                    help="comma list of n_chunks for decode_iq_fused")
    ap.add_argument("--overlap", default="4x16,4x8,2x32",
                    help="comma list of SLABSxCPS for decode_iq_fused_overlap")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import numpy as np
    from wenet_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))
    import jax
    import jax.numpy as jnp
    from wenet_tpu.ops import fsk
    from wenet_tpu.rx import pipeline as P

    import bench

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_runs", "stream_tune.jsonl")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    def emit(rec):
        rec["t"] = round(time.time(), 0)
        rec["platform"] = jax.devices()[0].platform
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    # the exact bench capture via the canonical shared builder
    cfg = fsk.V2_CONFIG
    t0 = time.perf_counter()
    raw, n_packets = bench.stream_capture(args.secs)
    n_samples = len(raw) // 2
    print(f"capture ready ({time.perf_counter()-t0:.1f}s, "
          f"{n_samples/cfg.Fs:.1f}s, {n_packets} packets)", flush=True)

    fused_list = [int(x) for x in args.fused.split(",") if x]
    ov_list = [tuple(int(v) for v in x.split("x"))
               for x in args.overlap.split(",") if x]

    for nc in fused_list:
        # --- program-rate on device-resident data
        data, n, fmt = P._normalize_fused_input(raw, "cu8")
        syms_pp, chunk_len, starts, skips = P._fused_geometry(
            cfg, "v2", n, nc, 8)
        nf = cfg.num_frames(chunk_len)
        k = int(np.ceil(chunk_len / cfg.Ts / syms_pp)) + 2
        fn = P._fused_program(cfg, "v2", chunk_len, nf, k, 10, fmt,
                              P._fused_unroll(None), P._fused_fstep(None),
                              tuple(int(s) for s in starts))
        t0 = time.perf_counter()
        d = jax.device_put(np.ascontiguousarray(data))
        np.asarray(d[-4:])          # block_until_ready lies on device_put
        h2d_s = time.perf_counter() - t0
        sj, kj = jnp.asarray(starts), jnp.asarray(skips)
        t0 = time.perf_counter()
        packed = np.asarray(fn(d, sj, kj))
        first_s = time.perf_counter() - t0
        rec = {"config": f"fused{nc}_devres", "h2d_s": round(h2d_s, 2),
               "first_call_s": round(first_s, 2)}
        if args.compile_only:
            emit(rec)
            continue
        t0 = time.perf_counter()
        for _ in range(args.reps):
            packed = np.asarray(fn(d, sj, kj))
        dt = (time.perf_counter() - t0) / args.reps
        ok = len(P._dedup_payloads(P._unpack_fused(packed, starts, cfg),
                                   syms_pp))
        rec.update(program_msps=round(n / dt / 1e6, 2),
                   program_realtime_x=round(n / dt / cfg.Fs, 1),
                   packets_ok=ok, packets_expected=n_packets)
        emit(rec)
        # --- real ingest from host bytes
        t0 = time.perf_counter()
        pk = P.decode_iq_fused(raw, "v2", n_chunks=nc, input_format="cu8")
        dt = time.perf_counter() - t0
        emit({"config": f"fused{nc}_ingest",
              "ingest_msps": round(n_samples / dt / 1e6, 2),
              "ingest_realtime_x": round(n_samples / dt / cfg.Fs, 1),
              "packets_ok": len(pk), "packets_expected": n_packets})

    for (ns, cps) in ov_list:
        t0 = time.perf_counter()
        pk = P.decode_iq_fused_overlap(raw, "v2", n_slabs=ns,
                                       chunks_per_slab=cps,
                                       input_format="cu8")
        first_s = time.perf_counter() - t0
        rec = {"config": f"overlap{ns}x{cps}_ingest",
               "first_call_s": round(first_s, 2)}
        if args.compile_only:
            emit(rec)
            continue
        t0 = time.perf_counter()
        for _ in range(args.reps):
            pk = P.decode_iq_fused_overlap(raw, "v2", n_slabs=ns,
                                           chunks_per_slab=cps,
                                           input_format="cu8")
        dt = (time.perf_counter() - t0) / args.reps
        rec.update(ingest_msps=round(n_samples / dt / 1e6, 2),
                   ingest_realtime_x=round(n_samples / dt / cfg.Fs, 1),
                   packets_ok=len(pk), packets_expected=n_packets)
        emit(rec)


if __name__ == "__main__":
    main()
