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
    ap.add_argument("--unroll", default="1")
    ap.add_argument("--fstep", default="1,4,8,16",
                    help="frames_per_step values for the demod-only sweep")
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

    import bench
    cfg = fsk.V2_CONFIG
    raw, _ = bench.stream_capture(args.secs)   # canonical shared builder

    nc = args.chunks
    data, n, fmt = P._normalize_fused_input(raw, "cu8")
    syms_pp, chunk_len, starts, skips = P._fused_geometry(cfg, "v2", n, nc, 8)
    nf = cfg.num_frames(chunk_len)
    k = int(np.ceil(chunk_len / cfg.Ts / syms_pp)) + 2
    t0 = time.perf_counter()
    d = jax.device_put(np.ascontiguousarray(data))
    np.asarray(d[-4:])              # block_until_ready lies on device_put
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

    # (a) demod-only, at several scan unrolls x frames_per_step
    for unroll in (int(u) for u in args.unroll.split(",")):
        for fstep in (int(f) for f in args.fstep.split(",")):
            @jax.jit
            def demod_only(data, starts, skips, _u=unroll, _f=fstep):
                pad = jnp.full((chunk_len, 2), 127, data.dtype)
                buf = jnp.concatenate([data, pad], axis=0)
                ix = starts[:, None] + jnp.arange(chunk_len, dtype=jnp.int32)
                chunks = buf[ix]

                def one(chunk, skip):
                    x = (chunk.astype(jnp.float32) - 127.0) * (1.0 / 128.0)
                    z = jax.lax.complex(x[..., 0], x[..., 1])
                    _, outs = fsk.demod_stream(cfg, z, nf, unroll=_u,
                                               frames_per_step=_f)
                    keep = outs.valid & (jnp.arange(nf, dtype=jnp.int32) >= skip)
                    soft = jnp.where(keep[:, None], outs.soft, 1.0).reshape(-1)
                    return soft
                return jax.vmap(one)(chunks, skips)

            soft = timed(f"demod_only_u{unroll}_f{fstep}", demod_only,
                         d, sj, kj, unroll=unroll, fstep=fstep)

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
    fs = P._fused_fstep(None)
    fn = P._fused_program(cfg, "v2", chunk_len, nf, k, 10, fmt,
                          P._fused_unroll(None), fs,
                          tuple(int(s) for s in starts))
    timed("full_chain", fn, d, sj, kj, k=k, fstep=fs)




def bisect(chunks=32, reps=2, secs=95.0):
    """Ablate demod-step components one at a time (demod-only scan, tiny
    honest fetch) to find where the ~380 us/step actually goes."""
    import numpy as np
    from wenet_tpu.utils.jaxcache import enable_persistent_cache
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    enable_persistent_cache(os.path.join(repo, ".jax_cache"))
    import jax
    import jax.numpy as jnp
    from wenet_tpu.ops import fsk
    from wenet_tpu.rx import pipeline as P
    from wenet_tpu.utils import compat

    out_path = os.path.join(repo, "bench_runs", "fused_profile.jsonl")

    def emit(rec):
        rec["t"] = round(time.time(), 0)
        rec["platform"] = jax.devices()[0].platform
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    import bench
    cfg = fsk.V2_CONFIG
    raw, _ = bench.stream_capture(secs)        # canonical shared builder
    data, n, fmt = P._normalize_fused_input(raw, "cu8")
    syms_pp, chunk_len, starts, skips = P._fused_geometry(
        cfg, "v2", n, chunks, 8)
    nf = cfg.num_frames(chunk_len)
    d = jax.device_put(np.ascontiguousarray(data))
    d.block_until_ready()
    sj = jnp.asarray(starts)

    TWO_PI = np.float32(2 * np.pi)
    hann = jnp.asarray(fsk.hann_window(cfg.Ndft))
    Ts, Pp, M, Nsym, Nmem = cfg.Ts, cfg.P, cfg.M, cfg.Nsym, cfg.Nmem
    S = Ts // Pp

    def make_variant(skip):
        def step_fn(st, stream, new_blocks):
            nin = st.nin
            nold = Nmem - nin
            if "freq" in skip:
                fft_est, f_new = st.fft_est, jnp.asarray(
                    [24000.0, 120000.0], jnp.float32)
            elif "peaks" in skip:
                # keep the DFT + EMA, replace only the M-peak pick: how
                # much of freq-est is the ~10 small reduction ops?
                from wenet_tpu.utils import compat as _compat
                half_ = cfg.Ndft // 2
                idx_ = jnp.arange(cfg.Ndft)
                fft_samps = jnp.clip(nin - cfg.Ndft, 0, cfg.Ndft)
                win_ = jnp.where(idx_ < fft_samps, hann, 0.0)
                spec = _compat.dft(new_blocks[: cfg.Ndft] * win_,
                                   n_out=half_)
                mag2 = jnp.square(spec.real) + jnp.square(spec.imag)
                bin_i = jnp.arange(half_)
                band = (bin_i >= cfg.f_min_bin) & (bin_i < cfg.f_max_bin - 1)
                mag = jnp.sqrt(jnp.where(band, mag2, 0.0))
                tc_ = jnp.float32(cfg.ema_tc)
                fft_est = st.fft_est * (1 - tc_) + mag * tc_
                f_new = jnp.asarray([24000.0, 120000.0], jnp.float32) \
                    + 0.0 * fft_est[0]
            else:
                fft_est, f_new = fsk._freq_est_step(
                    cfg, st.fft_est, new_blocks, nin, hann)
            latched = jnp.where(st.f_est[0] < 1.0, f_new, st.f_est)
            inv_fs = np.float32(1.0 / cfg.Fs)
            t = jnp.arange(Nmem, dtype=jnp.float32)[None, :]
            noldf = nold.astype(jnp.float32)
            f_old, f_cur = latched[:, None], f_new[:, None]
            theta0 = st.phi[:, None] - TWO_PI * (noldf - S) * f_old * inv_fs
            if "osc" in skip:
                d_ = jnp.broadcast_to(stream[None, :], (M, Nmem))
            else:
                ang = theta0 + TWO_PI * inv_fs * (
                    f_old * jnp.minimum(t, noldf)
                    + f_cur * jnp.maximum(t - noldf, 0.0))
                osc = jax.lax.complex(jnp.cos(ang), -jnp.sin(ang))
                d_ = stream[None, :] * osc
            phi_next = jnp.mod(
                theta0[:, 0] + TWO_PI * inv_fs * (
                    latched * noldf
                    + f_new * (nin.astype(jnp.float32) - S)),
                np.float32(TWO_PI))
            if "cumsum" in skip:
                f_int = d_[:, : (Nsym + 1) * Pp]
            else:
                csum = jnp.cumsum(d_, axis=-1)
                csum = jnp.concatenate(
                    [jnp.zeros((M, 1), csum.dtype), csum], axis=-1)
                starts_ = np.arange((Nsym + 1) * Pp, dtype=np.int32) * S
                f_int = csum[:, starts_ + Ts] - csum[:, starts_]
            if "timing" in skip:
                rx_timing = jnp.float32(0.0)
                norm_rx_timing = jnp.float32(0.0)
            else:
                ft1 = jnp.sum(jnp.square(f_int.real)
                              + jnp.square(f_int.imag), axis=0)
                spin = jnp.exp(1j * (TWO_PI / Pp)
                               * jnp.arange((Nsym + 1) * Pp))
                t_c = jnp.sum(ft1.astype(jnp.complex64)
                              * spin.astype(jnp.complex64))
                norm_rx_timing = compat.atan2(
                    t_c.imag, t_c.real) / np.float32(TWO_PI)
                rx_timing = norm_rx_timing * Pp
            nin_next = jnp.where(
                norm_rx_timing > 0.25, cfg.N + Ts // 2,
                jnp.where(norm_rx_timing < -0.25, cfg.N - Ts // 2,
                          cfg.N)).astype(jnp.int32)
            if "interp" in skip:
                st_idx = (np.arange(Nsym, dtype=np.int32) + 1) * Pp
                tv = f_int[:, st_idx]
            else:
                k_lo, k_hi = -(Pp // 2) - 1, Pp // 2 + 1
                low = compat.floor_int(rx_timing, k_lo, k_hi)
                fract = rx_timing - low.astype(jnp.float32)
                high = low + (fract > 0).astype(jnp.int32)
                st_idx = (np.arange(Nsym, dtype=np.int32) + 1) * Pp
                offs = np.arange(k_lo, k_hi + 1, dtype=np.int32)
                win = f_int[:, st_idx[:, None] + offs[None, :]]
                k_ar = jnp.asarray(offs)
                w = (jnp.where(k_ar == low, 1.0, 0.0) * (1 - fract)
                     + jnp.where(k_ar == high, 1.0, 0.0) * fract)
                tv = jnp.sum(win * w[None, None, :], axis=-1)
            tmax = jnp.square(tv.real) + jnp.square(tv.imag)
            mags = jnp.sqrt(tmax)
            soft = mags[0] - mags[1]
            new_state = fsk.DemodState(
                pos=st.pos + nin, nin=nin_next, fft_est=fft_est,
                f_est=f_new, phi=phi_next,
                norm_rx_timing=norm_rx_timing,
                ppm=st.ppm, ebno_db=st.ebno_db, snr_est=st.snr_est)
            return new_state, soft

        @jax.jit
        def run(data, starts):
            pad = jnp.full((chunk_len, 2), 127, data.dtype)
            buf = jnp.concatenate([data, pad], axis=0)
            ix = starts[:, None] + jnp.arange(chunk_len, dtype=jnp.int32)
            chunks_ = buf[ix]

            def one(chunk):
                x = (chunk.astype(jnp.float32) - 127.0) * (1.0 / 128.0)
                z = jax.lax.complex(x[..., 0], x[..., 1])
                st0 = fsk.demod_init(cfg)
                zz = z[0].real * 0.0
                st0 = jax.tree.map(lambda a: a + zz.astype(a.dtype), st0)
                pf = cfg.Nmem
                pb = cfg.Nmem + cfg.Ndft * cfg.max_fft_blocks
                b2 = jnp.concatenate([jnp.zeros(pf, jnp.complex64), z,
                                      jnp.zeros(pb, jnp.complex64)])

                def stp(c, i):
                    if "noslice" in sset:
                        base = i * cfg.N + pf
                        stream = jax.lax.dynamic_slice(
                            b2, (base,), (cfg.Nmem,))  # static-stride pos
                        nb = stream[: cfg.Ndft * cfg.max_fft_blocks]
                    elif "onegather" in sset:
                        # ONE gather of a slack window, then tiny in-window
                        # dynamic slices (operand is 790 elems, not 2.9M)
                        nold = cfg.Nmem - c.nin
                        wb = jax.lax.dynamic_slice(
                            b2, (pf + c.pos - 30,), (cfg.Nmem + 290,))
                        stream = jax.lax.dynamic_slice(
                            wb, (30 - nold,), (cfg.Nmem,))
                        nb = jax.lax.dynamic_slice(
                            wb, (30,), (cfg.Ndft * cfg.max_fft_blocks,))
                    else:
                        nold = cfg.Nmem - c.nin
                        stream = jax.lax.dynamic_slice(
                            b2, (pf + c.pos - nold,), (cfg.Nmem,))
                        nb = jax.lax.dynamic_slice(
                            b2, (pf + c.pos,),
                            (cfg.Ndft * cfg.max_fft_blocks,))
                    nc_, soft = step_fn(c, stream, nb)
                    return nc_, jnp.sum(soft)
                fin, s = jax.lax.scan(stp, st0,
                                      jnp.arange(nf, dtype=jnp.int32))
                return jnp.sum(s)
            return jnp.sum(jax.vmap(one)(chunks_))
        return run

    skips = (sys.argv[sys.argv.index("--skips") + 1].split(",")
             if "--skips" in sys.argv else
             ["none", "freq", "osc", "cumsum", "timing", "interp",
              "freq+osc", "freq+osc+cumsum+timing+interp"])
    for skip in skips:
        sset = set(skip.split("+")) - {"none"}
        run = make_variant(sset)
        t0 = time.perf_counter()
        np.asarray(run(d, sj))
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            r = np.asarray(run(d, sj))
        dt = (time.perf_counter() - t0) / reps
        emit({"bisect_skip": skip, "first_s": round(first, 2),
              "exec_s": round(dt, 3), "msps": round(n / dt / 1e6, 2),
              "us_per_step": round(dt / nf * 1e6, 1), "chunks": chunks})


if __name__ == "__main__":
    if "--bisect" in sys.argv:
        _ap = argparse.ArgumentParser()
        _ap.add_argument("--bisect", action="store_true")
        _ap.add_argument("--chunks", type=int, default=32)
        _ap.add_argument("--reps", type=int, default=2)
        _ap.add_argument("--secs", type=float, default=95.0)
        _ap.add_argument("--skips", default=None)
        _a = _ap.parse_args()
        bisect(chunks=_a.chunks, reps=_a.reps, secs=_a.secs)
    else:
        main()
