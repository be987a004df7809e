"""Bisect which demod sub-stage the tunnelled TPU backend rejects.

Each stage runs in its OWN process (a failed compile poisons the axon
session: every later compile in the same process fails instantly), so
per-stage results are independent.

Usage:
  python tools/tpu_bisect.py            # orchestrate: one subprocess/stage
  python tools/tpu_bisect.py <stage>    # run a single stage in-process
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = [
    "sanity_matmul",
    "fft_only",
    "fft_mask_sqrt",
    "fft_ema_loop",
    "peak_picks",
    "freq_est_full",
    "downconvert_cumsum",
    "demod_frame",
    "scan3",
    "scan_full",
    "rand_normal",
    "vmap_rand",
    "vmap_dynslice",
    "vmap_demod",
    "vmap_noise",
    "vmap_chain_arg",
    "vmap_chain",
]


def build(stage):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from wenet_tpu.ops import fsk
    from wenet_tpu.utils.rng import prng_key

    cfg = fsk.V2_CONFIG
    rng = np.random.default_rng(0)
    n = cfg.N * 6
    iq = jnp.asarray(
        (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64))
    hann = jnp.asarray(fsk.hann_window(cfg.Ndft))
    half = cfg.Ndft // 2

    if stage == "sanity_matmul":
        a = jnp.ones((256, 256), jnp.float32)
        return lambda: jax.jit(lambda x: x @ x)(a)

    if stage == "fft_only":
        def f(x):
            return jnp.abs(jnp.fft.fft(x * hann)[:half])
        return lambda: jax.jit(f)(iq[: cfg.Ndft])

    if stage == "fft_mask_sqrt":
        def f(x):
            spec = jnp.fft.fft(x * hann)[:half]
            mag2 = jnp.square(spec.real) + jnp.square(spec.imag)
            bin_i = jnp.arange(half)
            band = (bin_i >= cfg.f_min_bin) & (bin_i < cfg.f_max_bin - 1)
            return jnp.sqrt(jnp.where(band, mag2, 0.0))
        return lambda: jax.jit(f)(iq[: cfg.Ndft])

    if stage == "fft_ema_loop":
        def f(blocks, nin):
            fft_est = jnp.zeros(half, jnp.float32)
            idx = jnp.arange(cfg.Ndft)
            n_blocks = nin // cfg.Ndft
            b2 = blocks.reshape(cfg.max_fft_blocks, cfg.Ndft)
            for j in range(cfg.max_fft_blocks):
                fft_samps = jnp.clip(nin - (j + 1) * cfg.Ndft, 0, cfg.Ndft)
                win = jnp.where(idx < fft_samps, hann, 0.0)
                spec = jnp.fft.fft(b2[j] * win)[:half]
                mag2 = jnp.square(spec.real) + jnp.square(spec.imag)
                mag = jnp.sqrt(mag2)
                upd = fft_est * (1 - jnp.float32(cfg.ema_tc)) + mag * \
                    jnp.float32(cfg.ema_tc)
                fft_est = jnp.where(j < n_blocks, upd, fft_est)
            return fft_est
        nb = iq[: cfg.Ndft * cfg.max_fft_blocks]
        return lambda: jax.jit(f)(nb, jnp.int32(cfg.N))

    if stage == "peak_picks":
        def f(fft_est):
            work = fft_est
            off = jnp.arange(half)
            peaks = []
            for _ in range(cfg.M):
                imax = jnp.min(jnp.where(work >= jnp.max(work), off, half))
                peaks.append(imax)
                blank = (off >= imax - cfg.f_zero_bins) & \
                    (off < imax + cfg.f_zero_bins)
                work = jnp.where(blank, 0.0, work)
            lo = jnp.minimum(peaks[0], peaks[1])
            hi = jnp.maximum(peaks[0], peaks[1])
            return jnp.stack([lo, hi]).astype(jnp.float32) * (cfg.Fs / cfg.Ndft)
        x = jnp.abs(iq[:half]).astype(jnp.float32)
        return lambda: jax.jit(f)(x)

    if stage == "freq_est_full":
        st = fsk.demod_init(cfg)
        nb = iq[: cfg.Ndft * cfg.max_fft_blocks]
        return lambda: jax.jit(lambda b: fsk._freq_est_step(
            cfg, st.fft_est, b, jnp.int32(cfg.N), hann))(nb)[1]

    if stage == "downconvert_cumsum":
        def body(stream):
            t = jnp.arange(cfg.Nmem, dtype=jnp.float32)[None, :]
            ang = t * jnp.float32(0.1)
            osc = jax.lax.complex(jnp.cos(ang), -jnp.sin(ang))
            d = stream[None, :] * osc
            csum = jnp.cumsum(d, axis=-1)
            csum = jnp.concatenate(
                [jnp.zeros((1, 1), csum.dtype), csum], axis=-1)
            starts = np.arange((cfg.Nsym + 1) * cfg.P, dtype=np.int32) * \
                (cfg.Ts // cfg.P)
            return csum[:, starts + cfg.Ts] - csum[:, starts]
        return lambda: jax.jit(body)(iq[: cfg.Nmem])

    if stage == "demod_frame":
        st = fsk.demod_init(cfg)
        def one(stream, nb):
            nst, out = fsk._demod_frame(cfg, st, stream, nb, hann)
            return out.soft
        return lambda: jax.jit(one)(
            iq[: cfg.Nmem], iq[: cfg.Ndft * cfg.max_fft_blocks])

    if stage == "scan3":
        return lambda: fsk.demod_stream(cfg, iq[: cfg.N * 4], 3)[1].soft

    if stage == "scan_full":
        nf = cfg.num_frames(n)
        return lambda: fsk.demod_stream(cfg, iq, nf)[1].soft

    if stage == "rand_normal":
        k = prng_key(1)
        return lambda: jax.jit(
            lambda kk: jax.random.normal(kk, (4096, 2), jnp.float32))(k)

    if stage == "vmap_rand":
        keys = jax.random.split(prng_key(1), 4)
        return lambda: jax.jit(jax.vmap(
            lambda kk: jax.random.normal(kk, (4096, 2), jnp.float32)))(keys)

    if stage == "vmap_dynslice":
        starts = jnp.arange(4, dtype=jnp.int32) * 17
        def f(s):
            return jax.lax.dynamic_slice(iq, (s,), (cfg.Nmem,)).real
        return lambda: jax.jit(jax.vmap(f))(starts)

    if stage == "vmap_demod":
        nf = cfg.num_frames(n)
        iqb = jnp.stack([iq, iq * 0.5, iq * 0.25, iq * 2.0])
        def f(x):
            return fsk.demod_stream(cfg, x, nf)[1].soft
        return lambda: jax.jit(jax.vmap(f))(iqb)

    if stage == "vmap_noise":
        @jax.jit
        def f(keys):
            def one(k):
                z = jax.random.normal(k, (iq.shape[0], 2), jnp.float32)
                x = iq + 0.1 * jax.lax.complex(z[:, 0], z[:, 1])
                return (x / jnp.max(jnp.abs(x))).real
            return jax.vmap(one)(keys)
        keys = jax.random.split(prng_key(1), 4)
        return lambda: f(keys)

    if stage == "vmap_chain_arg":
        nf = cfg.num_frames(n)
        @jax.jit
        def f(sig, keys):
            def one(k):
                z = jax.random.normal(k, (sig.shape[0], 2), jnp.float32)
                x = sig + 0.1 * jax.lax.complex(z[:, 0], z[:, 1])
                x = x / jnp.max(jnp.abs(x))
                return fsk.demod_stream(cfg, x, nf)[1].soft
            return jax.vmap(one)(keys)
        keys = jax.random.split(prng_key(1), 4)
        return lambda: f(iq, keys)

    if stage == "vmap_chain":
        nf = cfg.num_frames(n)
        @jax.jit
        def chain(keys):
            def one(k):
                z = jax.random.normal(k, (iq.shape[0], 2), jnp.float32)
                x = iq + 0.1 * jax.lax.complex(z[:, 0], z[:, 1])
                x = x / jnp.max(jnp.abs(x))
                return fsk.demod_stream(cfg, x, nf)[1].soft
            return jax.vmap(one)(keys)
        keys = jax.random.split(prng_key(1), 4)
        return lambda: chain(keys)

    raise SystemExit(f"unknown stage {stage}")


def run_one(stage):
    fn = build(stage)
    t0 = time.perf_counter()
    out = fn()
    out.block_until_ready()
    print(f"PASS {stage}  ({time.perf_counter()-t0:.1f}s)", flush=True)


def orchestrate():
    for s in STAGES:
        t0 = time.perf_counter()
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), s],
            capture_output=True, text=True,
            timeout=float(os.environ.get("WENET_STAGE_TIMEOUT", 420)))
        dt = time.perf_counter() - t0
        if p.returncode == 0 and "PASS" in p.stdout:
            print(p.stdout.strip(), flush=True)
        else:
            tail = (p.stderr or p.stdout).strip().replace("\n", " | ")[-250:]
            print(f"FAIL {s}  ({dt:.1f}s): {tail}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_one(sys.argv[1])
    else:
        try:
            orchestrate()
        except subprocess.TimeoutExpired as e:
            print(f"TIMEOUT in {e.cmd[-1]} after {e.timeout}s", flush=True)
