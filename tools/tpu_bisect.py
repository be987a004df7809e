"""Bisect which demod sub-stage the tunnelled TPU backend rejects.

Runs progressively larger pieces of the demod program, each as its own
compile, printing PASS/FAIL + timing per stage.  Designed as a batch job
(CLAUDE.md TPU discipline): never killed mid-compile, bounded by a
watchdog that reports progress-so-far.

Usage:  timeout 900 python tools/tpu_bisect.py
"""
import os
import sys
import threading
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPORT = []
DONE = threading.Event()


def emit():
    for line in REPORT:
        print(line, flush=True)


def watchdog(seconds):
    if not DONE.wait(seconds):
        REPORT.append(f"WATCHDOG after {seconds}s — stages so far above")
        emit()
        os._exit(0)


def stage(name):
    def deco(fn):
        def run(*a):
            t0 = time.perf_counter()
            try:
                fn(*a)
                REPORT.append(f"PASS {name}  ({time.perf_counter()-t0:.1f}s)")
                print(f"PASS {name}  ({time.perf_counter()-t0:.1f}s)",
                      flush=True)
                return True
            except Exception as e:
                msg = repr(e).replace("\n", " ")[:200]
                REPORT.append(f"FAIL {name}  ({time.perf_counter()-t0:.1f}s): {msg}")
                print(f"FAIL {name}: {msg}", flush=True)
                return False
        return run
    return deco


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from wenet_tpu.ops import fsk
    from wenet_tpu.utils.rng import prng_key

    dev = jax.devices()[0]
    REPORT.append(f"platform={dev.platform}")

    cfg = fsk.V2_CONFIG
    rng = np.random.default_rng(0)
    n = cfg.N * 6
    iq_np = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    iq = jnp.asarray(iq_np)
    hann = jnp.asarray(fsk.hann_window(cfg.Ndft))

    @stage("0 sanity matmul")
    def s0():
        a = jnp.ones((256, 256), jnp.float32)
        jax.jit(lambda x: x @ x)(a).block_until_ready()

    @stage("1 freq_est (fft+ema+peaks)")
    def s1():
        st = fsk.demod_init(cfg)
        f = jax.jit(lambda blocks: fsk._freq_est_step(
            cfg, st.fft_est, blocks, jnp.int32(cfg.N), hann))
        nb = iq[: cfg.Ndft * cfg.max_fft_blocks]
        fft_est, freqs = f(nb)
        freqs.block_until_ready()

    @stage("2 downconvert+integrate (cumsum windows)")
    def s2():
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
        jax.jit(body)(iq[: cfg.Nmem]).block_until_ready()

    @stage("3 full _demod_frame (single, jit)")
    def s3():
        st = fsk.demod_init(cfg)
        def one(stream, nb):
            nst, out = fsk._demod_frame(cfg, st, stream, nb, hann)
            return out.soft
        jax.jit(one)(iq[: cfg.Nmem],
                     iq[: cfg.Ndft * cfg.max_fft_blocks]).block_until_ready()

    @stage("4 demod_stream scan, 3 frames")
    def s4():
        _, outs = fsk.demod_stream(cfg, iq[: cfg.N * 4], 3)
        outs.soft.block_until_ready()

    @stage("5 demod_stream scan, full capture")
    def s5():
        nf = cfg.num_frames(len(iq))
        _, outs = fsk.demod_stream(cfg, iq, nf)
        outs.soft.block_until_ready()

    @stage("6 vmapped chain (bench stage 2 shape)")
    def s6():
        nf = cfg.num_frames(len(iq))
        @jax.jit
        def chain(keys):
            def one(k):
                z = jax.random.normal(k, (iq.shape[0], 2), jnp.float32)
                x = iq + 0.1 * jax.lax.complex(z[:, 0], z[:, 1])
                x = x / jnp.max(jnp.abs(x))
                _, outs = fsk.demod_stream(cfg, x, nf)
                return outs.soft
            return jax.vmap(one)(keys)
        soft = chain(jax.random.split(prng_key(1), 4))
        soft.block_until_ready()

    for s in (s0, s1, s2, s3, s4, s5, s6):
        if not s():
            # keep going: later stages may fail differently/informatively
            pass


if __name__ == "__main__":
    threading.Thread(
        target=watchdog,
        args=(float(os.environ.get("WENET_BENCH_TIMEOUT", 840)),),
        daemon=True).start()
    try:
        main()
    except Exception:
        REPORT.append("TOPLEVEL: " + traceback.format_exc()[-300:])
    finally:
        DONE.set()
        print("=== final report ===")
        emit()
