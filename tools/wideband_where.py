"""Attribute wideband fused-pipeline time: channelize / +demod / full."""
import json, os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO); sys.path.insert(0, os.path.join(REPO, "tools"))

def main():
    import numpy as np
    from wenet_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache(os.path.join(REPO, ".jax_cache"))
    import jax, jax.numpy as jnp
    from wenet_tpu.ops import channelizer as C, deframe, fsk
    from wenet_tpu.utils import compat
    from wenet_tpu.rx.pipeline import _fused_fstep
    import wideband_scaling as W
    nch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cfg = fsk.V2_CONFIG
    wide, fs_total = W.build_wideband_capture(nch, cfg)
    d = compat.put_complex(wide); np.asarray(d[-4:].real)
    nf = cfg.num_frames(len(wide) // nch)
    fs = _fused_fstep(None)
    reps = 2

    def timed(label, fn):
        t0 = time.perf_counter(); np.asarray(fn(d)); first = time.perf_counter()-t0
        t0 = time.perf_counter()
        for _ in range(reps): r = np.asarray(fn(d))
        dt = (time.perf_counter()-t0)/reps
        print(json.dumps({"stage": label, "first_s": round(first,1),
                          "exec_s": round(dt,3),
                          "msps": round(len(wide)/dt/1e6,1)}), flush=True)

    timed("chanz_only", jax.jit(lambda x: jnp.sum(jnp.abs(C.channelize(x, nch)))))

    @jax.jit
    def chanz_demod(x):
        chans = C.channelize(x, nch)
        def one(c):
            _, outs = fsk.demod_stream(cfg, c, nf, frames_per_step=fs)
            return jnp.sum(outs.soft)
        return jnp.sum(jax.vmap(one)(chans))
    timed("chanz_demod", chanz_demod)

    from wenet_tpu.core import framing
    syms_pp = framing.V2_SYMBOLS_PER_PACKET
    kk = int(np.ceil(nf * cfg.Nbits / syms_pp)) + 2
    @jax.jit
    def full(x):
        chans = C.channelize(x, nch)
        def one(c):
            _, outs = fsk.demod_stream(cfg, c, nf, frames_per_step=fs)
            soft = jnp.where(outs.valid[:, None], outs.soft, 1.0).reshape(-1)
            pb, ok, _, pos = deframe.deframe_topk(soft, mode="v2", k=kk)
            return ok
        return jnp.sum(jax.vmap(one)(chans))
    timed("full", full)

if __name__ == "__main__":
    main()
