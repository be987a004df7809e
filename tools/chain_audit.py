"""Audit the headline full-chain GS/s number (VERDICT r1 weak #1 / next #2).

Builds EXACTLY the bench.py stage_chain program, then publishes what the
chip actually executes:

  1. XLA's own post-optimization cost analysis (FLOPs, bytes accessed)
     of the compiled program — i.e. AFTER dead-code elimination, so it
     counts only the work that survives.
  2. A hand per-scan-step FLOP budget of the demod math (DFT matmul,
     downconvert, integrate, timing) for comparison: how much of the
     written program XLA kept.
  3. Which FrameOut fields survive in the optimized HLO (what DCE took).
  4. The implied sustained TFLOP/s at the measured runtime, against v5e
     peak (~197 bf16 / ~98 f32 TFLOP/s) — the reconciliation VERDICT asks
     for.

Run as a TPU batch job:  timeout 900 python tools/chain_audit.py
Writes tools/chain_audit_out/{report.json, chain_opt.hlo.txt}.
"""
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "chain_audit_out")


def hand_flop_budget(cfg, n_samples, B):
    """Count the demod scan's arithmetic by hand, per frame-step and total.

    Complex MAC = 8 flops (4 mul + 4 add), complex mul = 6, mag^2 = 3.
    Shapes from ops/fsk.py demod_stream at V2_CONFIG (Ndft=256, P=8).
    """
    nin = cfg.N                            # nominal samples per frame step
    nsym = cfg.Nsym                        # symbols per frame
    Ndft = cfg.Ndft
    M = cfg.M
    P = cfg.P
    steps = n_samples // nin
    per_step = {}
    # tone estimation: half-spectrum DFT as matmul, (Ndft,) x (Ndft, Ndft/2+1)
    # complex: input complex x complex twiddle -> 8 flops/MAC
    per_step["dft_tone_est"] = Ndft * (Ndft // 2 + 1) * 8 + (Ndft // 2) * 3
    # downconvert to M tone frequencies: nin complex muls per tone (osc via
    # precomputed phasor table + phase rotation ~ 6 flops) + phase advance
    per_step["downconvert"] = M * nin * (6 + 2)
    # integrate-and-dump: cumsum over nin at P phases -> prefix sum + P*nsym
    # window differences per tone (complex adds = 2 flops)
    per_step["integrate"] = M * (nin * 2 + P * (nsym + 1) * 2)
    # timing estimation: |x|^2 over P*nsym, nonlinearity + dft at Rs (small)
    per_step["timing"] = M * P * nsym * 3 + P * nsym * 10
    # fine interp + soft bits: per symbol, M mags + LLR combine
    per_step["softbits"] = nsym * (M * (6 + 3) + 8)
    # EbNo/SNR stats
    per_step["stats"] = nsym * 6 + 64
    total_step = sum(per_step.values())
    return {
        "per_step_flops": per_step,
        "per_step_total": total_step,
        "steps": int(steps),
        "hand_total_gflop_per_stream": round(total_step * steps / 1e9, 3),
        "hand_total_gflop_batch": round(total_step * steps * B / 1e9, 2),
    }


def main():
    import jax
    import jax.numpy as jnp
    from wenet_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))

    import bench
    from wenet_tpu.ops import deframe, fsk
    from wenet_tpu.utils import compat
    from wenet_tpu.utils.rng import prng_key

    os.makedirs(OUT, exist_ok=True)
    cfg = fsk.V2_CONFIG
    n_packets = 12
    rng = np.random.default_rng(0)
    bits = bench.make_packet_bits(cfg, n_packets, rng)
    sig, _ = fsk.fsk_mod_np(cfg, bits, 2 * cfg.Rs, cfg.Rs)
    var = float(np.mean(np.abs(sig) ** 2))
    sig_j = compat.put_complex(sig)
    nf = cfg.num_frames(len(sig))
    B = int(os.environ.get("WENET_BENCH_STREAMS", "256"))
    ebnos = jnp.linspace(8.0, 15.0, B)

    @jax.jit
    def chain(sig, keys, ebno_db):
        def one(k, e):
            nvar = var * cfg.Fs / (cfg.Rs * 10.0 ** (e / 10.0))
            z = jax.random.normal(k, (sig.shape[0], 2), jnp.float32)
            iq = sig + jnp.sqrt(nvar / 2) * jax.lax.complex(z[:, 0], z[:, 1])
            iq = iq / jnp.max(jnp.abs(iq))
            _, outs = fsk.demod_stream(cfg, iq, nf)
            _, ok, _, _ = deframe.deframe_topk(
                outs.soft.reshape(-1), mode="v2", k=n_packets)
            return jnp.sum(ok.astype(jnp.int32))
        return jax.vmap(one)(keys, ebno_db)

    report = {"platform": jax.devices()[0].platform, "B": B,
              "n_samples": len(sig), "nf": int(nf)}
    keys = jax.random.split(prng_key(1), B)

    t0 = time.perf_counter()
    lowered = chain.lower(sig_j, keys, ebnos)
    compiled = lowered.compile()
    report["compile_s"] = round(time.perf_counter() - t0, 1)

    # --- 1. XLA post-DCE cost analysis ---------------------------------
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    report["xla_flops_g"] = round(float(ca.get("flops", 0)) / 1e9, 2)
    report["xla_bytes_gb"] = round(
        float(ca.get("bytes accessed", 0)) / 1e9, 3)

    # --- 3. DCE evidence: optimized HLO --------------------------------
    try:
        hlo = compiled.as_text()
    except Exception:
        hlo = ""
    with open(os.path.join(OUT, "chain_opt.hlo.txt"), "w") as f:
        f.write(hlo)
    # FrameOut fields written by the scan body in the source program:
    fields = ["soft", "f_est", "ppm", "ebno", "nin", "snr_est"]
    # in optimized HLO the scan carry/outputs appear as tuple shapes; count
    # large per-frame output tensors that survive (heuristic: count
    # f32[B,nf,...] buffers)
    survive = len(re.findall(rf"f32\[{B},{nf}", hlo))
    report["opt_hlo_lines"] = hlo.count("\n")
    report["per_frame_outputs_surviving"] = survive
    report["frameout_fields_in_source"] = fields

    # --- 2. hand budget --------------------------------------------------
    report["hand_budget"] = hand_flop_budget(cfg, len(sig), B)

    # --- 4. measured runtime + reconciliation ---------------------------
    ok = compiled(sig_j, keys, ebnos)
    ok.block_until_ready()
    t0 = time.perf_counter()
    reps = 5
    for r in range(reps):
        ok = compiled(sig_j, jax.random.split(prng_key(2 + r), B), ebnos)
    ok.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    report["run_s"] = round(dt, 4)
    report["msps"] = round(B * len(sig) / dt / 1e6, 1)
    report["sustained_tflops_xla"] = round(
        report["xla_flops_g"] / dt / 1e3, 2)
    report["sustained_gbps_hbm"] = round(report["xla_bytes_gb"] / dt, 1)
    report["v5e_peak_tflops"] = {"bf16": 197, "f32": 98}
    report["packets_ok"] = int(np.asarray(ok).sum())

    with open(os.path.join(OUT, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
