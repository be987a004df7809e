"""Compile + rate-check the Pallas BP kernel on the real chip (batch job).

Usage: timeout 580 python tools/pallas_tpu_check.py [batch_tile]
"""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp


def main():
    from wenet_tpu.ops import ldpc, ldpc_pallas
    bt = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    r = np.random.default_rng(1)
    nB = 512
    ib = np.unpackbits(r.integers(0, 256, (nB, 258), dtype=np.uint8), axis=1)
    cw = np.concatenate([ib, ldpc.encode_bits_np(ib)], axis=1)
    sd = (1 - 2.0 * cw) + r.normal(0, np.sqrt(1 / (2 * 10 ** 0.75 * 0.8)),
                                   cw.shape)
    llr = ldpc.sd_to_llr(jnp.asarray(sd, jnp.float32))
    t0 = time.perf_counter()
    b, it, ok = ldpc_pallas.decode_pallas(llr, batch_tile=bt)
    b.block_until_ready()
    print(f"compile+run {time.perf_counter()-t0:.1f}s; "
          f"ok {int(ok.sum())}/{nB}", flush=True)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        b, it, ok = ldpc_pallas.decode_pallas(llr, batch_tile=bt)
    b.block_until_ready()
    print(f"pallas rate: {nB/((time.perf_counter()-t0)/reps):,.0f} cw/s",
          flush=True)
    bb, ii, okk = ldpc.decode(llr)
    bb.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        bb, ii, okk = ldpc.decode(llr)
    bb.block_until_ready()
    print(f"xla rate:    {nB/((time.perf_counter()-t0)/reps):,.0f} cw/s",
          flush=True)
    print("bit agreement:", float((np.asarray(b) == np.asarray(bb)).mean()),
          "parity agreement:",
          float((np.asarray(ok) == np.asarray(okk)).mean()), flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception:
        traceback.print_exc()
