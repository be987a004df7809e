"""Pallas TPU kernel: fused sum-product LDPC decode for H2064_516.

STATUS (measured on a real v5e chip): compiles, runs, and matches
ops/ldpc.decode bit-for-bit on 512 random codewords -- but the XLA
gather-based decoder is ~4x faster and remains the production path.
The reason is structural: this kernel expresses the irregular edge
maps as dense one-hot matmuls streamed from HBM, so each BP iteration
moves 2 x 55 MB of one-hot matrix regardless of batch size, giving a
bandwidth ceiling of ~Bt/(10 iters x 110 MB / HBM_BW) ~ 23k codewords/s
at Bt=32 (measured 17k).  The XLA decoder's gathers move only the
8448-edge messages (~34 KB/codeword/iter) and measured 5-12M
codewords/s.  For a code this small, gathers beat the MXU: the kernel
is kept as a validated, instructive alternative (and as the Mosaic
portability playbook: see the layout comments), not as the default.

Original motivation: the XLA decoder round-trips messages through HBM
between the gather / phi0 / reduce / scatter stages of every BP
iteration.  This kernel keeps the entire decoder state for a batch tile
resident in VMEM across all iterations and expresses the two irregular
reductions in MXU-native form:

  * check-side reduction: edges live in ONE flat (Bt, EDGES_P) array laid
    out slot-major, where slot s is the contiguous lane range
    [s*CHECKS_P, (s+1)*CHECKS_P).  CHECKS_P = 640 = 5*128, so every slot
    boundary is lane-aligned and the per-check row sum is a sum of 16
    static slices — no reshape (Mosaic rejects lane-splitting shape
    casts), no gather, no relayout.
  * var-side reduction and var->edge broadcast: one-hot matrices
    (edges x vars) streamed from HBM in 128-row tiles with double-buffered
    async DMA, contracted on the MXU (bf16 one-hot — exact for 0/1 —
    with f32 accumulation).

Geometry: 516 checks padded to 640 lanes; 14 edge slots padded to 16;
EDGES_P = 16*640 = 10240 (= 80*128); 2580 vars padded to 2688 (= 21*128).

Reference behavior matched: phi0 clamps (mpdecode_core.c:95-123), early
exit via convergence masking (:466-483).  Output-parity is asserted against
ops/ldpc.decode in tests (interpret mode on CPU; compiled on TPU).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import ldpc_tables as T

CHECKS_P = 640            # 516 padded to 5*128 (lane-aligned slot stride)
SLOTS = 16                # 14 edge slots padded
EDGES_P = CHECKS_P * SLOTS            # 10240 = 80 * 128
VARS_P = 2688             # 2580 padded (21 * 128)
TILE = 128                # one-hot streaming tile rows (divides 2688, 10240)


@lru_cache(maxsize=1)
def _tables():
    var_idx, mask = T.check_edges()                     # (516, 14)
    vi = np.zeros((SLOTS, CHECKS_P), np.int32)          # slot-major
    mk = np.zeros((SLOTS, CHECKS_P), bool)
    vi[:14, :516] = var_idx.T
    mk[:14, :516] = mask.T
    edge_var = vi.reshape(-1)                           # (EDGES_P,)
    edge_mask = mk.reshape(-1)
    # one-hot edge->var scatter matrix (0/1: exact in bf16; MXU-native)
    scat = np.zeros((EDGES_P, VARS_P), np.float32)
    scat[np.arange(EDGES_P)[edge_mask], edge_var[edge_mask]] = 1.0
    return edge_mask.astype(np.float32).reshape(1, EDGES_P), scat


def _phi0(x):
    xs = jnp.clip(x, 9.08e-5, 10.0)
    val = -jnp.log(jnp.tanh(xs * 0.5))
    val = jnp.where(x > 10.0, 0.0, val)
    return jnp.where(x < 9.08e-5, 10.0, val)


def _slot(x, s):
    """Slot s of a flat slot-major edge array: a static lane-aligned slice."""
    return x[:, s * CHECKS_P:(s + 1) * CHECKS_P]


def _bp_kernel(llr_ref, mask_ref, scat_ref, scat_t_ref,
               bits_ref, iters_ref, conv_ref, max_iter: int):
    """One batch tile. llr: (Bt, VARS_P) f32; mask: (1, EDGES_P) f32;
    scat: (EDGES_P, VARS_P) bf16 in HBM; scat_t: (VARS_P, EDGES_P) bf16."""
    Bt = llr_ref.shape[0]
    llr = llr_ref[:]                                    # (Bt, V)
    fmask = mask_ref[:]                                 # (1, E)

    def matmul_stream(x, mat_ref, out_cols, scratch, sem):
        """x (Bt, K) @ HBM mat (K, out_cols): K streamed in TILE-row DMAs,
        double-buffered so the next tile transfers while the MXU contracts
        the current one (pallas guide double-buffering pattern).  The tile
        loop is unrolled at trace time: every slice offset is static and
        lane-aligned, avoiding dynamic_slice inside the kernel."""
        K = x.shape[1]
        n_tiles = K // TILE

        def dma(slot, i):
            return pltpu.make_async_copy(
                mat_ref.at[pl.ds(i * TILE, TILE), :], scratch.at[slot],
                sem.at[slot])

        dma(0, 0).start()
        acc = jnp.zeros((Bt, out_cols), jnp.float32)
        for i in range(n_tiles):
            slot = i % 2
            if i + 1 < n_tiles:
                dma(1 - slot, i + 1).start()
            dma(slot, i).wait()
            xt = x[:, i * TILE:(i + 1) * TILE]
            acc = acc + jnp.dot(xt, scratch[slot].astype(jnp.float32),
                                preferred_element_type=jnp.float32)
        return acc

    def slot_sum(x):
        """Per-check sum over the 16 slots of a flat edge array: (Bt, C)."""
        acc = _slot(x, 0)
        for s in range(1, SLOTS):
            acc = acc + _slot(x, s)
        return acc

    def broadcast_minus(tot, x):
        """Per-edge (tot_of_its_check - x): flat, via 16 static slices."""
        return jnp.concatenate(
            [tot - _slot(x, s) for s in range(SLOTS)], axis=-1)

    def run(scratch_e, sem_e, scratch_v, sem_v):
        # v-side init: vmsg = phi0(|llr_e|), sign of llr_e  (flat edges)
        llr_e = matmul_stream(llr, scat_t_ref, EDGES_P, scratch_v, sem_v)
        vmsg = _phi0(jnp.abs(llr_e)) * fmask
        vsgn = jnp.where((llr_e < 0) & (fmask > 0), 1.0, 0.0)

        # per-codeword state kept 2-D (Bt, 1) and all-f32 throughout:
        # Mosaic mis-lowers 1-D vectors, i1 minor-dim inserts, i32 (Bt, 1)
        # loop carries, and vector->scalar reduces in a while cond (invalid
        # relayout) -- so the loop is a fixed-trip fori with per-codeword
        # convergence masking (converged rows freeze; same outputs as the
        # reference's early exit, mpdecode_core.c:478-483)
        # inits derived from data, not constants: a constant splat gets the
        # fully-replicated layout {*,*} while the body's outputs are
        # sublane-concrete {0,*}, and Mosaic cannot relayout concrete ->
        # replicated across a fori carry ("Invalid relayout" otherwise)
        zcol = llr[:, :1] * 0.0                               # (Bt, 1) f32
        state0 = (vmsg, vsgn,
                  llr * 0.0,                                  # qi snapshot
                  zcol,                                       # iter count
                  zcol)                                       # conv flag 0/1

        def body(it, state):
            vmsg, vsgn, qi_f, iters, conv = state
            phi_sum = slot_sum(vmsg)                        # (Bt, C)
            sgn_tot = slot_sum(vsgn) % 2.0                  # (Bt, C)
            r_mag = _phi0(broadcast_minus(phi_sum, vmsg))   # (Bt, E)
            r_sgn = jnp.abs(broadcast_minus(sgn_tot, vsgn)) % 2.0
            rmsg = jnp.where(r_sgn > 0.5, -r_mag, r_mag) * fmask
            # padded checks have zero signs -> "ok"; require all CHECKS_P
            ssum = jnp.sum(jnp.where(sgn_tot < 0.5, 1.0, 0.0),
                           axis=-1, keepdims=True)          # (Bt, 1)

            qsum = matmul_stream(rmsg, scat_ref, VARS_P, scratch_e, sem_e)
            qi = llr + qsum

            q_e = matmul_stream(qi, scat_t_ref, EDGES_P, scratch_v, sem_v)
            q_e = q_e - rmsg
            n_vmsg = _phi0(jnp.abs(q_e)) * fmask
            n_vsgn = jnp.where((q_e <= 0.0) & (fmask > 0), 1.0, 0.0)

            ones_neg = jnp.sum(
                jnp.where(qi[:, : T.N_DATA] < 0.0, 1.0, 0.0),
                axis=-1, keepdims=True)                     # (Bt, 1)
            trigger = jnp.where(
                (ones_neg < 0.5) | (ssum >= CHECKS_P), 1.0, 0.0)

            upd = conv < 0.5                                # (Bt, 1)
            vmsg = jnp.where(upd, n_vmsg, vmsg)
            vsgn = jnp.where(upd, n_vsgn, vsgn)
            qi_f = jnp.where(upd, qi, qi_f)
            iters = iters + jnp.where(upd, 1.0, 0.0)
            return vmsg, vsgn, qi_f, iters, jnp.maximum(conv, trigger)

        vmsg, vsgn, qi_f, iters, conv = jax.lax.fori_loop(
            0, max_iter, body, state0)
        bits_ref[:] = jnp.where(qi_f < 0.0, 1, 0).astype(jnp.int8)
        iters_ref[:] = iters.astype(jnp.int32)
        conv_ref[:] = jnp.where(conv > 0.5, 1, 0).astype(jnp.int8)

    pl.run_scoped(
        run,
        pltpu.VMEM((2, TILE, VARS_P), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.VMEM((2, TILE, EDGES_P), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((2,)),
    )


@partial(jax.jit, static_argnames=("max_iter", "batch_tile", "interpret"))
def decode_pallas(llr: jnp.ndarray, max_iter: int = 10,
                  batch_tile: int = 32, interpret: bool = False):
    """Pallas BP decode. llr (B, 2580) f32 -> (bits (B,2580) uint8,
    iters (B,), parity_ok (B,)). Output-parity with ops/ldpc.decode."""
    mask_f, scat = _tables()
    B = llr.shape[0]
    Bp = -(-B // batch_tile) * batch_tile
    llr_p = jnp.zeros((Bp, VARS_P), jnp.float32)
    llr_p = llr_p.at[:B, : T.CODE_LEN].set(llr.astype(jnp.float32))
    scat_j = jnp.asarray(scat, jnp.bfloat16)
    scat_t_j = jnp.asarray(np.ascontiguousarray(scat.T), jnp.bfloat16)
    mask_j = jnp.asarray(mask_f, jnp.float32)

    grid = Bp // batch_tile
    bits_p, iters_p, _conv_p = pl.pallas_call(
        partial(_bp_kernel, max_iter=max_iter),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((batch_tile, VARS_P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, EDGES_P), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),      # scat stays in HBM
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),      # scat_t stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((batch_tile, VARS_P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, VARS_P), jnp.int8),
            jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.int8),
        ],
        interpret=interpret,
    )(llr_p, mask_j, scat_j, scat_t_j)

    bits = bits_p[:B, : T.CODE_LEN].astype(jnp.uint8)
    iters = iters_p[:B, 0]
    # final parity check (same as ops/ldpc.decode)
    var_idx, mask = T.check_edges()
    be = bits[:, jnp.asarray(var_idx)].astype(jnp.int32) * \
        jnp.asarray(mask, jnp.int32)
    parity_ok = jnp.all(jnp.sum(be, axis=-1) % 2 == 0, axis=-1)
    return bits, iters, parity_ok
