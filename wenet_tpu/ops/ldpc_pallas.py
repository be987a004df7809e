"""Pallas TPU kernel: fused sum-product LDPC decode for H2064_516.

The XLA decoder (ops/ldpc.py) round-trips messages through HBM between the
gather / phi0 / reduce / scatter stages of every BP iteration.  This kernel
keeps the entire decoder state for a batch tile resident in VMEM across all
iterations and expresses the two irregular reductions in MXU-native form:

  * check-side reduction: edges are laid out check-major, so the row sum is
    a reshape + sum over the 16-slot axis (no gather)
  * var-side reduction and var->edge broadcast: one-hot matrices
    (edges x vars) streamed from HBM in 128-row tiles with double-buffered
    async DMA, contracted on the MXU (bf16 one-hot, f32 accumulation)

Geometry: 516 checks x 14 slots padded to 16 x 528 = 8448 edge slots
(= 66*128 lanes); 2580 vars padded to 2688 (= 21*128).  Edge tensors are
slot-major (Bt, SLOTS, CHECKS_P): the checks axis is the lane (minor)
axis, so a 528-wide row pads to 640 lanes (~21% waste) instead of the
8x waste a 16-wide minor axis would suffer under (8,128) tiling; the
check-side reduction is a sum over the 16-sublane slot axis.

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

CHECKS_P = 528            # 516 padded (33 sublane groups of 16)
SLOTS = 16                # 14 edge slots padded
EDGES_P = CHECKS_P * SLOTS            # 8448 = 66 * 128
VARS_P = 2688             # 2580 padded (21 * 128)
TILE = 128                # one-hot streaming tile rows (divides 2688 and 8448;
                          # lane-aligned so value slices need no relayout)


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
    return edge_mask.astype(np.float32).reshape(SLOTS, CHECKS_P), scat


def _phi0(x):
    xs = jnp.clip(x, 9.08e-5, 10.0)
    val = -jnp.log(jnp.tanh(xs * 0.5))
    val = jnp.where(x > 10.0, 0.0, val)
    return jnp.where(x < 9.08e-5, 10.0, val)


def _bp_kernel(llr_ref, mask_ref, scat_ref, scat_t_ref,
               bits_ref, iters_ref, conv_ref, max_iter: int):
    """One batch tile. llr: (Bt, VARS_P) f32; mask: (SLOTS, CHECKS_P) f32;
    scat: (EDGES_P, VARS_P) bf16 in HBM; scat_t: (VARS_P, EDGES_P) bf16."""
    Bt = llr_ref.shape[0]
    llr = llr_ref[:]                                    # (Bt, V)
    fmask = mask_ref[:].reshape(1, SLOTS, CHECKS_P)

    def matmul_stream(x, mat_ref, out_cols, scratch, sem):
        """x (Bt, K) @ HBM mat (K, out_cols): K streamed in TILE-row DMAs,
        double-buffered so the next tile transfers while the MXU contracts
        the current one (pallas guide double-buffering pattern).  The tile
        loop is unrolled at trace time: every slice offset is static and
        lane-aligned (TILE=128), avoiding dynamic_slice inside the kernel
        (unimplemented in some Pallas TPU lowerings)."""
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

    def run(scratch_e, sem_e, scratch_v, sem_v):
        # v-side init: vmsg = phi0(|llr_e|), sign of llr_e  (edge-major)
        llr_e = matmul_stream(llr, scat_t_ref, EDGES_P, scratch_v, sem_v)
        vmsg = (_phi0(jnp.abs(llr_e)).reshape(Bt, SLOTS, CHECKS_P) * fmask)
        vsgn = jnp.where((llr_e < 0).reshape(Bt, SLOTS, CHECKS_P) & (fmask > 0),
                         1.0, 0.0)

        state0 = (jnp.zeros((), jnp.int32),
                  vmsg, vsgn,
                  jnp.zeros((Bt, VARS_P), jnp.float32),       # qi snapshot
                  jnp.full((Bt,), max_iter, jnp.int32),
                  jnp.zeros((Bt,), jnp.bool_))

        def body(state):
            it, vmsg, vsgn, qi_f, iters, conv = state
            phi_sum = jnp.sum(vmsg, axis=1, keepdims=True)  # over slots
            sgn_tot = jnp.sum(vsgn, axis=1, keepdims=True) % 2.0
            r_mag = _phi0(phi_sum - vmsg)
            r_sgn = jnp.abs(sgn_tot - vsgn) % 2.0          # xor of {0,1}
            rmsg = jnp.where(r_sgn > 0.5, -r_mag, r_mag) * fmask
            checks_ok = sgn_tot[:, 0, :] < 0.5              # (Bt, CHECKS_P)
            # padded rows have zero signs -> "ok"; require all 528
            ssum = jnp.sum(checks_ok.astype(jnp.float32), axis=-1)

            flat = rmsg.reshape(Bt, EDGES_P)
            qsum = matmul_stream(flat, scat_ref, VARS_P, scratch_e, sem_e)
            qi = llr + qsum
            new_bits_neg = qi < 0.0

            q_e = matmul_stream(qi, scat_t_ref, EDGES_P, scratch_v, sem_v)
            q_e = q_e.reshape(Bt, SLOTS, CHECKS_P) - rmsg
            n_vmsg = _phi0(jnp.abs(q_e)) * fmask
            n_vsgn = jnp.where((q_e <= 0.0) & (fmask > 0), 1.0, 0.0)

            data_zero = jnp.sum(
                jnp.where(new_bits_neg[:, : T.N_DATA], 1.0, 0.0), axis=-1) == 0
            trigger = data_zero | (ssum >= CHECKS_P)

            upd = ~conv
            u3 = upd[:, None, None]
            vmsg = jnp.where(u3, n_vmsg, vmsg)
            vsgn = jnp.where(u3, n_vsgn, vsgn)
            qi_f = jnp.where(upd[:, None], qi, qi_f)
            iters = jnp.where(upd, it + 1, iters)
            return it + 1, vmsg, vsgn, qi_f, iters, conv | trigger

        def cond(state):
            it, *_, conv = state
            return (it < max_iter) & ~jnp.all(conv)

        _, vmsg, vsgn, qi_f, iters, conv = jax.lax.while_loop(
            cond, body, state0)
        bits_ref[:] = (qi_f < 0.0).astype(jnp.int8)
        iters_ref[:] = iters[:, None]
        conv_ref[:] = conv.astype(jnp.int8)[:, None]

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
            pl.BlockSpec((SLOTS, CHECKS_P), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),      # scat stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),      # scat_t stays in HBM
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
