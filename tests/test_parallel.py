"""Sharded-decode parity and driver entry-point smoke tests (8-dev CPU mesh)."""
import numpy as np
import jax
import jax.numpy as jnp

from wenet_tpu.ops import ldpc
from wenet_tpu.parallel import mesh as M
from wenet_tpu.parallel import sharded_ldpc


def _codewords(rng, B):
    ibits = np.unpackbits(rng.integers(0, 256, (B, 258), dtype=np.uint8), axis=1)
    return np.concatenate([ibits, ldpc.encode_bits_np(ibits)], axis=1)


def test_sharded_decode_matches_baseline():
    rng = np.random.default_rng(30)
    cw = _codewords(rng, 8)
    sym = 1.0 - 2.0 * cw
    esn0 = 10 ** 0.75 * 0.8
    sd = sym + rng.normal(0, np.sqrt(1 / (2 * esn0)), sym.shape)
    llr = np.asarray(ldpc.sd_to_llr(jnp.asarray(sd, jnp.float32)))

    base_bits, base_iters, base_ok = ldpc.decode_np(llr)

    mesh = M.make_mesh_2d(4, 2)
    bits, iters, ok = jax.jit(
        lambda x: sharded_ldpc.decode_sharded(x, mesh))(jnp.asarray(llr))
    np.testing.assert_array_equal(np.asarray(bits), base_bits)
    np.testing.assert_array_equal(np.asarray(iters), base_iters)
    np.testing.assert_array_equal(np.asarray(ok), base_ok)


def test_graft_entry_single():
    import __graft_entry__ as G
    fn, args = G.entry()
    ok, iters, ebno = jax.jit(fn)(*args)
    assert bool(ok)


def test_graft_entry_multichip():
    import __graft_entry__ as G
    G.dryrun_multichip(8)
