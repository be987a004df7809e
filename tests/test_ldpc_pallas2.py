"""Gather-native Pallas BP decoder (ldpc_pallas2): output parity with the
XLA decoder (interpret mode on CPU; the same kernel compiles for TPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from wenet_tpu.ops import ldpc, ldpc_pallas2

from test_ldpc_pallas import _llrs


@pytest.mark.parametrize("snr_db", [6.0, 7.5, 12.0])
def test_pallas2_matches_xla(snr_db):
    llr, cw = _llrs(6, snr_db, int(snr_db * 10))
    bx, ix, okx = ldpc.decode_np(llr)
    bp, ip, okp = ldpc_pallas2.decode_pallas2(
        jnp.asarray(llr), batch_tile=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(bp), bx)
    np.testing.assert_array_equal(np.asarray(ip), ix)
    np.testing.assert_array_equal(np.asarray(okp), okx)


def test_pallas2_batch_padding():
    """B not a multiple of the tile: padded lanes must not disturb output."""
    llr, cw = _llrs(5, 10.0, 99)
    bp, ip, okp = ldpc_pallas2.decode_pallas2(
        jnp.asarray(llr), batch_tile=4, interpret=True)
    assert np.asarray(bp).shape == (5, 2580)
    np.testing.assert_array_equal(np.asarray(bp), cw)
    assert np.asarray(okp).all()
