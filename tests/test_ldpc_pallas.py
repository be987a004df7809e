"""Pallas BP decoder: output parity with the XLA decoder (interpret mode on
CPU; the same kernel compiles for TPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from wenet_tpu.ops import ldpc, ldpc_pallas


def _llrs(B, snr_db, seed):
    rng = np.random.default_rng(seed)
    ib = np.unpackbits(rng.integers(0, 256, (B, 258), dtype=np.uint8), axis=1)
    cw = np.concatenate([ib, ldpc.encode_bits_np(ib)], axis=1)
    esn0 = 10 ** (snr_db / 10) * 0.8
    sd = (1 - 2.0 * cw) + rng.normal(0, np.sqrt(1 / (2 * esn0)), cw.shape)
    return np.asarray(ldpc.sd_to_llr(jnp.asarray(sd, jnp.float32))), cw


@pytest.mark.parametrize("snr_db", [6.0, 7.5, 12.0])
def test_pallas_matches_xla(snr_db):
    llr, cw = _llrs(6, snr_db, int(snr_db * 10))
    bx, ix, okx = ldpc.decode_np(llr)
    bp, ip, okp = ldpc_pallas.decode_pallas(
        jnp.asarray(llr), batch_tile=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(bp), bx)
    np.testing.assert_array_equal(np.asarray(ip), ix)
    np.testing.assert_array_equal(np.asarray(okp), okx)


def test_pallas_batch_padding():
    """B not a multiple of the tile: padded rows must not disturb output."""
    llr, cw = _llrs(5, 10.0, 99)
    bp, ip, okp = ldpc_pallas.decode_pallas(
        jnp.asarray(llr), batch_tile=4, interpret=True)
    assert np.asarray(bp).shape == (5, 2580)
    np.testing.assert_array_equal(np.asarray(bp), cw)
    assert np.asarray(okp).all()
