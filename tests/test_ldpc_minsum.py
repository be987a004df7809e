"""Normalized min-sum decoder: correctness + waterfall tracking vs the
sum-product reference path (sum-product stays the oracle-parity decoder;
min-sum is the transcendental-free Monte-Carlo engine)."""
import numpy as np
import jax.numpy as jnp

from wenet_tpu.ops import ldpc


def _cw_llrs(nB, snr_db, seed):
    rng = np.random.default_rng(seed)
    ib = np.unpackbits(rng.integers(0, 256, (nB, 258), dtype=np.uint8), axis=1)
    cw = np.concatenate([ib, ldpc.encode_bits_np(ib)], axis=1)
    esn0 = 10 ** (snr_db / 10) * 0.8
    sd = (1 - 2.0 * cw) + rng.normal(0, np.sqrt(1 / (2 * esn0)), cw.shape)
    return np.asarray(ldpc.sd_to_llr(jnp.asarray(sd, jnp.float32))), cw


def test_minsum_decodes_clean_and_matches_sp_at_high_snr():
    llr, cw = _cw_llrs(16, 12.0, 3)
    bm, im, pm = ldpc.decode_minsum(jnp.asarray(llr))
    bs, _, ps = ldpc.decode(jnp.asarray(llr))
    assert np.asarray(pm).all() and np.asarray(ps).all()
    np.testing.assert_array_equal(np.asarray(bm), cw)
    np.testing.assert_array_equal(np.asarray(bm), np.asarray(bs))


def test_minsum_waterfall_tracks_sum_product():
    """At the decoding cliff the 0.8-normalized min-sum FER must stay
    within a small gap of sum-product (measured ~0.05 at FER~0.6)."""
    for snr, tol in ((3.0, 0.12), (3.5, 0.08)):
        llr, _ = _cw_llrs(192, snr, int(snr * 10))
        _, _, pm = ldpc.decode_minsum(jnp.asarray(llr))
        _, _, ps = ldpc.decode(jnp.asarray(llr))
        fer_m = 1.0 - float(np.asarray(pm).mean())
        fer_s = 1.0 - float(np.asarray(ps).mean())
        assert abs(fer_m - fer_s) <= tol, (snr, fer_m, fer_s)


def test_minsum_early_exit_iters():
    llr, _ = _cw_llrs(8, 11.0, 9)
    _, iters, ok = ldpc.decode_minsum(jnp.asarray(llr))
    assert np.asarray(ok).all()
    assert (np.asarray(iters) <= 3).all()       # converges fast when clean
