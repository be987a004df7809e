import ctypes
import subprocess

import numpy as np
import pytest

import refbins
from wenet_tpu.core import ldpc_tables as T
from wenet_tpu.ops import ldpc

needs_ref = pytest.mark.skipif(
    not refbins.reference_available(), reason="reference tree/gcc unavailable")

# Golden parity for the reference's own self-test payload
# (tx/ldpc_encoder.py:116-138: payload = bytes(range(256)) + b"\x00\x00").
GOLDEN_PAYLOAD = bytes(range(256)) + b"\x00\x00"
GOLDEN_PARITY_HEX = (
    "47160e3c6708de29f3712adb016b73e26b2297a40fada46953443a1c459b0447"
    "2ca95401b856bf55e33f6459e550eaabc5f4926d8ee39f3da29af322611e8170"
    "00"
)


def _random_codewords(rng, B):
    payloads = rng.integers(0, 256, (B, 258), dtype=np.uint8)
    ibits = np.unpackbits(payloads, axis=1)
    pbits = ldpc.encode_bits_np(ibits)
    return np.concatenate([ibits, pbits], axis=1)


def test_encode_golden():
    assert ldpc.encode_bytes(GOLDEN_PAYLOAD).hex() == GOLDEN_PARITY_HEX


def test_encode_jax_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    ibits = np.unpackbits(rng.integers(0, 256, (4, 258), dtype=np.uint8), axis=1)
    assert np.array_equal(
        np.asarray(ldpc.encode_bits(jnp.asarray(ibits))),
        ldpc.encode_bits_np(ibits))


def test_encoded_codewords_satisfy_parity():
    """Every encoder output must pass the decoder's H-matrix parity check."""
    rng = np.random.default_rng(7)
    cw = _random_codewords(rng, 8)
    var_idx, mask = T.check_edges()
    sums = (cw[:, var_idx] * mask).sum(axis=-1)
    assert (sums % 2 == 0).all()


def test_decode_noiseless():
    rng = np.random.default_rng(1)
    cw = _random_codewords(rng, 4)
    llr = (1.0 - 2.0 * cw) * 10.0
    bits, iters, ok = ldpc.decode_np(llr)
    assert np.array_equal(bits, cw)
    assert ok.all()
    assert (iters == 1).all()


def test_decode_corrects_noise():
    rng = np.random.default_rng(2)
    B = 8
    cw = _random_codewords(rng, B)
    sym = 1.0 - 2.0 * cw
    # ~7 dB Eb/N0 at rate 0.8: within the code's correction range
    ebno = 10 ** (7.0 / 10.0)
    esn0 = ebno * 0.8
    noise = rng.normal(0, np.sqrt(1 / (2 * esn0)), sym.shape)
    import jax.numpy as jnp
    llr = np.asarray(ldpc.sd_to_llr(jnp.asarray(sym + noise, jnp.float32)))
    bits, iters, ok = ldpc.decode_np(llr)
    assert ok.all()
    assert np.array_equal(bits, cw)


@needs_ref
def test_encode_matches_reference_c():
    from numpy.ctypeslib import ndpointer

    lib = ctypes.CDLL(refbins.ldpc_enc_so())
    lib.encode.restype = None
    lib.encode.argtypes = (
        ndpointer(ctypes.c_ubyte, flags="C_CONTIGUOUS"),
        ndpointer(ctypes.c_ubyte, flags="C_CONTIGUOUS"))

    rng = np.random.default_rng(3)
    for _ in range(10):
        ibits = np.unpackbits(rng.integers(0, 256, 258, dtype=np.uint8))
        pbits = np.zeros(516, np.uint8)
        lib.encode(ibits.copy(), pbits)
        assert np.array_equal(ldpc.encode_bits_np(ibits), pbits)


@needs_ref
@pytest.mark.parametrize("snr_db", [7.0, 8.0, 10.0, 20.0])
def test_decode_matches_reference_c(snr_db):
    """Bit-for-bit output parity with the C sum-product decoder on noisy
    codewords (iteration counts may differ by +/-1 near threshold because the
    C build uses the phi0 LUT approximation; output bits must match)."""
    drv = refbins.ldpc_dec_driver()
    rng = np.random.default_rng(int(snr_db * 10))
    B = 8
    cw = _random_codewords(rng, B)
    sym = 1.0 - 2.0 * cw
    esn0 = 10 ** (snr_db / 10.0) * 0.8
    sd = sym + rng.normal(0, np.sqrt(1 / (2 * esn0)), sym.shape)
    import jax.numpy as jnp
    llr = np.asarray(ldpc.sd_to_llr(jnp.asarray(sd, jnp.float32)))

    proc = subprocess.run([drv], input=llr.astype(np.float32).tobytes(),
                          capture_output=True, check=True)
    rec = np.frombuffer(proc.stdout, dtype=np.uint8).reshape(B, 2580 + 8)
    c_bits = rec[:, :2580]

    bits, _, _ = ldpc.decode_np(llr)
    agreement = (bits == c_bits).mean()
    assert agreement == 1.0, f"bit agreement {agreement}"


def test_sd_to_llr_matches_c_formula():
    """sd_to_llr numeric parity with the double-precision C implementation
    (mpdecode_core.c:569-595) within float32 tolerance."""
    rng = np.random.default_rng(4)
    sd = rng.normal(0, 1, 2580)

    def c_formula(sd):
        mean = np.mean(np.abs(sd))
        sign = (sd > 0).astype(float) - (sd < 0).astype(float)
        x = sd / mean - sign
        n = len(sd)
        estvar = (n * np.sum(x * x) - np.sum(x) ** 2) / (n * (n - 1))
        return 4.0 * (1.0 / (2.0 * estvar + 1e-3)) * sd

    import jax.numpy as jnp
    ours = np.asarray(ldpc.sd_to_llr(jnp.asarray(sd, jnp.float32)))
    np.testing.assert_allclose(ours, c_formula(sd), rtol=2e-4)
