"""Fault-injection robustness envelope (benchmarking/README.md:94-172):
baud-rate error tolerance — ~0.3% barely affects decode, ~0.6% kills it —
and frequency-offset tracking via the FFT estimator."""
import numpy as np
import pytest

from wenet_tpu.core import framing
from wenet_tpu.ops import channel, fsk, ldpc
from wenet_tpu.rx.pipeline import Receiver

CFG = fsk.FSKConfig(Fs=96000, Rs=9600)


def _capture(n_pkts, rng):
    payloads, bits = [], [rng.integers(0, 2, CFG.Nbits * 6).astype(np.uint8)]
    for _ in range(n_pkts):
        p = rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
        payloads.append(p)
        bits.append(framing.frame_to_bits(
            framing.frame_packet(p, ldpc.encode_bytes, "v2"), "v2"))
        bits.append(rng.integers(0, 2, 200).astype(np.uint8))
    stream = np.concatenate(bits)
    stream = np.concatenate(
        [stream, np.zeros((-len(stream)) % CFG.Nbits, np.uint8)])
    sig, _ = fsk.fsk_mod_np(CFG, stream, 2 * CFG.Rs, CFG.Rs)
    return payloads, sig.astype(np.complex64)


def _decode_with_resample(sig, ratio, rng):
    iq = channel.resample_linear(sig, ratio)
    iq = channel.add_awgn(iq, 14.0, CFG.Fs, CFG.Rs, rng=rng)
    rx = Receiver(mode="v2", cfg=CFG)
    return rx.decode_iq(iq)


def test_baud_error_tolerance():
    """0.3% clock error decodes nearly everything (elastic nin tracks it);
    0.6% fails completely — the reference's measured envelope."""
    rng = np.random.default_rng(80)
    payloads, sig = _capture(8, rng)
    ok_03 = _decode_with_resample(sig, 1.003, np.random.default_rng(1))
    ok_06 = _decode_with_resample(sig, 1.006, np.random.default_rng(2))
    assert len(ok_03) >= len(payloads) - 2, f"0.3%: {len(ok_03)}/8"
    assert len(ok_06) <= 1, f"0.6% should fail, got {len(ok_06)}"


def test_frequency_offset_tracking():
    """A static offset moves both tones; the FFT estimator retunes and the
    chain still decodes (csdr shift_addition_cc sweep, test_demod.py:71)."""
    rng = np.random.default_rng(81)
    payloads, sig = _capture(5, rng)
    for shift in (4000.0, -3000.0):
        iq = channel.freq_shift(sig, shift, CFG.Fs)
        iq = channel.add_awgn(iq, 14.0, CFG.Fs, CFG.Rs,
                              rng=np.random.default_rng(3))
        rx = Receiver(mode="v2", cfg=CFG)
        got = rx.decode_iq(iq)
        assert len(got) >= len(payloads) - 1, (shift, len(got))
        f1, f2 = rx.stats.f_est
        assert f1 == pytest.approx(2 * CFG.Rs + shift, abs=CFG.Fs / CFG.Ndft)
        assert f2 == pytest.approx(3 * CFG.Rs + shift, abs=CFG.Fs / CFG.Ndft)


def test_ppm_estimator_tracks_clock_error():
    rng = np.random.default_rng(82)
    _, sig = _capture(6, rng)
    iq = channel.resample_linear(sig, 1.002)     # +0.2% clock error
    iq = channel.add_awgn(iq, 16.0, CFG.Fs, CFG.Rs, rng=rng)
    rx = Receiver(mode="v2", cfg=CFG)
    rx.decode_iq(iq)
    # 0.2% = 2000 ppm; the IIR-filtered estimate should land in the right
    # decade and sign
    assert 500 < abs(rx.stats.ppm) < 4000
