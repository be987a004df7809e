"""v1 (RS232-framed) full-chain tests at scaled Ts=8 geometry, including
parity vs fsk_demod | drs232_ldpc, and the tuning arithmetic."""
import subprocess

import numpy as np
import pytest

import refbins
from wenet_tpu.core import framing, tuning
from wenet_tpu.ops import channel, fsk, ldpc
from wenet_tpu.rx.pipeline import Receiver

needs_ref = pytest.mark.skipif(
    not refbins.reference_available(), reason="reference tree/gcc unavailable")

# scaled v1 geometry: Ts=8, P=8 like the real 921416/115177 configuration
CFG = fsk.FSKConfig(Fs=92000, Rs=11500)
F1, SHIFT = 2 * CFG.Rs, CFG.Rs


def _capture(n_pkts, rng):
    payloads, bits = [], [rng.integers(0, 2, CFG.Nbits * 4).astype(np.uint8)]
    for _ in range(n_pkts):
        p = rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
        payloads.append(p)
        frame = framing.frame_packet(p, ldpc.encode_bytes, mode="v1")
        bits.append(framing.frame_to_bits(frame, "v1"))
        bits.append(rng.integers(0, 2, 300).astype(np.uint8))
    stream = np.concatenate(bits)
    stream = np.concatenate(
        [stream, np.zeros((-len(stream)) % CFG.Nbits, np.uint8)])
    sig, _ = fsk.fsk_mod_np(CFG, stream, F1, SHIFT)
    return payloads, sig.astype(np.complex64)


def test_v1_geometry():
    assert CFG.Ts == 8 and CFG.P == 8 and CFG.N == 384 and CFG.Ndft == 256


def test_v1_end_to_end():
    rng = np.random.default_rng(70)
    payloads, sig = _capture(5, rng)
    iq = channel.add_awgn(sig, 12.0, CFG.Fs, CFG.Rs, rng=rng)
    rx = Receiver(mode="v1", cfg=CFG)
    got = rx.decode_iq(iq)
    assert got == payloads


@needs_ref
def test_v1_full_chain_matches_reference():
    demod_bin = refbins.fsk_demod()
    drs_bin = refbins.drs232_ldpc()
    rng = np.random.default_rng(71)
    _, sig = _capture(6, rng)
    for ebno in (9.0, 13.0):
        iq = channel.add_awgn(sig, ebno, CFG.Fs, CFG.Rs, rng=rng)
        raw = fsk.iq_to_cu8(iq)
        p1 = subprocess.run(
            [demod_bin, "--cu8", "-s", "2", str(CFG.Fs), str(CFG.Rs), "-", "-"],
            input=raw.tobytes(), capture_output=True, check=True)
        p2 = subprocess.run([drs_bin, "-", "-"], input=p1.stdout,
                            capture_output=True, check=True)
        ref_payloads = [p2.stdout[i:i + 256]
                        for i in range(0, len(p2.stdout), 256)]
        rx = Receiver(mode="v1", cfg=CFG)
        ours = rx.decode_iq(fsk.iq_from_cu8(raw))
        matched = sum(1 for p in ours if p in ref_payloads)
        assert abs(len(ours) - len(ref_payloads)) <= 1
        assert matched >= len(ref_payloads) - 1
        if ebno >= 13.0:
            assert ours == ref_payloads


def test_tuning_formulas():
    # start_rx.sh defaults: 115177 baud, oversampling 8
    assert tuning.sdr_rate(115177, 8) == 921416
    off = tuning.tuning_offset(115177, 8)
    assert off == -(115177 * 1.75)
    lo, hi = tuning.expected_tones(115177, 8)
    assert hi - lo == pytest.approx(115177)
    # tones must sit inside the estimator band [Rs/4, Fs/2 - Rs/4]
    cfg = fsk.V1_CONFIG
    assert cfg.est_min < lo < hi < cfg.est_max
