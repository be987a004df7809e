"""Modem-only BER mode and eye-diagram probe tests."""
import numpy as np

from wenet_tpu.cli.ber import run_ber
from wenet_tpu.ops import fsk
from wenet_tpu.utils import probe

CFG = fsk.FSKConfig(Fs=96000, Rs=9600)


def test_ber_clean_and_noisy():
    hi = run_ber(CFG, 20.0, seconds=0.5)
    assert hi["sync_found"] and hi["ber"] < 1e-3
    lo = run_ber(CFG, 3.0, seconds=0.5)
    # at 3 dB uncoded 2FSK BER is a few percent — sync may hold, BER >> hi
    assert lo["ber"] > 10 * max(hi["ber"], 1e-6) or not lo["sync_found"]


def test_eye_diagram_shape_and_opening():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, CFG.Nbits * 12).astype(np.uint8)
    sig, _ = fsk.fsk_mod_np(CFG, bits, 19200, 9600)
    traces = probe.probe_demod(CFG, (0.3 * sig).astype(np.complex64))
    eye = probe.eye_traces(CFG, traces, frame=-1)
    assert eye.shape == (8, 2 * CFG.P)
    assert eye.max() == 1.0        # normalised
    # clean signal: wide-open eye — the on-tone trace peaks well above the
    # off-tone trace at the sampling instant
    mid = eye[:, : CFG.P].max(axis=1)
    assert mid.max() / (eye.mean() + 1e-9) > 1.5
