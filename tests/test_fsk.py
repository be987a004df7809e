"""FSK modem parity tests vs the reference C implementation.

Oracles are built from the read-only reference tree (tests/refbins.py).
Parity philosophy (SURVEY.md §7): internal floats may differ (XLA FFT vs
kiss_fft, exact vs drifting oscillators); agreement is asserted on the
quantities that determine packet output — soft-bit values/signs, f_est,
the elastic-nin sequence — at tight statistical tolerances.
"""
import subprocess

import numpy as np
import pytest

import refbins
from wenet_tpu.ops import fsk

needs_ref = pytest.mark.skipif(
    not refbins.reference_available(), reason="reference tree/gcc unavailable")

CFG = fsk.FSKConfig(Fs=96000, Rs=9600)   # scaled-down v2 geometry (Ts=P=10)
F1, SHIFT = 12000, 9600


def _tx_bits(rng, nframes):
    return rng.integers(0, 2, CFG.Nbits * nframes).astype(np.uint8)


def test_config_geometry():
    v1, v2 = fsk.V1_CONFIG, fsk.V2_CONFIG
    assert (v1.Ts, v1.P, v1.N, v1.Ndft) == (8, 8, 384, 256)
    assert (v2.Ts, v2.P, v2.N, v2.Ndft) == (10, 10, 480, 256)
    assert v1.nin_choices == (380, 384, 388)
    assert v2.nin_choices == (475, 480, 485)
    assert (v1.f_min_bin, v1.f_max_bin, v1.f_zero_bins) == (7, 120, 25)
    assert v2.max_fft_blocks == 1 and v1.max_fft_blocks == 1
    assert fsk.FSKConfig(Fs=960000, Rs=96000).max_fft_blocks == 1


def test_mod_jax_matches_numpy():
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    bits = _tx_bits(rng, 20)
    ref, _ = fsk.fsk_mod_np(CFG, bits, F1, SHIFT)
    dev = np.asarray(fsk.fsk_mod(CFG, jnp.asarray(bits), F1, SHIFT))
    np.testing.assert_allclose(dev, ref, atol=2e-4)


def test_mod_constant_envelope_and_tones():
    rng = np.random.default_rng(1)
    bits = _tx_bits(rng, 10)
    sig, _ = fsk.fsk_mod_np(CFG, bits, F1, SHIFT)
    np.testing.assert_allclose(np.abs(sig), 2.0, rtol=1e-6)
    # instantaneous frequency of each symbol == its tone
    ph = np.unwrap(np.angle(sig)).reshape(-1, CFG.Ts)
    f_inst = np.diff(ph, axis=1).mean(axis=1) * CFG.Fs / (2 * np.pi)
    syms = bits.astype(int)
    np.testing.assert_allclose(f_inst, F1 + SHIFT * syms, rtol=1e-4)


@needs_ref
def test_mod_matches_reference_c():
    """Waveform parity with fsk_mod_c over a few frames (the C oscillator
    drifts in float32 and renormalizes per frame; atol covers that)."""
    drv = refbins.fsk_mod_driver()
    rng = np.random.default_rng(2)
    bits = _tx_bits(rng, 8)
    proc = subprocess.run(
        [drv, str(CFG.Fs), str(CFG.Rs), str(CFG.P), str(F1), str(SHIFT)],
        input=bits.tobytes(), capture_output=True, check=True)
    ref = np.frombuffer(proc.stdout, np.float32).view(np.complex64)
    ours, _ = fsk.fsk_mod_np(CFG, bits, F1, SHIFT)
    assert len(ref) == len(ours)
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def _channel(sig, snr_scale, rng):
    x = sig * 0.3
    noise = rng.normal(0, snr_scale, (len(x), 2)).astype(np.float32)
    return (x + noise[:, 0] + 1j * noise[:, 1]).astype(np.complex64)


def test_demod_recovers_bits():
    rng = np.random.default_rng(3)
    nframes = 60
    bits = _tx_bits(rng, nframes)
    sig, _ = fsk.fsk_mod_np(CFG, bits, F1, SHIFT)
    iq = _channel(sig, 0.02, rng)
    soft, outs, final = fsk.demod_iq_np(CFG, iq)
    hard = (soft < 0).astype(np.uint8)
    # find alignment by correlating against tx bits
    tx = 1 - 2.0 * bits
    rx = 1 - 2.0 * hard
    corr = np.correlate(rx, tx[: CFG.Nbits * 4])
    lag = int(np.argmax(corr))
    n = min(len(tx), len(rx) - lag) - CFG.Nbits  # drop last partial frame
    ber = np.mean(tx[:n] != rx[lag:lag + n])
    assert ber < 1e-3, f"BER {ber}"
    # estimator locked on the two tones (bin resolution Fs/Ndft = 750 Hz)
    f_est = outs.f_est[outs.valid][-1]
    assert abs(f_est[0] - F1) <= CFG.Fs / CFG.Ndft
    assert abs(f_est[1] - (F1 + SHIFT)) <= CFG.Fs / CFG.Ndft


@needs_ref
def test_demod_matches_reference_c():
    """Soft-bit stream parity vs the fsk_demod binary on identical cu8 input."""
    demod = refbins.fsk_demod()
    rng = np.random.default_rng(4)
    nframes = 120
    bits = _tx_bits(rng, nframes)
    sig, _ = fsk.fsk_mod_np(CFG, bits, F1, SHIFT)
    iq = _channel(sig, 0.08, rng)          # moderate SNR: decisions non-trivial
    raw = fsk.iq_to_cu8(iq)

    proc = subprocess.run(
        [demod, "--cu8", "-s", "2", str(CFG.Fs), str(CFG.Rs), "-", "-"],
        input=raw.tobytes(), capture_output=True, check=True)
    ref_soft = np.frombuffer(proc.stdout, np.float32)

    soft, outs, _ = fsk.demod_iq_np(CFG, fsk.iq_from_cu8(raw))
    n = min(len(ref_soft), len(soft))
    assert n >= (nframes - 2) * CFG.Nbits
    ours, ref = soft[:n], ref_soft[:n]
    # sign agreement on confidently-decided bits must be essentially total
    scale = np.median(np.abs(ref))
    confident = np.abs(ref) > 0.05 * scale
    sign_agree = np.mean(np.sign(ours[confident]) == np.sign(ref[confident]))
    assert sign_agree > 0.999, f"sign agreement {sign_agree}"
    # values track closely in aggregate
    rel_err = np.abs(ours - ref) / (np.abs(ref) + 0.1 * scale)
    assert np.median(rel_err) < 0.02, f"median rel err {np.median(rel_err)}"
    # elastic-nin sequence: same total sample consumption (+/- one step)
    nins = outs.nin[outs.valid]
    assert abs(int(nins.sum()) - (len(raw) // 2 // CFG.N) * CFG.N) < 2 * CFG.N


def test_demod_stream_resumable():
    """Chunked demod with carried state == one-shot demod (the streaming
    contract that replaces the reference's fread loop)."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    bits = _tx_bits(rng, 40)
    sig, _ = fsk.fsk_mod_np(CFG, bits, F1, SHIFT)
    iq = _channel(sig, 0.02, rng)

    soft_all, outs_all, _ = fsk.demod_iq_np(CFG, iq)

    # feed in two chunks, splitting exactly at a consumed-sample boundary
    st = fsk.demod_init(CFG)
    nf1 = 17
    _, outs1 = fsk.demod_stream(CFG, jnp.asarray(iq), nf1, st)
    consumed = int(np.asarray(outs1.nin).sum())
    st2 = jax.tree.map(lambda x: x[-1] if x.ndim else x, outs1)  # unused; recompute
    final1, outs1 = fsk.demod_stream(CFG, jnp.asarray(iq), nf1, st)
    final1 = jax.tree.map(np.asarray, final1)
    # continue from final state on the same buffer
    nf2 = CFG.num_frames(len(iq)) - nf1
    _, outs2 = fsk.demod_stream(CFG, jnp.asarray(iq), nf2,
                                jax.tree.map(jnp.asarray, final1))
    s1 = np.asarray(outs1.soft)[np.asarray(outs1.valid)].reshape(-1)
    s2 = np.asarray(outs2.soft)[np.asarray(outs2.valid)].reshape(-1)
    joined = np.concatenate([s1, s2])
    n = min(len(joined), len(soft_all))
    np.testing.assert_allclose(joined[:n], soft_all[:n], rtol=1e-4, atol=1e-3)


def test_demod_multi_frame_step_bit_exact():
    """frames_per_step > 1 is a pure codegen knob: every decision-path
    output (soft, bits, valid, f_est, norm_rx_timing, nin) must be
    BIT-EXACT vs the single-frame scan, across all three elastic-nin
    values.  ppm (a pure output stat feeding no decision) may differ in
    the last ULP from XLA FMA-contraction choices in the unrolled bodies."""
    import jax.numpy as jnp
    rng = np.random.default_rng(11)
    bits = _tx_bits(rng, 60)
    sig, _ = fsk.fsk_mod_np(CFG, bits, F1, SHIFT)
    iq = _channel(sig, 0.25, rng)
    # resample ~0.4% fast then ~0.4% slow so nin exercises ALL of
    # {N-Ts/2, N, N+Ts/2}
    def _resample(x, r):
        t = np.arange(int(len(x) / r))
        return (np.interp(t * r, np.arange(len(x)), x.real)
                + 1j * np.interp(t * r, np.arange(len(x)), x.imag))
    half = len(iq) // 2
    iq = np.concatenate([_resample(iq[:half], 1.004),
                         _resample(iq[half:], 0.996)]).astype(np.complex64)
    nf = CFG.num_frames(len(iq))
    _, o1 = fsk.demod_stream(CFG, jnp.asarray(iq), nf)
    nins = np.asarray(o1.nin)[np.asarray(o1.valid)]
    assert len(set(nins.tolist())) == 3, "test capture must exercise all nin"
    valid = np.asarray(o1.valid)
    for F in (2, 4, 8):
        _, oF = fsk.demod_stream(CFG, jnp.asarray(iq), nf, frames_per_step=F)
        assert np.array_equal(valid, np.asarray(oF.valid))
        # outputs are defined (and must be bit-exact) on VALID frames;
        # past-end frames are masked garbage in every caller and may
        # differ between step shapes
        for field in ("soft", "bits", "f_est", "norm_rx_timing",
                      "nin", "ebno_db"):
            a = np.asarray(getattr(o1, field))[valid]
            b = np.asarray(getattr(oF, field))[valid]
            assert a.shape == b.shape and np.array_equal(a, b), (F, field)
        np.testing.assert_allclose(np.asarray(oF.ppm)[valid],
                                   np.asarray(o1.ppm)[valid],
                                   rtol=1e-6, atol=1e-6)


def test_mod_ext_vco_drive():
    """VCO drive = per-sample tone frequency (fsk.c:1207-1243)."""
    rng = np.random.default_rng(11)
    bits = _tx_bits(rng, 2)
    v = fsk.fsk_mod_ext_vco(CFG, bits, F1, SHIFT)
    assert v.shape == (len(bits) * CFG.Ts,)
    np.testing.assert_array_equal(
        v.reshape(-1, CFG.Ts), np.repeat(
            (F1 + SHIFT * bits.astype(np.float32))[:, None], CFG.Ts, axis=1))
    # 4FSK: 2 bits -> one symbol
    cfg4 = fsk.FSKConfig(Fs=96000, Rs=9600, M=4)
    v4 = fsk.fsk_mod_ext_vco(cfg4, np.array([1, 0, 0, 1], np.uint8), F1, SHIFT)
    assert v4.shape == (2 * cfg4.Ts,)
    assert v4[0] == F1 + 2 * SHIFT and v4[-1] == F1 + SHIFT


@needs_ref
def test_4fsk_demod_matches_reference_c():
    """4FSK soft-bit parity vs `fsk_demod --cu8 -s 4 Fs Rs` on identical
    cu8 bytes (fsk.c:954-981 4FSK decision/soft mapping)."""
    cfg4 = fsk.FSKConfig(Fs=96000, Rs=9600, M=4)
    demod = refbins.fsk_demod()
    rng = np.random.default_rng(12)
    nframes = 60
    bits = rng.integers(0, 2, cfg4.Nbits * nframes).astype(np.uint8)
    sig, _ = fsk.fsk_mod_np(cfg4, bits, F1, SHIFT)
    iq = _channel(sig, 0.08, rng)
    raw = fsk.iq_to_cu8(iq)

    proc = subprocess.run(
        [demod, "--cu8", "-s", "4", str(cfg4.Fs), str(cfg4.Rs), "-", "-"],
        input=raw.tobytes(), capture_output=True, check=True)
    ref_soft = np.frombuffer(proc.stdout, np.float32)

    soft, outs, _ = fsk.demod_iq_np(cfg4, fsk.iq_from_cu8(raw))
    n = min(len(ref_soft), len(soft))
    assert n >= (nframes - 2) * cfg4.Nbits
    ours, ref = soft[:n], ref_soft[:n]
    scale = np.median(np.abs(ref))
    confident = np.abs(ref) > 0.05 * scale
    sign_agree = np.mean(np.sign(ours[confident]) == np.sign(ref[confident]))
    assert sign_agree > 0.995, f"sign agreement {sign_agree}"
    rel_err = np.abs(ours - ref) / (np.abs(ref) + 0.1 * scale)
    assert np.median(rel_err) < 0.05, f"median rel err {np.median(rel_err)}"


def test_demod_multi_frame_step_bit_exact_odd_ts():
    """Same frames_per_step contract at the GQRX 48 kHz geometry (Ts=5,
    ODD — the elastic-nin offsets are 0/2/4, not 0/half/Ts; this config
    caught the r4 window-select bug)."""
    import jax.numpy as jnp
    cfg = fsk.FSKConfig(Fs=48000, Rs=9600)      # Ts=P=5
    rng = np.random.default_rng(12)
    bits = rng.integers(0, 2, cfg.Nbits * 50).astype(np.uint8)
    sig, _ = fsk.fsk_mod_np(cfg, bits, 2 * cfg.Rs, cfg.Rs)
    iq = (sig + (0.3 * (rng.normal(size=sig.shape)
                        + 1j * rng.normal(size=sig.shape)))).astype(np.complex64)

    def _resample(x, r):
        t = np.arange(int(len(x) / r))
        return (np.interp(t * r, np.arange(len(x)), x.real)
                + 1j * np.interp(t * r, np.arange(len(x)), x.imag))
    half = len(iq) // 2
    iq = np.concatenate([_resample(iq[:half], 1.004),
                         _resample(iq[half:], 0.996)]).astype(np.complex64)
    nf = cfg.num_frames(len(iq))
    _, o1 = fsk.demod_stream(cfg, jnp.asarray(iq), nf)
    nins = np.asarray(o1.nin)[np.asarray(o1.valid)]
    assert len(set(nins.tolist())) >= 2
    valid = np.asarray(o1.valid)
    for F in (4, 8):
        _, oF = fsk.demod_stream(cfg, jnp.asarray(iq), nf, frames_per_step=F)
        assert np.array_equal(valid, np.asarray(oF.valid))
        for field in ("soft", "bits", "nin", "f_est"):
            assert np.array_equal(np.asarray(getattr(o1, field))[valid],
                                  np.asarray(getattr(oF, field))[valid]), \
                (F, field)
