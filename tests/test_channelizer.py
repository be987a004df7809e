"""Polyphase channelizer tests: tone isolation and multi-channel packet
decode from one wideband stream."""
import numpy as np
import jax.numpy as jnp
import pytest

from wenet_tpu.core import framing
from wenet_tpu.ops import channel, channelizer, fsk, ldpc

CFG = fsk.FSKConfig(Fs=96000, Rs=9600)
NCH = 8
FS_TOTAL = CFG.Fs * NCH                # 768 kHz wideband


def test_tone_lands_in_its_channel():
    n = FS_TOTAL // 4
    t = np.arange(n) / FS_TOTAL
    k_target = 3
    f0 = k_target * FS_TOTAL / NCH + 5000.0      # 5 kHz into channel 3
    x = np.exp(2j * np.pi * f0 * t).astype(np.complex64)
    ch = np.asarray(channelizer.channelize(jnp.asarray(x), NCH))
    power = (np.abs(ch) ** 2).mean(axis=1)
    assert power.argmax() == k_target
    assert power[k_target] / power.sum() > 0.95
    # baseband offset inside the channel is preserved
    spec = np.abs(np.fft.fft(ch[k_target]))
    f_axis = np.fft.fftfreq(ch.shape[1], 1.0 / CFG.Fs)
    assert abs(f_axis[spec.argmax()] - 5000.0) < CFG.Fs / ch.shape[1] * 2


def _packet_capture(seed):
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
    frame = framing.frame_packet(payload, ldpc.encode_bytes, mode="v2")
    bits = np.concatenate([
        rng.integers(0, 2, CFG.Nbits * 3).astype(np.uint8),
        framing.frame_to_bits(frame, "v2"),
        rng.integers(0, 2, CFG.Nbits * 3).astype(np.uint8)])
    bits = np.concatenate([bits, np.zeros((-len(bits)) % CFG.Nbits, np.uint8)])
    sig, _ = fsk.fsk_mod_np(CFG, bits, 2 * CFG.Rs, CFG.Rs)
    return payload, sig.astype(np.complex64)


def test_two_channels_decode_from_wideband():
    p1, s1 = _packet_capture(50)
    p2, s2 = _packet_capture(51)
    n = max(len(s1), len(s2))
    s1 = np.pad(s1, (0, n - len(s1)))
    s2 = np.pad(s2, (0, n - len(s2)))

    # build each narrowband signal at FS_TOTAL directly: linear-interp
    # resample then mix to its channel centre k*Fs/N
    t = np.arange(n * NCH) / FS_TOTAL
    wide = np.zeros(n * NCH, np.complex64)
    for sig, k in ((s1, 2), (s2, 5)):
        dst_t = np.arange(n * NCH) / NCH
        i0 = np.minimum(dst_t.astype(np.int64), len(sig) - 2)
        fr = dst_t - i0
        nb = (1 - fr) * sig[i0] + fr * sig[i0 + 1]
        fc = k * FS_TOTAL / NCH
        wide += (nb * np.exp(2j * np.pi * fc * t)).astype(np.complex64)
    wide = channel.add_awgn(wide, 33.0, FS_TOTAL, CFG.Rs,
                            rng=np.random.default_rng(7))

    out = channelizer.demod_multichannel(wide, FS_TOTAL, NCH, CFG,
                                         channels=[2, 5])
    assert out[2] == [p1], f"ch2 got {len(out[2])} packets"
    assert out[5] == [p2], f"ch5 got {len(out[5])} packets"

    # the streaming per-channel Receiver path yields identical packets
    out_rx = channelizer.demod_multichannel(wide, FS_TOTAL, NCH, CFG,
                                            channels=[2, 5], vectorized=False)
    assert out_rx == out

    # the fully-fused path (filterbank + demods + deframes + LDPC in ONE
    # dispatch, only packets fetched) yields identical packets too
    out_f = channelizer.demod_multichannel(wide, FS_TOTAL, NCH, CFG,
                                           channels=[2, 5], fused=True)
    assert out_f == out


def test_wideband_cli(tmp_path):
    """`rx --channels N`: the CLI front door for the wideband path (the
    reference's rx/grc flowgraph role)."""
    from wenet_tpu.cli import rx as rx_cli
    from wenet_tpu.core import packets as wp

    rng = np.random.default_rng(60)
    payload = wp.encode_text_message("wideband channel three", 7)
    frame = framing.frame_packet(payload, ldpc.encode_bytes, mode="v2")
    bits = np.concatenate([
        rng.integers(0, 2, CFG.Nbits * 3).astype(np.uint8),
        framing.frame_to_bits(frame, "v2"),
        rng.integers(0, 2, CFG.Nbits * 3).astype(np.uint8)])
    bits = np.concatenate([bits, np.zeros((-len(bits)) % CFG.Nbits, np.uint8)])
    sig, _ = fsk.fsk_mod_np(CFG, bits, 2 * CFG.Rs, CFG.Rs)
    sig = sig.astype(np.complex64)

    n = len(sig)
    t = np.arange(n * NCH) / FS_TOTAL
    dst_t = np.arange(n * NCH) / NCH
    i0 = np.minimum(dst_t.astype(np.int64), n - 2)
    fr = dst_t - i0
    nb = (1 - fr) * sig[i0] + fr * sig[i0 + 1]
    wide = (nb * np.exp(2j * np.pi * (3 * FS_TOTAL / NCH) * t)
            ).astype(np.complex64)
    wide = channel.add_awgn(wide, 30.0, FS_TOTAL, CFG.Rs,
                            rng=np.random.default_rng(8))
    cap = tmp_path / "wide.c64"
    wide.tofile(cap)

    rc = rx_cli.main([str(cap), "--format", "c64", "--channels", str(NCH),
                      "--channel-select", "3", "--mode", "v2",
                      "--fs", str(CFG.Fs), "--rs", str(CFG.Rs),
                      "--no-udp", "--image-dir", str(tmp_path / "imgs"),
                      "--log-dir", str(tmp_path / "logs")])
    assert rc == 0
    logs = list((tmp_path / "logs").glob("*text*"))
    assert logs and "wideband channel three" in logs[0].read_text()


def test_channelizer_adjacent_channel_rejection():
    """Regression for the polyphase commutator bug (round 4): the analysis
    filterbank must reject out-of-channel tones by the prototype's stopband
    (measured -62..-77 dB after the fix), not the -12..-22 dB the x[mN+p]
    phase ordering gave — which split an FSK burst's power ~equally between
    its own channel and the next and broke fully-occupied wideband decode."""
    import jax.numpy as jnp
    N = 8
    Fs = 96000 * N
    n = N * 4096
    t = np.arange(n) / Fs
    centres = channelizer.channel_centres(Fs, N)
    # tone 100 kHz above channel 2's centre: inside channel 2
    tone = np.exp(2j * np.pi * (centres[2] + 10000) * t).astype(np.complex64)
    chans = np.asarray(channelizer.channelize(jnp.asarray(tone), N))
    p = 10 * np.log10(np.mean(np.abs(chans) ** 2, axis=1) + 1e-15)
    assert p[2] > -1.5, f"in-channel tone attenuated: {p[2]:.1f} dB"
    others = np.delete(p, 2)
    assert others.max() < p[2] - 45, (
        f"leakage only {p[2] - others.max():.1f} dB below in-channel")
