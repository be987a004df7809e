"""Hardware TX transport parity: the UART and I2S modulation byte streams,
modulated by our FSK modulator, must decode byte-exactly through the
reference C deframers (the radio_wrappers.py:214-460 on-air contracts)."""
import subprocess

import numpy as np
import pytest

import refbins
from wenet_tpu.core import framing
from wenet_tpu.ops import fsk
from wenet_tpu.tx import PacketTX
from wenet_tpu.tx.radios import (RFM98W_I2S, RFM98W_Serial, i2s_audio_params,
                                 i2s_expand, i2s_line_bits)

needs_ref = pytest.mark.skipif(
    not refbins.reference_available(), reason="reference tree/gcc unavailable")

CFG = fsk.FSKConfig(Fs=96000, Rs=9600)   # scaled geometry; bits are rate-free
F1, SHIFT = 19200, 9600


class Sink:
    """In-memory stand-in for a pyserial Serial / alsaaudio PCM."""

    def __init__(self):
        self.data = b""
        self.period_sizes = []
        self.closed = False

    def write(self, b):
        self.data += bytes(b)

    def setperiodsize(self, n):
        self.period_sizes.append(n)
        return n

    def close(self):
        self.closed = True


def _decode_with_oracle(bits, ldpc_bin):
    """Modulate a bit stream and run it through fsk_demod | <deframer>."""
    bits = np.concatenate([
        np.zeros(CFG.Nbits * 2, np.uint8), bits,
        np.zeros(CFG.Nbits * 4, np.uint8)])
    bits = np.concatenate([bits, np.zeros((-len(bits)) % CFG.Nbits, np.uint8)])
    sig, _ = fsk.fsk_mod_np(CFG, bits, F1, SHIFT)
    raw = fsk.iq_to_cu8(0.5 * sig.astype(np.complex64))
    p1 = subprocess.run(
        [refbins.fsk_demod(), "--cu8", "-s", "2", str(CFG.Fs), str(CFG.Rs),
         "-", "-"], input=raw.tobytes(), capture_output=True, check=True)
    p2 = subprocess.run([ldpc_bin, "-", "-"], input=p1.stdout,
                        capture_output=True, check=True)
    return [p2.stdout[i:i + 256] for i in range(0, len(p2.stdout), 256)]


def test_i2s_audio_params_match_reference_search():
    # the reference's rate search lands on 48 kHz stereo S16 = 2 bytes per
    # modem bit at 96000 baud (radio_wrappers.py:302-332)
    assert i2s_audio_params(96000) == (48000, 2)
    assert i2s_audio_params(9600) == (48000, 20)
    with pytest.raises(ValueError):
        i2s_audio_params(96001)


def test_i2s_expand_roundtrip():
    data = bytes(range(256))
    buf = i2s_expand(data, 2)
    assert len(buf) == len(data) * 8 * 2
    assert set(buf) <= {0x00, 0xFF}
    bits = i2s_line_bits(buf, 2)
    assert framing.bits_to_bytes_msb(bits) == data


@needs_ref
def test_uart_serial_transport_through_drs232_oracle():
    """v1: framed bytes written to the UART, RS232-expanded by the UART
    hardware, decode byte-exactly through fsk_demod | drs232_ldpc."""
    sink = Sink()
    radio = RFM98W_Serial(transport=sink, baudrate=115200)
    # register truth: 115200 baud selects the 71797 Hz deviation entry
    # (radio_wrappers.py:95-104)
    regs = radio.radio.lora.spi
    assert abs(regs.deviation_hz() - 71797) < 62       # one fstep
    tx = PacketTX(radio, callsign="VK5QI")
    rng = np.random.default_rng(5)
    payloads = [rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
                for _ in range(3)]
    for p in payloads:
        radio.transmit_packet(tx.frame_packet(p))
    radio.shutdown()
    assert sink.closed

    # the UART shifts each byte as start + 8 data bits LSB-first + stop:
    # exactly framing.rs232_expand
    bits = framing.rs232_expand(sink.data)
    got = _decode_with_oracle(bits, refbins.drs232_ldpc())
    assert got == payloads


@needs_ref
def test_i2s_transport_through_wenet_ldpc_oracle():
    """v2: scrambled framed bytes expanded onto the I2S line decode
    byte-exactly through fsk_demod | wenet_ldpc."""
    sink = Sink()
    radio = RFM98W_I2S(pcm=sink, baudrate=96000)
    assert (radio.audio_rate, radio.bytes_per_bit) == (48000, 2)
    tx = PacketTX(radio, callsign="VK5QI")
    rng = np.random.default_rng(6)
    payloads = [rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
                for _ in range(3)]
    for p in payloads:
        radio.transmit_packet(tx.frame_packet(p))
    radio.shutdown()
    # one ALSA period per packet: period size set once, frames consistent
    frame_len = len(tx.frame_packet(payloads[0]))
    assert sink.period_sizes == [frame_len * 8 * 2 // (2 * 2)]

    bits = i2s_line_bits(sink.data, radio.bytes_per_bit)
    got = _decode_with_oracle(bits, refbins.wenet_ldpc())
    assert got == payloads
