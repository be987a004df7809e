"""Radio backends for the TX stack.

The reference drives an RFM98W over SPI with UART (v1) or I2S (v2)
modulation (tx/radio_wrappers.py).  Here the radio abstraction keeps the
same contract — `scramble(body)`, `transmit_packet(frame)`, `shutdown()` —
with software backends:

  * IQRadio        — synthesizes the actual FSK IQ waveform (the TPU-native
                     "transmitter"): continuous phase across packets, sink =
                     file / callback / in-memory buffer
  * BinaryDebugRadio — one-byte-per-bit files for the C fsk modulator
                     (radio_wrappers.py:544-563 parity)
  * UDPRadio       — framed packets over UDP (tx/examples/
                     wenet_link_emulation.py equivalent, zero-RF testing)

Hardware SPI/UART/I2S backends are deliberately out of scope on this
platform; the IQRadio output is bit-compatible with what the RFM98W emits.
"""
from __future__ import annotations

import socket

import numpy as np

from ..core import framing
from ..ops import fsk


class _RadioBase:
    mode = "v2"

    def scramble(self, body: bytes) -> bytes:
        """v2 radios XOR-scramble the post-UW body (radio_wrappers.py:385-405);
        v1 serial radios transmit it raw."""
        if self.mode == "v2":
            return framing.tx_scramble(body)
        return body

    def transmit_packet(self, frame: bytes) -> None:  # pragma: no cover
        raise NotImplementedError

    def shutdown(self) -> None:
        pass


class IQRadio(_RadioBase):
    """Synthesize the on-air complex baseband waveform for each packet.

    sink: callable(np.complex64 array) — e.g. file writer, channel model,
    or a live Receiver for closed-loop tests.
    """

    def __init__(self, sink, cfg: fsk.FSKConfig | None = None,
                 mode: str = "v2", f1: int | None = None,
                 shift: int | None = None, amplitude: float = 1.0):
        self.mode = mode
        self.cfg = (fsk.V2_CONFIG if mode == "v2" else fsk.V1_CONFIG) \
            if cfg is None else cfg
        self.f1 = 2 * self.cfg.Rs if f1 is None else f1
        # deviation = baud/2 => tone spacing = baud (radio_wrappers.py:95-104)
        self.shift = self.cfg.Rs if shift is None else shift
        self.sink = sink
        self.amplitude = amplitude
        self._phase_acc = 0

    def transmit_packet(self, frame: bytes) -> None:
        bits = framing.frame_to_bits(frame, self.mode)
        pad = (-len(bits)) % (2 if self.cfg.M == 4 else 1)
        if pad:
            bits = np.concatenate([bits, np.ones(pad, np.uint8)])
        sig, self._phase_acc = fsk.fsk_mod_np(
            self.cfg, bits, self.f1, self.shift, phase_acc=self._phase_acc)
        self.sink((0.5 * self.amplitude * sig).astype(np.complex64))


class RFM98W_IQ(IQRadio):
    """IQRadio configured through a register-level RFM98W driver.

    The register file (or real SPI transport) is programmed exactly as the
    reference programs the hardware (radio_wrappers.py:85-139); the FSK
    tone spacing used for synthesis is then *read back from the registers*
    (2x deviation), so tests exercise the true config path.  Also carries
    the reference's per-5000-packet re-init behavior.
    """

    def __init__(self, sink, frequency_hz: float = 443.5e6,
                 baudrate: int | None = None, tx_power_dbm: int = 10,
                 mode: str = "v2", cfg: fsk.FSKConfig | None = None,
                 transport=None, reinit_count: int = 5000):
        from . import sx127x
        base_cfg = (fsk.V2_CONFIG if mode == "v2" else fsk.V1_CONFIG) \
            if cfg is None else cfg
        baud = base_cfg.Rs if baudrate is None else baudrate
        self.radio = sx127x.RFM98W(
            frequency_hz=frequency_hz, baudrate=baud,
            tx_power_dbm=tx_power_dbm, reinit_count=reinit_count,
            transport=transport)
        if not self.radio.start():
            raise RuntimeError("RFM98W failed to initialise")
        regs = self.radio.lora.spi
        shift = (int(round(2 * regs.deviation_hz()))
                 if isinstance(regs, sx127x.RegisterFile) else baud)
        super().__init__(sink, cfg=base_cfg, mode=mode, shift=shift)

    def transmit_packet(self, frame: bytes) -> None:
        super().transmit_packet(frame)
        self.radio.on_packet_transmitted()

    def shutdown(self) -> None:
        self.radio.shutdown()


class BinaryDebugRadio(_RadioBase):
    """Write packets as one-byte-per-bit files (0x00/0x01) for codec2's fsk
    modulator — the reference's BinaryDebug fake radio."""

    def __init__(self, path: str, mode: str = "v1"):
        self.mode = mode
        self._f = open(path, "wb")

    def transmit_packet(self, frame: bytes) -> None:
        bits = framing.frame_to_bits(frame, self.mode)
        self._f.write(bits.astype(np.uint8).tobytes())

    def shutdown(self) -> None:
        self._f.close()


class UDPRadio(_RadioBase):
    """Emit framed packets as UDP datagrams (RF-free link emulation)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 55674,
                 mode: str = "v2"):
        self.mode = mode
        self.addr = (host, port)
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    def transmit_packet(self, frame: bytes) -> None:
        self._sock.sendto(frame, self.addr)

    def shutdown(self) -> None:
        self._sock.close()
