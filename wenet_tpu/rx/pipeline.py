"""End-to-end RX pipeline: IQ samples -> CRC-verified 256-byte packets.

Replaces the reference's multi-process shell pipeline
(start_rx.sh:125-133: rtl_sdr | fsk_demod | wenet_ldpc | rx_ssdv.py) with a
single in-process chain: a jitted scan demodulator feeding the batched
deframer.  Both one-shot (`decode_iq`) and chunked streaming (`push`) APIs,
with exact state carry so chunked == one-shot.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..ops import deframe, fsk


MODE_CONFIGS = {
    "v1": fsk.V1_CONFIG,     # 115177 baud RS232 framing (drs232_ldpc path)
    "v2": fsk.V2_CONFIG,     # 96000 baud raw+scrambled (wenet_ldpc path)
}

INPUT_CONVERTERS = {
    "cu8": (fsk.iq_from_cu8, np.uint8, 2),
    "cs16": (fsk.iq_from_cs16, np.int16, 2),
    "s16": (fsk.iq_from_s16_real, np.int16, 1),
    "c64": (lambda raw: np.asarray(raw, np.complex64), np.complex64, 1),
}


@dataclasses.dataclass
class RxStats:
    frames: int = 0
    samples: int = 0
    detections: int = 0
    crc_ok: int = 0
    ebno_db: float = 0.0
    f_est: tuple = (0.0, 0.0)
    ppm: float = 0.0

    @property
    def per(self) -> float:
        return (self.detections - self.crc_ok) / max(self.detections, 1)


class Receiver:
    """Streaming Wenet receiver (one logical channel).

    Args:
      mode: 'v1' or 'v2' (selects modem geometry and deframer variant)
      cfg:  optional FSKConfig override (e.g. scaled rates for tests)
      estimator_limits: optional (min_hz, max_hz) like fsk_demod -b/-u
    """

    def __init__(self, mode: str = "v2", cfg: fsk.FSKConfig | None = None,
                 estimator_limits: tuple | None = None, max_iter: int = 10):
        self.mode = mode
        base = MODE_CONFIGS[mode] if cfg is None else cfg
        if estimator_limits is not None:
            base = dataclasses.replace(
                base, est_min=estimator_limits[0], est_max=estimator_limits[1])
        self.cfg = base
        self.deframer = deframe.StreamDeframer(mode, max_iter=max_iter)
        self.state = None            # DemodState, created lazily
        self._history = np.zeros(0, np.complex64)
        self.stats = RxStats()

    # ------------------------------------------------------------- one-shot

    def decode_iq(self, iq: np.ndarray) -> list:
        """Decode a whole capture; returns the CRC-valid payloads in order.
        Equivalent to the full fsk_demod | {wenet,drs232}_ldpc pipeline."""
        payloads = self.push(iq)
        return payloads

    def decode_file(self, path: str, fmt: str = "cu8") -> list:
        conv, dtype, _ = INPUT_CONVERTERS[fmt]
        raw = np.fromfile(path, dtype=dtype)
        return self.decode_iq(conv(raw))

    # ------------------------------------------------------------ streaming

    def push(self, iq_chunk: np.ndarray) -> list:
        """Feed IQ samples; returns newly-completed CRC-valid payloads."""
        import jax
        import jax.numpy as jnp

        cfg = self.cfg
        iq_chunk = np.asarray(iq_chunk, np.complex64)
        buf = np.concatenate([self._history, iq_chunk])
        if self.state is None:
            self.state = fsk.demod_init(cfg)
        start_pos = int(self.state.pos)   # first unconsumed sample in buf
        nf = cfg.num_frames(max(len(buf) - start_pos, 0))
        if nf <= 0 or len(buf) < int(self.state.nin):
            self._history = buf
            return []
        # bucket shapes: pad the buffer and round the frame count so repeated
        # pushes of similar size reuse one compiled program
        nf = -(-nf // 32) * 32
        blen = -(-len(buf) // (32 * cfg.N)) * (32 * cfg.N)
        padded = np.zeros(blen, np.complex64)
        padded[: len(buf)] = buf
        final, outs = fsk.demod_stream(cfg, jnp.asarray(padded), nf,
                                       self.state, n_valid=len(buf))
        outs = jax.tree.map(np.asarray, outs)
        valid = outs.valid
        soft = outs.soft[valid].reshape(-1)
        nframes = int(valid.sum())

        # retain history for the next chunk's old-sample window and estimator
        final = jax.tree.map(np.asarray, final)
        end_pos = int(final.pos)
        keep = min(end_pos, cfg.Nmem)
        self._history = buf[end_pos - keep:]
        self.state = final._replace(pos=np.int32(keep))

        self.stats.frames += nframes
        self.stats.samples += len(iq_chunk)
        if nframes:
            last = np.flatnonzero(valid)[-1]
            self.stats.ebno_db = float(outs.ebno_db[last])
            self.stats.f_est = tuple(float(x) for x in outs.f_est[last])
            self.stats.ppm = float(outs.ppm[last])

        payloads = self.deframer.push(soft)
        self.stats.detections = self.deframer.n_detections
        self.stats.crc_ok = self.deframer.n_crc_ok
        return payloads
