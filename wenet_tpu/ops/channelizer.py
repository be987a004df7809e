"""Polyphase DFT filterbank channelizer: one wideband IQ stream -> N
critically-sampled channels feeding parallel demods (BASELINE.json config 4
— the wideband front-end the reference covers with per-channel rtl_sdr
processes).

Classic design: an N-phase decomposition of a windowed-sinc prototype
lowpass, each phase filtering its decimated sub-stream, followed by an
N-point (i)FFT across phases per output sample.  Channel k is centred at
k*Fs/N (negative ks wrap).  All compute is a reshape + grouped conv + FFT —
MXU/VPU-friendly, vmap-able over batches.
"""
from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import compat


def prototype_lowpass(n_channels: int, taps_per_phase: int = 12,
                      cutoff_scale: float = 1.0) -> np.ndarray:
    """Windowed-sinc prototype for the filterbank: length N*taps_per_phase,
    cutoff at the channel half-width."""
    ntaps = n_channels * taps_per_phase
    t = np.arange(ntaps) - (ntaps - 1) / 2.0
    fc = cutoff_scale * 0.5 / n_channels          # normalized (fs=1)
    h = 2 * fc * np.sinc(2 * fc * t)
    h *= np.hamming(ntaps)
    return (h / np.sum(h)).astype(np.float32)


@partial(jax.jit, static_argnames=("n_channels", "taps_per_phase"))
def channelize(iq: jnp.ndarray, n_channels: int,
               taps_per_phase: int = 12) -> jnp.ndarray:
    """iq (n,) complex64 -> (n_channels, n//n_channels) complex64.

    Channel k is the signal around centre frequency k*Fs/N, downconverted
    to baseband and decimated by N (critically sampled).
    """
    N = n_channels
    h = jnp.asarray(prototype_lowpass(N, taps_per_phase))
    n = (iq.shape[0] // N) * N
    x = iq[:n].reshape(-1, N)                     # x[m, p] = iq[m*N + p]
    # textbook polyphase commutator: channel k decimated is
    #   z_k[m] = sum_tau h[tau] x[mN - tau] e^{+2pi i k tau / N}
    # with tau = s*N + p, so phase p consumes x[mN - p] — the COLUMN-
    # REVERSED frame with a one-frame delay for p >= 1, NOT x[mN + p].
    # (The previous +p ordering broke alias cancellation: a tone inside
    # one channel leaked at only -12 dB into the rest, and an FSK burst
    # split its power ~equally between its own channel and the next —
    # round-4 wideband debug.)
    xf0 = x[:, :1]                                # phase 0: x[mN]
    xrev = x[:, :0:-1]                            # columns N-1 .. 1
    xdel = jnp.pad(xrev, ((1, 0), (0, 0)))[:-1]   # one-frame delay
    xf = jnp.concatenate([xf0, xdel], axis=1)     # xf[m, p] = x[mN - p]
    hp = h.reshape(taps_per_phase, N)             # hp[s, p] = h[s*N + p]
    # filter along frames per phase: y[m, p] = sum_s hp[s, p] xf[m-s, p]
    xp = jnp.pad(xf, ((taps_per_phase - 1, 0), (0, 0)))
    # T static shifted slices instead of an advanced-indexing window
    # gather: the gather form lowers to a ~210 MB/s scalar-ish gather on
    # the target backend (tools/fused_where.py, r5) — slices are plain
    # contiguous copies.  The stacked einsum keeps the identical
    # 12-term reduction.
    frames = x.shape[0]
    windows = jnp.stack([xp[s: s + frames] for s in range(taps_per_phase)])
    y = jnp.einsum("tmp,tp->mp", windows, hp[::-1])
    # sum_p y[m,p] e^{+2pi i kp/N} == DFT(y) evaluated at bin (-k) mod N.
    # The (-k) % N permutation is [0, N-1, ..., 1]: bin 0 + the reversed
    # tail — two static slices + a reverse, NOT a traced-index gather
    # (advanced indexing lowers to a ~210 MB/s gather on this backend)
    chans = compat.dft(y)                         # (frames, N)
    chans = jnp.concatenate([chans[:, :1], chans[:, :0:-1]], axis=1)
    return jnp.swapaxes(chans, 0, 1).astype(jnp.complex64)


def channel_centres(Fs: int, n_channels: int) -> np.ndarray:
    """Centre frequency of each channel (Hz), wrapping negatives."""
    k = np.arange(n_channels)
    f = k * Fs / n_channels
    return np.where(f >= Fs / 2, f - Fs, f)


def _select_static(chans, sel_t: tuple):
    """Static row selection (a traced index-array gather copies the whole
    filterbank output at ~210 MB/s on the target backend)."""
    if sel_t == tuple(range(chans.shape[0])):
        return chans
    return jnp.stack([chans[k] for k in sel_t])


@functools.lru_cache(maxsize=16)
def _wideband_fused_program(cfg, mode: str, nc: int, nf: int, kk: int,
                            max_iter: int, fstep: int, sel_t: tuple):
    """Cached one-dispatch wideband program: filterbank + per-channel demod
    + top-k deframe + BP decode + CRC.  Module-level cache: a jit defined
    inside demod_multichannel is a fresh function object per CALL, so every
    invocation re-traced and re-loaded from the XLA disk cache (~2 s) —
    measured as a 40x wall-clock loss on the wideband bench (r5)."""
    from ..ops import deframe, fsk

    @jax.jit
    def whole(x):
        chans = _select_static(channelize(x, nc), sel_t)

        def one(c):
            _, outs = fsk.demod_stream(cfg, c, nf, frames_per_step=fstep)
            soft = jnp.where(outs.valid[:, None], outs.soft, 1.0).reshape(-1)
            pb, ok, _, pos = deframe.deframe_topk(
                soft, mode=mode, k=kk, max_iter=max_iter)
            # ONE uint8 result array == one D2H fetch for the whole
            # wideband result (deframe.pack_decode_results)
            return deframe.pack_decode_results(pb, ok, pos)
        return jax.vmap(one)(chans)
    return whole


@functools.lru_cache(maxsize=16)
def _wideband_demod_program(cfg, nc: int, nf: int, fstep: int, sel_t: tuple):
    """Cached channelize + vmapped demod (host-side deframe variant)."""
    from ..ops import fsk

    @jax.jit
    def front_end(x):
        chans = _select_static(channelize(x, nc), sel_t)
        return jax.vmap(lambda c: fsk.demod_stream(
            cfg, c, nf, frames_per_step=fstep)[1])(chans)
    return front_end


def demod_multichannel(iq: np.ndarray, Fs_total: int, n_channels: int,
                       cfg, mode: str = "v2", channels=None,
                       vectorized: bool = True, max_iter: int = 10,
                       fused: bool = False):
    """Wideband capture -> per-channel packet decode (BASELINE config 4).

    iq at Fs_total; each channel lands at Fs_total/n_channels which must
    equal cfg.Fs.  Returns {channel_index: list_of_payloads}.

    vectorized=True (the TPU-first path) runs ONE jitted program: the
    polyphase channelizer followed by the scan demod vmapped across the
    selected channels — the whole wideband front-end is a single device
    dispatch, replacing the reference's per-channel rtl_sdr+fsk_demod
    process per frequency. Host work is only the per-channel deframe of the
    soft bits. vectorized=False keeps one streaming Receiver per channel
    (bit-identical packets; useful for incremental/streaming captures).

    fused=True goes one further and keeps the deframe + BP decode + CRC on
    device as well (UW top-k acquisition, as decode_iq_fused): the ENTIRE
    wideband pipeline — filterbank, N demods, N deframes, batched LDPC —
    is one dispatch, and only the decoded packets cross back to host.
    """
    from ..ops import deframe, fsk
    from ..rx.pipeline import Receiver

    if Fs_total // n_channels != cfg.Fs:
        raise ValueError("channel rate != demod config rate")
    sel = list(range(n_channels)) if channels is None else list(channels)
    if not vectorized and not fused:
        ch = compat.get_complex(channelize(compat.put_complex(iq), n_channels))
        out = {}
        for k in sel:
            rx = Receiver(mode=mode, cfg=cfg)
            out[k] = rx.decode_iq(ch[k])
        return out

    nf = cfg.num_frames(len(iq) // n_channels)
    sel_t = tuple(int(k) for k in sel)    # compile-time channel selection
    _fs = fsk.default_frames_per_step()   # frames/scan-step (bit-exact, r5)

    if fused:
        from ..core import framing
        syms_pp = (framing.V2_SYMBOLS_PER_PACKET if mode == "v2"
                   else framing.V1_SYMBOLS_PER_PACKET)
        kk = int(np.ceil(nf * cfg.Nbits / syms_pp)) + 2
        whole = _wideband_fused_program(cfg, mode, n_channels, nf, kk,
                                        max_iter, _fs, sel_t)
        x_dev = (iq if isinstance(iq, jax.Array)
                 else compat.put_complex(iq))    # callers may pre-put
        packed = np.asarray(whole(x_dev))        # ONE D2H fetch
        pb, ok, pos = deframe.unpack_decode_results(packed)
        out = {}
        for i, k in enumerate(sel):
            hits = sorted((int(pos[i, j]), pb[i, j, :256].tobytes())
                          for j in range(kk) if ok[i, j] and pos[i, j] >= 0)
            out[k] = [payload for _, payload in hits]
        return out

    front_end = _wideband_demod_program(cfg, n_channels, nf, _fs, sel_t)
    outs = jax.tree.map(np.asarray, front_end(
        iq if isinstance(iq, jax.Array) else compat.put_complex(iq)))
    out = {}
    for i, k in enumerate(sel):
        soft = outs.soft[i][outs.valid[i]].reshape(-1)
        res = deframe.deframe_soft(soft, mode, max_iter)
        out[k] = [res.packets_raw[j, :256].tobytes()
                  for j, ok in enumerate(res.crc_ok) if ok]
    return out
