"""Wideband (channelized) throughput scaling on the real chip.

Builds an N-channel wideband capture (independent 12-packet v2 bursts on
every channel centre), then measures the FUSED wideband pipeline —
polyphase filterbank + N scan demods + N UW-top-k deframes + batched BP
decode, one dispatch — at increasing N.  Reports wideband Msamples/s and
per-channel decode completeness, appending JSON records to
bench_runs/wideband.jsonl (the committed scaling table's source).

Reference role: the GRC wideband flowgraphs
(/root/reference/rx/grc/usb_demod_rtlsdr.grc) — one SDR front-end feeding
per-frequency demod chains; BASELINE config 4.

Usage: timeout 580 python tools/wideband_scaling.py [N ...]
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

PACKETS_PER_CHANNEL = 12


def _channel_bits(cfg, seed):
    """12 framed packets with INDEPENDENT content per channel: mixing the
    SAME burst onto every centre makes the wideband sum coherent — a
    Dirichlet comb that periodically cancels/boosts the envelope (round-4
    occupancy bisect: evens-occupied N=16 decoded 0/12 while a contiguous
    half decoded 12/12 — inverted physics, pure harness artifact).
    Independent payloads add incoherently like real multi-payload
    traffic."""
    from wenet_tpu.core import framing
    from wenet_tpu.ops import ldpc
    r = np.random.default_rng(seed)
    frames = []
    for _ in range(PACKETS_PER_CHANNEL):
        p = r.integers(0, 256, 256, dtype=np.uint8).tobytes()
        frames.append(framing.frame_to_bits(
            framing.frame_packet(p, ldpc.encode_bytes, "v2"), "v2"))
        frames.append(r.integers(0, 2, 512).astype(np.uint8))
    bits = np.concatenate(
        [r.integers(0, 2, cfg.Nbits * 8).astype(np.uint8)] + frames)
    return np.concatenate(
        [bits, np.zeros((-len(bits)) % cfg.Nbits, np.uint8)])


def build_wideband_capture(nch: int, cfg=None, ebno_db: float = 30.0,
                           cache: bool = True):
    """N-channel wideband complex64 capture at Fs_total = nch*cfg.Fs, every
    channel occupied by an independent burst; disk-cached (host synthesis
    at wideband rates costs minutes for N=16).

    Each channel is synthesized NATIVELY at the wideband rate (the exact
    integer-phase modulator at Fs_total), then mixed to its centre: a
    linear-interp upsample leaves sinc^2 images of every channel in every
    other channel, which at N=16 fully occupied accumulates past the
    decode cliff (round-4 debug).  add_awgn sizes N0 from TOTAL signal
    power (nch incoherently-added channels), so +10log10(nch) makes the
    requested Eb/N0 the per-channel truth."""
    import dataclasses as _dc
    import hashlib
    import inspect
    from wenet_tpu.ops import channel, channelizer, fsk
    cfg = fsk.V2_CONFIG if cfg is None else cfg
    fs_total = cfg.Fs * nch

    cache_dir = os.path.join(REPO, ".jax_cache")
    fp = hashlib.sha1((f"{ebno_db}_{cfg.Fs}_{cfg.Rs}_" +
                       inspect.getsource(_channel_bits) +
                       inspect.getsource(fsk.fsk_mod_np)).encode()
                      ).hexdigest()[:10]
    path = os.path.join(cache_dir, f"wideband_{nch}_{fp}.npy")
    if cache and os.path.exists(path):
        try:
            return np.load(path), fs_total
        except Exception:
            pass

    cfg_wide = _dc.replace(cfg, Fs=fs_total)
    centres = channelizer.channel_centres(fs_total, nch)
    wide = None
    for k in range(nch):
        sig_w, _ = fsk.fsk_mod_np(cfg_wide, _channel_bits(cfg, 100 + k),
                                  2 * cfg.Rs, cfg.Rs)
        sig_w = sig_w.astype(np.complex64)
        if wide is None:           # all channels share one frame count
            nw = len(sig_w)
            t = np.arange(nw, dtype=np.float64) / fs_total
            wide = np.zeros(nw, np.complex64)
        wide += (sig_w * np.exp(2j * np.pi * centres[k] * t)
                 ).astype(np.complex64)
    wide = channel.add_awgn(wide, ebno_db + 10 * np.log10(nch), fs_total,
                            cfg.Rs, rng=np.random.default_rng(nch))
    if cache:
        try:
            os.makedirs(cache_dir, exist_ok=True)
            tmp = f"{path}.{os.getpid()}.tmp.npy"
            np.save(tmp, wide)
            os.replace(tmp, path)
        except Exception:
            pass
    return wide, fs_total


def measure(nch: int, reps: int = 2, log=lambda *a: None):
    """Build/load the N-channel capture, run the fused wideband pipeline,
    return the record dict (fetch-honest: demod_multichannel returns host
    payload dicts, so every timed region ends in the packet fetch)."""
    import jax
    from wenet_tpu.ops import channelizer, fsk
    cfg = fsk.V2_CONFIG
    t0 = time.perf_counter()
    wide, fs_total = build_wideband_capture(nch, cfg)
    build_s = time.perf_counter() - t0

    # ONE H2D (fetch-honest tail), then device-resident program timing —
    # the per-rep put_complex otherwise makes this a wire benchmark
    from wenet_tpu.utils import compat
    wide_dev = compat.put_complex(wide)
    np.asarray(wide_dev[-4:].real)    # honest tail fetch — f32, never
    #   complex (complex D2H returns UNIMPLEMENTED on some sessions)

    t0 = time.perf_counter()
    out = channelizer.demod_multichannel(wide_dev, fs_total, nch, cfg,
                                         fused=True)
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = channelizer.demod_multichannel(wide_dev, fs_total, nch, cfg,
                                             fused=True)
    dt = (time.perf_counter() - t0) / reps
    got = {k: len(v) for k, v in out.items()}
    complete = sum(1 for v in got.values()
                   if v >= PACKETS_PER_CHANNEL - 1)
    msps = len(wide) / dt / 1e6
    rec = {"nch": nch, "fs_total": fs_total,
           "wideband_msps": round(msps, 1),
           "band_realtime_x": round(msps * 1e6 / fs_total, 1),
           "channels_complete": complete,
           "packets_per_channel": PACKETS_PER_CHANNEL,
           "first_call_s": round(first, 1),
           "capture_build_s": round(build_s, 1),
           "platform": jax.devices()[0].platform}
    log(f"N={nch:3d}: {msps:,.1f} wideband Msamp/s "
        f"({rec['band_realtime_x']}x rt of the {fs_total / 1e6:.1f} MHz "
        f"band), {complete}/{nch} channels complete, first {first:.1f}s")
    return rec


def main():
    from wenet_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    out_path = os.path.join(REPO, "bench_runs", "wideband.jsonl")
    for nch in [int(a) for a in (sys.argv[1:] or ["4", "8", "16"])]:
        rec = measure(nch, log=print)
        rec["t"] = round(time.time(), 0)
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
