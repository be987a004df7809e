"""Wideband (channelized) throughput scaling on the real chip.

Builds an N-channel wideband capture (the same 12-packet v2 burst mixed
onto every channel centre), then measures the FUSED wideband pipeline —
polyphase filterbank + N scan demods + N UW-top-k deframes + batched BP
decode, one dispatch — at increasing N.  Reports wideband Msamples/s and
per-channel decode completeness.

Usage: timeout 580 python tools/wideband_scaling.py [N ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from wenet_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    from wenet_tpu.core import framing
    from wenet_tpu.ops import channel, channelizer, fsk, ldpc

    cfg = fsk.V2_CONFIG

    def channel_bits(seed):
        """12 framed packets with INDEPENDENT content per channel: mixing
        the SAME burst onto every centre makes the wideband sum coherent —
        a Dirichlet comb that periodically cancels/boosts the envelope
        (round-4 occupancy bisect: evens-occupied N=16 decoded 0/12 while
        a contiguous half decoded 12/12 — inverted physics, pure harness
        artifact).  Independent payloads add incoherently like real
        multi-payload traffic."""
        r = np.random.default_rng(seed)
        frames = []
        for _ in range(12):
            p = r.integers(0, 256, 256, dtype=np.uint8).tobytes()
            frames.append(framing.frame_to_bits(
                framing.frame_packet(p, ldpc.encode_bytes, "v2"), "v2"))
            frames.append(r.integers(0, 2, 512).astype(np.uint8))
        bits = np.concatenate(
            [r.integers(0, 2, cfg.Nbits * 8).astype(np.uint8)] + frames)
        return np.concatenate(
            [bits, np.zeros((-len(bits)) % cfg.Nbits, np.uint8)])

    n_bits = len(channel_bits(0))
    print(f"burst: {n_bits} bits/channel ({n_bits / cfg.Rs:.2f} s), "
          "12 packets/channel", flush=True)

    for nch in [int(a) for a in (sys.argv[1:] or ["4", "8", "16"])]:
        fs_total = cfg.Fs * nch
        # synthesize each channel NATIVELY at the wideband rate (the exact
        # integer-phase modulator at Fs_total), then mix to its centre: a
        # linear-interp upsample leaves sinc^2 images of every channel in
        # every other channel, which at N=16 fully occupied accumulates
        # past the decode cliff (round-4 debug: single-occupied-channel
        # N=16 decoded 3/3 while the all-occupied harness decoded 0/16 —
        # the harness, not the channelizer, was the failure)
        import dataclasses as _dc
        cfg_wide = _dc.replace(cfg, Fs=fs_total)
        centres = channelizer.channel_centres(fs_total, nch)
        wide = None
        for k in range(nch):
            sig_w, _ = fsk.fsk_mod_np(cfg_wide, channel_bits(100 + k),
                                      2 * cfg.Rs, cfg.Rs)
            sig_w = sig_w.astype(np.complex64)
            if wide is None:       # all channels share one frame count, so
                nw = len(sig_w)    # every sig_w has the same length
                t = np.arange(nw, dtype=np.float64) / fs_total
                wide = np.zeros(nw, np.complex64)
            wide += (sig_w * np.exp(2j * np.pi * centres[k] * t)
                     ).astype(np.complex64)
        # add_awgn sizes N0 from the TOTAL signal power, which here is
        # nch coherently-added channels: without compensation the
        # per-channel Eb/N0 is (requested - 10log10(nch)) — at N=8 that
        # accidentally landed ~9.5 dB (the cliff) and at N=16 ~6 dB
        # (below it), which is why earlier runs decoded 8/8 then 0/16.
        # +10log10(nch) makes the REQUESTED figure the per-channel truth.
        wide = channel.add_awgn(wide, 30.0 + 10 * np.log10(nch), fs_total,
                                cfg.Rs, rng=np.random.default_rng(nch))

        t0 = time.perf_counter()
        out = channelizer.demod_multichannel(wide, fs_total, nch, cfg,
                                             fused=True)
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            out = channelizer.demod_multichannel(wide, fs_total, nch, cfg,
                                                 fused=True)
        dt = (time.perf_counter() - t0) / reps
        got = {k: len(v) for k, v in out.items()}
        complete = sum(1 for v in got.values() if v >= 11)
        msps = len(wide) / dt / 1e6
        print(f"N={nch:3d}: {msps:,.1f} wideband Msamp/s "
              f"({msps * 1e6 / fs_total:.1f}x rt of the {fs_total / 1e6:.1f}"
              f" MHz band), {complete}/{nch} channels >=11/12 packets, "
              f"first-call {comp:.1f}s", flush=True)


if __name__ == "__main__":
    main()
