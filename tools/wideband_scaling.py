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
    rng = np.random.default_rng(0)
    frames = []
    payloads = []
    for _ in range(12):
        p = rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
        payloads.append(p)
        frames.append(framing.frame_to_bits(
            framing.frame_packet(p, ldpc.encode_bytes, "v2"), "v2"))
        frames.append(rng.integers(0, 2, 512).astype(np.uint8))
    bits = np.concatenate(
        [rng.integers(0, 2, cfg.Nbits * 8).astype(np.uint8)] + frames)
    bits = np.concatenate([bits, np.zeros((-len(bits)) % cfg.Nbits,
                                          np.uint8)])
    sig, _ = fsk.fsk_mod_np(cfg, bits, 2 * cfg.Rs, cfg.Rs)
    sig = sig.astype(np.complex64)
    n = len(sig)
    print(f"burst: {n} samples ({n / cfg.Fs:.2f} s), 12 packets/channel",
          flush=True)

    for nch in [int(a) for a in (sys.argv[1:] or ["4", "8", "16"])]:
        fs_total = cfg.Fs * nch
        # upsample by zero-order linear interp and mix onto each centre
        dst_t = np.arange(n * nch) / nch
        i0 = np.minimum(dst_t.astype(np.int64), n - 2)
        fr = (dst_t - i0).astype(np.float32)
        nb = ((1 - fr) * sig[i0] + fr * sig[i0 + 1]).astype(np.complex64)
        t = np.arange(n * nch, dtype=np.float64) / fs_total
        wide = np.zeros(n * nch, np.complex64)
        for k in range(nch):
            fc = channelizer.channel_centres(fs_total, nch)[k]
            wide += (nb * np.exp(2j * np.pi * fc * t)).astype(np.complex64)
        wide = channel.add_awgn(wide, 30.0, fs_total, cfg.Rs,
                                rng=np.random.default_rng(nch))

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
