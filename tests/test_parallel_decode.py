"""Chunked overlap-save parallel decode == sequential decode."""
import numpy as np

from wenet_tpu.core import framing
from wenet_tpu.ops import channel, fsk, ldpc
from wenet_tpu.rx import pipeline

CFG = fsk.FSKConfig(Fs=96000, Rs=9600)


def _capture(n_pkts, rng, ebno=10.0):
    payloads, bits = [], [rng.integers(0, 2, CFG.Nbits * 4).astype(np.uint8)]
    for _ in range(n_pkts):
        p = rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
        payloads.append(p)
        bits.append(framing.frame_to_bits(
            framing.frame_packet(p, ldpc.encode_bytes, "v2"), "v2"))
        bits.append(rng.integers(0, 2, 200).astype(np.uint8))
    stream = np.concatenate(bits)
    stream = np.concatenate(
        [stream, np.zeros((-len(stream)) % CFG.Nbits, np.uint8)])
    sig, _ = fsk.fsk_mod_np(CFG, stream, 2 * CFG.Rs, CFG.Rs)
    return payloads, channel.add_awgn(sig.astype(np.complex64), ebno,
                                      CFG.Fs, CFG.Rs, rng=rng)


def test_parallel_equals_sequential():
    rng = np.random.default_rng(60)
    payloads, iq = _capture(12, rng)
    seq = pipeline.Receiver(mode="v2", cfg=CFG).decode_iq(iq)
    par = pipeline.decode_iq_parallel(iq, "v2", CFG, n_chunks=4)
    assert par == seq
    assert len(par) >= 11          # at most the cold-start packet lost


def test_parallel_dedups_repeated_content():
    """Legitimately repeated payloads must not be deduplicated."""
    rng = np.random.default_rng(61)
    p = rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
    bits = [rng.integers(0, 2, CFG.Nbits * 4).astype(np.uint8)]
    for _ in range(6):
        bits.append(framing.frame_to_bits(
            framing.frame_packet(p, ldpc.encode_bytes, "v2"), "v2"))
        bits.append(rng.integers(0, 2, 300).astype(np.uint8))
    stream = np.concatenate(bits)
    stream = np.concatenate(
        [stream, np.zeros((-len(stream)) % CFG.Nbits, np.uint8)])
    sig, _ = fsk.fsk_mod_np(CFG, stream, 2 * CFG.Rs, CFG.Rs)
    iq = channel.add_awgn(sig.astype(np.complex64), 14.0, CFG.Fs, CFG.Rs,
                          rng=rng)
    par = pipeline.decode_iq_parallel(iq, "v2", CFG, n_chunks=3)
    assert len(par) >= 5
    assert all(x == p for x in par)


def test_parallel_matches_sequential_at_boundary_false_lock():
    """Regression: a chunk starting mid-packet can false-lock on payload
    content and (under FSM semantics) swallow the next real UW; the "all"
    acquisition recovers it, and a packet ending exactly at the capture end
    still flushes. Parallel == sequential across chunk counts."""
    import numpy as np
    from wenet_tpu.core import framing
    from wenet_tpu.ops import channel, fsk, ldpc
    from wenet_tpu.rx.pipeline import Receiver, decode_iq_parallel

    cfg = fsk.FSKConfig(Fs=92000, Rs=11500)   # scaled v1 geometry
    rng = np.random.default_rng(42)
    bits = [rng.integers(0, 2, cfg.Nbits * 4).astype(np.uint8)]
    payloads = []
    for i in range(24):
        p = rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
        payloads.append(p)
        bits.append(framing.frame_to_bits(
            framing.frame_packet(p, ldpc.encode_bytes, mode="v1"), "v1"))
    bits.append(rng.integers(0, 2, cfg.Nbits * 2).astype(np.uint8))
    stream = np.concatenate(bits)
    stream = np.concatenate(
        [stream, np.zeros((-len(stream)) % cfg.Nbits, np.uint8)])
    sig, _ = fsk.fsk_mod_np(cfg, stream, 2 * cfg.Rs, cfg.Rs)
    iq = channel.add_awgn(sig.astype(np.complex64), 12.0, cfg.Fs, cfg.Rs,
                          rng=rng)

    seq = Receiver(mode="v1", cfg=cfg).decode_iq(iq)
    assert len(seq) == 24
    for nc in (3, 8, 16):
        par = decode_iq_parallel(iq, mode="v1", cfg=cfg, n_chunks=nc)
        assert par == seq, f"n_chunks={nc}: {len(par)} vs {len(seq)}"


def test_fused_equals_sequential():
    """ONE-dispatch fused decode (demod + deframe + LDPC + CRC in a single
    XLA program) recovers the same payload set as the sequential FSM path."""
    rng = np.random.default_rng(62)
    payloads, iq = _capture(12, rng)
    seq = pipeline.Receiver(mode="v2", cfg=CFG).decode_iq(iq)
    fused = pipeline.decode_iq_fused(iq, "v2", CFG, n_chunks=4,
                                     input_format="c64")
    assert fused == seq
    assert len(fused) >= 11


def test_fused_cu8_ingest():
    """Fused decode from raw rtl_sdr u8 bytes (device-side conversion)."""
    rng = np.random.default_rng(63)
    payloads, iq = _capture(8, rng, ebno=13.0)
    raw = fsk.iq_to_cu8(iq / (np.abs(iq).max() + 1e-9))
    fused = pipeline.decode_iq_fused(raw, "v2", CFG, n_chunks=3,
                                     input_format="cu8")
    assert len(fused) >= 7
    assert set(fused) <= set(payloads)


def test_fused_v1_mode():
    cfg = fsk.FSKConfig(Fs=92000, Rs=11500)
    rng = np.random.default_rng(64)
    bits = [rng.integers(0, 2, cfg.Nbits * 4).astype(np.uint8)]
    payloads = []
    for _ in range(10):
        p = rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
        payloads.append(p)
        bits.append(framing.frame_to_bits(
            framing.frame_packet(p, ldpc.encode_bytes, mode="v1"), "v1"))
        bits.append(rng.integers(0, 2, 200).astype(np.uint8))
    stream = np.concatenate(bits)
    stream = np.concatenate(
        [stream, np.zeros((-len(stream)) % cfg.Nbits, np.uint8)])
    sig, _ = fsk.fsk_mod_np(cfg, stream, 2 * cfg.Rs, cfg.Rs)
    iq = channel.add_awgn(sig.astype(np.complex64), 12.0, cfg.Fs, cfg.Rs,
                          rng=rng)
    seq = pipeline.Receiver(mode="v1", cfg=cfg).decode_iq(iq)
    fused = pipeline.decode_iq_fused(iq, "v1", cfg, n_chunks=3,
                                     input_format="c64")
    assert fused == seq
    assert len(fused) >= 9


def test_fused_overlap_equals_fused():
    """Slab-pipelined fused decode (H2D/exec overlap, depth-2 in flight)
    recovers the same payload set as the one-dispatch fused path and the
    sequential FSM, including packets spanning slab seams."""
    rng = np.random.default_rng(66)
    payloads, iq = _capture(12, rng)
    seq = pipeline.Receiver(mode="v2", cfg=CFG).decode_iq(iq)
    for n_slabs in (2, 3, 5):
        ov = pipeline.decode_iq_fused_overlap(
            iq, "v2", CFG, n_slabs=n_slabs, chunks_per_slab=2,
            input_format="c64")
        assert ov == seq, f"n_slabs={n_slabs}: {len(ov)} vs {len(seq)}"
    assert len(seq) >= 11


def test_fused_overlap_cu8():
    """Overlap path from raw rtl_sdr u8 bytes (device-side conversion)."""
    rng = np.random.default_rng(67)
    payloads, iq = _capture(8, rng, ebno=13.0)
    raw = fsk.iq_to_cu8(iq / (np.abs(iq).max() + 1e-9))
    ov = pipeline.decode_iq_fused_overlap(raw, "v2", CFG, n_slabs=3,
                                          chunks_per_slab=2,
                                          input_format="cu8")
    assert len(ov) >= 7
    assert set(ov) <= set(payloads)


def test_fused_cs16_ingest():
    """Fused decode from raw KA9Q-style s16 IQ pairs (device conversion)."""
    rng = np.random.default_rng(65)
    payloads, iq = _capture(6, rng, ebno=13.0)
    iq = iq / (np.abs(iq).max() + 1e-9)
    raw = np.empty(2 * len(iq), np.int16)
    raw[0::2] = np.clip(np.round(iq.real * 800), -32768, 32767)
    raw[1::2] = np.clip(np.round(iq.imag * 800), -32768, 32767)
    fused = pipeline.decode_iq_fused(raw, "v2", CFG, n_chunks=3,
                                     input_format="cs16")
    assert len(fused) >= 5
    assert set(fused) <= set(payloads)


def test_fused_mesh_sharded_equals_unsharded():
    """The production fused path with its chunk axis sharded over the full
    device mesh (the pod configuration, VERDICT r3 #6) returns exactly the
    unsharded payload list — XLA partitions the one-dispatch program from
    the input shardings alone."""
    from wenet_tpu.parallel.mesh import make_mesh
    rng = np.random.default_rng(64)
    payloads, iq = _capture(12, rng, ebno=14.0)
    raw = fsk.iq_to_cu8(iq / np.abs(iq).max())
    base = pipeline.decode_iq_fused(raw, "v2", CFG, n_chunks=8,
                                    input_format="cu8")
    mesh = make_mesh(8)
    sharded = pipeline.decode_iq_fused(raw, "v2", CFG, n_chunks=8,
                                       input_format="cu8", mesh=mesh)
    assert sharded == base
    assert len(sharded) >= 11


def test_fused_receiver_streaming_equals_batch():
    """FusedReceiver (the chunk-parallel live path: slabs + halo recompute,
    depth-pipelined, device deframe) recovers the same payload set as the
    batch fused decode of the whole capture, fed in unaligned buckets."""
    rng = np.random.default_rng(70)
    payloads, iq = _capture(20, rng, ebno=12.0)
    raw = fsk.iq_to_cu8(iq / (np.abs(iq).max() + 1e-9))
    batch = pipeline.decode_iq_fused(raw, "v2", CFG, n_chunks=4,
                                     input_format="cu8")

    rx = pipeline.FusedReceiver(mode="v2", cfg=CFG,
                                push_samples=len(iq) // 5, n_chunks=4,
                                input_format="cu8", depth=2)
    got = []
    bucket = 2 * (37 * CFG.N + 131)          # unaligned cu8-byte buckets
    for i in range(0, len(raw), bucket):
        got.extend(rx.push(raw[i:i + bucket]))
    got.extend(rx.flush())
    assert set(got) == set(batch)
    assert len(got) == len(batch)            # no duplicate emissions
    assert len(got) >= 19
    assert rx.n_crc_ok == len(got)


def test_fused_receiver_c64_and_latency():
    """c64 input path; payloads may arrive up to `depth` slabs late but all
    arrive by flush, and pushing after flush continues the stream."""
    rng = np.random.default_rng(71)
    payloads, iq = _capture(10, rng, ebno=13.0)
    rx = pipeline.FusedReceiver(mode="v2", cfg=CFG,
                                push_samples=len(iq) // 3, n_chunks=3,
                                input_format="c64", depth=1)
    got = list(rx.push(iq))
    got += rx.flush()
    assert set(got) <= set(payloads)
    assert len(got) >= 9


def test_fused_receiver_push_after_flush():
    """flush() re-anchors the stream: a later push starts a fresh segment
    at the current global sample count and its packets still decode (the
    review-found _base/_next desync dropped them silently)."""
    rng = np.random.default_rng(72)
    p1, iq1 = _capture(6, rng, ebno=13.0)
    p2, iq2 = _capture(6, rng, ebno=13.0)
    rx = pipeline.FusedReceiver(mode="v2", cfg=CFG,
                                push_samples=len(iq1) // 2, n_chunks=3,
                                input_format="c64", depth=1)
    got1 = list(rx.push(iq1)) + rx.flush()
    got2 = list(rx.push(iq2)) + rx.flush()
    assert len(got1) >= 5 and set(got1) <= set(p1)
    assert len(got2) >= 5 and set(got2) <= set(p2)


def test_fused_receiver_cs16():
    """cs16 (KA9Q pcmcat s16 IQ) input path through FusedReceiver."""
    rng = np.random.default_rng(73)
    payloads, iq = _capture(8, rng, ebno=13.0)
    iq = iq / (np.abs(iq).max() + 1e-9)
    pairs = np.empty(2 * len(iq), np.int16)
    pairs[0::2] = np.clip(np.round(iq.real * fsk.FDMDV_SCALE), -32768, 32767)
    pairs[1::2] = np.clip(np.round(iq.imag * fsk.FDMDV_SCALE), -32768, 32767)
    rx = pipeline.FusedReceiver(mode="v2", cfg=CFG,
                                push_samples=len(iq) // 3, n_chunks=3,
                                input_format="cs16", depth=1)
    got = list(rx.push(pairs)) + rx.flush()
    assert len(got) >= 7 and set(got) <= set(payloads)
