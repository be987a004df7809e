"""Bench capture-builder accounting: exact decodable-packet counts.

VERDICT r3 weak#4: the stream stage's packets_sent was an estimate that
under-counted by one (records showed ok > sent).  These tests pin the
exact enumeration (bench.decodable_packets) to the actual bit layout
produced by bench.make_packet_bits.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from wenet_tpu.ops import fsk


def test_layout_matches_decodable_packets():
    """Frame i occupies bits [lead + i*cycle, lead + i*cycle + FRAME_BITS)."""
    cfg = fsk.V2_CONFIG
    rng = np.random.default_rng(0)
    n_packets = 5
    bits = bench.make_packet_bits(cfg, n_packets, rng)
    total = len(bits)
    # no prefix shorter than lead+frame contains a packet
    assert bench.decodable_packets(bench.LEAD_BITS + bench.FRAME_BITS_V2 - 1,
                                   n_packets) == 0
    # exactly at the first frame's end: 1
    assert bench.decodable_packets(bench.LEAD_BITS + bench.FRAME_BITS_V2,
                                   n_packets) == 1
    # mid-gap after frame 2: 3 frames fit
    nbits = bench.LEAD_BITS + 2 * bench.PKT_CYCLE_V2 + bench.FRAME_BITS_V2 + 100
    assert bench.decodable_packets(nbits, n_packets) == 3
    # the whole stream: capped at n_packets
    assert bench.decodable_packets(total, n_packets) == n_packets
    assert bench.decodable_packets(10 * total, n_packets) == n_packets


def test_lead_in_present_and_frames_at_cycle_offsets():
    """The capture starts with LEAD_BITS of filler and every frame's UW
    lands at lead + i*cycle (the loss-census index mapping relies on it)."""
    from wenet_tpu.core import framing
    from wenet_tpu.ops import ldpc
    cfg = fsk.V2_CONFIG
    rng = np.random.default_rng(1)
    bits = bench.make_packet_bits(cfg, 3, rng)
    # rebuild with the same rng stream to locate frame starts
    rng2 = np.random.default_rng(1)
    lead = rng2.integers(0, 2, bench.LEAD_BITS).astype(np.uint8)
    np.testing.assert_array_equal(bits[:bench.LEAD_BITS], lead)
    p = rng2.integers(0, 256, 256, dtype=np.uint8).tobytes()
    frame = framing.frame_to_bits(
        framing.frame_packet(p, ldpc.encode_bytes, mode="v2"), "v2")
    np.testing.assert_array_equal(
        bits[bench.LEAD_BITS:bench.LEAD_BITS + bench.FRAME_BITS_V2], frame)
    assert len(frame) == bench.FRAME_BITS_V2
