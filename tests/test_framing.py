import numpy as np
import pytest

from wenet_tpu.core import framing as fr


def test_crc16_check_value():
    # CRC16/CCITT-FALSE check value
    assert fr.crc16_ccitt(b"123456789") == 0x29B1


def test_crc16_batch_matches_scalar():
    rng = np.random.default_rng(1)
    pkts = rng.integers(0, 256, (8, 256), dtype=np.uint8)
    batch = fr.crc16_ccitt_batch(pkts)
    for i in range(8):
        assert int(batch[i]) == fr.crc16_ccitt(pkts[i].tobytes())


def test_uw_patterns_match_reference_tables():
    # wenet_ldpc.c:77-82
    assert fr.UW_BITS_V2.tolist() == [
        1, 0, 1, 0, 1, 0, 1, 1,
        1, 1, 0, 0, 1, 1, 0, 1,
        1, 1, 1, 0, 1, 1, 1, 1,
        0, 0, 0, 0, 0, 0, 0, 1,
    ]
    # drs232_ldpc.c:77-86
    assert fr.UW_BITS_V1.tolist() == [
        0, 1, 1, 0, 1, 0, 1, 0, 1, 1,
        0, 1, 0, 1, 1, 0, 0, 1, 1, 1,
        0, 1, 1, 1, 1, 0, 1, 1, 1, 1,
        0, 1, 0, 0, 0, 0, 0, 0, 0, 1,
    ]


def test_tx_scramble_table_values():
    # radio_wrappers.py:386-398 first row
    assert fr.TX_XOR[:10].tolist() == [
        0xB9, 0x97, 0x93, 0x13, 0xF7, 0xAB, 0x1E, 0x88, 0x12, 0xC4]
    assert len(fr.TX_XOR) == 125
    assert len(fr.SCRAMBLE_PM1) == 1000


def test_scramble_tx_rx_consistency():
    """XOR-scrambling bytes on TX then +/-1-descrambling the BPSK symbols on
    RX must recover the original bits."""
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, 323, dtype=np.uint8).tobytes()
    scrambled = fr.tx_scramble(data)
    bits = fr.bytes_to_bits_msb(scrambled)
    soft = 1.0 - 2.0 * bits.astype(np.float32)      # bit0 -> +1
    descrambled = fr.rx_descramble_soft(soft)
    rx_bits = (descrambled < 0).astype(np.uint8)
    assert np.array_equal(rx_bits, fr.bytes_to_bits_msb(data))


def test_rs232_roundtrip():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, 323, dtype=np.uint8).tobytes()
    words = fr.rs232_expand(data)
    assert words.size == len(data) * 10
    # start/stop bits in place
    w = words.reshape(-1, 10)
    assert (w[:, 0] == 0).all() and (w[:, 9] == 1).all()
    soft = 1.0 - 2.0 * words.astype(np.float32)
    stripped = fr.rs232_strip_soft(soft)
    bits = (stripped < 0).astype(np.uint8)
    assert fr.bits_to_bytes_msb(bits) == data


def test_frame_packet_layout():
    from wenet_tpu.ops import ldpc

    payload = b"\x00hello"
    frame = fr.frame_packet(payload, ldpc.encode_bytes, mode="v2")
    assert len(frame) == 16 + 4 + 256 + 2 + 65
    assert frame[:16] == fr.PREAMBLE
    assert frame[16:20] == fr.UNIQUE_WORD
    # body is scrambled; descramble and check payload + CRC
    body = fr.tx_scramble(frame[20:])  # XOR is an involution
    assert body[: len(payload)] == payload
    assert body[len(payload):256] == b"\x55" * (256 - len(payload))
    crc = int.from_bytes(body[256:258], "little")
    assert crc == fr.crc16_ccitt(body[:256])
