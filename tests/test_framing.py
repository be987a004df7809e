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


def test_habitat_legacy_sentence_and_upload():
    """UKHAS sentence + defunct-Habitat upload API (WenetPackets.py:635-751),
    transport injected so nothing touches the network."""
    from wenet_tpu.core import packets as wp

    gps = {"week": 2300, "iTOW": 302400.0, "leapS": 18, "latitude": -34.9,
           "longitude": 138.6, "altitude": 12345.0, "ground_speed": 10.0,
           "heading": 90.0, "ascent_rate": 5.0, "numSV": 9, "gpsFix": 3,
           "dynamic_model": 6}
    ori = {"sys_status": 0, "sys_error": 0, "sys_cal": 3, "gyro_cal": 3,
           "accel_cal": 3, "magnet_cal": 3, "temp": 21,
           "euler_heading": 1.0, "euler_roll": 2.0, "euler_pitch": 3.0,
           "quaternion_x": 0.1, "quaternion_y": 0.2, "quaternion_z": 0.3,
           "quaternion_w": 0.9}
    pkt = wp.encode_image_telemetry(gps, ori, image_id=7,
                                    callsign="VK5QI", count=42)
    s = wp.image_telemetry_habitat_string(pkt)
    assert s.startswith("$$VK5QI,42,") and s.endswith("\n") and "*" in s
    sentence, csum = s.strip().rsplit("*", 1)
    assert csum == wp.crc16_ccitt_hex(sentence[2:].encode("ascii"))

    calls = []
    class _Resp:
        def __init__(self, code): self.status_code = code
    def put(url, data, timeout):
        calls.append((url, data))
        return _Resp([409, 201][len(calls) - 1])   # conflict then success
    ok, msg = wp.image_telemetry_upload(pkt, user_callsign="N0CALL", put=put)
    assert ok and len(calls) == 2
    assert "payload_telemetry/_update/add_listener/" in calls[0][0]
    import json, base64
    body = json.loads(calls[1][1])
    assert base64.b64decode(body["data"]["_raw"]).decode() == s
    assert "N0CALL" in body["receivers"]

    def put_fail(url, data, timeout):
        return _Resp(500)
    ok, msg = wp.image_telemetry_upload(pkt, put=put_fail)
    assert not ok
