"""Native C runtime parity tests: the C acquisition FSM must agree with the
numpy emulation (both mirror the reference deframers), and C sample
conversion must match the numpy converters bit-exactly."""
import numpy as np
import pytest

from wenet_tpu import native
from wenet_tpu.ops import deframe, fsk

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C compiler available")


@pytest.mark.parametrize("mode", ["v2", "v1"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fsm_parity_random_noise(mode, seed):
    """Pure-noise streams: detections (false triggers) must agree exactly,
    including the stale-buffer resume windows."""
    rng = np.random.default_rng(seed)
    soft = rng.normal(0, 1, 80000).astype(np.float32)
    hard = (soft < 0).astype(np.uint8)
    p_np, s_np = deframe.uw_detect_positions(hard, mode, force_numpy=True)
    p_c, s_c = deframe.uw_detect_positions(hard, mode)
    np.testing.assert_array_equal(p_np, p_c)
    if len(p_np):
        np.testing.assert_array_equal(s_np, s_c)


@pytest.mark.parametrize("mode", ["v2", "v1"])
def test_fsm_parity_real_packets(mode):
    from wenet_tpu.core import framing
    from wenet_tpu.ops import ldpc
    rng = np.random.default_rng(3)
    parts = [rng.normal(0, 1, 777).astype(np.float32)]
    for _ in range(5):
        frame = framing.frame_packet(
            rng.integers(0, 256, 256, dtype=np.uint8).tobytes(),
            ldpc.encode_bytes, mode=mode)
        bits = framing.frame_to_bits(frame, mode)
        parts.append((1.0 - 2.0 * bits +
                      rng.normal(0, 0.4, len(bits))).astype(np.float32))
        parts.append(rng.normal(0, 1, 333).astype(np.float32))
    soft = np.concatenate(parts)
    hard = (soft < 0).astype(np.uint8)
    p_np, _ = deframe.uw_detect_positions(hard, mode, force_numpy=True)
    p_c, _ = deframe.uw_detect_positions(hard, mode)
    np.testing.assert_array_equal(p_np, p_c)
    assert len(p_c) >= 4


def test_fsm_parity_with_init_buffer():
    rng = np.random.default_rng(4)
    soft = rng.normal(0, 1, 20000).astype(np.float32)
    hard = (soft < 0).astype(np.uint8)
    init = rng.integers(0, 2, 32).astype(np.int8)
    p_np, _ = deframe.uw_detect_positions(hard, "v2", init, force_numpy=True)
    p_c, _ = deframe.uw_detect_positions(hard, "v2", init)
    np.testing.assert_array_equal(p_np, p_c)


def test_sample_conversion_parity():
    rng = np.random.default_rng(5)
    raw8 = rng.integers(0, 256, 20000, dtype=np.uint8)
    np.testing.assert_array_equal(native.cu8_to_c64(raw8),
                                  fsk.iq_from_cu8(raw8))
    raw16 = rng.integers(-32768, 32768, 20000).astype(np.int16)
    np.testing.assert_array_equal(native.cs16_to_c64(raw16),
                                  fsk.iq_from_cs16(raw16))
