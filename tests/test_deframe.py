"""Deframer parity tests: byte-exact payload output vs wenet_ldpc/drs232_ldpc
on identical soft-decision streams."""
import subprocess

import numpy as np
import pytest

import refbins
from wenet_tpu.core import framing
from wenet_tpu.ops import deframe, ldpc

needs_ref = pytest.mark.skipif(
    not refbins.reference_available(), reason="reference tree/gcc unavailable")


def _soft_stream(mode, n_packets, rng, noise=0.0, gap=200):
    """TX-frame n packets with idle filler, emit ±1 soft symbols + AWGN."""
    bits = [rng.integers(0, 2, gap).astype(np.uint8)]
    payloads = []
    for k in range(n_packets):
        payload = rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
        payloads.append(payload)
        frame = framing.frame_packet(payload, ldpc.encode_bytes, mode=mode)
        bits.append(framing.frame_to_bits(frame, mode))
        bits.append(rng.integers(0, 2, gap).astype(np.uint8))
    stream = np.concatenate(bits)
    soft = (1.0 - 2.0 * stream).astype(np.float32)
    if noise:
        soft = soft + rng.normal(0, noise, soft.shape).astype(np.float32)
    return soft, payloads


@pytest.mark.parametrize("mode", ["v2", "v1"])
def test_deframe_clean(mode):
    rng = np.random.default_rng(10)
    soft, payloads = _soft_stream(mode, 4, rng)
    res = deframe.deframe_soft(soft, mode)
    assert res.n_detections == 4
    assert res.n_crc_ok == 4
    assert res.payloads == payloads


@pytest.mark.parametrize("mode", ["v2", "v1"])
def test_deframe_noisy(mode):
    """~7.5 dB-equivalent noise: LDPC must correct errors, CRC must gate."""
    rng = np.random.default_rng(11)
    soft, payloads = _soft_stream(mode, 6, rng, noise=0.55)
    res = deframe.deframe_soft(soft, mode)
    assert res.payloads == [p for i, p in enumerate(payloads)
                            if i < res.n_detections and res.crc_ok[i]] or \
        set(res.payloads) <= set(payloads)
    assert res.n_crc_ok >= 4   # most packets should survive


@needs_ref
@pytest.mark.parametrize("mode,noise", [("v2", 0.0), ("v2", 0.5), ("v2", 0.65),
                                        ("v1", 0.0), ("v1", 0.5)])
def test_deframe_matches_reference(mode, noise):
    binpath = refbins.wenet_ldpc() if mode == "v2" else refbins.drs232_ldpc()
    rng = np.random.default_rng(12 + int(noise * 100))
    soft, _ = _soft_stream(mode, 8, rng, noise=noise)
    proc = subprocess.run([binpath, "-", "-"], input=soft.tobytes(),
                          capture_output=True, check=True)
    ref_out = proc.stdout
    res = deframe.deframe_soft(soft, mode)
    ours = b"".join(res.payloads)
    assert ours == ref_out, (
        f"payload mismatch: ours {len(ours)}B vs ref {len(ref_out)}B "
        f"({res.n_detections} det, {res.n_crc_ok} ok); ref stderr: "
        f"{proc.stderr.decode()[-200:]}")


@pytest.mark.parametrize("mode", ["v2", "v1"])
def test_deframe_topk_device_matches_host(mode):
    """The all-on-device top-k deframe recovers the same packets as the
    host FSM path, under jit, with excess picks failing the CRC gate."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(21)
    soft, payloads = _soft_stream(mode, 3, rng, noise=0.35)
    host = deframe.deframe_soft(soft, mode)
    assert host.n_crc_ok == 3

    fn = jax.jit(lambda s: deframe.deframe_topk(s, mode=mode, k=5))
    pbytes, ok, iters, starts = jax.tree.map(np.asarray,
                                             fn(jnp.asarray(soft)))
    got = sorted(pbytes[i, :256].tobytes() for i in range(5) if ok[i])
    assert got == sorted(payloads)
    assert int(ok.sum()) == 3          # the 2 extra picks are CRC-rejected
    # real picks are distinct UW starts; exhausted picks are -1 sentinels
    real = [s for s in starts.tolist() if s >= 0]
    assert len(set(real)) == len(real) >= 3
