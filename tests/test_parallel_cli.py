"""`rx --parallel N`: the CLI front door for the overlap-save one-shot
throughput path (decode_iq_parallel), cu8 bytes converted on device."""
import numpy as np

from wenet_tpu.core import framing, packets as wp
from wenet_tpu.ops import channel, fsk, ldpc

CFG = fsk.FSKConfig(Fs=96000, Rs=9600)


def test_parallel_cli_cu8(tmp_path):
    from wenet_tpu.cli import rx as rx_cli

    rng = np.random.default_rng(61)
    chunks = []
    for i in range(3):
        payload = wp.encode_text_message(f"parallel packet {i}", i + 1)
        frame = framing.frame_packet(payload, ldpc.encode_bytes, mode="v2")
        chunks.append(rng.integers(0, 2, CFG.Nbits * 3).astype(np.uint8))
        chunks.append(framing.frame_to_bits(frame, "v2"))
    chunks.append(rng.integers(0, 2, CFG.Nbits * 6).astype(np.uint8))
    bits = np.concatenate(chunks)
    bits = np.concatenate([bits, np.zeros((-len(bits)) % CFG.Nbits, np.uint8)])
    sig, _ = fsk.fsk_mod_np(CFG, bits, 2 * CFG.Rs, CFG.Rs)
    iq = channel.add_awgn(sig.astype(np.complex64), 14.0, CFG.Fs, CFG.Rs,
                          rng=np.random.default_rng(9))
    cap = tmp_path / "par.cu8"
    fsk.iq_to_cu8(iq).tofile(cap)

    rc = rx_cli.main([str(cap), "--format", "cu8", "--parallel", "4",
                      "--mode", "v2", "--fs", str(CFG.Fs),
                      "--rs", str(CFG.Rs), "--no-udp",
                      "--image-dir", str(tmp_path / "imgs"),
                      "--log-dir", str(tmp_path / "logs")])
    assert rc == 0
    logs = list((tmp_path / "logs").glob("*text*"))
    assert logs
    text = logs[0].read_text()
    for i in range(3):
        assert f"parallel packet {i}" in text
