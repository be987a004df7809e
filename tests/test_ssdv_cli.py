"""Standalone `ssdv` subcommand: fsphil/ssdv argv contract over the native
codec (reference invocations: tx/WenetPiCamera2.py:420-432 `-e -n -q 6 -c
CALL -i N`, rx/rx_ssdv.py:243 `-d`)."""
import io

import numpy as np
import pytest

from wenet_tpu.cli.ssdv_cli import main as ssdv_main
from wenet_tpu.ssdv import codec

PIL = pytest.importorskip("PIL.Image")


def make_jpeg(w=160, h=128, seed=0, quality=80):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h // 16, w // 16, 3), dtype=np.uint8)
    arr = np.kron(base, np.ones((16, 16, 1), np.uint8))
    buf = io.BytesIO()
    PIL.fromarray(arr).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def test_ssdv_cli_roundtrip_nofec(tmp_path):
    jpg = tmp_path / "in.jpg"
    jpg.write_bytes(make_jpeg())
    binf, out = tmp_path / "p.bin", tmp_path / "out.jpg"
    # the reference camera's exact flags
    assert ssdv_main(["-e", "-n", "-q", "6", "-c", "VK5QI", "-i", "7",
                      str(jpg), str(binf)]) == 0
    data = binf.read_bytes()
    assert len(data) % 256 == 0
    info = codec.packet_info(data[:256])
    assert info["callsign"] == "VK5QI" and info["image_id"] == 7
    assert data[1] == codec.TYPE_NOFEC
    assert ssdv_main(["-d", str(binf), str(out)]) == 0
    a1 = np.asarray(PIL.open(io.BytesIO(jpg.read_bytes())), np.float32)
    a2 = np.asarray(PIL.open(str(out)), np.float32)
    assert a1.shape == a2.shape
    assert np.abs(a1 - a2).mean() < 8.0          # requantisation only


def test_ssdv_cli_fec_mode_and_resync(tmp_path):
    jpg = tmp_path / "in.jpg"
    jpg.write_bytes(make_jpeg(seed=1))
    binf, out = tmp_path / "p.bin", tmp_path / "out.jpg"
    assert ssdv_main(["-e", "-c", "N0CALL", "-i", "2",
                      str(jpg), str(binf)]) == 0       # FEC default (no -n)
    data = binf.read_bytes()
    assert data[1] == codec.TYPE_FEC
    # decoder resyncs past leading garbage like the real binary's scanner
    binf.write_bytes(b"\x00garbage\x55" + data)
    assert ssdv_main(["-d", str(binf), str(out)]) == 0
    a1 = np.asarray(PIL.open(io.BytesIO(jpg.read_bytes())), np.float32)
    a2 = np.asarray(PIL.open(str(out)), np.float32)
    assert np.abs(a1 - a2).mean() < 8.0


def test_ssdv_cli_bad_args(tmp_path):
    assert ssdv_main(["-e", "-l", "128", "/dev/null", "-"]) == 1
    f = tmp_path / "junk.bin"
    f.write_bytes(b"\x00" * 1024)
    assert ssdv_main(["-d", str(f), "-"]) == 1
