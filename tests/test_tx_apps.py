"""TX application-layer tests: GPS simulation, camera loop, link emulation,
probe traces, flight CLI."""
import json
import socket
import time

import numpy as np
import pytest
from PIL import Image

from wenet_tpu.core import packets as wp
from wenet_tpu.examples.link_emulation import LinkEmulator
from wenet_tpu.tx.gps import SimulatedGPS


def test_simulated_gps_trajectory():
    fixes = []
    gps = SimulatedGPS(callback=fixes.append, rate=1.0, realtime=False)
    for _ in range(100):
        gps.step()
    assert len(fixes) == 100
    assert fixes[50]["altitude"] == pytest.approx(51 * 5.0)
    assert fixes[0]["gpsFix"] == 3
    # encodes/decodes through the real packet format
    pkt = wp.encode_gps_telemetry(fixes[10])
    d = wp.gps_telemetry_decoder(pkt)
    assert d["error"] == "None"
    assert d["altitude"] == pytest.approx(fixes[10]["altitude"])
    assert d["dynamic_model_str"] == "Airborne 1G"


def test_gps_telemetry_through_packet_tx():
    from wenet_tpu.tx import PacketTX

    frames = []

    class Radio:
        mode = "v2"

        def scramble(self, b):
            from wenet_tpu.core import framing
            return framing.tx_scramble(b)

        def transmit_packet(self, f):
            frames.append(f)

        def shutdown(self):
            pass

    tx = PacketTX(Radio(), callsign="TEST")
    gps = SimulatedGPS(realtime=False)
    gps.step()
    tx.transmit_gps_telemetry(gps.state)
    assert tx.telemetry_queue.qsize() == 1


def test_link_emulation_secondary_payload():
    """Secondary payload command in via UDP -> telemetry broadcast out."""
    # listen on the telemetry port first
    rx_port = 42672
    tx_port = 42674
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    s.settimeout(5)
    s.bind(("", rx_port))

    emu = LinkEmulator(tx_port=tx_port, telemetry_port=rx_port)
    time.sleep(0.3)
    cmd = {"type": "WENET_TX_SEC_PAYLOAD", "id": 7,
           "packet": list(range(20))}
    c = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    c.sendto(json.dumps(cmd).encode(), ("127.0.0.1", tx_port))
    time.sleep(0.5)
    emu.drain()

    d = json.loads(s.recvfrom(65535)[0])
    s.close()
    emu.close()
    assert d["type"] == "WENET"
    payload = bytes(bytearray(d["packet"]))
    sec = wp.sec_payload_decode(payload)
    assert sec["id"] == 7
    assert sec["payload"][:20] == bytes(range(20))


def test_link_emulation_through_modem():
    emu = LinkEmulator(tx_port=42675, telemetry_port=42673,
                       through_modem=True)
    emu.tx.transmit_text_message("bit-true link")
    emu.drain()
    # trailing idle flushes the demod/deframe pipeline (a real stream is
    # continuous; the last packet needs subsequent samples to complete)
    emu.tx.radio.transmit_packet(emu.tx.idle_message)
    emu.close()
    texts = [wp.decode_text_message(p) for p in emu.packets_received
             if wp.decode_packet_type(p) == wp.PacketType.TEXT_MESSAGE]
    assert any(t.get("text") == "bit-true link" for t in texts)


def test_probe_traces():
    from wenet_tpu.ops import fsk
    from wenet_tpu.utils import probe

    cfg = fsk.FSKConfig(Fs=96000, Rs=9600)
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, cfg.Nbits * 20).astype(np.uint8)
    sig, _ = fsk.fsk_mod_np(cfg, bits, 19200, 9600)
    traces = probe.probe_demod(cfg, (0.3 * sig).astype(np.complex64))
    assert set(traces) >= {"t_fft_est", "t_f_est", "t_norm_rx_timing",
                           "t_nin", "t_EbNodB", "t_ppm", "rx_sd"}
    v = traces["valid"]
    assert traces["t_f_est"][v][-1][0] == pytest.approx(19200, abs=400)
    # matches the production demod path
    soft, outs, _ = fsk.demod_iq_np(cfg, (0.3 * sig).astype(np.complex64))
    np.testing.assert_allclose(traces["rx_sd"][v].reshape(-1), soft,
                               rtol=1e-4, atol=1e-3)


def test_flight_cli(tmp_path):
    from wenet_tpu.cli.flight import main as flight_main

    rng = np.random.default_rng(0)
    img = (rng.normal(128, 30, (64, 96, 3))).clip(0, 255).astype(np.uint8)
    (tmp_path / "imgs").mkdir()
    Image.fromarray(img).save(tmp_path / "imgs" / "a.jpg")
    out = tmp_path / "flight.c64"
    rc = flight_main(["--images-dir", str(tmp_path / "imgs"),
                      "--out", str(out), "--fs", "96000", "--rs", "9600",
                      "--duration", "3", "--tx-resolution", "96x64"])
    assert rc == 0
    assert out.stat().st_size > 100000   # several packets of IQ emitted


def test_kill_payload_leds_injected():
    """pi_utils drives all 9 LED channels to full-off duty (kill_leds.py)."""
    from wenet_tpu.tx import pi_utils

    class FakeChannel:
        duty_cycle = 0

    class FakePCA:
        def __init__(self):
            self.channels = [FakeChannel() for _ in range(16)]
            self.frequency = 0

    pca = FakePCA()
    assert pi_utils.kill_payload_leds(pca=pca)
    assert pca.frequency == 60
    assert all(pca.channels[i].duty_cycle == 0xFFFF for i in range(9))
    assert pca.channels[9].duty_cycle == 0
