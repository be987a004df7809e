"""Desktop-GUI model tests (rx_gui / fskdemodgui / TelemetryGUI parity).

The models consume the exact same UDP/JSON vocabulary the reference GUIs
do; here they are fed both directly and over real UDP sockets via the
framework's own emitters.
"""
import time

import numpy as np

from wenet_tpu.core import packets as wp
from wenet_tpu.rx.gui import (ImageViewerModel, ModemStatsModel,
                              TelemetryDashboardModel, UDPListener)
from wenet_tpu.rx.router import UDPEmitter


def test_image_viewer_model_messages():
    changes = []
    m = ImageViewerModel(on_change=lambda mm: changes.append(mm.latest_image))
    m.handle({"filename": "/tmp/img_1.jpg", "text": "GPS overlay"})
    assert m.latest_image == "/tmp/img_1.jpg" and m.text == "GPS overlay"
    m.handle({"uploader_status": {"queued": 3, "uploaded": 7, "discarded": 1}})
    assert m.upload_status == {"queued": 3, "uploaded": 7, "discarded": 1}
    m.handle({"unrelated": True})          # ignored, no callback
    assert changes == ["/tmp/img_1.jpg", "/tmp/img_1.jpg"]
    line = m.status_line()
    assert "img_1.jpg" in line and "ok=7" in line


def test_image_viewer_over_udp():
    m = ImageViewerModel()
    # bind port 0: the OS picks a free port, so parallel/shared CI hosts
    # never collide (and SO_REUSEPORT can't route our datagrams elsewhere)
    listener = UDPListener(0, m.handle).start()
    try:
        em = UDPEmitter(image_port=listener.port)
        em.gui_update("rx_images/a.jpg", "hello")
        for _ in range(50):
            if m.images_seen:
                break
            time.sleep(0.05)
    finally:
        listener.close()
    assert m.latest_image == "rx_images/a.jpg" and m.text == "hello"


def test_modem_stats_model_history_and_eye():
    m = ModemStatsModel(history=5)
    for i in range(8):      # longer than history: ring must roll
        m.update({"EbNodB": float(i), "ppm": -2.0, "f1_est": 1200.0,
                  "f2_est": 2400.0,
                  "samp_fft": [0.0] * 16,
                  "eye_diagram": [[0.1, 0.9, 0.1]] * 4})
    snap = m.snapshot()
    assert snap["EbNodB"] == 7.0 and snap["ppm"] == -2.0
    assert snap["f1_est"] == 1200.0 and snap["f2_est"] == 2400.0
    assert snap["eye_lines"] == 4 and snap["frames"] == 8
    assert m.ebno.tolist() == [3.0, 4.0, 5.0, 6.0, 7.0]
    # NaN scrubbing, as fskstatsudp does (fskstatsudp.py:89-91)
    m.update({"EbNodB": float("nan"), "ppm": 1.0})
    assert np.isnan(m.ebno[-1]) and m.snapshot()["EbNodB"] == 7.0


def test_telemetry_dashboard_model():
    m = TelemetryDashboardModel(history=3)
    gps = {"week": 2300, "iTOW": 100000.0, "leapS": 18,
           "latitude": -34.9285, "longitude": 138.6007, "altitude": 21000.0,
           "ground_speed": 40.0, "heading": 90.0, "ascent_rate": 4.5,
           "numSV": 9, "gpsFix": 3, "dynamic_model": 6}
    pkt = wp.encode_gps_telemetry(gps)
    for i in range(5):
        m.handle({"type": "WENET", "packet": list(pkt)})
    assert len(m.track) == 3                      # bounded history
    assert abs(m.track[-1]["latitude"] - -34.9285) < 1e-4
    assert "alt=21000m" in m.status_line()

    txt = wp.encode_text_message("dashboard text", 2)
    m.handle({"type": "WENET", "packet": list(txt)})
    assert m.text_log == ["dashboard text"]
    m.handle({"type": "OTHER", "packet": [0]})    # non-WENET ignored
    assert m.packets == 6
