"""UBX binary protocol tests: frame codec, stream resync, driver state
machine, and a hardware-free fix loop through the real parser."""
import queue
import threading
import time

from wenet_tpu.core import packets as wp
from wenet_tpu.tx import ubx
from wenet_tpu.tx.gps import SimulatedGPS


FIX = {"week": 2345, "iTOW": 302400.5, "leapS": 18,
       "latitude": -34.92850, "longitude": 138.60074, "altitude": 31245.5,
       "ground_speed": 62.3, "heading": 271.75, "ascent_rate": 5.25,
       "numSV": 12, "gpsFix": 3}


def test_frame_checksum_and_parser_roundtrip():
    f = ubx.frame(0x06, 0x24, b"\x01\x02\x03")
    assert f[:2] == b"\xb5\x62" and len(f) == 8 + 3
    p = ubx.UBXParser()
    msgs = p.feed(f)
    assert msgs == [(0x06, 0x24, b"\x01\x02\x03")]

    # split across arbitrary feed boundaries
    p2 = ubx.UBXParser()
    got = []
    for b in bytes(f):
        got += p2.feed(bytes([b]))
    assert got == msgs


def test_parser_resync_on_garbage_and_bad_checksum():
    good = ubx.frame(0x01, 0x02, b"\x00" * 28)
    corrupted = bytearray(good)
    corrupted[-1] ^= 0xFF                       # break ck_b
    stream = b"\xffJUNK\xb5" + bytes(corrupted) + b"\x00" + good + b"\xb5\x62"
    p = ubx.UBXParser()
    msgs = p.feed(stream)
    assert len(msgs) == 1 and msgs[0][:2] == (0x01, 0x02)
    assert p.bad_checksums == 1
    # the trailing partial sync survives for the next feed
    rest = p.feed(ubx.frame(0x01, 0x06, b"\x00" * 52)[2:])
    assert rest and rest[0][:2] == (0x01, 0x06)


def test_fix_burst_updates_state_with_reference_scalings():
    fixes = []
    gps = ubx.UBloxGPS(transport=_NullTransport(), callback=fixes.append)
    for msg in ubx.UBXParser().feed(ubx.nav_frames(FIX)):
        gps.handle(*msg)
    assert len(fixes) == 1                      # one callback per TIMEGPS
    st = fixes[0]
    assert abs(st["latitude"] - FIX["latitude"]) < 1e-6
    assert abs(st["longitude"] - FIX["longitude"]) < 1e-6
    assert abs(st["altitude"] - FIX["altitude"]) < 1e-3
    assert abs(st["ground_speed"] - FIX["ground_speed"]) < 0.05
    assert abs(st["heading"] - FIX["heading"]) < 1e-4
    assert abs(st["ascent_rate"] - FIX["ascent_rate"]) < 0.01
    assert st["numSV"] == 12 and st["gpsFix"] == 3
    assert st["week"] == 2345 and abs(st["iTOW"] - 302400.5) < 1e-3
    assert st["timestamp"] == wp.gps_weeksecondstoutc(2345, 302400.5, 18)

    # the state dict feeds the GPS telemetry wire format unchanged
    st["dynamic_model"] = 6
    pkt = wp.encode_gps_telemetry(st)
    dec = wp.gps_telemetry_decoder(pkt)
    assert abs(dec["altitude"] - FIX["altitude"]) < 0.01
    assert dec["numSV"] == 12


def test_cfg_nav5_sets_and_reports_dynamic_model():
    f = ubx.pack_cfg_nav5(ubx.DYNAMIC_MODEL_AIRBORNE1G)
    (cls, mid, payload), = ubx.UBXParser().feed(f)
    assert (cls, mid) == (ubx.CLASS_CFG, ubx.MSG_CFG_NAV5)
    assert len(payload) == 36 and payload[2] == 6
    gps = ubx.UBloxGPS(transport=_NullTransport())
    gps.handle(cls, mid, payload)               # CFG-NAV5 poll response
    assert gps.read_state()["dynamic_model"] == 6


class _NullTransport:
    def write(self, data):
        pass

    def read(self, n):
        return b""


class _PipeTransport:
    """In-memory duplex transport: RX bytes from a queue, TX captured."""

    def __init__(self):
        self.rx: queue.Queue = queue.Queue()
        self.tx = bytearray()
        self._lock = threading.Lock()

    def write(self, data):
        with self._lock:
            self.tx.extend(data)

    def read(self, n):
        try:
            return self.rx.get(timeout=0.05)
        except queue.Empty:
            return b""


def test_driver_configures_and_tracks_simulated_flight():
    """SimulatedGPS trajectory -> UBX frames -> real parser/driver thread."""
    pipe = _PipeTransport()
    fixes = []
    gps = ubx.UBloxGPS(transport=pipe, callback=fixes.append,
                       update_rate_ms=250,
                       dynamic_model=ubx.DYNAMIC_MODEL_AIRBORNE1G)
    # setup() wrote the config frames: rate, 4 message rates, NAV5
    cfgs = ubx.UBXParser().feed(bytes(pipe.tx))
    assert len(cfgs) == 6
    assert cfgs[0][:2] == (ubx.CLASS_CFG, ubx.MSG_CFG_RATE)
    assert cfgs[0][2][:2] == (250).to_bytes(2, "little")
    assert cfgs[-1][:2] == (ubx.CLASS_CFG, ubx.MSG_CFG_NAV5)
    assert cfgs[-1][2][2] == 6

    sim = SimulatedGPS(rate=4.0)               # manual stepping via .step()
    gps.start()
    try:
        for i in range(3):
            state = sim.step()
            raw = ubx.nav_frames(state)
            # fragment the burst as a serial port would
            for j in range(0, len(raw), 17):
                pipe.rx.put(raw[j:j + 17])
        deadline = time.time() + 5.0
        while len(fixes) < 3 and time.time() < deadline:
            time.sleep(0.02)
    finally:
        gps.close()
    assert len(fixes) == 3
    assert fixes[-1]["altitude"] > fixes[0]["altitude"]   # ascending
    assert fixes[-1]["gpsFix"] == 3 and fixes[-1]["numSV"] == 11


def test_time_sync_hook_fires_on_whole_seconds_only():
    """The NTPD-SHM push condition (reference ublox.py:1186-1188): the
    time_sync callable fires only when iTOW lands on a whole second, with
    the UTC unix timestamp (GPS time minus leap seconds)."""
    import calendar
    import datetime
    stamps = []
    gps = ubx.UBloxGPS(transport=_NullTransport(), time_sync=stamps.append)
    frac = dict(FIX)                          # iTOW=302400.5 — fractional
    for msg in ubx.UBXParser().feed(ubx.nav_frames(frac)):
        gps.handle(*msg)
    assert stamps == []
    whole = dict(FIX, iTOW=302401.0)
    for msg in ubx.UBXParser().feed(ubx.nav_frames(whole)):
        gps.handle(*msg)
    expect_dt = (datetime.datetime(1980, 1, 6) + datetime.timedelta(
        days=FIX["week"] * 7, seconds=302401.0 - FIX["leapS"]))
    assert stamps == [calendar.timegm(expect_dt.utctimetuple())]


def test_time_sync_failure_is_contained():
    """A raising time_sync must not break fix processing (it is host time
    discipline, not flight-critical)."""
    msgs = []

    def boom(_):
        raise RuntimeError("shm gone")
    fixes = []
    gps = ubx.UBloxGPS(transport=_NullTransport(), callback=fixes.append,
                       time_sync=boom, debug_ptr=msgs.append)
    for msg in ubx.UBXParser().feed(ubx.nav_frames(dict(FIX, iTOW=7.0))):
        gps.handle(*msg)
    assert len(fixes) == 1
    assert any("time_sync failed" in m for m in msgs)


def test_system_clock_setter_first_3d_fix_once():
    """cli/flight.py --set-system-clock: clock set once, on the FIRST 3D
    fix, with the reference's exact timedatectl commands and downlinked
    debug text (tx_picamera2_gps.py:133-151)."""
    from wenet_tpu.cli.flight import SystemClockSetter
    ran, texts = [], []
    setter = SystemClockSetter(debug_ptr=texts.append,
                               runner=lambda cmd: ran.append(cmd) or 0)
    setter.on_fix(dict(FIX, gpsFix=0))            # no fix: nothing happens
    assert ran == []
    setter.on_fix(dict(FIX, iTOW=302400.0))       # first 3D fix
    assert len(ran) == 2
    assert ran[0].startswith('timedatectl set-time "') and ran[0].endswith('"')
    assert ran[1] == "timedatectl set-ntp 1"
    import datetime
    expect = (datetime.datetime(1980, 1, 6) + datetime.timedelta(
        days=FIX["week"] * 7, seconds=302400.0 - FIX["leapS"])
        ).strftime("%Y-%m-%d %H:%M:%S")
    assert expect in ran[0]
    assert any("System clock set to GPS time" in t for t in texts)
    assert any("Re-enabled NTP sync" in t for t in texts)
    setter.on_fix(dict(FIX, iTOW=302460.0))       # later fixes: no-op
    assert len(ran) == 2


def test_system_clock_setter_reports_failure():
    from wenet_tpu.cli.flight import SystemClockSetter
    texts = []
    setter = SystemClockSetter(debug_ptr=texts.append,
                               runner=lambda cmd: 1)
    setter.on_fix(dict(FIX))
    assert any("failed" in t for t in texts)
    assert any("Could not enable NTP sync" in t for t in texts)
