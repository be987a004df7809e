"""Shift/resample robustness envelope at REAL flight rates vs committed
goldens (the reference's committed-table methodology for baud-rate error,
benchmarking/README.md:94-172, plus the frequency-shift sweep of
test_demod.py:71).

tools/robustness_table.py regenerates tests/golden/robustness_{v1,v2}.json;
this test re-runs the identical grid and fails on sensitivity drift."""
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import robustness_table  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.parametrize("mode", ["v1", "v2"])
def test_robustness_matches_golden(mode):
    path = os.path.join(GOLDEN_DIR, f"robustness_{mode}.json")
    with open(path) as f:
        golden = json.load(f)
    table = robustness_table.sweep(mode)
    assert table["packets"] == golden["packets"]
    for new, old in zip(table["rows"], golden["rows"]):
        assert (new["kind"], new["value"], new["ebno_db"]) == (
            old["kind"], old["value"], old["ebno_db"])
        # +-2 packets absorbs float drift near the failure edges while
        # catching real sensitivity loss
        assert abs(new["packets_ok"] - old["packets_ok"]) <= 2, (
            mode, new["kind"], new["value"], new["packets_ok"],
            old["packets_ok"])

    # hard envelope invariants (the reference's summary,
    # benchmarking/README.md:98): 0.3% error barely affects decode;
    # 0.6% fails completely — at the real flight rates
    n = table["packets"]
    by = {(r["kind"], r["value"], r["ebno_db"]): r["packets_ok"]
          for r in table["rows"]}
    assert by[("resample", 1.003, 14.0)] >= n - 1
    assert by[("resample", 0.997, 14.0)] >= n - 1
    assert by[("resample", 1.006, 14.0)] <= 1
    assert by[("shift", -0.5, 12.0)] >= n - 1
    assert by[("shift", 0.5, 12.0)] >= n - 1
