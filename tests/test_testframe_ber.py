"""Testframe BER oracle parity (SURVEY §4 contract (c)): our modem's
sliding-window testframe statistics vs `fsk_demod -f` on identical cu8
bytes — the modem-only validation mode the reference uses for MDS/BER
work (fsk_demod.c:230-343, tx_known_sequence.py)."""
import re
import subprocess

import numpy as np
import pytest

import refbins
from wenet_tpu.cli.ber import (TEST_FRAME_SIZE, glibc_rand_bits,
                               make_testframe_capture, sliding_testframe_ber)
from wenet_tpu.ops import fsk

pytestmark = pytest.mark.skipif(not refbins.reference_available(),
                                reason="reference tree / gcc unavailable")

CFG = fsk.FSKConfig(Fs=96000, Rs=9600)


def test_glibc_rand_emulation_matches_libc():
    """The Python glibc-rand emulation must produce the exact frame the C
    binary builds with srand(158324) — checked against compiled libc."""
    import os
    import tempfile
    src = (r'#include <stdio.h>'
           '\n#include <stdlib.h>\n'
           'int main(){srand(158324);'
           'for(int i=0;i<100;i++)printf("%d",rand()&1);return 0;}\n')
    with tempfile.TemporaryDirectory() as d:
        c = os.path.join(d, "p.c")
        exe = os.path.join(d, "p")
        open(c, "w").write(src)
        subprocess.run(["gcc", "-O0", c, "-o", exe], check=True)
        want = np.frombuffer(
            subprocess.run([exe], capture_output=True).stdout,
            np.uint8) - ord("0")
    got = glibc_rand_bits(158324, TEST_FRAME_SIZE)
    np.testing.assert_array_equal(got, want)


def _oracle_ber(raw_cu8: bytes):
    """Run `fsk_demod --cu8 -f` and parse its final cumulative BER line
    ('errs: N FSK BER x, bits tested B, bit errors E')."""
    demod = refbins.fsk_demod()
    proc = subprocess.run(
        [demod, "--cu8", "-f", "2", str(CFG.Fs), str(CFG.Rs), "-", "-"],
        input=raw_cu8, capture_output=True, check=True)
    hits = re.findall(rb"bits tested (\d+), bit errors (\d+)", proc.stderr)
    if not hits:
        return {"bits": 0, "errs": 0, "ber": 1.0}
    bits, errs = (int(x) for x in hits[-1])
    return {"bits": bits, "errs": errs, "ber": errs / max(bits, 1)}


@pytest.mark.parametrize("ebno_db", [9.0, 14.0])
def test_testframe_ber_matches_fsk_demod(ebno_db):
    iq, frame = make_testframe_capture(CFG, ebno_db, seconds=1.5)
    raw = fsk.iq_to_cu8(iq)

    ref = _oracle_ber(raw.tobytes())
    soft, _, _ = fsk.demod_iq_np(CFG, fsk.iq_from_cu8(raw))
    ours = sliding_testframe_ber((soft < 0).astype(np.uint8), frame)

    assert ours["sync_found"] and ref["bits"] > 0
    # identical counting semantics on near-identical hard bits: totals agree
    # within a couple of boundary frames, BER within measurement noise
    assert abs(ours["bits"] - ref["bits"]) <= 3 * TEST_FRAME_SIZE
    assert abs(ours["ber"] - ref["ber"]) <= max(2e-3, 0.5 * ref["ber"])
