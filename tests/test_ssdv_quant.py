"""Lock the SSDV quality ladder's quantisation tables to libjpeg.

The one piece of the SSDV format not verifiable against a real fsphil/ssdv
binary in this sandbox is the quality-level -> quantisation-table mapping
(ssdv/codec.py QUALITY_LADDER + quant_tables).  fsphil's encoder uses
libjpeg's `jpeg_set_quality` convention (scale = q<50 ? 5000/q : 200-2q
applied to the Annex K base tables, force_baseline clamping to 1..255).
PIL links libjpeg, so encoding any image at quality q and parsing the DQT
segments out of the produced file yields libjpeg's ground-truth tables —
this test derives them for all 8 ladder qualities and requires
`quant_tables()` to match byte-for-byte (VERDICT r3 next-step #3).
"""
import io

import numpy as np
import pytest

from wenet_tpu.ssdv import codec
from wenet_tpu.ssdv import jpeg as J

PIL = pytest.importorskip("PIL.Image")


def _libjpeg_tables(quality: int):
    """Ground-truth DQT tables (zigzag order) from a PIL/libjpeg encode."""
    img = PIL.fromarray(
        np.random.default_rng(0).integers(0, 255, (16, 16, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=quality)
    parsed = J.parse_jpeg(buf.getvalue())
    # table 0 = luminance, table 1 = chrominance (PIL default layout)
    return parsed.qtables[0], parsed.qtables[1]


@pytest.mark.parametrize("idx", range(8))
def test_quality_ladder_matches_libjpeg(idx):
    q = codec.QUALITY_LADDER[idx]
    lum_ref, chr_ref = _libjpeg_tables(q)
    lum, chr_ = codec.quant_tables(idx)
    np.testing.assert_array_equal(lum, lum_ref,
                                  err_msg=f"lum table mismatch at q={q}")
    np.testing.assert_array_equal(chr_, chr_ref,
                                  err_msg=f"chr table mismatch at q={q}")


def test_pil_tables_are_annex_k_at_q50():
    """Sanity: at q=50 libjpeg emits the unscaled Annex K base tables,
    i.e. the constants ssdv/codec.py carries are themselves correct."""
    lum_ref, chr_ref = _libjpeg_tables(50)
    np.testing.assert_array_equal(np.asarray(lum_ref), codec._BASE_LUM)
    np.testing.assert_array_equal(np.asarray(chr_ref), codec._BASE_CHR)
