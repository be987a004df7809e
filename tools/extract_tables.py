#!/usr/bin/env python
"""Extract wire-format constant tables from the reference tree into .npz data.

These are *data* constants of the Wenet on-air format (the H2064_516 LDPC
parity-check matrix and the RAND million-random-digits scrambler sequence).
They must be numerically identical for wire interop; we store them as packed
numpy archives under wenet_tpu/core/data/.

Sources (reference, read-only):
  /root/reference/src/H2064_516_sparse.h   (H_rows 516x12 col-major, H_cols 2064x3 col-major)
  /root/reference/tx/Hrow2064.txt          (H_rows 516x12 row-major, encoder order)
  /root/reference/src/wenet_scramble.h     (1000-entry +/-1 descramble sequence)

Run once:  python tools/extract_tables.py
"""
import re
import numpy as np
import os

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "wenet_tpu", "core", "data")

NUMBERPARITYBITS = 516
MAX_ROW_WEIGHT = 12
CODELENGTH = 2580
NUMBERROWSHCOLS = 2064
MAX_COL_WEIGHT = 3


def ints_between(text, start_marker, end_marker):
    seg = text.split(start_marker, 1)[1].split(end_marker, 1)[0]
    return np.array([int(x) for x in re.findall(r"-?\d+", seg)], dtype=np.int64)


def main():
    src = open(os.path.join(REF, "src", "H2064_516_sparse.h")).read()
    h_rows = ints_between(src, "uint16_t H_rows[] = {", "};")
    h_cols = ints_between(src, "uint16_t H_cols[] = {", "};")
    assert h_rows.size == NUMBERPARITYBITS * MAX_ROW_WEIGHT, h_rows.size
    assert h_cols.size == NUMBERROWSHCOLS * MAX_COL_WEIGHT, h_cols.size
    # column-major in the C header: element [i + j*516] is (row i, slot j)
    H_rows = h_rows.reshape(MAX_ROW_WEIGHT, NUMBERPARITYBITS).T.astype(np.int32)
    H_cols = h_cols.reshape(MAX_COL_WEIGHT, NUMBERROWSHCOLS).T.astype(np.int32)

    # encoder-order copy (row-major), sanity check vs sparse header
    enc = open(os.path.join(REF, "tx", "Hrow2064.txt")).read()
    enc_rows = np.array([int(x) for x in re.findall(r"\d+", enc)], dtype=np.int64)
    assert enc_rows.size == NUMBERPARITYBITS * MAX_ROW_WEIGHT
    Enc_rows = enc_rows.reshape(NUMBERPARITYBITS, MAX_ROW_WEIGHT).astype(np.int32)
    # The two tables describe the same code; verify sets per row match.
    same = all(
        sorted(Enc_rows[i].tolist()) == sorted(H_rows[i].tolist())
        for i in range(NUMBERPARITYBITS)
    )
    print("Hrow2064.txt consistent with H2064_516_sparse.h:", same)

    scr = open(os.path.join(REF, "src", "wenet_scramble.h")).read()
    scramble = ints_between(scr, "double scramble_code[] = {", "};").astype(np.int8)
    assert scramble.size == 1000
    assert set(np.unique(scramble)) <= {-1, 1}

    # TX-side XOR byte table is derivable: on-air bit k of byte b is the MSB-first
    # bit, and scramble[k] == -1 means "invert".  Reconstruct the 125-byte XOR table.
    bits = (scramble == -1).astype(np.uint8).reshape(125, 8)
    tx_xor = np.packbits(bits, axis=1).reshape(125)

    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(
        os.path.join(OUT, "h2064_516.npz"),
        H_rows=H_rows,          # (516, 12) 1-based var indices, 0 = unused slot
        H_cols=H_cols,          # (2064, 3) 1-based check indices, 0 = unused slot
        Enc_rows=Enc_rows,      # (516, 12) encoder tap order (row-major source)
    )
    np.savez_compressed(
        os.path.join(OUT, "scramble.npz"),
        scramble_pm1=scramble,  # (1000,) +/-1 RX descramble multipliers
        tx_xor=tx_xor,          # (125,) TX byte XOR table
    )
    print("wrote", OUT)


if __name__ == "__main__":
    main()
