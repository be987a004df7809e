"""Monte-Carlo sweep tests on the 8-device virtual CPU mesh."""
import numpy as np

from wenet_tpu import parallel
from wenet_tpu.ops import fsk
from wenet_tpu.parallel import sweep

CFG = fsk.FSKConfig(Fs=96000, Rs=9600)


def test_ldpc_ber_sweep_single():
    r = sweep.ldpc_ber_sweep([3.0, 8.0], n_cw_per_point=16)
    assert r["fer"][0] > r["fer"][1]
    assert r["fer"][1] == 0.0          # 8 dB is well past the cliff
    assert r["ber"][1] == 0.0


def test_ldpc_ber_sweep_sharded_matches_semantics():
    mesh = parallel.make_mesh(8)
    r = sweep.ldpc_ber_sweep([8.0], n_cw_per_point=32, mesh=mesh)
    assert r["n_codewords"] == 32
    assert r["fer"][0] == 0.0


def test_chain_per_sweep_cliff():
    """Full on-device chain shows the PER cliff: ~1 at low Eb/N0, ~0 high."""
    r = sweep.chain_per_sweep(CFG, [4.0, 20.0], trials_per_point=4)
    assert r["per"][0] == 1.0
    assert r["per"][1] == 0.0


def test_chain_per_sweep_sharded():
    mesh = parallel.make_mesh(8)
    r = sweep.chain_per_sweep(CFG, [20.0], trials_per_point=8, mesh=mesh)
    assert r["per"][0] == 0.0
