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


def test_acquisition_search_finds_offset():
    """A capture tuned +30 kHz off (tones at 49.2/58.8 kHz: outside the
    estimator band [2.4k, 45.6k]) is unusable by the plain demod; the
    parallel coarse-offset search finds a candidate that locks, and mixing
    by it yields a CRC-valid packet. vmap and mesh-sharded paths agree."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from wenet_tpu.ops import fsk
    from wenet_tpu.parallel import sweep
    from wenet_tpu.parallel.mesh import make_mesh

    cfg = fsk.FSKConfig(Fs=96000, Rs=9600)
    sig, _ = sweep.make_single_packet_stream(cfg, bytes(range(256)), "v2")
    true_off = 30000.0
    n = np.arange(len(sig))
    iq = (sig * np.exp(2j * np.pi * true_off * n / cfg.Fs)).astype(np.complex64)
    rng = np.random.default_rng(0)
    iq = iq + (rng.normal(0, 0.05, (len(iq), 2)) @ [1, 1j]).astype(np.complex64)

    grid = np.arange(-40000, 40001, 5000, np.float32)
    best, scores = sweep.acquisition_search(cfg, iq, grid)
    # any candidate that brings both tones back inside the estimator band
    # can lock (off in [13.2k, 46.8k] here); the losers stay near the noise
    # floor of a 32-bit correlation
    assert 15000 <= best <= 40000, (best, scores)
    assert scores.max() >= 28
    out_of_band = scores[(grid < 13200) | (grid > 46800)]
    assert out_of_band.max() <= scores.max() - 8

    # the acquired offset is good enough for an actual decode
    nf = cfg.num_frames(len(iq))
    ph = np.mod(n * np.float64(best) / cfg.Fs, 1.0) * 2 * np.pi
    mixed = (iq * np.exp(-1j * ph)).astype(np.complex64)
    _, outs = fsk.demod_stream(cfg, jnp.asarray(mixed), nf)
    ok, _ = sweep._uw_window_decode(cfg, outs.soft.reshape(-1), "v2", 10)
    assert bool(ok)

    mesh = make_mesh(len(jax.devices()))
    best_m, scores_m = sweep.acquisition_search(cfg, iq, grid, mesh=mesh)
    assert best_m == best
    np.testing.assert_allclose(scores_m, scores, rtol=1e-5, atol=1e-4)
