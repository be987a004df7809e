"""Channel models / fault injection for self-contained Monte-Carlo testing.

Reproduces the benchmarking corpus transforms the reference applies with
external tools (benchmarking/generate_lowsnr.py, test_demod.py:71-73):

  * calibrated AWGN at a target Eb/N0 given the capture's signal variance
    (generate_lowsnr.add_noise: noise_var = var*Fs/(Rs*EbNo*bits/sym))
  * frequency shift (csdr shift_addition_cc equivalent — complex mixer)
  * sample-rate error (tsrc equivalent — linear-interpolation resampler),
    the baud-error robustness sweep of benchmarking/README.md:94-172

numpy host versions for corpus generation + JAX versions for on-device
Monte-Carlo sweeps.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def signal_variance(iq: np.ndarray, threshold_db: float = -100.0) -> float:
    """Variance of samples above a power threshold
    (generate_lowsnr.calculate_variance)."""
    iq = np.asarray(iq)
    p = 20 * np.log10(np.abs(iq) + 1e-30)
    return float(np.var(iq[p > threshold_db]))


def add_awgn(iq: np.ndarray, ebno_db: float, Fs: int, Rs: int,
             variance: float | None = None, bits_per_symbol: float = 1.0,
             normalise: bool = True, rng=None) -> np.ndarray:
    """Calibrated AWGN (generate_lowsnr.add_noise semantics)."""
    rng = np.random.default_rng() if rng is None else rng
    var = signal_variance(iq) if variance is None else variance
    ebno = 10.0 ** (ebno_db / 10.0)
    nvar = var * Fs / (Rs * ebno * bits_per_symbol)
    n = (rng.standard_normal(len(iq)) + 1j * rng.standard_normal(len(iq)))
    noisy = iq + np.sqrt(nvar / 2.0) * n
    if normalise:
        noisy = noisy / np.max(np.abs(noisy))
    return noisy.astype(np.complex64)


def freq_shift(iq: np.ndarray, shift_hz: float, Fs: int) -> np.ndarray:
    """Mix by exp(j 2 pi shift t) (csdr shift_addition_cc)."""
    n = np.arange(len(iq), dtype=np.float64)
    return (np.asarray(iq) * np.exp(2j * np.pi * shift_hz * n / Fs)).astype(np.complex64)


def resample_linear(iq: np.ndarray, ratio: float) -> np.ndarray:
    """Resample by `ratio` (output rate = input rate * ratio) with linear
    interpolation — the baud-rate-error fault injection (tsrc equivalent)."""
    iq = np.asarray(iq)
    n_out = int(len(iq) * ratio)
    t = np.arange(n_out, dtype=np.float64) / ratio
    i0 = np.minimum(t.astype(np.int64), len(iq) - 2)
    frac = t - i0
    return ((1 - frac) * iq[i0] + frac * iq[i0 + 1]).astype(np.complex64)


# ------------------------------------------------------------ JAX versions


def add_awgn_jax(key, iq: jnp.ndarray, ebno_db, Fs: int, Rs: int,
                 variance, bits_per_symbol: float = 1.0) -> jnp.ndarray:
    """Device AWGN for Monte-Carlo sweeps; ebno_db may be batched (leading
    axes broadcast against iq's)."""
    ebno = 10.0 ** (jnp.asarray(ebno_db, jnp.float32) / 10.0)
    nvar = variance * Fs / (Rs * ebno * bits_per_symbol)
    shape = jnp.broadcast_shapes(jnp.shape(nvar) + (1,), iq.shape)
    n = jax.random.normal(key, shape + (2,), jnp.float32)
    noise = jax.lax.complex(n[..., 0], n[..., 1])
    scaled = jnp.sqrt(nvar / 2.0)[..., None] if jnp.ndim(nvar) else jnp.sqrt(nvar / 2.0)
    noisy = iq + scaled * noise
    peak = jnp.max(jnp.abs(noisy), axis=-1, keepdims=True)
    return (noisy / peak).astype(jnp.complex64)


def freq_shift_jax(iq: jnp.ndarray, shift_hz, Fs: int) -> jnp.ndarray:
    n = jnp.arange(iq.shape[-1], dtype=jnp.float32)
    ang = 2 * jnp.pi * jnp.asarray(shift_hz, jnp.float32)[..., None] * n / Fs \
        if jnp.ndim(shift_hz) else 2 * jnp.pi * shift_hz * n / Fs
    return iq * jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
