"""Structure-analysis math: autocorrelation, spectral energy, effective rank.

Semantics match the reference's numpy/torch implementations
(`/root/reference/nerf_attention/analyze.py:20-58`) but are expressed as
jittable, vmappable jax.numpy — autocorrelation is computed with one
zero-padded rFFT per signal (O(n log n), exactly equal to the reference's
O(n*lags) shifted-dot-product loop), and the SVD runs through XLA.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

SPECTRAL_PERCENTS = (0.05, 0.10, 0.25, 0.50)


def _next_pow2(n: int) -> int:
    return 1 << (2 * n - 1).bit_length()


@partial(jax.jit, static_argnames=("max_lag",))
def autocorrelation(signal: jax.Array, max_lag: int = 50) -> jax.Array:
    """Mean-centered, variance-normalized autocorrelation for lags 0..max_lag.

    ac[l] = sum(s[:n-l] * s[l:]) / sum(s^2) after centering — evaluated via
    the Wiener-Khinchin identity on a zero-padded FFT. Lags >= n are zero, as
    in the reference (its loop stops at n). Near-constant signals return all
    zeros (variance < 1e-10 guard, analyze.py:24-25).
    """
    n = signal.shape[-1]
    s = signal - jnp.mean(signal, axis=-1, keepdims=True)
    var = jnp.sum(s**2, axis=-1, keepdims=True)

    nfft = _next_pow2(n)  # >= 2n: linear (non-circular) correlation
    spec = jnp.fft.rfft(s, n=nfft, axis=-1)
    corr = jnp.fft.irfft(spec * jnp.conj(spec), n=nfft, axis=-1)[..., : max_lag + 1]
    if corr.shape[-1] < max_lag + 1:  # short signal: lags >= n are zero anyway
        pad = [(0, 0)] * (corr.ndim - 1) + [(0, max_lag + 1 - corr.shape[-1])]
        corr = jnp.pad(corr, pad)
    ac = jnp.where(var < 1e-10, 0.0, corr / jnp.maximum(var, 1e-30))
    # Zero out lags beyond the signal (fp residue from the FFT round-trip).
    lag_ids = jnp.arange(max_lag + 1)
    return jnp.where(lag_ids < n, ac, 0.0)


@jax.jit
def spectral_energy(signal: jax.Array) -> jax.Array:
    """Energy fraction in the lowest {5, 10, 25, 50}% of frequencies.

    Hann-windowed after mean removal, |rfft|^2 accumulation
    (reference analyze.py:33-44). Returns a (4,) array ordered as
    SPECTRAL_PERCENTS; degenerate (silent) signals return all ones.
    """
    n = signal.shape[-1]
    k = jnp.arange(n)
    hann = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * k / max(n - 1, 1))  # np.hanning
    windowed = (signal - jnp.mean(signal, axis=-1, keepdims=True)) * hann
    power = jnp.abs(jnp.fft.rfft(windowed, axis=-1)) ** 2
    total = jnp.sum(power, axis=-1)

    n_freqs = power.shape[-1]
    fracs = []
    for pct in SPECTRAL_PERCENTS:
        cutoff = max(1, int(n_freqs * pct))
        fracs.append(jnp.sum(power[..., :cutoff], axis=-1))
    fracs = jnp.stack(fracs, axis=-1)
    return jnp.where(total[..., None] < 1e-10, 1.0, fracs / jnp.maximum(total[..., None], 1e-30))


def effective_rank(matrix: jax.Array, threshold: float = 0.99) -> dict[str, float]:
    """Singular-value concentration stats (reference analyze.py:47-58).

    rank = number of leading singular values needed to reach ``threshold`` of
    their sum, computed as count(cumsum < threshold*total) + 1.
    """
    s = np.asarray(jnp.linalg.svd(matrix, compute_uv=False))
    total = s.sum()
    cumulative = np.cumsum(s)
    rank = int((cumulative < threshold * total).sum()) + 1
    return {
        "effective_rank_99": rank,
        "full_rank": len(s),
        "rank_ratio": rank / len(s),
        "top_sv_fraction": float(s[0] / total),
        "top_10_sv_fraction": float(s[:10].sum() / total) if len(s) >= 10 else 1.0,
    }


def sample_dim_indices(d_head: int, max_dims: int = 16) -> list[int]:
    """Evenly sample up to ~max_dims dimensions (reference analyze.py:62-64)."""
    dims_to_sample = min(d_head, max_dims)
    return list(range(0, d_head, max(1, d_head // dims_to_sample)))


@partial(jax.jit, static_argnames=("max_lag",))
def batched_autocorrelation(signals: jax.Array, max_lag: int = 50) -> jax.Array:
    """(K, S) signals -> (K, max_lag+1) autocorrelations in one XLA call."""
    return jax.vmap(lambda s: autocorrelation(s, max_lag))(signals)


@jax.jit
def batched_spectral_energy(signals: jax.Array) -> jax.Array:
    """(K, S) signals -> (K, 4) low-frequency energy fractions."""
    return jax.vmap(spectral_energy)(signals)
