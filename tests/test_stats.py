"""Analysis math vs independent numpy oracles."""

import numpy as np

from nerf_attention_tpu.ops.stats import (
    SPECTRAL_PERCENTS,
    autocorrelation,
    batched_autocorrelation,
    effective_rank,
    sample_dim_indices,
    spectral_energy,
)


def _autocorr_oracle(signal, max_lag=50):
    """Direct shifted-dot-product formula (reference analyze.py:20-30)."""
    n = len(signal)
    s = signal - signal.mean()
    var = (s**2).sum()
    if var < 1e-10:
        return np.zeros(max_lag + 1)
    ac = np.zeros(max_lag + 1)
    for lag in range(min(max_lag + 1, n)):
        ac[lag] = (s[: n - lag] * s[lag:]).sum() / var
    return ac


def _spectral_oracle(signal):
    windowed = (signal - signal.mean()) * np.hanning(len(signal))
    spectrum = np.abs(np.fft.rfft(windowed))
    total = (spectrum**2).sum()
    if total < 1e-10:
        return np.ones(4)
    n_freqs = len(spectrum)
    return np.array(
        [
            (spectrum[: max(1, int(n_freqs * p))] ** 2).sum() / total
            for p in SPECTRAL_PERCENTS
        ]
    )


def test_autocorrelation_matches_direct_formula(rng):
    for n in (37, 128, 1000):
        sig = rng.standard_normal(n).astype(np.float32)
        got = np.asarray(autocorrelation(sig, max_lag=50))
        want = _autocorr_oracle(sig.astype(np.float64), max_lag=50)
        np.testing.assert_allclose(got, want, atol=2e-4)
        assert got[0] == np.float32(1.0) or abs(got[0] - 1.0) < 1e-4


def test_autocorrelation_short_signal_zero_tail(rng):
    sig = rng.standard_normal(10).astype(np.float32)
    got = np.asarray(autocorrelation(sig, max_lag=50))
    # Lags >= n are exactly zero, matching the reference's loop bound.
    np.testing.assert_array_equal(got[10:], 0.0)


def test_autocorrelation_constant_signal():
    got = np.asarray(autocorrelation(np.full(64, 3.7, np.float32), max_lag=20))
    np.testing.assert_array_equal(got, np.zeros(21))


def test_autocorrelation_smooth_vs_noise(rng):
    t = np.linspace(0, 1, 512)
    smooth = np.sin(2 * np.pi * 3 * t).astype(np.float32)
    noise = rng.standard_normal(512).astype(np.float32)
    assert float(autocorrelation(smooth, 5)[1]) > 0.99
    assert abs(float(autocorrelation(noise, 5)[1])) < 0.2


def test_spectral_energy_matches_oracle(rng):
    for n in (65, 128, 501):
        sig = rng.standard_normal(n).astype(np.float32)
        got = np.asarray(spectral_energy(sig))
        want = _spectral_oracle(sig.astype(np.float64))
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_spectral_energy_low_freq_concentration():
    t = np.linspace(0, 1, 1024)
    low = np.sin(2 * np.pi * 2 * t).astype(np.float32)
    fracs = np.asarray(spectral_energy(low))
    assert fracs[0] > 0.99  # all energy in the lowest 5% of frequencies
    assert np.all(np.diff(fracs) >= -1e-6)  # monotone in percentile


def test_effective_rank_exact_low_rank(rng):
    u = rng.standard_normal((100, 3))
    v = rng.standard_normal((3, 20))
    m = (u @ v).astype(np.float32)
    stats = effective_rank(m)
    assert stats["effective_rank_99"] <= 3
    assert stats["full_rank"] == 20
    assert 0 < stats["rank_ratio"] <= 3 / 20
    assert stats["top_10_sv_fraction"] > 0.999


def test_sample_dim_indices():
    assert sample_dim_indices(128) == list(range(0, 128, 8))  # 16 dims
    assert sample_dim_indices(8) == list(range(8))
    assert sample_dim_indices(20) == list(range(0, 20, 1))  # reference quirk


def test_batched_autocorrelation_matches_single(rng):
    sigs = rng.standard_normal((5, 100)).astype(np.float32)
    batched = np.asarray(batched_autocorrelation(sigs, 10))
    for i in range(5):
        single = np.asarray(autocorrelation(sigs[i], 10))
        np.testing.assert_allclose(batched[i], single, atol=1e-5)
