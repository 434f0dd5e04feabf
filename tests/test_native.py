"""Native C++ generator: RNG bit-parity and signal parity vs pure numpy."""

import ctypes

import numpy as np
import pytest

from nerf_attention_tpu.native import load_synthkv
from nerf_attention_tpu.synthetic import _head_signals, _head_signals_native

lib = load_synthkv()
needs_native = pytest.mark.skipif(lib is None, reason="no C++ toolchain")


@needs_native
def test_rng_doubles_bit_identical():
    n = 1000
    out = np.empty(n, dtype=np.float64)
    lib.rng_doubles(42, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    np.testing.assert_array_equal(out, np.random.RandomState(42).random_sample(n))


@needs_native
@pytest.mark.parametrize("lo,hi", [(0, 2048), (1, 5), (0, 7), (3, 4)])
def test_rng_randints_bit_identical(lo, hi):
    n = 500
    out = np.empty(n, dtype=np.int64)
    lib.rng_randints(
        123, lo, hi, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_long))
    )
    np.testing.assert_array_equal(
        out, np.random.RandomState(123).randint(lo, hi, size=n)
    )


@needs_native
def test_rng_gauss_bit_identical():
    n = 1001  # odd: exercises the polar-method cache across the boundary
    out = np.empty(n, dtype=np.float64)
    lib.rng_gauss(7, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    np.testing.assert_array_equal(out, np.random.RandomState(7).randn(n))


@needs_native
@pytest.mark.parametrize("seed,sharp", [(0, 1.0), (13, 2.2), (255, 3.0)])
def test_head_signals_parity(seed, sharp):
    """Assembled signals match numpy to float32 resolution (libm vs numpy's
    vectorized sin/cos may differ by <=1 ulp in float64 before the cast)."""
    seq_len, head_dim = 257, 24
    k_c, v_c = _head_signals_native(lib, seed, seq_len, head_dim, sharp)
    t = np.linspace(0, 1, seq_len)
    rng = np.random.RandomState(seed)
    k_py, v_py = _head_signals(rng, t, head_dim, sharp)
    np.testing.assert_allclose(k_c, k_py, rtol=0, atol=2e-6)
    np.testing.assert_allclose(v_c, v_py, rtol=0, atol=2e-6)
    # The RNG consumption must be identical too: spike positions are integers,
    # so any drift would misplace whole bumps, far beyond the tolerance above.


@needs_native
def test_generate_uses_native_and_matches_python(tmp_path, monkeypatch):
    from nerf_attention_tpu.io import kvstore
    from nerf_attention_tpu.synthetic import generate_synthetic_kv

    generate_synthetic_kv(
        seq_len=64, num_layers=2, num_kv_heads=2, head_dim=8,
        output_dir=tmp_path / "native", verbose=False,
    )
    monkeypatch.setenv("NERF_ATTENTION_NO_NATIVE", "1")
    import nerf_attention_tpu.native as native_mod

    monkeypatch.setattr(native_mod, "_lib", None)
    monkeypatch.setattr(native_mod, "_tried", False)
    generate_synthetic_kv(
        seq_len=64, num_layers=2, num_kv_heads=2, head_dim=8,
        output_dir=tmp_path / "python", verbose=False,
    )
    monkeypatch.setattr(native_mod, "_tried", False)

    for layer in (0, 1):
        k_n, v_n = kvstore.load_layer(tmp_path / "native", layer)
        k_p, v_p = kvstore.load_layer(tmp_path / "python", layer)
        np.testing.assert_allclose(k_n, k_p, rtol=0, atol=2e-6)
        np.testing.assert_allclose(v_n, v_p, rtol=0, atol=2e-6)


@needs_native
@pytest.mark.parametrize("seed,sharp", [(1_000_003, 1.0), (1_000_042, 2.6)])
def test_hard_values_parity(seed, sharp):
    """Native hard-mode values match numpy draw-for-draw (float32 slack)."""
    from nerf_attention_tpu.synthetic import _hard_values

    seq_len, head_dim = 193, 16
    # Any depth-graded / content-scaled values; parity must hold for all.
    carrier_amp, noise_amp = 0.37, 0.27
    v_c = np.empty((seq_len, head_dim), dtype=np.float32)
    lib.synth_hard_values(
        seed, seq_len, head_dim, sharp, carrier_amp, noise_amp,
        v_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    t = np.linspace(0, 1, seq_len)
    v_py = _hard_values(
        np.random.RandomState(seed), t, head_dim, sharp, carrier_amp, noise_amp
    )
    np.testing.assert_allclose(v_c, v_py, rtol=0, atol=2e-6)


@needs_native
def test_generate_hard_uses_native_and_matches_python(tmp_path, monkeypatch):
    from nerf_attention_tpu.io import kvstore
    from nerf_attention_tpu.synthetic import generate_synthetic_kv

    native_dir, python_dir = tmp_path / "native", tmp_path / "python"
    generate_synthetic_kv(
        seq_len=96, num_layers=2, num_kv_heads=2, head_dim=4,
        output_dir=native_dir, verbose=False, values_mode="hard",
    )
    monkeypatch.setenv("NERF_ATTENTION_NO_NATIVE", "1")
    import nerf_attention_tpu.native as native_mod

    monkeypatch.setattr(native_mod, "_lib", None)
    monkeypatch.setattr(native_mod, "_tried", False)
    generate_synthetic_kv(
        seq_len=96, num_layers=2, num_kv_heads=2, head_dim=4,
        output_dir=python_dir, verbose=False, values_mode="hard",
    )
    for layer in range(2):
        k_n, v_n = kvstore.load_layer(native_dir, layer)
        k_p, v_p = kvstore.load_layer(python_dir, layer)
        np.testing.assert_allclose(k_n, k_p, rtol=0, atol=2e-6)
        np.testing.assert_allclose(v_n, v_p, rtol=0, atol=2e-6)
