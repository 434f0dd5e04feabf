"""SIREN model: init distribution, parameter counts, forward numerics."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_attention_tpu.models.siren import (
    count_parameters,
    init_siren,
    layer_dims,
    positions,
    siren_apply,
    size_bytes,
)
from nerf_attention_tpu.types import CONFIGS_FULL, SIRENConfig


def test_medium_param_count_matches_reference():
    # Reference FINDINGS.md:61-63 — medium SIREN is 164,992 fp32 params.
    config = SIRENConfig(256, 2, 30.0, "medium")
    params = init_siren(jax.random.PRNGKey(0), config, out_features=128)
    assert count_parameters(params) == 164_992
    assert config.num_parameters(128) == 164_992
    assert size_bytes(params) == 164_992 * 4


@pytest.mark.parametrize("config", CONFIGS_FULL, ids=lambda c: c.name)
def test_param_counts_consistent(config):
    params = init_siren(jax.random.PRNGKey(0), config, out_features=128)
    assert count_parameters(params) == config.num_parameters(128)
    dims = layer_dims(config, 128)
    assert len(params) == len(dims) == config.hidden_layers + 2


def test_init_bounds():
    config = SIRENConfig(64, 2, 30.0, "t")
    params = init_siren(jax.random.PRNGKey(3), config, out_features=8)
    # First sine layer: U(-1/in, 1/in) with in=1.
    w0, b0 = params[0]
    assert np.abs(w0).max() <= 1.0 and np.abs(b0).max() <= 1.0
    # Later layers: U(+-sqrt(6/in)/omega).
    for w, b in params[1:]:
        bound = math.sqrt(6.0 / w.shape[0]) / 30.0
        assert np.abs(w).max() <= bound
        assert np.abs(b).max() <= bound
    # Bounds are actually exercised (not degenerate init).
    assert np.abs(params[1][0]).max() > 0.5 * math.sqrt(6.0 / 64) / 30.0


def test_forward_matches_numpy_oracle():
    """Independent numpy evaluation of sin(w0(xW+b)) composition."""
    config = SIRENConfig(hidden_features=8, hidden_layers=1, omega_0=7.0, name="t")
    params = init_siren(jax.random.PRNGKey(11), config, out_features=3)
    x = np.linspace(0, 1, 17, dtype=np.float32)[:, None]

    h = x
    for w, b in [(np.asarray(w), np.asarray(b)) for w, b in params[:-1]]:
        h = np.sin(7.0 * (h @ w + b))
    wf, bf = np.asarray(params[-1][0]), np.asarray(params[-1][1])
    expected = h @ wf + bf

    got = np.asarray(siren_apply(params, 7.0, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_positions_contract():
    pos = np.asarray(positions(5))
    np.testing.assert_allclose(pos[:, 0], [0.0, 0.25, 0.5, 0.75, 1.0])
    assert pos.shape == (5, 1)


def test_positions_absolute_convention():
    import pytest

    # Absolute coordinates are the exact PREFIX of the final-length grid:
    # appends never move what came before.
    full = np.asarray(positions(9))
    part = np.asarray(positions(5, total_len=9))
    np.testing.assert_array_equal(part, full[:5])
    # At the final length the two conventions coincide bit-exactly.
    np.testing.assert_array_equal(np.asarray(positions(9, total_len=9)), full)
    with pytest.raises(ValueError):
        positions(9, total_len=5)


def test_forward_output_shape():
    config = SIRENConfig(32, 2, 30.0, "t")
    params = init_siren(jax.random.PRNGKey(0), config, out_features=12)
    out = siren_apply(params, 30.0, positions(64))
    assert out.shape == (64, 12)
    assert np.isfinite(np.asarray(out)).all()


def test_siren_apply_fm_variant():
    """Per-unit first-layer frequencies: mult=1 reduces exactly to the
    shared-omega forward; a spread changes the output; shapes/params equal."""
    import jax

    from nerf_attention_tpu.models.siren import (
        fm_frequency_multipliers,
        init_siren,
        positions,
        siren_apply,
        siren_apply_fm,
    )
    from nerf_attention_tpu.types import SIRENConfig

    config = SIRENConfig(16, 1, 30.0, "t")
    params = init_siren(jax.random.PRNGKey(0), config, out_features=4)
    pos = positions(32)

    base = siren_apply(params, config.omega_0, pos)
    ones = jnp.ones(16, dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(siren_apply_fm(params, config.omega_0, ones, pos)),
        np.asarray(base),
    )

    mult = fm_frequency_multipliers(16, 4.0)
    assert mult.shape == (16,) and float(mult[0]) == 1.0 and float(mult[-1]) == 4.0
    spread = siren_apply_fm(params, config.omega_0, mult, pos)
    assert spread.shape == base.shape
    assert not np.allclose(np.asarray(spread), np.asarray(base), atol=1e-4)
