"""Shared-basis SIREN (`models/siren_shared.py`).

The amortized trunk is a new architecture, so the tests pin its contract
to the per-unit trainer it must be comparable against: init distribution
(a 1-unit group IS a SIREN), byte accounting, the frozen-trunk regime
(only heads move), and that a shared fit actually learns (cosine well
above init on a structured target).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from nerf_attention_tpu.models.siren import (
    init_siren,
    positions,
    siren_apply,
)
from nerf_attention_tpu.models.siren_shared import (
    fit_shared_batch,
    init_shared,
    shared_apply,
    shared_bytes_per_unit,
    shared_param_counts,
    trunk_apply,
)
from nerf_attention_tpu.types import CONFIGS_BY_NAME


def _targets(n_units=4, s=128, d=16, seed=0):
    """Smooth per-unit signals a tiny net can learn in few epochs."""
    rng = np.random.RandomState(seed)
    t = np.linspace(0, 1, s)[None, :, None]
    freq = rng.uniform(1, 4, (n_units, 1, d))
    phase = rng.uniform(0, 2 * np.pi, (n_units, 1, d))
    return np.sin(2 * np.pi * freq * t + phase).astype(np.float32)


def test_single_unit_group_matches_siren_shapes_and_init():
    """U=1 shared params are layer-for-layer a plain SIREN: same shapes,
    same init bounds (both are uniform; compare supports)."""
    cfg = CONFIGS_BY_NAME["small"]
    d = 16
    params = init_shared(jax.random.PRNGKey(0), cfg, d, 1)
    plain = init_siren(jax.random.PRNGKey(0), cfg, d)
    assert len(params["trunk"]) == len(plain) - 1
    for (w, b), (pw, pb) in zip(params["trunk"], plain[:-1]):
        assert w.shape == pw.shape and b.shape == pb.shape
        assert float(jnp.abs(w).max()) <= float(jnp.abs(pw).max()) * 1.2 + 1e-6
    hw, hb = params["heads"]
    assert hw.shape == (1, cfg.hidden_features, d)
    assert hb.shape == (1, d)
    # final-layer bound: sqrt(6/h)/omega, same as the plain net's last layer
    bound = np.sqrt(6.0 / cfg.hidden_features) / cfg.omega_0
    assert float(jnp.abs(hw).max()) <= bound
    assert float(jnp.abs(plain[-1][0]).max()) <= bound


def test_shared_apply_is_trunk_plus_per_unit_linear():
    cfg = CONFIGS_BY_NAME["tiny"]
    d, u, s = 8, 3, 32
    params = init_shared(jax.random.PRNGKey(1), cfg, d, u)
    x = positions(s)
    out = shared_apply(params, cfg.omega_0, x)
    assert out.shape == (u, s, d)
    feats = trunk_apply(params["trunk"], cfg.omega_0, x)
    w, b = params["heads"]
    for i in range(u):
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(feats @ w[i] + b[i]),
            rtol=1e-5, atol=1e-6,
        )
    # U=1 with heads grafted onto a plain SIREN's final layer == siren_apply
    plain = init_siren(jax.random.PRNGKey(2), cfg, d)
    grafted = {
        "trunk": plain[:-1],
        "heads": (plain[-1][0][None], plain[-1][1][None]),
    }
    np.testing.assert_allclose(
        np.asarray(shared_apply(grafted, cfg.omega_0, x)[0]),
        np.asarray(siren_apply(plain, cfg.omega_0, x)),
        rtol=1e-5, atol=1e-6,
    )


def test_byte_accounting_amortizes_trunk():
    cfg = CONFIGS_BY_NAME["small"]
    d = 16
    p1 = init_shared(jax.random.PRNGKey(0), cfg, d, 1)
    p8 = init_shared(jax.random.PRNGKey(0), cfg, d, 8)
    c = shared_param_counts(p8)
    h = cfg.hidden_features
    assert c["heads_per_unit"] == h * d + d
    assert c["trunk"] == (1 * h + h) + cfg.hidden_layers * (h * h + h)
    # trainable trunk: per-unit bytes shrink as the group grows
    assert shared_bytes_per_unit(p8, frozen_trunk=False) < (
        shared_bytes_per_unit(p1, frozen_trunk=False)
    )
    # frozen trunk: per-unit bytes are the head alone, group-size free
    assert shared_bytes_per_unit(p8, frozen_trunk=True) == (
        c["heads_per_unit"] * 2.0
    )
    assert shared_bytes_per_unit(p1, frozen_trunk=True) == (
        c["heads_per_unit"] * 2.0
    )


def test_fit_shared_learns_and_frozen_trunk_stays_frozen():
    cfg = CONFIGS_BY_NAME["tiny"]
    targets = _targets(n_units=4, s=128, d=8)
    fit = fit_shared_batch(targets, cfg, epochs=300, seed=0)
    assert fit.cosine_mean.shape == (4,)
    assert float(fit.cosine_mean.mean()) > 0.8
    assert fit.losses.shape == (300,)
    assert fit.losses[-1] < fit.losses[0]

    frozen = fit_shared_batch(
        targets, cfg, epochs=300, seed=0, trainable_trunk=False
    )
    init_p = init_shared(
        jax.random.PRNGKey(0), cfg, 8, 4, jnp.float32
    )
    for (w, b), (iw, ib) in zip(frozen.params["trunk"], init_p["trunk"]):
        np.testing.assert_array_equal(w, np.asarray(iw))
        np.testing.assert_array_equal(b, np.asarray(ib))
    # heads did train, and random features still fit smooth signals
    assert float(frozen.cosine_mean.mean()) > 0.5
    # the trained trunk should do at least as well as the frozen one here
    assert float(fit.cosine_mean.mean()) >= float(frozen.cosine_mean.mean()) - 0.05
