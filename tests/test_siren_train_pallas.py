"""Fused training kernel parity vs XLA autodiff (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_attention_tpu.models.siren import init_siren, positions, siren_apply
from nerf_attention_tpu.ops.siren_train_pallas import siren_train_grads
from nerf_attention_tpu.parallel.sweep import (
    _fit_batch_compiled,
    normalize_targets,
)
from nerf_attention_tpu.types import CONFIGS_FULL, SIRENConfig


def _batched_params(config, n, d_out, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    return jax.vmap(lambda k: init_siren(k, config, d_out))(keys)


def _xla_loss_and_grads(params, targets_norm, omega, fm_mult=None):
    """Reference: jax autodiff of the per-fit normalized MSE."""
    from nerf_attention_tpu.models.siren import siren_apply_maybe_fm

    n, s, d = targets_norm.shape
    pos = positions(s)

    def one(p, t):
        return jnp.mean((siren_apply_maybe_fm(p, omega, fm_mult, pos) - t) ** 2)

    def total(p):
        return jnp.sum(jax.vmap(one)(p, targets_norm))

    losses = jax.vmap(one)(params, targets_norm)
    grads = jax.grad(total)(params)  # sum over fits == per-fit grads (independent)
    return losses, grads


@pytest.mark.parametrize("stash", ["act", "sincos"])
@pytest.mark.parametrize(
    "config",
    [CONFIGS_FULL[0], CONFIGS_FULL[2], CONFIGS_FULL[4]],  # tiny, medium, deep
    ids=lambda c: c.name,
)
def test_fused_grads_match_autodiff(config, stash, rng):
    n, s, d = 3, 96, 16
    targets = jnp.asarray(rng.standard_normal((n, s, d)), dtype=jnp.float32)
    targets_norm = jax.vmap(lambda t: normalize_targets(t)[0])(targets)
    params = _batched_params(config, n, d)

    loss, grads = siren_train_grads(
        params, targets_norm, omega=config.omega_0, interpret=True, stash=stash
    )
    want_loss, want_grads = _xla_loss_and_grads(params, targets_norm, config.omega_0)

    np.testing.assert_allclose(loss, want_loss, rtol=1e-5, atol=1e-6)
    for (gw, gb), (ww, wb) in zip(grads, want_grads):
        np.testing.assert_allclose(gw, ww, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(gb, wb, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("stash", ["act", "sincos"])
@pytest.mark.parametrize(
    "config",
    [CONFIGS_FULL[0], CONFIGS_FULL[2], CONFIGS_FULL[4]],  # tiny, medium, deep
    ids=lambda c: c.name,
)
def test_fused_fm_grads_match_autodiff(config, stash, rng):
    """FM-SIREN in-kernel (VERDICT r3 #1): per-unit first-layer frequencies.

    The kernel takes the exact fm_frequency_multipliers row the XLA forward
    derives, so the oracle is jax autodiff of siren_apply_maybe_fm — same
    tolerance family as the plain-SIREN parity test.
    """
    fm_mult = 64.0
    n, s, d = 3, 96, 16
    targets = jnp.asarray(rng.standard_normal((n, s, d)), dtype=jnp.float32)
    targets_norm = jax.vmap(lambda t: normalize_targets(t)[0])(targets)
    params = _batched_params(config, n, d)

    loss, grads = siren_train_grads(
        params, targets_norm, omega=config.omega_0, interpret=True,
        stash=stash, fm_mult=fm_mult,
    )
    want_loss, want_grads = _xla_loss_and_grads(
        params, targets_norm, config.omega_0, fm_mult=fm_mult
    )

    np.testing.assert_allclose(loss, want_loss, rtol=1e-5, atol=1e-6)
    # Gradient atol scales with the frequency spread: da_0 carries a factor
    # omega*mult_i (up to 64x the plain kernel), so fp32 cancellation noise
    # in the dW sums is ~fm_mult larger at identical math (measured 4.3e-5
    # max abs on tiny; the plain-SIREN test's 1e-6 atol scaled by 64 = 6e-5).
    for (gw, gb), (ww, wb) in zip(grads, want_grads):
        np.testing.assert_allclose(gw, ww, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(gb, wb, rtol=1e-3, atol=1e-4)


def test_fused_fm_differs_from_plain(rng):
    """fm_mult must actually change the computation (guards against the
    multiplier operand being silently dropped)."""
    config = CONFIGS_FULL[0]
    n, s, d = 2, 64, 8
    targets_norm = jnp.asarray(rng.standard_normal((n, s, d)), dtype=jnp.float32)
    params = _batched_params(config, n, d)
    loss_fm, _ = siren_train_grads(
        params, targets_norm, omega=config.omega_0, interpret=True, fm_mult=64.0
    )
    loss_plain, _ = siren_train_grads(
        params, targets_norm, omega=config.omega_0, interpret=True
    )
    assert not np.allclose(loss_fm, loss_plain, atol=1e-6)


def test_pallas_fm_training_path_matches_xla_quality(rng):
    """Full short FM training run: fused path lands at the XLA-FM optimum
    (the r3 verdict's 'quality flagship on the perf flagship path')."""
    config = SIRENConfig(32, 1, 30.0, "t32")
    n, s, d = 2, 64, 8
    t = np.linspace(0, 1, s, dtype=np.float32)[:, None]
    targets = jnp.asarray(
        np.stack([np.sin(2 * np.pi * (i + 2) * t) * np.ones((1, d), np.float32)
                  for i in range(n)])
    )
    keys = jax.random.split(jax.random.PRNGKey(0), n)

    _, m_xla = _fit_batch_compiled(
        keys, targets, config=config, epochs=150, lr=1e-4, impl="xla",
        fm_mult=8.0,
    )
    _, m_pal = _fit_batch_compiled(
        keys, targets, config=config, epochs=150, lr=1e-4, impl="pallas",
        fm_mult=8.0,
    )

    np.testing.assert_allclose(
        m_pal["cosine_mean"], m_xla["cosine_mean"], atol=2e-3
    )
    np.testing.assert_allclose(m_pal["losses"], m_xla["losses"], rtol=1e-3, atol=1e-5)


def test_fused_grads_rejects_unknown_options(rng):
    """stash/sin_impl typos must error, not silently fall back to a layout."""
    config = CONFIGS_FULL[0]
    n, s, d = 2, 32, 8
    targets_norm = jnp.asarray(rng.standard_normal((n, s, d)), dtype=jnp.float32)
    params = _batched_params(config, n, d)
    with pytest.raises(ValueError, match="stash"):
        siren_train_grads(
            params, targets_norm, omega=30.0, interpret=True, stash="sin_cos"
        )
    with pytest.raises(ValueError, match="sin_impl"):
        siren_train_grads(
            params, targets_norm, omega=30.0, interpret=True, sin_impl="poly"
        )


@pytest.mark.parametrize(
    "config",
    [CONFIGS_FULL[2], CONFIGS_FULL[4]],  # medium, deep
    ids=lambda c: c.name,
)
def test_fused_fast_sine_grads_match_autodiff(config, rng):
    """sin_impl='fast' in-kernel: polynomial error stays below fp32 noise."""
    n, s, d = 3, 96, 16
    targets = jnp.asarray(rng.standard_normal((n, s, d)), dtype=jnp.float32)
    targets_norm = jax.vmap(lambda t: normalize_targets(t)[0])(targets)
    params = _batched_params(config, n, d)

    loss, grads = siren_train_grads(
        params, targets_norm, omega=config.omega_0, interpret=True,
        sin_impl="fast",
    )
    want_loss, want_grads = _xla_loss_and_grads(params, targets_norm, config.omega_0)

    # Poly abs error 2.4e-7 per sine compounds through layers: tolerances one
    # order looser than the exact-kernel test, still far below training noise.
    np.testing.assert_allclose(loss, want_loss, rtol=1e-4, atol=1e-5)
    for (gw, gb), (ww, wb) in zip(grads, want_grads):
        np.testing.assert_allclose(gw, ww, rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(gb, wb, rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize(
    "config",
    [CONFIGS_FULL[2], CONFIGS_FULL[4]],  # medium, deep
    ids=lambda c: c.name,
)
def test_fused_bf16_mxu_grads_near_autodiff(config, rng):
    """mxu='bf16' rounds only the dot operands (fp32 accumulate): gradients
    must track the fp32 oracle within bf16 input-rounding noise (~2^-8
    relative), far tighter than full-bf16 training error."""
    n, s, d = 3, 96, 16
    targets = jnp.asarray(rng.standard_normal((n, s, d)), dtype=jnp.float32)
    targets_norm = jax.vmap(lambda t: normalize_targets(t)[0])(targets)
    params = _batched_params(config, n, d)

    loss, grads = siren_train_grads(
        params, targets_norm, omega=config.omega_0, interpret=True,
        sin_impl="fast", mxu="bf16",
    )
    want_loss, want_grads = _xla_loss_and_grads(params, targets_norm, config.omega_0)

    np.testing.assert_allclose(loss, want_loss, rtol=5e-2, atol=1e-3)
    for (gw, gb), (ww, wb) in zip(grads, want_grads):
        np.testing.assert_allclose(gw, ww, rtol=0.15, atol=2e-3)
        np.testing.assert_allclose(gb, wb, rtol=0.15, atol=2e-3)

    with pytest.raises(ValueError, match="mxu"):
        siren_train_grads(
            params, targets_norm, omega=config.omega_0, interpret=True,
            mxu="fp16",
        )


def test_fused_grads_padding_masked(rng):
    """Sequence not a multiple of the tile: padded rows must not leak."""
    config = SIRENConfig(32, 1, 30.0, "t32")
    n, s, d = 2, 77, 8  # tile rounds to a non-multiple of 77
    targets = jnp.asarray(rng.standard_normal((n, s, d)), dtype=jnp.float32)
    targets_norm = jax.vmap(lambda t: normalize_targets(t)[0])(targets)
    params = _batched_params(config, n, d)

    loss, grads = siren_train_grads(
        params, targets_norm, omega=30.0, interpret=True, tile=32
    )
    want_loss, want_grads = _xla_loss_and_grads(params, targets_norm, 30.0)
    np.testing.assert_allclose(loss, want_loss, rtol=1e-5, atol=1e-6)
    for (gw, gb), (ww, wb) in zip(grads, want_grads):
        np.testing.assert_allclose(gw, ww, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(gb, wb, rtol=1e-4, atol=1e-6)


def test_pallas_training_path_matches_xla_quality(rng):
    """Full short training run: fused path lands at the same optimum."""
    config = SIRENConfig(32, 1, 30.0, "t32")
    n, s, d = 2, 64, 8
    t = np.linspace(0, 1, s, dtype=np.float32)[:, None]
    targets = jnp.asarray(
        np.stack([np.sin(2 * np.pi * (i + 2) * t) * np.ones((1, d), np.float32)
                  for i in range(n)])
    )
    keys = jax.random.split(jax.random.PRNGKey(0), n)

    _, m_xla = _fit_batch_compiled(keys, targets, config=config, epochs=150, lr=1e-4, impl="xla")
    _, m_pal = _fit_batch_compiled(keys, targets, config=config, epochs=150, lr=1e-4, impl="pallas")

    np.testing.assert_allclose(
        m_pal["cosine_mean"], m_xla["cosine_mean"], atol=2e-3
    )
    np.testing.assert_allclose(m_pal["losses"], m_xla["losses"], rtol=1e-3, atol=1e-5)
    assert m_pal["losses"].shape == (n, 150)
