"""Shared-basis SIREN: one sinusoidal trunk serving MANY units.

Beyond-reference extension (r4). The reference fits one full network per
(layer, head, K|V) tensor (`/root/reference/nerf_attention/fit.py:54-86`,
`siren.py:70-149`) — every unit re-learns its own positional basis from
scratch, and the hidden layers (the bulk of the parameters: a medium net
is 1->256->256->128, so ~80% of its weights never touch the output dim)
are pure per-unit overhead. This module amortizes them: a single SIREN
trunk maps position -> an h-wide feature vector, and each unit owns only
a final linear head (h x D + D). Stored bytes per unit shrink toward the
head alone as the group grows; serving ALL units of a group costs ONE
trunk forward plus one batched head matmul (an (S,h) x (U,h,D) einsum
that tiles onto the MXU) instead of U independent MLP forwards.

Two trunk regimes, both measured by `tools/shared_basis_study.py`:

* ``trainable`` — the trunk learns jointly with every head (a learned
  positional basis shared across the group).
* ``frozen`` — the trunk stays at its SIREN init (random sinusoidal
  features a la random-Fourier-features). Its weights are a pure
  function of (seed, config), so a serving system stores ONLY the heads
  and re-derives the trunk from the seed: per-unit storage drops to the
  head bytes exactly.

Training numerics deliberately match the per-unit trainer
(`parallel/sweep.py`): positions linspace(0,1,S), per-unit per-dim
z-normalization with the ddof=1 std clamped >= 1e-3, full-batch MSE on
normalized targets (mean over units), Adam(lr=1e-4) under cosine
annealing to lr*0.01 — so shared-vs-independent deltas are attributable
to the architecture, not the recipe.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerf_attention_tpu.models.siren import (
    init_bound,
    positions,
)
from nerf_attention_tpu.parallel.sweep import (
    _make_optimizer,
    _resolve_sin,
    cosine_similarity,
    normalize_targets,
)
from nerf_attention_tpu.types import SIRENConfig


def init_shared(
    key: jax.Array,
    config: SIRENConfig,
    out_features: int,
    n_units: int,
    dtype: jnp.dtype = jnp.float32,
) -> dict:
    """Initialize {'trunk': [(W,b), ...sine layers...], 'heads': (W, b)}.

    The trunk is exactly a SIREN minus its final linear: first sine layer
    (1, h) at U(+-1/in), then ``config.hidden_layers`` sine layers (h, h)
    at U(+-sqrt(6/in)/omega_0). Heads are per-unit final linears — W
    (n_units, h, out_features), b (n_units, out_features) — at the same
    final-linear bound every unit's independent net would use
    (reference siren.py:52-55), so a 1-unit group reproduces a plain
    SIREN's init distribution layer-for-layer.
    """
    h = config.hidden_features
    dims = [(1, h)] + [(h, h)] * config.hidden_layers
    keys = jax.random.split(key, len(dims) + 1)
    trunk = []
    for i, ((d_in, d_out), k) in enumerate(zip(dims, keys[:-1])):
        bound = init_bound(config, i, d_in)
        kw, kb = jax.random.split(k)
        trunk.append(
            (
                jax.random.uniform(kw, (d_in, d_out), dtype, -bound, bound),
                jax.random.uniform(kb, (d_out,), dtype, -bound, bound),
            )
        )
    bound = math.sqrt(6.0 / h) / config.omega_0
    kw, kb = jax.random.split(keys[-1])
    heads = (
        jax.random.uniform(
            kw, (n_units, h, out_features), dtype, -bound, bound
        ),
        jax.random.uniform(kb, (n_units, out_features), dtype, -bound, bound),
    )
    return {"trunk": trunk, "heads": heads}


def trunk_apply(
    trunk: list, omega_0: float, x: jax.Array, sin=jnp.sin
) -> jax.Array:
    """Position column (S, 1) -> shared features (S, h)."""
    h = x
    for w, b in trunk:
        h = sin(omega_0 * (h @ w + b))
    return h


def shared_apply(
    params: dict, omega_0: float, x: jax.Array, sin=jnp.sin
) -> jax.Array:
    """Forward for every unit at once: (S, 1) -> (U, S, D).

    One trunk forward feeds all heads through a single batched matmul —
    the serving shape: reconstructing a whole group costs one MLP pass
    regardless of U.
    """
    feats = trunk_apply(params["trunk"], omega_0, x, sin=sin)  # (S, h)
    w, b = params["heads"]  # (U, h, D), (U, D)
    return jnp.einsum("sh,uhd->usd", feats, w) + b[:, None, :]


def shared_param_counts(params: dict) -> dict:
    """{'trunk': n, 'heads_per_unit': n, 'n_units': U} parameter counts."""
    trunk = sum(int(w.size) + int(b.size) for w, b in params["trunk"])
    w, b = params["heads"]
    n_units = int(w.shape[0])
    return {
        "trunk": trunk,
        "heads_per_unit": int(w.size + b.size) // n_units,
        "n_units": n_units,
    }


def shared_bytes_per_unit(params: dict, *, frozen_trunk: bool) -> float:
    """Stored fp16 bytes per unit under the group's amortization.

    A frozen trunk is a pure function of (seed, config) — nothing to
    store; a trainable trunk's bytes spread evenly over the group.
    """
    c = shared_param_counts(params)
    per_unit = c["heads_per_unit"] * 2.0
    if not frozen_trunk:
        per_unit += c["trunk"] * 2.0 / c["n_units"]
    return per_unit


@dataclass
class SharedFitMetrics:
    """Per-unit metrics for one shared-basis group fit."""

    params: dict  # trunk [(w, b)...] + heads (U, h, D)/(U, D), numpy
    target_mean: np.ndarray  # (U, 1, D)
    target_std: np.ndarray  # (U, 1, D)
    losses: np.ndarray  # (epochs,) group-mean normalized MSE
    cosine_mean: np.ndarray  # (U,)
    cosine_min: np.ndarray  # (U,)
    final_mse: np.ndarray  # (U,)
    train_time_seconds: float
    n_units: int


@partial(
    jax.jit,
    static_argnames=(
        "config", "out_features", "n_units", "epochs", "lr", "sin_impl",
        "trainable_trunk",
    ),
)
def _fit_shared_jit(
    key,
    targets,  # (U, S, D)
    *,
    config: SIRENConfig,
    out_features: int,
    n_units: int,
    epochs: int,
    lr: float,
    sin_impl: str,
    trainable_trunk: bool,
):
    seq_len = targets.shape[1]
    pos = positions(seq_len, dtype=targets.dtype)
    omega = config.omega_0
    sin = _resolve_sin(sin_impl)
    tx = _make_optimizer(lr, epochs)

    targets_norm, mean, std = jax.vmap(normalize_targets)(targets)
    params = init_shared(key, config, out_features, n_units, targets.dtype)

    if trainable_trunk:
        train_p, static_p = params, {}
    else:
        train_p = {"heads": params["heads"]}
        static_p = {"trunk": params["trunk"]}

    opt_state = tx.init(train_p)

    def loss_fn(p):
        pred = shared_apply({**static_p, **p}, omega, pos, sin=sin)
        return jnp.mean((pred - targets_norm) ** 2)

    def step(carry, _):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    (train_p, _), losses = jax.lax.scan(
        step, (train_p, opt_state), length=epochs
    )
    params = {**static_p, **train_p}

    pred = shared_apply(params, omega, pos) * std + mean  # (U, S, D)
    err = pred - targets
    cos = jax.vmap(cosine_similarity)(pred, targets)  # (U, S)
    metrics = {
        "cosine_mean": jnp.mean(cos, axis=1),
        "cosine_min": jnp.min(cos, axis=1),
        "final_mse": jnp.mean(err**2, axis=(1, 2)),
    }
    return params, mean, std, losses, metrics


def fit_shared_batch(
    targets: np.ndarray,
    config: SIRENConfig,
    *,
    epochs: int = 2000,
    lr: float = 1e-4,
    seed: int = 0,
    sin_impl: str = "fast",
    trainable_trunk: bool = True,
) -> SharedFitMetrics:
    """Fit one shared-basis group on a (U, S, D) target stack."""
    targets = jnp.asarray(np.asarray(targets, dtype=np.float32))
    n_units, _, d = targets.shape
    t0 = time.perf_counter()
    params, mean, std, losses, metrics = _fit_shared_jit(
        jax.random.PRNGKey(seed),
        targets,
        config=config,
        out_features=d,
        n_units=n_units,
        epochs=epochs,
        lr=lr,
        sin_impl=sin_impl,
        trainable_trunk=trainable_trunk,
    )
    # Materialize a small leaf to force completion through the tunnel
    # (block_until_ready can return early over axon, see fit_batch).
    cosine_mean = np.asarray(metrics["cosine_mean"])
    wall = time.perf_counter() - t0
    return SharedFitMetrics(
        params=jax.tree.map(np.asarray, params),
        target_mean=np.asarray(mean),
        target_std=np.asarray(std),
        losses=np.asarray(losses),
        cosine_mean=cosine_mean,
        cosine_min=np.asarray(metrics["cosine_min"]),
        final_mse=np.asarray(metrics["final_mse"]),
        train_time_seconds=wall,
        n_units=n_units,
    )
