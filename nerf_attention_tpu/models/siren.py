"""SIREN (sinusoidal MLP) as pure JAX functions over a params pytree.

The network maps a normalized scalar position to a d_head KV vector:
``x (S,1) -> sin(w0*(xW1+b1)) -> ... -> h Wf + bf  (S, d_head)``.

Numerics follow the reference exactly (`/root/reference/nerf_attention/siren.py:17-67`):
  * first sine layer init  U(-1/in, 1/in) on both W and b
  * hidden sine layers and the final linear init U(-sqrt(6/in)/w0, +...)
  * forward is sin(omega_0 * linear(x)) per sine layer, plain linear at the end.

Unlike the torch reference (an nn.Module per fit), params here are a flat list
of ``(W, b)`` tuples with W laid out (in, out) — a pytree that vmaps over a
leading fit axis, so hundreds of SIRENs train as one XLA program.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from nerf_attention_tpu.types import SIRENConfig

# A SIREN's parameters: [(W0,b0), (W1,b1), ..., (Wf,bf)], W of shape (in, out).
SirenParams = list[tuple[jax.Array, jax.Array]]


def layer_dims(config: SIRENConfig, out_features: int) -> list[tuple[int, int]]:
    """(in, out) feature sizes for every layer, first sine to final linear."""
    h = config.hidden_features
    dims = [(1, h)]
    dims += [(h, h)] * config.hidden_layers
    dims += [(h, out_features)]
    return dims


def init_bound(config: SIRENConfig, layer_idx: int, in_features: int) -> float:
    """Uniform init bound for one layer (reference siren.py:25-31, 52-55)."""
    if layer_idx == 0:
        return 1.0 / in_features
    return math.sqrt(6.0 / in_features) / config.omega_0


def init_siren(
    key: jax.Array,
    config: SIRENConfig,
    out_features: int,
    dtype: jnp.dtype = jnp.float32,
) -> SirenParams:
    """Initialize one SIREN's parameters from a PRNG key."""
    dims = layer_dims(config, out_features)
    params: SirenParams = []
    keys = jax.random.split(key, len(dims))
    for i, ((d_in, d_out), k) in enumerate(zip(dims, keys)):
        bound = init_bound(config, i, d_in)
        kw, kb = jax.random.split(k)
        w = jax.random.uniform(kw, (d_in, d_out), dtype, -bound, bound)
        b = jax.random.uniform(kb, (d_out,), dtype, -bound, bound)
        params.append((w, b))
    return params


def siren_apply(
    params: SirenParams, omega_0: float, x: jax.Array, sin=jnp.sin
) -> jax.Array:
    """Forward pass: x (S, 1) -> (S, out_features).

    All but the last layer are sine layers; the last is a plain linear
    (reference siren.py:33-34, 60-61). ``sin`` swaps the activation
    implementation (``ops.fastmath.fast_sin`` is the measured-parity fast
    path; training is sine-throughput-bound on TPU, see fastmath docs).
    """
    h = x
    for w, b in params[:-1]:
        h = sin(omega_0 * (h @ w + b))
    w, b = params[-1]
    return h @ w + b


def count_parameters(params: SirenParams) -> int:
    return sum(int(w.size) + int(b.size) for w, b in params)


def size_bytes(params: SirenParams) -> int:
    """Checkpoint size: params are stored float32 (reference siren.py:66-67)."""
    return count_parameters(params) * 4


@partial(jax.jit, static_argnames=("omega_0",))
def siren_forward(params: SirenParams, omega_0: float, x: jax.Array) -> jax.Array:
    """Jitted single-network forward (decode path)."""
    return siren_apply(params, omega_0, x)


def fm_frequency_multipliers(
    hidden: int, max_mult: float, dtype: jnp.dtype = jnp.float32
) -> jax.Array:
    """Per-unit first-layer frequency multipliers, linearly spread 1..max.

    FM-SIREN-style frequency diversity (PAPERS.md: "FM-SIREN & FM-FINER —
    Nyquist-based orthogonality"): giving each first-layer neuron a DISTINCT
    base frequency removes the redundancy of every unit sharing omega_0 and
    widens the spectrum the network can represent without retuning omega.
    """
    return jnp.linspace(1.0, max_mult, hidden, dtype=dtype)


def siren_apply_fm(
    params: SirenParams,
    omega_0: float,
    mult: jax.Array,
    x: jax.Array,
    sin=jnp.sin,
) -> jax.Array:
    """SIREN forward with per-unit first-layer frequencies.

    Identical to ``siren_apply`` except the first sine layer computes
    ``sin(omega_0 * mult_i * (x W + b)_i)`` per hidden unit i. Same
    parameter shapes/count, so compression accounting is unchanged.
    """
    w, b = params[0]
    h = sin(omega_0 * mult * (x @ w + b))
    for w, b in params[1:-1]:
        h = sin(omega_0 * (h @ w + b))
    w, b = params[-1]
    return h @ w + b


def siren_apply_maybe_fm(
    params: SirenParams,
    omega_0: float,
    fm_mult: float | None,
    x: jax.Array,
    sin=jnp.sin,
) -> jax.Array:
    """Forward for a possibly-FM network, deriving the multipliers.

    The one dispatch point every reader of fm-aware checkpoints/configs
    uses (sweep training, evaluate reconstruction, quantize experiment) —
    a site that forgot the spread would silently evaluate a different
    architecture.
    """
    if fm_mult is None:
        return siren_apply(params, omega_0, x, sin=sin)
    hidden = params[0][0].shape[-1]
    mult = fm_frequency_multipliers(hidden, fm_mult, dtype=x.dtype)
    return siren_apply_fm(params, omega_0, mult, x, sin=sin)


def positions(
    seq_len: int,
    dtype: jnp.dtype = jnp.float32,
    *,
    total_len: int | None = None,
) -> jax.Array:
    """Input coordinates: linspace(0, 1, S) as a (S, 1) column (siren.py:82).

    ``total_len`` pins the normalization to a cache's FINAL length instead
    of the current one: token ``i`` maps to ``i / (total_len - 1)`` so an
    append never moves existing coordinates (the "absolute" convention of
    the incremental experiment). ``total_len=None`` (and the degenerate
    ``total_len == seq_len``) is the reference-parity relative convention.
    """
    if total_len is None or total_len == seq_len:
        # linspace exactly, to keep the sweep's bit-identical reproduction.
        return jnp.linspace(0.0, 1.0, seq_len, dtype=dtype)[:, None]
    if total_len < seq_len:
        raise ValueError(f"total_len {total_len} < seq_len {seq_len}")
    return jnp.linspace(
        0.0, 1.0, total_len, dtype=dtype
    )[:seq_len, None]
