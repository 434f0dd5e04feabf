"""Fast polynomial sine/cosine for the SIREN hot paths.

Measured on v5e (benchmarks/r2/mfu_profile.json): the sweep's training step
is SINE-bound, not matmul-bound — the medium forward takes 1.66 ms of which
1.49 ms is the two `jnp.sin` layers (the no-sin forward runs in 0.16 ms;
the chip's achievable sweep-shaped fp32 matmul rate is ~102 TFLOP/s, so
matmuls are ~16% of the full step). XLA's exact sine costs ~34 VPU ops/element; the polynomial
here costs ~11, and its error (2.4e-7 abs on the reduced range, fp32
range-reduction floor ~6e-6 at |x|~100) is orders of magnitude below fp32
training noise — CosSim parity with the exact path is bit-indistinguishable
at the reported 4-decimal precision.

``fast_sin`` carries a custom JVP whose tangent uses the matching
polynomial cosine, so `jax.grad` through a fast-sine network stays on the
fast path (the backward pass otherwise re-introduces an exact `cos`).

SIREN arguments are bounded (|omega * (Wx + b)| <~ 100), so single-step
range reduction r = x - 2*pi*round(x / 2*pi) in fp32 is sufficient.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Odd degree-11 fit of sin on [-pi, pi]: sin(r) = r * P(r^2), max abs err 2.4e-7.
_SIN_POLY = (
    0.999999944113757,
    -0.1666662473075619,
    0.008332823045890596,
    -0.00019818565614087048,
    2.709950069004074e-06,
    -2.0744775113774107e-08,
)
# Even degree-12 fit of cos on [-pi, pi]: cos(r) = Q(r^2), max abs err 1.3e-8.
_COS_POLY = (
    0.9999999901772433,
    -0.49999990032638814,
    0.04166650094457125,
    -0.0013887856111527088,
    2.4770936496032278e-05,
    -2.7088724370451157e-07,
    1.727848798870973e-09,
)
_TWO_PI = 6.283185307179586
_INV_TWO_PI = 1.0 / _TWO_PI


def _reduce(x: jax.Array) -> jax.Array:
    return x - jnp.round(x * _INV_TWO_PI) * _TWO_PI


def _poly_even(r2: jax.Array, coefs) -> jax.Array:
    acc = jnp.asarray(coefs[-1], r2.dtype)
    for c in coefs[-2::-1]:
        acc = acc * r2 + jnp.asarray(c, r2.dtype)
    return acc


@jax.custom_jvp
def fast_sin(x: jax.Array) -> jax.Array:
    """Polynomial sine (range-reduced); gradient uses ``fast_cos``."""
    r = _reduce(x)
    return r * _poly_even(r * r, _SIN_POLY)


def fast_cos(x: jax.Array) -> jax.Array:
    """Polynomial cosine (range-reduced)."""
    r = _reduce(x)
    return _poly_even(r * r, _COS_POLY)


@fast_sin.defjvp
def _fast_sin_jvp(primals, tangents):
    (x,) = primals
    (t,) = tangents
    return fast_sin(x), fast_cos(x) * t


def fast_sincos(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(sin, cos) with ONE shared range reduction and r^2.

    For call sites that need both (the fused training kernel's backward pass
    needs sin(a) as the previous layer's activation and cos(a) as the sine
    derivative), this costs ~60% of two independent polynomial calls.
    """
    r = _reduce(x)
    r2 = r * r
    return r * _poly_even(r2, _SIN_POLY), _poly_even(r2, _COS_POLY)
