"""Fused SIREN -> attention decode kernel (Pallas/TPU).

The serving endgame of the study's premise. Replacing a KV cache with
networks means a decode step must produce ``O = softmax(q K^T / sqrt(d)) V``
from the *parameters*. The two-pass story (fused reconstruction kernel ->
HBM -> XLA attention) pays a full HBM round-trip for tensors that exist
only to be consumed once: at S=32768, D=128 that is ~33 MB of K/V per head
written and immediately re-read. This kernel removes the round-trip: each
S-tile of K-hat and V-hat is reconstructed in VMEM by the same layer stack
as the fused decode kernel (`ops/siren_pallas.py`) and consumed on the spot
by a flash-style online-softmax accumulation. The reconstructed cache never
exists in HBM — HBM traffic is the network weights once per head plus the
(T, D) queries and outputs.

Per head the kernel holds both parameter sets (key net + value net), the
per-channel denormalization vectors, and the query block in VMEM, then
loops over S-tiles carrying the running (max, denominator, accumulator)
triple; masking uses a large negative finite (not -inf) so fully-masked
score entries underflow to exactly zero weight.

Reference equivalent: none — the reference stops at per-tensor proxy
CosSim and an eager per-layer decode timing
(`/root/reference/nerf_attention/evaluate.py:173-219`); attention over the
reconstruction is this framework's experiment 8
(`experiments/attention_error.py`), whose XLA `attention_outputs` is the
parity oracle for this kernel.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_attention_tpu.ops.siren_pallas import (
    _BatchHeadView,
    _flat_weights,
    _layer_stack,
)
from nerf_attention_tpu.ops.tiling import SUBLANE, round_up

DEFAULT_TILE = 512
_MASKED = -1e30  # finite "minus infinity": exp underflows to 0, no NaN algebra


def _attn_kernel(
    *refs,
    omega: float,
    seq_len: int,
    tile: int,
    n_tiles: int,
    n_layers: int,
    n_queries: int,
    compute_dtype,
    sin_impl: str,
    fm: bool,
    causal: bool,
):
    """One head: online-softmax attention over reconstructed K/V tiles.

    refs = k_w0, k_b0, ..., k_wL, k_bL,  v_w0, ..., v_bL   (per-head blocked)
           k_mean, k_std, v_mean, v_std  (per-head (1, 1, D))
           q  (per-head (1, T_pad, D))
           [fm multipliers (shared (1, H))]
           out (per-head (1, T_pad, D))
    """
    out_ref = refs[-1]
    nw = 2 * n_layers
    k_refs = [_BatchHeadView(r) for r in refs[:nw]]
    v_refs = [_BatchHeadView(r) for r in refs[nw : 2 * nw]]
    k_mean = refs[2 * nw][0]
    k_std = refs[2 * nw + 1][0]
    v_mean = refs[2 * nw + 2][0]
    v_std = refs[2 * nw + 3][0]
    q = refs[2 * nw + 4][0].astype(jnp.float32)  # (T_pad, D)
    mult = refs[2 * nw + 5][:] if fm else None

    t_pad, d = q.shape
    q_scaled = q * jnp.float32(1.0 / math.sqrt(d))
    # Query row t sits at absolute position seq_len - n_queries + t; padded
    # rows beyond n_queries attend like the final real row (sliced off by
    # the wrapper, but they must not produce NaN).
    q_pos = jnp.minimum(
        jax.lax.broadcasted_iota(jnp.int32, (t_pad, tile), 0)
        + (seq_len - n_queries),
        seq_len - 1,
    )

    def body(ti, carry):
        m, l, acc = carry
        row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + ti * tile
        x = row.astype(jnp.float32) / jnp.float32(max(seq_len - 1, 1))
        k_tile = (
            _layer_stack(k_refs, x, omega, n_layers, compute_dtype, sin_impl, mult)
            * k_std
            + k_mean
        )  # (tile, D) fp32
        v_tile = (
            _layer_stack(v_refs, x, omega, n_layers, compute_dtype, sin_impl, mult)
            * v_std
            + v_mean
        )
        s = jax.lax.dot_general(
            q_scaled,
            k_tile,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T_pad, tile)
        pos = jax.lax.broadcasted_iota(jnp.int32, (t_pad, tile), 1) + ti * tile
        allowed = pos <= q_pos if causal else pos < seq_len
        s = jnp.where(allowed, s, jnp.float32(_MASKED))
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = alpha * acc + jax.lax.dot_general(
            p.astype(compute_dtype),
            v_tile.astype(compute_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    init = (
        jnp.full((t_pad, 1), _MASKED, jnp.float32),
        jnp.zeros((t_pad, 1), jnp.float32),
        jnp.zeros((t_pad, d), jnp.float32),
    )
    _, l, acc = jax.lax.fori_loop(0, n_tiles, body, init)
    out_ref[0] = (acc / l).astype(out_ref.dtype)


@partial(
    jax.jit,
    static_argnames=(
        "omega",
        "seq_len",
        "tile",
        "interpret",
        "compute_dtype",
        "sin_impl",
        "fm_mult",
        "causal",
    ),
)
def siren_attention_decode_fused(
    k_params,
    v_params,
    k_mean,
    k_std,
    v_mean,
    v_std,
    q,
    omega: float,
    seq_len: int,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
    compute_dtype=jnp.float32,
    sin_impl: str = "fast",
    fm_mult: float | None = None,
    causal: bool = True,
) -> jax.Array:
    """Attention outputs straight from SIREN parameters, per head.

    k_params / v_params: [(W, b), ...] with a leading head axis — W
    (N, in, out), b (N, out); the layer geometry must match between the
    two nets (one grid, one layer stack). k_mean/k_std/v_mean/v_std:
    (N, 1, D) denormalization from the fit (`parallel/sweep.py:56-57`).
    q: (N, T, D) queries for the trailing T positions of the S-token
    window. Returns (N, T, D) fp32 attention outputs.

    ``causal=True`` lets query row t (absolute position S-T+t) attend to
    positions <= itself — the `causal_allowed` convention of experiment 8;
    ``causal=False`` attends to the full S window (the T=1 decode step is
    identical under both). ``fm_mult`` applies the FM-SIREN per-unit
    first-layer frequencies to both nets, matching the fit.
    """
    if len(k_params) != len(v_params):
        raise ValueError("key and value nets must share the layer count")
    n, n_queries, d = q.shape
    n_layers = len(k_params)
    hidden = k_params[0][0].shape[-1]

    tile = min(tile, round_up(seq_len, SUBLANE))
    padded_s = round_up(seq_len, tile)
    t_pad = round_up(n_queries, SUBLANE)

    flat = _flat_weights(k_params, compute_dtype, n=n) + _flat_weights(
        v_params, compute_dtype, n=n
    )
    in_specs = [
        pl.BlockSpec((1, *f.shape[1:]), lambda ni: (ni, 0, 0), memory_space=pltpu.VMEM)
        for f in flat
    ]
    for stat in (k_mean, k_std, v_mean, v_std):
        flat.append(jnp.asarray(stat, jnp.float32).reshape(n, 1, d))
        in_specs.append(
            pl.BlockSpec((1, 1, d), lambda ni: (ni, 0, 0), memory_space=pltpu.VMEM)
        )
    q_padded = jnp.zeros((n, t_pad, d), jnp.float32).at[:, :n_queries].set(q)
    flat.append(q_padded)
    in_specs.append(
        pl.BlockSpec((1, t_pad, d), lambda ni: (ni, 0, 0), memory_space=pltpu.VMEM)
    )
    if fm_mult is not None:
        from nerf_attention_tpu.models.siren import fm_frequency_multipliers

        flat.append(fm_frequency_multipliers(hidden, fm_mult).reshape(1, hidden))
        in_specs.append(
            pl.BlockSpec((1, hidden), lambda ni: (0, 0), memory_space=pltpu.VMEM)
        )

    kernel = partial(
        _attn_kernel,
        omega=float(omega),
        seq_len=seq_len,
        tile=tile,
        n_tiles=padded_s // tile,
        n_layers=n_layers,
        n_queries=n_queries,
        compute_dtype=compute_dtype,
        sin_impl=sin_impl,
        fm=fm_mult is not None,
        causal=causal,
    )
    itemsize = jnp.dtype(compute_dtype).itemsize
    recon_flops_per_row = 2 * sum(
        2 * w.shape[1] * w.shape[2] for w in flat[: 2 * n_layers : 2]
    )
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, t_pad, d), lambda ni: (ni, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, t_pad, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n * padded_s * (recon_flops_per_row + 4 * t_pad * d),
            bytes_accessed=sum(f.size * f.dtype.itemsize for f in flat)
            + 2 * n * t_pad * d * itemsize,
            transcendentals=n * padded_s * (2 * hidden * (n_layers - 1) + t_pad),
        ),
        interpret=interpret,
    )(*flat)
    return out[:, :n_queries, :]


def siren_attention_decode_reference(
    k_params,
    v_params,
    k_mean,
    k_std,
    v_mean,
    v_std,
    q,
    omega: float,
    seq_len: int,
    sin_impl: str = "fast",
    fm_mult: float | None = None,
    causal: bool = True,
) -> jax.Array:
    """XLA oracle: materialize K-hat/V-hat, then exact masked attention.

    This IS the two-pass serving path being fused away (reconstruction ->
    HBM -> `experiments.attention_error.attention_outputs`); kept as the
    parity baseline and the off-TPU fallback.
    """
    from nerf_attention_tpu.experiments.attention_error import (
        attention_outputs,
        causal_allowed,
    )
    from nerf_attention_tpu.models.siren import positions, siren_apply_maybe_fm
    from nerf_attention_tpu.parallel.sweep import _resolve_sin

    sin = _resolve_sin(sin_impl)
    pos = positions(seq_len)
    n, n_queries, _ = q.shape
    if causal:
        allowed = jnp.asarray(causal_allowed(seq_len, n_queries))
    else:
        allowed = jnp.ones((n_queries, seq_len), bool)

    def one(kp, vp, km, ks, vm, vs, qh):
        k_hat = siren_apply_maybe_fm(kp, omega, fm_mult, pos, sin=sin) * ks + km
        v_hat = siren_apply_maybe_fm(vp, omega, fm_mult, pos, sin=sin) * vs + vm
        return attention_outputs(qh, k_hat, v_hat, allowed)[0]

    return jax.vmap(one)(
        [(jnp.asarray(w), jnp.asarray(b)) for w, b in k_params],
        [(jnp.asarray(w), jnp.asarray(b)) for w, b in v_params],
        jnp.asarray(k_mean),
        jnp.asarray(k_std),
        jnp.asarray(v_mean),
        jnp.asarray(v_std),
        jnp.asarray(q),
    )


def siren_attention_decode_sharded(
    k_params,
    v_params,
    k_mean,
    k_std,
    v_mean,
    v_std,
    q,
    omega: float,
    seq_len: int,
    mesh,
    axis: str = "fit",
    interpret: bool = False,
    sin_impl: str = "fast",
    fm_mult: float | None = None,
    causal: bool = True,
) -> jax.Array:
    """Fused attention-from-parameters with the head axis over a mesh.

    The serving scale-out: a model's full KV-cache replacement is hundreds
    of (key-net, value-net) pairs — 512 for the study's 32Lx8Hx2 geometry —
    and each head's attention is independent, so the head axis shards with
    zero collectives, exactly like `siren_decode_batch_sharded`. Head count
    must be divisible by the mesh size.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = q.shape[0]
    n_dev = int(np.prod(mesh.devices.shape))
    if n % n_dev:
        raise ValueError(f"head count {n} not divisible by mesh size {n_dev}")

    leaf = P(axis, None, None)
    bias = P(axis, None)
    param_specs = [(leaf, bias) for _ in k_params]
    in_specs = (param_specs, param_specs, leaf, leaf, leaf, leaf, leaf)
    body = lambda kp, vp, km, ks, vm, vs, qq: siren_attention_decode_fused(
        kp, vp, km, ks, vm, vs, qq, omega, seq_len, interpret=interpret,
        sin_impl=sin_impl, fm_mult=fm_mult, causal=causal,
    )
    from nerf_attention_tpu.parallel.mesh import shard_map_compat

    fn = shard_map_compat(body, mesh=mesh, in_specs=in_specs, out_specs=leaf)
    shard = lambda x, spec: jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, spec)
    )
    k_params = [(shard(w, leaf), shard(b, bias)) for w, b in k_params]
    v_params = [(shard(w, leaf), shard(b, bias)) for w, b in v_params]
    return fn(
        k_params,
        v_params,
        shard(jnp.asarray(k_mean, jnp.float32).reshape(n, 1, -1), leaf),
        shard(jnp.asarray(k_std, jnp.float32).reshape(n, 1, -1), leaf),
        shard(jnp.asarray(v_mean, jnp.float32).reshape(n, 1, -1), leaf),
        shard(jnp.asarray(v_std, jnp.float32).reshape(n, 1, -1), leaf),
        shard(q, leaf),
    )


def siren_attention_decode(
    k_params,
    v_params,
    k_mean,
    k_std,
    v_mean,
    v_std,
    q,
    omega: float,
    seq_len: int,
    sin_impl: str = "fast",
    fm_mult: float | None = None,
    causal: bool = True,
    tile: int = DEFAULT_TILE,
) -> jax.Array:
    """Fused attention-from-parameters with interpret fallback off-TPU."""
    on_tpu = jax.default_backend() == "tpu"
    k_params = [(jnp.asarray(w), jnp.asarray(b)) for w, b in k_params]
    v_params = [(jnp.asarray(w), jnp.asarray(b)) for w, b in v_params]
    return siren_attention_decode_fused(
        k_params,
        v_params,
        jnp.asarray(k_mean),
        jnp.asarray(k_std),
        jnp.asarray(v_mean),
        jnp.asarray(v_std),
        jnp.asarray(q),
        float(omega),
        seq_len,
        tile=tile,
        interpret=not on_tpu,
        sin_impl=sin_impl,
        fm_mult=fm_mult,
        causal=causal,
    )
