"""Quantized-RESIDENT KV-cache attention (Pallas/TPU) for GQA decode.

The round-5 MLA finding (`ops/mla_quant_pallas.py`) generalized: raw
cache attention is HBM-bandwidth-bound on the cache stream, so holding
the K/V rows as bit-packed int codes and dequantizing per tile in VMEM
improves BOTH axes at once — resident bytes drop by the bit ratio and
the kernel reads proportionally fewer bytes per step. This is the
serving path for the units a `serve-plan` does NOT serve from SIREN
parameters: with `models/llama_hybrid.py` covering the served units,
every cache byte a hybrid decode step touches can be sub-byte.

Quantization grid is EXACTLY `ops/quantize.py:quantize_array(axis=1)`
per (unit) — one fp16-valued per-channel scale row per ``group``
tokens, the grid every other resident payload in this codebase ships —
so parity against host-dequant attention is fp32 op-order noise.
Packing is PER TILE (`mla_quant_pallas.pack_resident_latent` layout):
tile t's rows land in plane rows [t·tile/2, (t+1)·tile/2), one
contiguous plane slice per grid step.

The kernel streams (tile, d) K and V blocks per (unit, tile) grid cell
into a flash-style online softmax over the unit's query group, with the
decode mask (rows < ``position`` attend) and optional (m, l)
sufficient-statistics output for exact external merging of extra
columns (the hybrid step's tail/self segments — same contract as
`siren_quant_pallas.siren_attention_decode_quant(return_stats=True)`).

Reference equivalent: none — the reference serves fp16 cache reads
(`/root/reference/nerf_attention/evaluate.py:173-242` profiles fp32
SIREN vs cache latency only).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_attention_tpu.ops.mla_quant_pallas import (
    _MASKED,
    pack_resident_latent,
)
from nerf_attention_tpu.ops.tiling import SUBLANE, round_up

DEFAULT_TILE = 512


def pack_kv_unit_stack(cache, scheme: str, tile: int = DEFAULT_TILE):
    """Pack an (n_units, S, d) cache half (K or V) into resident operands.

    Per-unit `pack_resident_latent` (each unit its own scales — the slice
    an operator stores/evicts independently), stacked on a leading unit
    axis so one pallas grid serves the whole batch. Returns
    ``(ops, layout)`` with ``layout = (kind, s, d, group, qmax, tile,
    n_tiles)``.
    """
    cache = np.asarray(cache, np.float32)
    per_unit = [pack_resident_latent(c, scheme, tile=tile) for c in cache]
    layout = per_unit[0][1]
    ops = tuple(
        jnp.stack([u_ops[i] for u_ops, _ in per_unit])
        for i in range(len(per_unit[0][0]))
    )
    return ops, layout


def resident_kv_bytes(ops) -> int:
    """Actual HBM bytes of packed cache operands (codes + scales)."""
    return int(
        sum(int(np.prod(o.shape)) * jnp.dtype(o.dtype).itemsize for o in ops)
    )


def _dequant_tile(kind: str, refs, tile: int, group: int, qmax: int):
    """(tile, d) fp32 rows from one grid cell's blocked plane refs.

    Mirrors `mla_quant_pallas._dequant_block`, reading through the
    leading blocked unit axis (``ref[0]``).
    """
    # Block may carry sublane padding past the real tile//group rows.
    scale = refs[-1][0][: tile // group]  # (tile//group, d) fp32
    if kind == "int8":
        codes = refs[0][0].astype(jnp.float32)
    elif kind == "int4":
        u = refs[0][0].astype(jnp.int32) & 0xFF
        codes = (
            jnp.concatenate([u & 0xF, (u >> 4) & 0xF], axis=0) - qmax
        ).astype(jnp.float32)
    elif kind == "int6":
        u4 = refs[0][0].astype(jnp.int32) & 0xFF
        low4 = jnp.concatenate([u4 & 0xF, (u4 >> 4) & 0xF], axis=0)
        u2 = refs[1][0].astype(jnp.int32) & 0xFF
        high2 = jnp.concatenate(
            [(u2 >> (2 * p)) & 0x3 for p in range(4)], axis=0
        )
        codes = ((low4 | (high2 << 4)) - qmax).astype(jnp.float32)
    else:  # pragma: no cover - pack enumerates the kinds above
        raise ValueError(kind)
    d = scale.shape[-1]
    g = tile // group
    scale_rows = jnp.broadcast_to(scale[:, None, :], (g, group, d)).reshape(
        tile, d
    )
    return codes * scale_rows


def _kv_quant_kernel(
    *refs,
    kind: str,
    n_k_ops: int,
    scale: float,
    tile: int,
    n_tiles: int,
    group: int,
    qmax: int,
    stats: bool,
):
    if stats:
        o_ref, m_ref, l_ref = refs[-6], refs[-5], refs[-4]
    else:
        o_ref = refs[-4]
    m_sc, l_sc, acc_sc = refs[-3], refs[-2], refs[-1]
    pos_ref, q_ref = refs[0], refs[1]
    k_refs = refs[2 : 2 + n_k_ops]
    v_refs = refs[2 + n_k_ops : 2 + 2 * n_k_ops]

    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _init():
        m_sc[:] = jnp.full(m_sc.shape, _MASKED, jnp.float32)
        l_sc[:] = jnp.zeros(l_sc.shape, jnp.float32)
        acc_sc[:] = jnp.zeros(acc_sc.shape, jnp.float32)

    pos = pos_ref[0, 0]
    t_pad = q_ref.shape[1]
    q = q_ref[0].astype(jnp.float32)  # (T_pad, d)
    k_blk = _dequant_tile(kind, k_refs, tile, group, qmax)  # (tile, d)
    v_blk = _dequant_tile(kind, v_refs, tile, group, qmax)

    s = jax.lax.dot_general(
        q, k_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * jnp.float32(scale)  # (T_pad, tile)
    col = jax.lax.broadcasted_iota(jnp.int32, (t_pad, tile), 1) + ti * tile
    s = jnp.where(col < pos, s, jnp.float32(_MASKED))
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + ti * tile
    v_blk = jnp.where(row < pos, v_blk, jnp.zeros((), jnp.float32))

    m_new = jnp.maximum(m_sc[:], jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_sc[:] - m_new)
    p = jnp.exp(s - m_new)
    l_sc[:] = alpha * l_sc[:] + jnp.sum(p, axis=-1, keepdims=True)
    acc_sc[:] = alpha * acc_sc[:] + jax.lax.dot_general(
        p, v_blk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_sc[:] = m_new

    @pl.when(ti == n_tiles - 1)
    def _emit():
        l = l_sc[:]
        o_ref[0] = (acc_sc[:] / l).astype(o_ref.dtype)
        if stats:
            m_ref[0] = m_sc[:].astype(m_ref.dtype)
            l_ref[0] = l.astype(l_ref.dtype)


def kv_cache_attention_quant(
    q: jax.Array,
    packed_k: tuple,
    packed_v: tuple,
    position,
    *,
    scale: float,
    interpret: bool | None = None,
    return_stats: bool = False,
):
    """Attention over a quant-RESIDENT KV cache, one pass, per unit.

    ``q``: (n_units, T, d) query rows per (kv-head) unit — GQA groups
    flatten onto T. ``packed_k`` / ``packed_v``: `pack_kv_unit_stack`
    results over (n_units, S_buf, d) halves. Cache rows with index <
    ``position`` attend (the decode-mask contract); the querying token's
    own k/v is NOT in the cache — merge it externally via
    ``return_stats=True`` → (o, m, l), the same exact-segment-merge
    algebra as the hybrid decode step. Without stats, returns the
    normalized (n_units, T, d) attention over cache rows only.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_ops, (kind, s_buf, d, group, qmax, tile, n_tiles) = packed_k
    v_ops, layout_v = packed_v
    if layout_v != (kind, s_buf, d, group, qmax, tile, n_tiles):
        raise ValueError("packed_k / packed_v layouts differ")
    n, t, _ = q.shape
    if int(k_ops[0].shape[0]) != n:
        raise ValueError(
            f"query unit count {n} != packed unit count {k_ops[0].shape[0]}"
        )
    t_pad = round_up(t, SUBLANE)
    q_p = jnp.zeros((n, t_pad, d), jnp.float32).at[:, :t].set(q)
    pos_arr = jnp.asarray(position, jnp.int32).reshape(1, 1)

    n_k_ops = len(k_ops)
    kernel = partial(
        _kv_quant_kernel,
        kind=kind,
        n_k_ops=n_k_ops,
        scale=float(scale),
        tile=tile,
        n_tiles=n_tiles,
        group=group,
        qmax=qmax,
        stats=return_stats,
    )

    def plane_spec(o):
        rows = int(o.shape[1]) // n_tiles
        return pl.BlockSpec(
            (1, rows, d), lambda ni, ti, _r=rows: (ni, ti, 0),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (1, t_pad, d), lambda ni, ti: (ni, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        *[plane_spec(o) for o in k_ops],
        *[plane_spec(o) for o in v_ops],
    ]
    out_spec = pl.BlockSpec(
        (1, t_pad, d), lambda ni, ti: (ni, 0, 0), memory_space=pltpu.VMEM
    )
    stat_spec = pl.BlockSpec(
        (1, t_pad, 1), lambda ni, ti: (ni, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((n, t_pad, d), jnp.float32)
    stat_shape = jax.ShapeDtypeStruct((n, t_pad, 1), jnp.float32)
    bytes_resident = resident_kv_bytes(k_ops) + resident_kv_bytes(v_ops)
    result = pl.pallas_call(
        kernel,
        grid=(n, n_tiles),
        in_specs=in_specs,
        out_specs=(out_spec, stat_spec, stat_spec)
        if return_stats
        else out_spec,
        out_shape=(out_shape, stat_shape, stat_shape)
        if return_stats
        else out_shape,
        scratch_shapes=[
            pltpu.VMEM((t_pad, 1), jnp.float32),
            pltpu.VMEM((t_pad, 1), jnp.float32),
            pltpu.VMEM((t_pad, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * t_pad * (n_tiles * tile) * d,
            bytes_accessed=bytes_resident + n * t_pad * d * 8,
            transcendentals=n * t_pad * (n_tiles * tile),
        ),
        interpret=interpret,
    )(pos_arr, q_p, *k_ops, *v_ops)
    if return_stats:
        o, m, l = result
        return o[:, :t, :], m[:, :t, 0], l[:, :t, 0]
    return result[:, :t, :]
