"""Quantized-RESIDENT absorbed MLA decode attention (Pallas/TPU).

Round-5 closure of the MLA serving story's last at-rest/on-device gap:
the quantized-latent ladder (`tools/mla_latent_study.py`) proved
group-wise int8/int6/int4 latents dominate SIREN fits on this
architecture (int4_g64: 30.1× at 0.99904 output cosine), but the
absorbed decode kernel (`ops/mla_absorbed_pallas.py`) consumed an fp32
latent cache in HBM — the 30× was true only for storage. Here the
bit-packed codes ARE the HBM-resident cache: each grid step DMAs one
(tile, latent_dim) block's packed planes + its fp16-valued scale rows
to VMEM, dequantizes on the spot (exact `ops/quantize.py:quantize_array
(axis=1)` grid — scale groups run along the SEQUENCE axis, one
per-channel scale row per ``group`` tokens), and feeds the same
flash-style online softmax. fp32 latent rows never exist in HBM.

Packing is PER TILE (unlike `siren_quant_pallas.pack_resident_params`,
whose nibble planes split rows into global halves): tile t's rows pack
into plane rows [t·tile/2, (t+1)·tile/2), so a block index maps to one
contiguous plane slice. The unpack arithmetic mirrors
`siren_quant_pallas._QuantWeightView` (int32 shifts — Mosaic has no i8
vector shift; sublane-axis concatenate).

Reference equivalent: none — the reference has no MLA or quantized
serving path; its cache surface is a raw fp16 materialized cache
(`/root/reference/nerf_attention/fit.py:20-118`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_attention_tpu.ops.mla_absorbed_pallas import (
    _MASKED,
    DEFAULT_TILE,
)
from nerf_attention_tpu.ops.tiling import SUBLANE, round_up
from nerf_attention_tpu.ops.quantize import parse_scheme, quantize_array


def pack_resident_latent(
    latent, scheme: str, tile: int = DEFAULT_TILE
) -> tuple[list, tuple]:
    """Pack one layer's (S, latent_dim) latent into HBM-resident operands.

    Quantization grid is EXACTLY ``quantize_array(latent, scheme, axis=1)``
    (the ladder/serializer grid: scale groups along the sequence axis,
    fp16-valued scales per channel), so parity against the host-dequant
    path is bit-for-bit. Rows pad to a whole number of ``tile``-row
    blocks; pad rows carry zero codes and are masked by the kernel's
    ``row < position`` rule like any unfilled buffer row.

    Returns ``(ops, layout)``: ``ops`` the operand arrays (code planes +
    scales), ``layout`` a static tuple
    ``(kind, s_buf, d, group, qmax, tile, n_tiles)``.
    """
    kind, bits, group = parse_scheme(scheme)
    lat = np.asarray(latent, np.float32)
    s, d = lat.shape
    if kind != "int" or group is None:
        raise ValueError(
            f"resident latent packing needs a group-wise int scheme, "
            f"got {scheme!r}"
        )
    if tile % group:
        raise ValueError(f"tile {tile} must be a multiple of group {group}")
    if tile % 4:
        raise ValueError(f"tile {tile} must be a multiple of 4")
    qmax = (1 << (bits - 1)) - 1
    payload, _ = quantize_array(lat, scheme, axis=1)
    codes = payload["data"].reshape(-1, d)[:s].astype(np.int8)  # (S, D)
    scale = payload["scale"].astype(np.float32)  # (G, D), fp16-valued

    n_tiles = -(-s // tile)
    s_pad = n_tiles * tile
    codes = np.pad(codes, ((0, s_pad - s), (0, 0)))
    g_per_tile = tile // group
    scale = np.pad(
        scale,
        ((0, n_tiles * g_per_tile - scale.shape[0]), (0, 0)),
        constant_values=np.finfo(np.float16).tiny,
    )
    # Mosaic requires block sublane dims divisible by 8: pad each tile's
    # scale rows from g_per_tile to a multiple of 8 (the kernel slices
    # back to the real rows). Costs (g_pad - g)·d·4 B/tile — noise.
    g_pad = -(-g_per_tile // 8) * 8
    if g_pad != g_per_tile:
        scale = np.concatenate(
            [
                np.pad(
                    s_t,
                    ((0, g_pad - g_per_tile), (0, 0)),
                    constant_values=np.finfo(np.float16).tiny,
                )
                for s_t in scale.reshape(n_tiles, g_per_tile, d)
            ]
        )

    ops: list = []
    if bits == 8:
        ops.append(jnp.asarray(codes))
        kind_tag = "int8"
    elif bits == 4:
        biased = (codes.astype(np.int16) + qmax).astype(np.uint8)
        planes = [
            (b[: tile // 2] | (b[tile // 2 :] << 4)).astype(np.int8)
            for b in biased.reshape(n_tiles, tile, d)
        ]
        ops.append(jnp.asarray(np.concatenate(planes)))  # (S_pad/2, D)
        kind_tag = "int4"
    elif bits == 6:
        biased = (codes.astype(np.int16) + qmax).astype(np.uint8)
        low, high = [], []
        for b in biased.reshape(n_tiles, tile, d):
            l4 = b & 0xF
            h2 = b >> 4
            low.append((l4[: tile // 2] | (l4[tile // 2 :] << 4)).astype(np.int8))
            q = tile // 4
            high.append(
                (
                    h2[:q]
                    | (h2[q : 2 * q] << 2)
                    | (h2[2 * q : 3 * q] << 4)
                    | (h2[3 * q :] << 6)
                ).astype(np.int8)
            )
        ops.append(jnp.asarray(np.concatenate(low)))  # (S_pad/2, D)
        ops.append(jnp.asarray(np.concatenate(high)))  # (S_pad/4, D)
        kind_tag = "int6"
    else:  # 2/3/5/7-bit grids ship byte-aligned codes (honest 1 B/elem)
        ops.append(jnp.asarray(codes))
        kind_tag = "int8"
    ops.append(jnp.asarray(scale))
    return ops, (kind_tag, s, d, group, qmax, tile, n_tiles)


def resident_latent_bytes(ops) -> int:
    """Actual HBM bytes of the packed latent (codes + scales)."""
    return int(
        sum(int(np.prod(o.shape)) * jnp.dtype(o.dtype).itemsize for o in ops)
    )


def _dequant_block(kind: str, refs, tile: int, group: int, qmax: int):
    """Rebuild one (tile, D) fp32 latent block from its VMEM plane refs."""
    # Block may carry sublane padding past the real tile//group rows.
    scale = refs[-1][:][: tile // group]  # (tile//group, D) fp32
    if kind == "int8":
        codes = refs[0][:].astype(jnp.float32)
    elif kind == "int4":
        u = refs[0][:].astype(jnp.int32) & 0xFF  # stored int8 bit patterns
        codes = (
            jnp.concatenate([u & 0xF, (u >> 4) & 0xF], axis=0) - qmax
        ).astype(jnp.float32)
    elif kind == "int6":
        u4 = refs[0][:].astype(jnp.int32) & 0xFF
        low4 = jnp.concatenate([u4 & 0xF, (u4 >> 4) & 0xF], axis=0)
        u2 = refs[1][:].astype(jnp.int32) & 0xFF
        high2 = jnp.concatenate(
            [(u2 >> (2 * p)) & 0x3 for p in range(4)], axis=0
        )
        codes = (low4 | (high2 << 4)) - qmax
        codes = codes.astype(jnp.float32)
    else:  # pragma: no cover - pack enumerates the kinds above
        raise ValueError(kind)
    d = scale.shape[-1]
    g = tile // group
    scale_rows = jnp.broadcast_to(
        scale[:, None, :], (g, group, d)
    ).reshape(tile, d)
    return codes * scale_rows


def _absorbed_quant_kernel(
    *refs,
    kind: str,
    r: int,
    scale: float,
    tile: int,
    n_tiles: int,
    group: int,
    qmax: int,
):
    """Quantized-resident twin of `mla_absorbed_pallas._absorbed_kernel`."""
    n_code = {"int8": 1, "int4": 1, "int6": 2}[kind]
    pos_ref, q_ref = refs[0], refs[1]
    code_refs = refs[2 : 2 + n_code + 1]  # planes + scale block
    new_ref = refs[2 + n_code + 1]
    o_ref, ent_ref = refs[-6], refs[-5]
    m_sc, l_sc, ws_sc, acc_sc = refs[-4:]

    ti = pl.program_id(0)

    @pl.when(ti == 0)
    def _init():
        m_sc[:] = jnp.full(m_sc.shape, _MASKED, jnp.float32)
        l_sc[:] = jnp.zeros(l_sc.shape, jnp.float32)
        ws_sc[:] = jnp.zeros(ws_sc.shape, jnp.float32)
        acc_sc[:] = jnp.zeros(acc_sc.shape, jnp.float32)

    pos = pos_ref[0, 0]
    h_pad = q_ref.shape[0]
    q = q_ref[:].astype(jnp.float32)
    lat = _dequant_block(kind, code_refs, tile, group, qmax)  # (tile, D) fp32

    s = jax.lax.dot_general(
        q, lat, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    col = jax.lax.broadcasted_iota(jnp.int32, (h_pad, tile), 1) + ti * tile
    s = jnp.where(col < pos, s, jnp.float32(_MASKED))
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + ti * tile
    c_blk = jnp.where(row < pos, lat[:, :r], jnp.zeros((), jnp.float32))

    def online_update(s_blk, c_blk):
        m_new = jnp.maximum(m_sc[:], jnp.max(s_blk, axis=-1, keepdims=True))
        alpha = jnp.exp(m_sc[:] - m_new)
        p = jnp.exp(s_blk - m_new)
        l_sc[:] = alpha * l_sc[:] + jnp.sum(p, axis=-1, keepdims=True)
        ws_sc[:] = alpha * ws_sc[:] + jnp.sum(p * s_blk, axis=-1, keepdims=True)
        acc_sc[:] = alpha * acc_sc[:] + jax.lax.dot_general(
            p, c_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_sc[:] = m_new

    online_update(s, c_blk)

    @pl.when(ti == n_tiles - 1)
    def _self_and_emit():
        new = new_ref[:].astype(jnp.float32)  # fp32: the live row is exact
        s_self = jax.lax.dot_general(
            q, new, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * jnp.float32(scale)
        rr = jax.lax.broadcasted_iota(jnp.int32, s_self.shape, 1)
        s_self = jnp.where(rr == 0, s_self, jnp.float32(_MASKED))
        online_update(s_self, new[:, :r])

        l = l_sc[:]
        o_ref[:] = (acc_sc[:] / l).astype(o_ref.dtype)
        ent_ref[:] = (m_sc[:] + jnp.log(l) - ws_sc[:] / l).astype(ent_ref.dtype)


def mla_absorbed_attention_quant(
    q: jax.Array,
    packed: tuple,
    latent_new: jax.Array,
    position: jax.Array,
    *,
    kv_lora_rank: int,
    scale: float,
    interpret: bool | None = None,
):
    """One layer's absorbed decode attention over a PACKED latent cache.

    Contract of `mla_absorbed_pallas.mla_absorbed_attention`, with the
    cache shipped as ``packed = pack_resident_latent(latent, scheme,
    tile)`` — the HBM operands are the bit-packed code planes + fp16-
    valued scales; fp32 rows exist only as VMEM tiles. The new token's
    own latent row stays exact fp32 (it is live state, quantized only
    when appended to the stored cache). Returns (o_lat (H, r), entropy
    (H,)).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ops, (kind, s_buf, latent_dim, group, qmax, tile, n_tiles) = packed
    h = q.shape[0]
    r = kv_lora_rank
    h_pad = round_up(h, SUBLANE)

    q_p = jnp.zeros((h_pad, latent_dim), q.dtype).at[:h].set(q)
    new_p = (
        jnp.zeros((SUBLANE, latent_dim), latent_new.dtype)
        .at[:1]
        .set(latent_new)
    )
    pos_arr = jnp.asarray(position, jnp.int32).reshape(1, 1)

    kernel = partial(
        _absorbed_quant_kernel,
        kind=kind,
        r=r,
        scale=float(scale),
        tile=tile,
        n_tiles=n_tiles,
        group=group,
        qmax=qmax,
    )
    rows_per_tile = {"int8": (tile,), "int4": (tile // 2,), "int6": (tile // 2, tile // 4)}[kind]
    code_specs = [
        pl.BlockSpec((rt, latent_dim), lambda ti, _rt=rt: (ti, 0),
                     memory_space=pltpu.VMEM)
        for rt in rows_per_tile
    ]
    scale_rows = int(ops[-1].shape[0]) // n_tiles  # g_per_tile, 8-padded
    scale_spec = pl.BlockSpec(
        (scale_rows, latent_dim), lambda ti: (ti, 0),
        memory_space=pltpu.VMEM,
    )
    o_lat, ent = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (h_pad, latent_dim), lambda ti: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            *code_specs,
            scale_spec,
            pl.BlockSpec(
                (SUBLANE, latent_dim), lambda ti: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((h_pad, r), lambda ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h_pad, 1), lambda ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h_pad, r), jnp.float32),
            jax.ShapeDtypeStruct((h_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((h_pad, 1), jnp.float32),
            pltpu.VMEM((h_pad, 1), jnp.float32),
            pltpu.VMEM((h_pad, 1), jnp.float32),
            pltpu.VMEM((h_pad, r), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * h_pad * (n_tiles * tile) * (latent_dim + r),
            bytes_accessed=sum(
                int(np.prod(o.shape)) * jnp.dtype(o.dtype).itemsize
                for o in ops
            )
            + (2 * h_pad * latent_dim + h_pad * r) * 4,
            transcendentals=h_pad * (n_tiles * tile),
        ),
        interpret=interpret,
    )(pos_arr, q_p, *ops, new_p)
    return o_lat[:h], ent[:h, 0]
