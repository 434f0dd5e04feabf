"""Quantized-resident fused SIREN kernels (Pallas/TPU).

Round-5 closure of the storage-compression frontier's last gap: until this
module, the int4/int6/int8 payloads `ops/quantize.py` prices and
`io/quantized.py` persists were true only AT REST — `load_siren_checkpoint`
dequantized to fp32 on the host, so the fused decode/attention kernels
(`ops/siren_pallas.py`, `ops/siren_attention_pallas.py`) kept fp32 weights
in device HBM and the bytes `serve-plan` claimed to free never left the
serving chip. Here the packed codes themselves are the HBM-resident
operands, and dequantization happens in VMEM inside the kernel, per tile:

  * int8 codes ride as raw int8 (R, C) arrays;
  * int4 codes pack two rows per byte in a PLANE layout — byte r of an
    (ceil(R/2), C) int8 array holds biased code r in its low nibble and
    biased code r + ceil(R/2) in its high nibble — so the in-kernel unpack
    is two masked shifts and one sublane-axis concatenate (no gathers, no
    per-element addressing: everything stays vectorized on the VPU);
  * int6 splits each biased code into a low nibble (int4-style plane) and
    a high 2-bit field (four codes per byte, again plane-ordered), for
    exactly 6 bits/param of code bytes;
  * group scales are stored as fp32 arrays holding exactly fp16-rounded
    values (fp16 -> fp32 is exact), so the in-kernel dequant multiply is
    BIT-IDENTICAL to the host path `quantize_params(...)[1]` — parity with
    the at-rest storage tests carries over unchanged;
  * layer 0 ((1, H) — the VPU broadcast layer) and biases stay as their
    dequantized fp32 values: a few hundred bytes, and fp32 keeps the
    `_l0fp32` FM phase-sensitivity rule intact by construction.

The kernels reuse `ops/siren_pallas._layer_stack` verbatim through
dequantizing weight views, so the decode math (polynomial sine, bf16
matmul option, FM multipliers) is the measured one.

Reference equivalent: none — the reference stores fp32 torch pickles and
times an fp32 eager forward (`/root/reference/nerf_attention/evaluate.py:
173-242`); a quantized-resident serving path is beyond it.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_attention_tpu.ops.quantize import parse_scheme, quantize_params, split_scheme
from nerf_attention_tpu.ops.siren_pallas import _layer_stack
from nerf_attention_tpu.ops.tiling import SUBLANE, round_up

DEFAULT_TILE = 512
_MASKED = -1e30


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _pack_nibble_planes(biased: np.ndarray) -> np.ndarray:
    """(N, R, C) biased codes (0..15) -> (N, ceil(R/2), C) packed int8.

    Byte r holds code r (low nibble) and code r + ceil(R/2) (high nibble);
    the kernel unpacks with two masked shifts + one sublane concat.
    """
    n, r, c = biased.shape
    rh = _ceil_div(r, 2)
    padded = np.zeros((n, 2 * rh, c), np.uint8)
    padded[:, :r] = biased
    low, high = padded[:, :rh], padded[:, rh:]
    return (low | (high << 4)).astype(np.int8)


def _pack_quarter_planes(two_bit: np.ndarray) -> np.ndarray:
    """(N, R, C) 2-bit fields (0..3) -> (N, ceil(R/4), C) packed int8.

    Byte r holds rows {r, r+Rq, r+2Rq, r+3Rq} at bit offsets {0, 2, 4, 6}.
    """
    n, r, c = two_bit.shape
    rq = _ceil_div(r, 4)
    padded = np.zeros((n, 4 * rq, c), np.uint8)
    padded[:, :r] = two_bit
    planes = [padded[:, p * rq : (p + 1) * rq] for p in range(4)]
    out = planes[0] | (planes[1] << 2) | (planes[2] << 4) | (planes[3] << 6)
    return out.astype(np.int8)


def pack_resident_params(params, scheme: str):
    """Quantize a batched SIREN parameter list into HBM-resident operands.

    ``params``: [(W, b), ...] with a leading network axis — W (N, R, C),
    b (N, C). Quantization grid is EXACTLY `ops/quantize.py:quantize_params`
    (applied per network, same op order), so a parity test against the host
    dequant path must match bit-for-bit in fp32 compute.

    Returns ``(ops, layout)``: ``ops`` is the flat list of jax arrays that
    become pallas_call operands (per layer: packed codes / scales / bias,
    or fp32 w / bias), ``layout`` a static (hashable) tuple the kernel uses
    to rebuild per-layer dequantizing views. Resident bytes = sum of
    ``op.nbytes`` — see :func:`resident_param_bytes`.
    """
    kind, bits, group = parse_scheme(scheme)
    _, l0fp32 = split_scheme(scheme)
    n = int(np.shape(params[0][0])[0])
    n_layers = len(params)

    # Per-network host quantization (offline, load-time): guarantees the
    # exact quantize_params grid including its group padding per network.
    per_net = [
        quantize_params(
            [(np.asarray(w)[i], np.asarray(b)[i]) for w, b in params], scheme
        )
        for i in range(n)
    ]

    ops: list[jax.Array] = []
    layout: list[tuple] = []
    for li in range(n_layers):
        r, c = int(np.shape(params[li][0])[1]), int(np.shape(params[li][0])[2])
        dq_w = np.stack([per_net[i][1][li][0] for i in range(n)])  # (N, R, C) fp32
        dq_b = np.stack([per_net[i][1][li][1] for i in range(n)]).reshape(n, 1, c)
        quantized_int = (
            kind == "int" and group is not None and not (l0fp32 and li == 0) and r > 1
        )
        if not quantized_int:
            # fp32/fp16/bf16 schemes, layer 0, and per-channel int8 all ship
            # their dequantized values (bit-exact; layer 0 and biases are a
            # negligible fraction of the bytes; bf16 ships 2-byte exact).
            if kind == "bf16":
                ops += [jnp.asarray(dq_w, jnp.bfloat16), jnp.asarray(dq_b, jnp.float32)]
                layout.append(("dense", r, c))
            else:
                ops += [jnp.asarray(dq_w), jnp.asarray(dq_b)]
                layout.append(("dense", r, c))
            continue

        qmax = (1 << (bits - 1)) - 1
        codes = np.stack(
            [
                per_net[i][0][li][0]["data"].reshape(-1, c)[:r]
                for i in range(n)
            ]
        ).astype(np.int8)  # (N, R, C) signed codes
        scale = np.stack(
            [per_net[i][0][li][0]["scale"] for i in range(n)]
        ).astype(np.float32)  # (N, G, C), fp16-valued
        if bits == 8:
            ops += [jnp.asarray(codes)]
            layout.append(("int8", r, c, group, qmax))
        elif bits == 4:
            biased = (codes.astype(np.int16) + qmax).astype(np.uint8)
            ops += [jnp.asarray(_pack_nibble_planes(biased))]
            layout.append(("int4", r, c, group, qmax))
        elif bits == 6:
            biased = (codes.astype(np.int16) + qmax).astype(np.uint8)
            ops += [
                jnp.asarray(_pack_nibble_planes(biased & 0xF)),
                jnp.asarray(_pack_quarter_planes(biased >> 4)),
            ]
            layout.append(("int6", r, c, group, qmax))
        else:  # 2/3/5/7-bit grids: codes byte-aligned (honest 1 B/param)
            ops += [jnp.asarray(codes)]
            layout.append(("int8", r, c, group, qmax))
        ops += [jnp.asarray(scale), jnp.asarray(dq_b)]
    return ops, tuple(layout)


def resident_param_bytes(ops) -> int:
    """Actual HBM bytes the packed operands occupy (codes+scales+biases)."""
    return int(
        sum(int(np.prod(o.shape)) * jnp.dtype(o.dtype).itemsize for o in ops)
    )


def _expand_scale(scale: jax.Array, group: int, rows: int) -> jax.Array:
    """(G, C) group scales -> (rows, C): broadcast + leading-dim collapse."""
    g, c = scale.shape
    return jnp.broadcast_to(scale[:, None, :], (g, group, c)).reshape(
        g * group, c
    )[:rows]


class _QuantWeightView:
    """Dequantizing weight view: `view[:]` yields the fp32 (R, C) matrix.

    ``refs`` are the per-network-blocked operand refs of one layer (codes
    planes + scale); reads go through ``ref[0]`` to drop the blocked
    network axis. The arithmetic mirrors `ops/quantize.py` dequant exactly:
    codes * fp16-valued-fp32 scale, in fp32.
    """

    def __init__(self, entry: tuple, refs: list):
        self._entry = entry
        self._refs = refs

    def __getitem__(self, _):
        kind = self._entry[0]
        if kind == "dense":
            return self._refs[0][0].astype(jnp.float32)
        _, rows, _c, group, qmax = self._entry
        scale = self._refs[-1][0]  # (G, C) fp32
        if kind == "int8":
            codes = self._refs[0][0].astype(jnp.float32)
        elif kind == "int4":
            # Unpack in int32: Mosaic has no i8 vector shift (arith.shrsi
            # fails to legalize) and the VPU is 32-bit natively — VMEM
            # still holds the packed int8 bytes, only registers widen.
            u = self._refs[0][0].astype(jnp.int32)  # (Rh, C) byte patterns
            low = u & 0xF
            high = (u >> 4) & 0xF
            codes = (
                jnp.concatenate([low, high], axis=0)[:rows] - qmax
            ).astype(jnp.float32)
        elif kind == "int6":
            u4 = self._refs[0][0].astype(jnp.int32)
            low4 = jnp.concatenate([u4 & 0xF, (u4 >> 4) & 0xF], axis=0)
            u2 = self._refs[1][0].astype(jnp.int32)
            high2 = jnp.concatenate(
                [(u2 >> (2 * p)) & 0x3 for p in range(4)], axis=0
            )
            biased = low4[:rows] | (high2[:rows] << 4)
            codes = (biased - qmax).astype(jnp.float32)
        else:  # pragma: no cover - layout enumerates the kinds above
            raise ValueError(kind)
        return codes * _expand_scale(scale, group, rows)


class _BiasView:
    def __init__(self, ref):
        self._ref = ref

    def __getitem__(self, _):
        return self._ref[0]


def _ops_per_layer(entry: tuple) -> int:
    return {"dense": 2, "int8": 3, "int4": 3, "int6": 4}[entry[0]]


def _build_views(layout: tuple, refs: list) -> list:
    """Flat [w_view, b_view, ...] list consumable by `_layer_stack`."""
    views, pos = [], 0
    for entry in layout:
        k = _ops_per_layer(entry)
        layer_refs = refs[pos : pos + k]
        views.append(_QuantWeightView(entry, layer_refs[:-1]))
        views.append(_BiasView(layer_refs[-1]))
        pos += k
    return views


def _block_specs(layout: tuple, ops, index_map) -> list:
    """Per-network blocked VMEM specs for the packed operand list."""
    return [
        pl.BlockSpec((1, *o.shape[1:]), index_map, memory_space=pltpu.VMEM)
        for o in ops
    ]


def _decode_quant_kernel(
    *refs, layout: tuple, omega: float, seq_len: int, tile: int,
    n_layers: int, compute_dtype, sin_impl: str, fm: bool,
):
    out_ref = refs[-1]
    n_ops = sum(_ops_per_layer(e) for e in layout)
    views = _build_views(layout, list(refs[:n_ops]))
    mult = refs[n_ops][:] if fm else None

    t_idx = pl.program_id(1)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + t_idx * tile
    x = row.astype(jnp.float32) / jnp.float32(max(seq_len - 1, 1))
    out_ref[0] = _layer_stack(
        views, x, omega, n_layers, compute_dtype, sin_impl, mult=mult
    ).astype(out_ref.dtype)


@partial(
    jax.jit,
    static_argnames=(
        "layout", "omega", "seq_len", "tile", "interpret", "compute_dtype",
        "sin_impl", "fm_mult",
    ),
)
def _decode_batch_quant_jit(
    ops, layout, omega, seq_len, tile, interpret, compute_dtype, sin_impl,
    fm_mult,
):
    n = ops[0].shape[0]
    n_layers = len(layout)
    d_out = layout[-1][2]
    hidden = layout[0][2]
    tile = min(tile, round_up(seq_len, SUBLANE))
    padded_s = round_up(seq_len, tile)
    grid = (n, padded_s // tile)

    flat = list(ops)
    in_specs = _block_specs(layout, flat, lambda ni, ti: (ni, 0, 0))
    if fm_mult is not None:
        from nerf_attention_tpu.models.siren import fm_frequency_multipliers

        flat.append(fm_frequency_multipliers(hidden, fm_mult).reshape(1, hidden))
        in_specs.append(
            pl.BlockSpec((1, hidden), lambda ni, ti: (0, 0), memory_space=pltpu.VMEM)
        )
    kernel = partial(
        _decode_quant_kernel,
        layout=layout,
        omega=float(omega),
        seq_len=seq_len,
        tile=tile,
        n_layers=n_layers,
        compute_dtype=compute_dtype,
        sin_impl=sin_impl,
        fm=fm_mult is not None,
    )
    resident = sum(int(np.prod(o.shape)) * jnp.dtype(o.dtype).itemsize for o in flat)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tile, d_out), lambda ni, ti: (ni, ti, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, padded_s, d_out), compute_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n * padded_s * 2 * hidden * (hidden * (n_layers - 2) + d_out),
            bytes_accessed=resident
            + n * padded_s * d_out * jnp.dtype(compute_dtype).itemsize,
            transcendentals=n * padded_s * hidden * (n_layers - 1),
        ),
        interpret=interpret,
    )(*flat)
    return out[:, :seq_len, :]


def siren_decode_batch_quant(
    params,
    scheme: str,
    omega: float,
    seq_len: int,
    tile: int = DEFAULT_TILE,
    interpret: bool | None = None,
    compute_dtype=jnp.float32,
    sin_impl: str = "exact",
    fm_mult: float | None = None,
    packed=None,
):
    """Batched fused decode with quantized weights RESIDENT in HBM.

    Same contract as `siren_pallas.siren_decode_batch` — params [(W, b), ...]
    with leading network axis, returns (N, seq_len, D) — but the device
    buffers hold the bit-packed int codes of ``scheme`` (int8_g32 /
    int6_g64 / int4_g128 / ..._l0fp32), not fp32 weights. Output is
    bit-identical to running the plain kernel on the host-dequantized
    params (same grid, same fp32 op order). ``packed`` short-circuits
    packing with a prior :func:`pack_resident_params` result.
    """
    if packed is None:
        packed = pack_resident_params(params, scheme)
    ops, layout = packed
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _decode_batch_quant_jit(
        tuple(ops), layout, float(omega), seq_len, tile, interpret,
        compute_dtype, sin_impl, fm_mult,
    )


def siren_decode_batch_quant_sharded(
    params,
    scheme: str,
    omega: float,
    seq_len: int,
    mesh,
    axis: str = "fit",
    interpret: bool | None = None,
    compute_dtype=jnp.float32,
    sin_impl: str = "exact",
    fm_mult: float | None = None,
    packed=None,
):
    """Quantized-resident batched decode with the network axis over a mesh.

    The serving scale-out of `siren_decode_batch_quant`: every packed
    operand carries a leading network axis (codes planes, scales, biases
    alike), so the whole payload shards with zero collectives — each
    device holds only its shard's PACKED bytes, keeping the resident-HBM
    win per chip. N must divide the mesh size.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nerf_attention_tpu.parallel.mesh import shard_map_compat

    if packed is None:
        packed = pack_resident_params(params, scheme)
    ops, layout = packed
    n = int(ops[0].shape[0])
    n_dev = int(np.prod(mesh.devices.shape))
    if n % n_dev:
        raise ValueError(f"network count {n} not divisible by mesh size {n_dev}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    leaf = P(axis, None, None)
    body = lambda ops_local: _decode_batch_quant_jit(
        tuple(ops_local), layout, float(omega), seq_len, DEFAULT_TILE,
        interpret, compute_dtype, sin_impl, fm_mult,
    )
    fn = shard_map_compat(
        body, mesh=mesh, in_specs=(tuple(leaf for _ in ops),), out_specs=leaf
    )
    sharded_ops = tuple(
        jax.device_put(o, NamedSharding(mesh, leaf)) for o in ops
    )
    return fn(sharded_ops)


def _attn_quant_kernel(
    *refs, k_layout: tuple, v_layout: tuple, omega: float, seq_len: int,
    tile: int, n_tiles: int, n_layers: int, n_queries: int, compute_dtype,
    sin_impl: str, fm: bool, causal: bool, stats: bool = False,
):
    """Quantized-resident twin of `siren_attention_pallas._attn_kernel`.

    ``stats=True`` additionally writes the online-softmax running max m
    and denominator l per query row — the sufficient statistics for
    EXACTLY merging this attention segment with extra columns computed
    outside the kernel (the hybrid decode step's self column:
    softmax([cache, self]) = (l·e^{m-M}·o + e^{s-M}·v_self) / (l·e^{m-M}
    + e^{s-M}) with M = max(m, s)).
    """
    if stats:
        out_ref, m_ref, l_ref = refs[-3], refs[-2], refs[-1]
        refs = refs[:-2]
    else:
        out_ref = refs[-1]
    nk = sum(_ops_per_layer(e) for e in k_layout)
    nv = sum(_ops_per_layer(e) for e in v_layout)
    k_refs = _build_views(k_layout, list(refs[:nk]))
    v_refs = _build_views(v_layout, list(refs[nk : nk + nv]))
    base = nk + nv
    k_mean = refs[base][0]
    k_std = refs[base + 1][0]
    v_mean = refs[base + 2][0]
    v_std = refs[base + 3][0]
    q = refs[base + 4][0].astype(jnp.float32)
    mult = refs[base + 5][:] if fm else None

    t_pad, d = q.shape
    q_scaled = q * jnp.float32(1.0 / math.sqrt(d))
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
        )
        v_tile = (
            _layer_stack(v_refs, x, omega, n_layers, compute_dtype, sin_impl, mult)
            * v_std
            + v_mean
        )
        s = jax.lax.dot_general(
            q_scaled, k_tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pos = jax.lax.broadcasted_iota(jnp.int32, (t_pad, tile), 1) + ti * tile
        allowed = pos <= q_pos if causal else pos < seq_len
        s = jnp.where(allowed, s, jnp.float32(_MASKED))
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = alpha * acc + jax.lax.dot_general(
            p.astype(compute_dtype), v_tile.astype(compute_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    init = (
        jnp.full((t_pad, 1), _MASKED, jnp.float32),
        jnp.zeros((t_pad, 1), jnp.float32),
        jnp.zeros((t_pad, d), jnp.float32),
    )
    m, l, acc = jax.lax.fori_loop(0, n_tiles, body, init)
    out_ref[0] = (acc / l).astype(out_ref.dtype)
    if stats:
        m_ref[0] = m.astype(m_ref.dtype)
        l_ref[0] = l.astype(l_ref.dtype)


@partial(
    jax.jit,
    static_argnames=(
        "k_layout", "v_layout", "omega", "seq_len", "tile", "interpret",
        "compute_dtype", "sin_impl", "fm_mult", "causal", "stats",
    ),
)
def _attn_quant_jit(
    k_ops, v_ops, k_mean, k_std, v_mean, v_std, q, k_layout, v_layout,
    omega, seq_len, tile, interpret, compute_dtype, sin_impl, fm_mult, causal,
    stats=False,
):
    n, n_queries, d = q.shape
    n_layers = len(k_layout)
    hidden = k_layout[0][2]
    tile = min(tile, round_up(seq_len, SUBLANE))
    padded_s = round_up(seq_len, tile)
    t_pad = round_up(n_queries, SUBLANE)

    flat = list(k_ops) + list(v_ops)
    in_specs = _block_specs(k_layout, k_ops, lambda ni: (ni, 0, 0))
    in_specs += _block_specs(v_layout, v_ops, lambda ni: (ni, 0, 0))
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
        _attn_quant_kernel,
        k_layout=k_layout,
        v_layout=v_layout,
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
        stats=stats,
    )
    resident = sum(int(np.prod(o.shape)) * jnp.dtype(o.dtype).itemsize
                   for o in list(k_ops) + list(v_ops))
    out_spec = pl.BlockSpec(
        (1, t_pad, d), lambda ni: (ni, 0, 0), memory_space=pltpu.VMEM
    )
    stat_spec = pl.BlockSpec(
        (1, t_pad, 1), lambda ni: (ni, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((n, t_pad, d), jnp.float32)
    stat_shape = jax.ShapeDtypeStruct((n, t_pad, 1), jnp.float32)
    result = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=in_specs,
        out_specs=(out_spec, stat_spec, stat_spec) if stats else out_spec,
        out_shape=(out_shape, stat_shape, stat_shape) if stats else out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n * padded_s
            * (4 * hidden * (hidden * (n_layers - 2) + d) + 4 * t_pad * d),
            bytes_accessed=resident + 2 * n * t_pad * d * 4,
            transcendentals=n * padded_s * (2 * hidden * (n_layers - 1) + t_pad),
        ),
        interpret=interpret,
    )(*flat)
    if stats:
        out, m, l = result
        return (
            out[:, :n_queries, :],
            m[:, :n_queries, 0],
            l[:, :n_queries, 0],
        )
    return result[:, :n_queries, :]


def siren_attention_decode_quant(
    k_params,
    v_params,
    k_mean,
    k_std,
    v_mean,
    v_std,
    q,
    scheme: str,
    omega: float,
    seq_len: int,
    tile: int = DEFAULT_TILE,
    interpret: bool | None = None,
    compute_dtype=jnp.float32,
    sin_impl: str = "fast",
    fm_mult: float | None = None,
    causal: bool = True,
    packed: tuple | None = None,
    return_stats: bool = False,
):
    """Attention-from-parameters with quantized weights resident in HBM.

    Contract of `siren_attention_pallas.siren_attention_decode_fused`, with
    both heads' nets shipped as the bit-packed ``scheme`` payload; K-hat and
    V-hat tiles are dequantized AND reconstructed in VMEM and consumed by
    the online softmax without ever existing in HBM — at any precision.
    ``packed`` short-circuits with prior ``(k_packed, v_packed)`` results
    from :func:`pack_resident_params`. ``scheme='fp32'`` runs the exact
    master weights through the same kernel (the unquantized variant).

    ``return_stats=True`` returns ``(o, m, l)`` with m/l each (N, T) —
    the online softmax's running max and denominator, sufficient to merge
    this segment EXACTLY with extra attention columns computed outside
    (the hybrid decode step's self column —
    `models.llama_jax.llama_decode_step_hybrid`).
    """
    if packed is None:
        packed = (
            pack_resident_params(k_params, scheme),
            pack_resident_params(v_params, scheme),
        )
    (k_ops, k_layout), (v_ops, v_layout) = packed
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _attn_quant_jit(
        tuple(k_ops), tuple(v_ops),
        jnp.asarray(k_mean), jnp.asarray(k_std),
        jnp.asarray(v_mean), jnp.asarray(v_std),
        jnp.asarray(q), k_layout, v_layout, float(omega), seq_len, tile,
        interpret, compute_dtype, sin_impl, fm_mult, causal, return_stats,
    )


def siren_attention_decode_quant_sharded(
    k_params,
    v_params,
    k_mean,
    k_std,
    v_mean,
    v_std,
    q,
    scheme: str,
    omega: float,
    seq_len: int,
    mesh,
    axis: str = "fit",
    tile: int = DEFAULT_TILE,
    interpret: bool | None = None,
    compute_dtype=jnp.float32,
    sin_impl: str = "fast",
    fm_mult: float | None = None,
    causal: bool = True,
    packed: tuple | None = None,
    return_stats: bool = False,
):
    """Quantized-resident attention-from-parameters, heads over a mesh.

    The serving scale-out of `siren_attention_decode_quant` and the
    multi-chip form of the hybrid serving engine's kernel segment
    (`models/llama_hybrid.py`): each device holds ONLY its heads' packed
    payload bytes (every packed operand — code planes, scales, biases —
    carries the leading net axis, so the whole payload shards with zero
    collectives), reconstructs K-hat/V-hat tiles in VMEM, and runs the
    online softmax for its heads. With ``return_stats=True`` the per-head
    (m, l) statistics come back sharded the same way, so a TP hybrid
    step can merge tail/self columns shard-locally — still zero
    collectives until the model's own o-projection all-reduce. Head
    count must divide the mesh size.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nerf_attention_tpu.parallel.mesh import shard_map_compat

    if packed is None:
        packed = (
            pack_resident_params(k_params, scheme),
            pack_resident_params(v_params, scheme),
        )
    (k_ops, k_layout), (v_ops, v_layout) = packed
    n = q.shape[0]
    n_dev = int(np.prod(mesh.devices.shape))
    if n % n_dev:
        raise ValueError(f"head count {n} not divisible by mesh size {n_dev}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    leaf = P(axis, None, None)
    stat = P(axis, None)

    def body(k_ops_l, v_ops_l, km, ks, vm, vs, qq):
        return _attn_quant_jit(
            tuple(k_ops_l), tuple(v_ops_l), km, ks, vm, vs, qq,
            k_layout, v_layout, float(omega), seq_len, tile, interpret,
            compute_dtype, sin_impl, fm_mult, causal, return_stats,
        )

    fn = shard_map_compat(
        body,
        mesh=mesh,
        in_specs=(
            tuple(leaf for _ in k_ops),
            tuple(leaf for _ in v_ops),
            leaf, leaf, leaf, leaf, leaf,
        ),
        out_specs=(leaf, stat, stat) if return_stats else leaf,
    )
    shard = lambda x, spec: jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, spec)
    )
    d = q.shape[-1]
    return fn(
        tuple(shard(o, leaf) for o in k_ops),
        tuple(shard(o, leaf) for o in v_ops),
        shard(jnp.asarray(k_mean, jnp.float32).reshape(n, 1, d), leaf),
        shard(jnp.asarray(k_std, jnp.float32).reshape(n, 1, d), leaf),
        shard(jnp.asarray(v_mean, jnp.float32).reshape(n, 1, d), leaf),
        shard(jnp.asarray(v_std, jnp.float32).reshape(n, 1, d), leaf),
        shard(q, leaf),
    )
