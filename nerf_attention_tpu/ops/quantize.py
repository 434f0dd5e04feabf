"""SIREN parameter quantization for the compression accounting.

Beyond-reference extension (round 3). The study's central metric is
``compression_ratio = raw_fp16_bytes / (params * 4)`` — the reference
hard-codes fp32 parameter storage (`/root/reference/nerf_attention/siren.py:
63-67`, `fit.py:127-128`), which is why a medium SIREN at S=2048 reads as
0.8x ("expansion"). Storing the trained network in bf16/fp16 doubles the
ratio, and int8 (symmetric, per-output-channel scales for weights) roughly
quadruples it; whether the reconstruction survives is an empirical question
this module lets the quantization experiment answer
(`experiments/quantized_params.py`).

Quantization here is post-training and storage-only: parameters are
de-quantized to fp32 before the forward pass, so the measured quality delta
isolates the ROUNDING of the stored representation (the decode kernel's
compute precision is studied separately — benchmarks/r2/decode_ladder.json).
"""

from __future__ import annotations

import re

import numpy as np

SCHEMES = ("fp32", "bf16", "fp16", "int8", "int4")

INT4_GROUP = 32  # reduction-axis elements sharing one fp16 scale


def split_scheme(scheme: str) -> tuple[str, bool]:
    """Strip the ``_l0fp32`` modifier -> (base scheme, l0fp32 flag).

    ``_l0fp32`` stores the FIRST layer's weights AND bias in fp32. For
    FM-SIRENs this is the whole storage-fragility fix: unit i's layer-0
    rounding error becomes phase error scaled by ``omega_0 * m_i`` (up to
    64x a shared-omega net's sensitivity — FINDINGS "storage-fragile"),
    and layer 0 is (1, hidden) + (hidden,) — ~0.3% of a medium net's
    bytes. Measured on-chip: an FM-64 value net at S=4096 reads 0.42
    under plain fp16 storage and 0.8005 (= the fp32 master) with the
    modifier.
    """
    if scheme.endswith("_l0fp32"):
        return scheme[: -len("_l0fp32")], True
    return scheme, False


def parse_scheme(scheme: str) -> tuple[str, int | None, int | None]:
    """Parse a scheme name -> (kind, bits, group) of its BASE grid.

    Beyond the named SCHEMES, group-wise integer schemes are parameterized
    as ``int<B>_g<N>`` (B in 2..8 bits, one fp16 scale per N reduction-axis
    elements per channel): ``int3_g64``, ``int8_g32``, … Plain ``int4`` is
    ``int4_g32`` (INT4_GROUP); plain ``int8`` is the r3 per-channel scheme
    (group=None). Returns bits/group None for the float schemes. A
    ``_l0fp32`` modifier (see :func:`split_scheme`) is stripped first —
    callers that branch on the first layer use ``split_scheme``.
    """
    scheme, _ = split_scheme(scheme)
    if scheme in ("fp32", "bf16", "fp16"):
        return scheme, None, None
    if scheme == "int8":
        return "int", 8, None
    if scheme == "int4":
        return "int", 4, INT4_GROUP
    m = re.fullmatch(r"int([2-8])_g(\d+)", scheme)
    if m:
        bits, group = int(m.group(1)), int(m.group(2))
        if group < 1:
            raise ValueError(f"group must be >= 1 in {scheme!r}")
        return "int", bits, group
    raise ValueError(
        f"scheme must be one of {SCHEMES} or int<B>_g<N>, got {scheme!r}"
    )


def _to_bf16(x: np.ndarray) -> np.ndarray:
    """Round-to-nearest-even fp32 -> bf16, returned as the rounded fp32."""
    x = np.asarray(x, dtype=np.float32)
    u = x.view(np.uint32)
    with np.errstate(over="ignore"):
        rounded = (u + 0x7FFF + ((u >> 16) & 1)) & 0xFFFF0000
    out = rounded.astype(np.uint32).view(np.float32)
    # The integer rounding carries into the exponent for max-exponent inputs
    # (NaN/Inf bit patterns wrap to a wrong finite value) — propagate the
    # non-finite input unchanged instead.
    return np.where(np.isfinite(x), out, x)


def _int_groupwise(x: np.ndarray, axis: int | None, group: int, bits: int):
    """Symmetric ``bits``-bit (-qmax..qmax, qmax = 2^(bits-1)-1) with one
    fp16 scale per ``group`` elements of the reduction axis, per channel
    along ``axis`` (per-tensor groups when None). Returns (payload,
    dequantized fp32).

    The scale grid is the STORED grid: scales round to fp16 before the
    dequant multiply, so this function is the exact decode a serializer
    would perform (and the exact grid ``ops/qat.py`` fine-tunes against).
    """
    qmax = (1 << (bits - 1)) - 1
    if axis is None:
        cols = x.reshape(-1, 1)
    else:
        cols = np.moveaxis(x, axis, -1).reshape(-1, x.shape[axis])
    rows, channels = cols.shape
    n_groups = -(-rows // group)
    pad = n_groups * group - rows
    grouped = np.pad(cols, ((0, pad), (0, 0))).reshape(n_groups, group, channels)
    amax = np.abs(grouped).max(axis=1)  # (n_groups, channels)
    # Floor at fp16's smallest normal: an all-zero/dead group would
    # otherwise round its scale to fp16 zero and the dequant divide below
    # turns into NaN (and NaN-poisons the jax QAT twin, ops/qat.py, which
    # must clamp identically to share the stored grid bit-for-bit).
    scale = np.maximum(
        (np.maximum(amax, 1e-12) / qmax).astype(np.float16),
        np.finfo(np.float16).tiny,
    )
    scale_f32 = scale.astype(np.float32)[:, None, :]
    q = np.clip(np.rint(grouped / scale_f32), -qmax, qmax).astype(np.int8)
    dq = (q.astype(np.float32) * scale_f32).reshape(-1, channels)[:rows]
    if axis is None:
        dq = dq.reshape(x.shape)
    else:
        moved_shape = np.moveaxis(x, axis, -1).shape
        dq = np.moveaxis(dq.reshape(moved_shape), -1, axis)
    return {"data": q, "scale": scale, "group": group, "bits": bits}, dq


def groupwise_scale_count(
    shape: tuple[int, ...], axis: int | None, group: int
) -> int:
    """Number of group-wise scales an int<B>_g<N> payload stores."""
    size = int(np.prod(shape))
    if axis is None:
        return -(-size // group)
    channels = shape[axis]
    return -(-(size // channels) // group) * channels


def quantize_array(x: np.ndarray, scheme: str, axis: int | None = None):
    """Quantize one array -> (stored payload dict, dequantized fp32 view).

    ``axis`` selects the scale axis for per-channel int8 (per-output-channel
    for weight matrices, per-tensor when None); for the group-wise integer
    schemes (``int4``, ``int<B>_g<N>``) it is the channel axis whose
    reduction dim is cut into group-element scale groups. The payload dict
    is what a serializer would persist; ``param_bytes`` accounts its size.
    """
    kind, bits, group = parse_scheme(scheme)
    x = np.asarray(x, dtype=np.float32)
    if kind == "fp32":
        return {"data": x}, x
    if kind == "bf16":
        dq = _to_bf16(x)
        return {"data": dq}, dq  # stored as 2 bytes/elem
    if kind == "fp16":
        data = x.astype(np.float16)
        return {"data": data}, data.astype(np.float32)
    if group is not None:
        return _int_groupwise(x, axis, group, bits)
    # per-channel (or per-tensor) int8 — the r3 scheme
    if axis is None:
        amax = np.max(np.abs(x))
        scale = np.float32(max(amax, 1e-12) / 127.0)
        q = np.clip(np.rint(x / scale), -127, 127).astype(np.int8)
        return {"data": q, "scale": scale}, q.astype(np.float32) * scale
    amax = np.max(np.abs(x), axis=tuple(a for a in range(x.ndim) if a != axis))
    scale = (np.maximum(amax, 1e-12) / 127.0).astype(np.float32)
    shape = [1] * x.ndim
    shape[axis] = -1
    scale_b = scale.reshape(shape)
    q = np.clip(np.rint(x / scale_b), -127, 127).astype(np.int8)
    return {"data": q, "scale": scale}, q.astype(np.float32) * scale_b


def quantize_params(params, scheme: str):
    """Quantize a SIREN parameter list -> (payloads, dequantized params).

    Weights get per-output-channel int8 scales (last axis) or group-wise
    fp16 scales (``int4`` / ``int<B>_g<N>``: group input rows per scale,
    per output channel); biases are per-tensor int8 under plain int8, and
    fp16 under every group-wise scheme (a bias is one row — coarse rounding
    there costs quality for ~0.1% of the bytes). A ``_l0fp32`` scheme
    stores layer 0 (weights AND bias) in fp32 — the FM phase-sensitivity
    fix (:func:`split_scheme`). The dequantized list is fp32 and drops
    into ``siren_apply`` unchanged.
    """
    base, l0fp32 = split_scheme(scheme)
    _, _, group = parse_scheme(base)
    payloads, dq_params = [], []
    for i, (w, b) in enumerate(params):
        if l0fp32 and i == 0:
            payloads.append(
                (quantize_array(w, "fp32")[0], quantize_array(b, "fp32")[0])
            )
            dq_params.append(
                (np.asarray(w, np.float32), np.asarray(b, np.float32))
            )
            continue
        w_payload, w_dq = quantize_array(w, base, axis=np.ndim(w) - 1)
        b_payload, b_dq = quantize_array(
            b, "fp16" if group is not None else base, axis=None
        )
        payloads.append((w_payload, b_payload))
        dq_params.append((w_dq, b_dq))
    return payloads, dq_params


_ELEM_BYTES = {"fp32": 4, "bf16": 2, "fp16": 2}


def tensor_bytes(
    shape: tuple[int, ...], scheme: str, axis: int | None = None
) -> int:
    """Stored size of ONE raw tensor under ``scheme`` — the exact layout
    :func:`quantize_array` produces: float schemes at their element width;
    group-wise int<B> packs B-bit codes densely plus fp16 group scales;
    per-channel int8 stores 1 byte/elem plus fp32 channel scales. This is
    the tensor-payload twin of :func:`param_bytes` (which prices SIREN
    (w, b) lists), used to price quantized CACHE surfaces (e.g. the MLA
    latent) on the same accounting as quantized parameters."""
    kind, bits, group = parse_scheme(scheme)
    if split_scheme(scheme)[1]:
        raise ValueError("_l0fp32 is a parameter-list modifier, not a tensor scheme")
    size = int(np.prod(shape))
    if kind in _ELEM_BYTES:
        return size * _ELEM_BYTES[kind]
    if group is not None:
        return -(-(size * bits) // 8) + groupwise_scale_count(
            shape, axis, group
        ) * 2
    return size + (shape[axis] if axis is not None else 1) * 4


def param_bytes(params, scheme: str) -> int:
    """Stored size of a quantized SIREN — the exact layout
    ``quantize_params`` produces: per-channel int8 includes its fp32
    scales; a group-wise int<B> scheme packs B-bit weights densely
    (ceil(size*B/8) bytes) plus fp16 group scales and fp16 biases; a
    ``_l0fp32`` modifier charges layer 0 at 4 bytes/param."""
    kind, bits, group = parse_scheme(scheme)
    _, l0fp32 = split_scheme(scheme)
    total = 0
    for i, (w, b) in enumerate(params):
        w, b = np.asarray(w), np.asarray(b)
        if l0fp32 and i == 0:
            total += (w.size + b.size) * 4
            continue
        if group is not None:
            total += -(-(w.size * bits) // 8)  # dense bit-packing
            total += groupwise_scale_count(w.shape, np.ndim(w) - 1, group) * 2
            total += b.size * 2  # fp16 biases
            continue
        elem = 1 if kind == "int" else _ELEM_BYTES[kind]
        total += w.size * elem + b.size * elem
        if kind == "int":
            total += w.shape[-1] * 4 + 4  # per-channel scales + bias scale
    return total
