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

import numpy as np

SCHEMES = ("fp32", "bf16", "fp16", "int8", "int4")

INT4_GROUP = 32  # reduction-axis elements sharing one fp16 scale


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


def _int4_groupwise(x: np.ndarray, axis: int | None, group: int):
    """Symmetric 4-bit (-7..7) with one fp16 scale per ``group`` elements
    of the reduction axis, per channel along ``axis`` (per-tensor groups
    when None). Returns (payload, dequantized fp32).

    The scale grid is the STORED grid: scales round to fp16 before the
    dequant multiply, so this function is the exact decode a serializer
    would perform (and the exact grid ``ops/qat.py`` fine-tunes against).
    """
    if axis is None:
        cols = x.reshape(-1, 1)
    else:
        cols = np.moveaxis(x, axis, -1).reshape(-1, x.shape[axis])
    rows, channels = cols.shape
    n_groups = -(-rows // group)
    pad = n_groups * group - rows
    grouped = np.pad(cols, ((0, pad), (0, 0))).reshape(n_groups, group, channels)
    amax = np.abs(grouped).max(axis=1)  # (n_groups, channels)
    scale = (np.maximum(amax, 1e-12) / 7.0).astype(np.float16)
    scale_f32 = scale.astype(np.float32)[:, None, :]
    q = np.clip(np.rint(grouped / scale_f32), -7, 7).astype(np.int8)
    dq = (q.astype(np.float32) * scale_f32).reshape(-1, channels)[:rows]
    if axis is None:
        dq = dq.reshape(x.shape)
    else:
        moved_shape = np.moveaxis(x, axis, -1).shape
        dq = np.moveaxis(dq.reshape(moved_shape), -1, axis)
    return {"data": q, "scale": scale, "group": group}, dq


def int4_scale_count(shape: tuple[int, ...], axis: int | None, group: int) -> int:
    """Number of group-wise scales an int4 payload stores for this shape."""
    size = int(np.prod(shape))
    if axis is None:
        return -(-size // group)
    channels = shape[axis]
    return -(-(size // channels) // group) * channels


def quantize_array(
    x: np.ndarray, scheme: str, axis: int | None = None, group: int = INT4_GROUP
):
    """Quantize one array -> (stored payload dict, dequantized fp32 view).

    ``axis`` selects the scale axis for int8 (per-output-channel for weight
    matrices, per-tensor when None); for int4 it is the channel axis whose
    reduction dim is cut into ``group``-element scale groups. The payload
    dict is what a serializer would persist; ``param_bytes`` accounts its
    size.
    """
    x = np.asarray(x, dtype=np.float32)
    if scheme == "fp32":
        return {"data": x}, x
    if scheme == "bf16":
        dq = _to_bf16(x)
        return {"data": dq}, dq  # stored as 2 bytes/elem
    if scheme == "fp16":
        data = x.astype(np.float16)
        return {"data": data}, data.astype(np.float32)
    if scheme == "int8":
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
    if scheme == "int4":
        return _int4_groupwise(x, axis, group)
    raise ValueError(f"scheme must be one of {SCHEMES}, got {scheme!r}")


def quantize_params(params, scheme: str, group: int = INT4_GROUP):
    """Quantize a SIREN parameter list -> (payloads, dequantized params).

    Weights get per-output-channel int8 scales (last axis) or group-wise
    int4 scales (``group`` input rows per fp16 scale, per output channel);
    biases are per-tensor int8, and fp16 under int4 (a bias is one row —
    4-bit rounding there costs quality for ~0.1% of the bytes). The
    dequantized list is fp32 and drops into ``siren_apply`` unchanged.
    """
    payloads, dq_params = [], []
    for w, b in params:
        w_payload, w_dq = quantize_array(w, scheme, axis=np.ndim(w) - 1, group=group)
        b_payload, b_dq = quantize_array(
            b, "fp16" if scheme == "int4" else scheme, axis=None
        )
        payloads.append((w_payload, b_payload))
        dq_params.append((w_dq, b_dq))
    return payloads, dq_params


_ELEM_BYTES = {"fp32": 4, "bf16": 2, "fp16": 2, "int8": 1}


def param_bytes(params, scheme: str, group: int = INT4_GROUP) -> int:
    """Stored size of a quantized SIREN (int8 includes its fp32 scales;
    int4 packs two 4-bit weights per byte plus fp16 group scales and fp16
    biases — the exact layout ``quantize_params`` produces)."""
    if scheme not in SCHEMES:
        raise ValueError(f"scheme must be one of {SCHEMES}, got {scheme!r}")
    total = 0
    for w, b in params:
        w, b = np.asarray(w), np.asarray(b)
        if scheme == "int4":
            total += -(-w.size // 2)  # two nibbles per byte
            total += int4_scale_count(w.shape, np.ndim(w) - 1, group) * 2
            total += b.size * 2  # fp16 biases
            continue
        elem = _ELEM_BYTES[scheme]
        total += w.size * elem + b.size * elem
        if scheme == "int8":
            total += w.shape[-1] * 4 + 4  # per-channel scales + bias scale
    return total
