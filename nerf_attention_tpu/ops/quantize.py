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

SCHEMES = ("fp32", "bf16", "fp16", "int8")


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


def quantize_array(x: np.ndarray, scheme: str, axis: int | None = None):
    """Quantize one array -> (stored payload dict, dequantized fp32 view).

    ``axis`` selects the scale axis for int8 (per-output-channel for weight
    matrices, per-tensor when None). The payload dict is what a serializer
    would persist; ``param_bytes`` accounts its size.
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
    raise ValueError(f"scheme must be one of {SCHEMES}, got {scheme!r}")


def quantize_params(params, scheme: str):
    """Quantize a SIREN parameter list -> (payloads, dequantized params).

    Weights get per-output-channel int8 scales (last axis); biases are
    per-tensor (tiny anyway). The dequantized list is fp32 and drops into
    ``siren_apply`` unchanged.
    """
    payloads, dq_params = [], []
    for w, b in params:
        w_payload, w_dq = quantize_array(w, scheme, axis=np.ndim(w) - 1)
        b_payload, b_dq = quantize_array(b, scheme, axis=None)
        payloads.append((w_payload, b_payload))
        dq_params.append((w_dq, b_dq))
    return payloads, dq_params


_ELEM_BYTES = {"fp32": 4, "bf16": 2, "fp16": 2, "int8": 1}


def param_bytes(params, scheme: str) -> int:
    """Stored size of a quantized SIREN (int8 includes its fp32 scales)."""
    if scheme not in SCHEMES:
        raise ValueError(f"scheme must be one of {SCHEMES}, got {scheme!r}")
    elem = _ELEM_BYTES[scheme]
    total = 0
    for w, b in params:
        w, b = np.asarray(w), np.asarray(b)
        total += w.size * elem + b.size * elem
        if scheme == "int8":
            total += w.shape[-1] * 4 + 4  # per-channel scales + bias scale
    return total
