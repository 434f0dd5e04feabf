"""Bit-packed quantized SIREN checkpoint storage.

Beyond-reference extension (round 4). The quantization experiment
(`experiments/quantized_params.py`) measures what int/fp-reduced *storage*
costs in reconstruction quality, and `ops/quantize.py:param_bytes` prices
the payload — but until this module the payload only ever existed in
memory, so the measured deployment rule ("shared-omega nets ship at
int4-g128+QAT, FM nets at int8-g32", FINDINGS_TPU.md) had no serving
round-trip. Here the exact payload `quantize_params` produces is persisted
to a single ``.npz``: integer codes densely bit-packed (ceil(B/8) bytes per
weight), fp16 group scales, fp16 biases — the stored array bytes equal
``param_bytes`` exactly, so the on-disk artifact IS the compression the
Pareto claims. Loading dequantizes to fp32 bit-identically to the in-memory
``quantize_params`` view and returns the same dict contract as
`io/checkpoint.py:load_siren_checkpoint` (which dispatches here on the
``scheme`` metadata key), so evaluate / aggregate-decode / the fused Pallas
decode kernel consume quantized checkpoints unmodified.

The reference stores fp32 torch pickles only
(`/root/reference/nerf_attention/fit.py:121-137`); this format is the
storage half it has no equivalent of.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from nerf_attention_tpu.ops.quantize import (
    parse_scheme,
    param_bytes,
    quantize_params,
    split_scheme,
)
from nerf_attention_tpu.types import SIRENConfig

def pack_codes(q: np.ndarray, bits: int) -> np.ndarray:
    """Pack symmetric int codes (-qmax..qmax) into a dense little-endian
    ``bits``-bit stream (uint8). ceil(size*bits/8) bytes — the accounting
    ``param_bytes`` charges for an int<B> payload.

    Uses the native codec (`native/qcodec.cpp`, bit-exact twin) when a
    compiler is available; the numpy path is the fallback."""
    from nerf_attention_tpu.native import load_qcodec

    lib = load_qcodec()
    if lib is not None:
        import ctypes

        codes = np.ascontiguousarray(q.reshape(-1), dtype=np.int8)
        out = np.empty(-(-codes.size * bits // 8), dtype=np.uint8)
        lib.pack_codes(
            codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            ctypes.c_long(codes.size), ctypes.c_int(bits),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out
    qmax = (1 << (bits - 1)) - 1
    u = (q.reshape(-1).astype(np.int16) + qmax).astype(np.uint8)
    if bits == 8:
        return u
    unpacked = np.unpackbits(u[:, None], axis=1, bitorder="little", count=bits)
    return np.packbits(unpacked.reshape(-1), bitorder="little")


def unpack_codes(packed: np.ndarray, bits: int, size: int) -> np.ndarray:
    """Inverse of :func:`pack_codes` — recover ``size`` int8 codes."""
    from nerf_attention_tpu.native import load_qcodec

    lib = load_qcodec()
    if lib is not None:
        import ctypes

        src = np.ascontiguousarray(np.asarray(packed, np.uint8))
        out = np.empty(size, dtype=np.int8)
        lib.unpack_codes(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_long(size), ctypes.c_int(bits),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        )
        return out
    qmax = (1 << (bits - 1)) - 1
    if bits == 8:
        u = packed[:size]
    else:
        unpacked = np.unpackbits(
            np.asarray(packed, np.uint8), bitorder="little", count=size * bits
        ).reshape(size, bits)
        u = np.packbits(unpacked, axis=1, bitorder="little")[:, 0]
    return (u.astype(np.int16) - qmax).astype(np.int8)


def _bf16_store(x: np.ndarray) -> np.ndarray:
    """bf16-rounded fp32 -> the 2-byte stored form (high half of the bits)."""
    return (np.ascontiguousarray(x, np.float32).view(np.uint32) >> 16).astype(
        np.uint16
    )


def _bf16_load(u: np.ndarray) -> np.ndarray:
    return (u.astype(np.uint32) << 16).view(np.float32)


def save_quantized_siren_checkpoint(
    path: Path,
    params: list[tuple[np.ndarray, np.ndarray]],
    scheme: str,
    config: SIRENConfig,
    out_features: int,
    target_mean: np.ndarray,
    target_std: np.ndarray,
    metrics: dict,
    fm_mult: float | None = None,
) -> Path:
    """Quantize fp32 master params under ``scheme`` and persist the payload.

    The caller passes MASTER weights (post-QAT if QAT was run —
    `nerf_attention_tpu/compress.py`); quantization happens here so the
    stored grid is exactly `ops/quantize.py`'s. Weight matrices must be the
    SIREN's 2-D (in, out) layout.
    """
    kind, bits, group = parse_scheme(scheme)
    _, l0fp32 = split_scheme(scheme)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    for w, _ in params:
        if np.ndim(w) != 2:
            raise ValueError(f"expected 2-D (in, out) weights, got {np.shape(w)}")

    payloads, _ = quantize_params(params, scheme)
    arrays: dict[str, np.ndarray] = {
        "target_mean": np.asarray(target_mean, dtype=np.float32),
        "target_std": np.asarray(target_std, dtype=np.float32),
    }
    for i, (w_pay, b_pay) in enumerate(payloads):
        if l0fp32 and i == 0:  # _l0fp32: layer 0 persists as raw fp32
            arrays[f"w_{i}"] = w_pay["data"]
            arrays[f"b_{i}"] = b_pay["data"]
        elif kind in ("fp32", "fp16"):
            arrays[f"w_{i}"] = w_pay["data"]
            arrays[f"b_{i}"] = b_pay["data"]
        elif kind == "bf16":
            arrays[f"w_{i}"] = _bf16_store(w_pay["data"])
            arrays[f"b_{i}"] = _bf16_store(b_pay["data"])
        elif group is not None:  # group-wise int<B>: packed codes + fp16
            rows, channels = np.shape(params[i][0])
            # quantize pads the reduction axis to a whole number of groups;
            # store only the real rows so the packed stream costs exactly
            # ceil(size*B/8) — the bytes param_bytes charges.
            q_rows = w_pay["data"].reshape(-1, channels)[:rows]
            arrays[f"w_{i}_codes"] = pack_codes(q_rows, bits)
            arrays[f"w_{i}_scale"] = w_pay["scale"]  # (n_groups, out) fp16
            arrays[f"b_{i}"] = b_pay["data"]  # fp16 (quantize_params contract)
        else:  # per-channel int8 weights, per-tensor int8 biases
            arrays[f"w_{i}_codes"] = w_pay["data"]
            arrays[f"w_{i}_scale"] = np.asarray(w_pay["scale"], np.float32)
            arrays[f"b_{i}_codes"] = b_pay["data"]
            arrays[f"b_{i}_scale"] = np.asarray(b_pay["scale"], np.float32)

    meta = {
        "config": {
            "hidden_features": config.hidden_features,
            "hidden_layers": config.hidden_layers,
            "omega_0": config.omega_0,
            "name": config.name,
            "out_features": out_features,
        },
        "num_layers": len(params),
        "metrics": metrics,
        "scheme": scheme,
        "w_shapes": [list(np.shape(w)) for w, _ in params],
        "stored_bytes": param_bytes(params, scheme),
    }
    if fm_mult is not None:
        meta["config"]["fm_mult"] = fm_mult
    np.savez(
        path,
        __meta__=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        **arrays,
    )
    return path


def dequantize_arrays(data, meta: dict) -> list[tuple[np.ndarray, np.ndarray]]:
    """Rebuild fp32 params from a quantized npz — bit-identical to the
    in-memory ``quantize_params(..)[1]`` view of the saved master weights
    (same dtypes, same op order as `ops/quantize.py`). ``data`` is the open
    npz mapping; called by ``checkpoint.load_siren_checkpoint``."""
    kind, bits, group = parse_scheme(meta["scheme"])
    _, l0fp32 = split_scheme(meta["scheme"])
    params = []
    for i, w_shape in enumerate(meta["w_shapes"]):
        rows, channels = int(w_shape[0]), int(w_shape[1])
        if l0fp32 and i == 0:
            params.append((data[f"w_{i}"], data[f"b_{i}"]))
        elif kind == "fp32":
            params.append((data[f"w_{i}"], data[f"b_{i}"]))
        elif kind == "fp16":
            params.append(
                (
                    data[f"w_{i}"].astype(np.float32),
                    data[f"b_{i}"].astype(np.float32),
                )
            )
        elif kind == "bf16":
            params.append((_bf16_load(data[f"w_{i}"]), _bf16_load(data[f"b_{i}"])))
        elif group is not None:
            q = unpack_codes(
                data[f"w_{i}_codes"], bits, rows * channels
            ).reshape(rows, channels)
            # One fp16 scale per `group` rows per channel: expand to rows.
            scale_rows = np.repeat(
                data[f"w_{i}_scale"].astype(np.float32), group, axis=0
            )[:rows]
            w = q.astype(np.float32) * scale_rows
            params.append((w, data[f"b_{i}"].astype(np.float32)))
        else:  # per-channel int8
            w = data[f"w_{i}_codes"].astype(np.float32) * data[
                f"w_{i}_scale"
            ].reshape(1, -1)
            b = data[f"b_{i}_codes"].astype(np.float32) * np.float32(
                data[f"b_{i}_scale"]
            )
            params.append((w, b))
    return params
