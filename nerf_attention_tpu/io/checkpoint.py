"""SIREN checkpoint save/load.

Payload contract mirrors the reference checkpoints
(`/root/reference/nerf_attention/fit.py:121-137`): model params, architecture
config (+ out_features), target mean/std for de-normalization, and the metrics
record. Stored as a single ``.npz`` (arrays + one JSON metadata entry) instead
of a torch pickle. Reference ``*_model.pt`` checkpoints load transparently
through the same API (torch state_dicts mapped onto the JAX (in, out) layout),
so ``evaluate``/``profile_latency`` run directly on checkpoints produced by
the reference's fit sweep.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from nerf_attention_tpu.types import SIRENConfig


def save_siren_checkpoint(
    path: Path,
    params: list[tuple[np.ndarray, np.ndarray]],
    config: SIRENConfig,
    out_features: int,
    target_mean: np.ndarray,
    target_std: np.ndarray,
    metrics: dict,
    fm_mult: float | None = None,
) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
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
    }
    if fm_mult is not None:
        # FM-SIREN per-unit first-layer frequency spread (models/siren.py);
        # readers must reconstruct with siren_apply_fm or the forward is a
        # different network. Additive key: plain checkpoints are unchanged.
        meta["config"]["fm_mult"] = fm_mult
    arrays: dict[str, np.ndarray] = {
        "target_mean": np.asarray(target_mean, dtype=np.float32),
        "target_std": np.asarray(target_std, dtype=np.float32),
    }
    for i, (w, b) in enumerate(params):
        arrays[f"w_{i}"] = np.asarray(w, dtype=np.float32)
        arrays[f"b_{i}"] = np.asarray(b, dtype=np.float32)
    np.savez(path, __meta__=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8), **arrays)
    return path


def save_torch_siren_checkpoint(
    path: Path,
    params: list[tuple[np.ndarray, np.ndarray]],
    config: SIRENConfig,
    out_features: int,
    target_mean: np.ndarray,
    target_std: np.ndarray,
    metrics: dict,
) -> Path | None:
    """Write a reference-format torch ``.pt`` checkpoint.

    The payload mirrors `/root/reference/nerf_attention/fit.py:121-137`
    exactly, so the reference's own ``evaluate.py`` loads it unmodified via
    ``model.load_state_dict``: state-dict keys are
    ``network.{i}.linear.{weight,bias}`` for sine layers and
    ``network.{n}.{weight,bias}`` for the final plain Linear, weights in
    torch's (out, in) layout, target mean/std as (1, D) tensors.

    Returns None (no-op) when torch is unavailable.
    """
    try:
        import torch
    except ImportError:
        return None

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    n_layers = len(params)
    state: dict = {}
    for i, (w, b) in enumerate(params):
        module = f"network.{i}.linear" if i < n_layers - 1 else f"network.{i}"
        # Explicit copies: the arrays may be non-writable views of jax
        # buffers, which torch.as_tensor would alias with a warning.
        state[f"{module}.weight"] = torch.from_numpy(
            np.array(w, dtype=np.float32).T.copy()
        )
        state[f"{module}.bias"] = torch.from_numpy(
            np.array(b, dtype=np.float32, copy=True)
        )
    torch.save(
        {
            "model_state": state,
            "config": {
                "hidden_features": config.hidden_features,
                "hidden_layers": config.hidden_layers,
                "omega_0": config.omega_0,
                "name": config.name,
                "out_features": out_features,
            },
            "target_mean": torch.from_numpy(
                np.array(target_mean, dtype=np.float32, copy=True).reshape(1, -1)
            ),
            "target_std": torch.from_numpy(
                np.array(target_std, dtype=np.float32, copy=True).reshape(1, -1)
            ),
            "metrics": metrics,
        },
        path,
    )
    return path


def _load_torch_siren_checkpoint(path: Path) -> dict:
    """Reference-format torch checkpoint (fit.py:121-137, evaluate.py:34-45).

    The state_dict keys are ``network.{i}.linear.{weight,bias}`` for sine
    layers and ``network.{n}.{weight,bias}`` for the final plain Linear;
    torch Linear weights are (out, in) and are transposed to this
    framework's (in, out) layout.
    """
    import torch

    payload = torch.load(Path(path), map_location="cpu", weights_only=True)
    per_layer: dict[int, dict[str, np.ndarray]] = {}
    for key, tensor in payload["model_state"].items():
        parts = key.split(".")
        layer_idx, kind = int(parts[1]), parts[-1]
        per_layer.setdefault(layer_idx, {})[kind] = np.asarray(
            tensor.detach().to(torch.float32).numpy()
        )
    params = [
        (per_layer[i]["weight"].T.copy(), per_layer[i]["bias"])
        for i in sorted(per_layer)
    ]
    cfg = payload["config"]
    return {
        "params": params,
        "config": SIRENConfig(
            hidden_features=cfg["hidden_features"],
            hidden_layers=cfg["hidden_layers"],
            omega_0=cfg["omega_0"],
            name=cfg.get("name", "medium"),
        ),
        "out_features": cfg["out_features"],
        "target_mean": np.asarray(
            torch.as_tensor(payload["target_mean"]).to(torch.float32).numpy()
        ),
        "target_std": np.asarray(
            torch.as_tensor(payload["target_std"]).to(torch.float32).numpy()
        ),
        "metrics": payload.get("metrics", {}),
        "fm_mult": None,  # reference checkpoints are always shared-omega
        "scheme": None,  # torch pickles are always fp32 (fit.py:121-137)
    }


def load_siren_checkpoint(path: Path) -> dict:
    """Load a checkpoint -> dict(params, config, out_features, target_mean/std, metrics).

    Accepts this framework's ``.npz`` and the reference's torch ``.pt``.
    """
    if Path(path).suffix == ".pt":
        return _load_torch_siren_checkpoint(path)
    with np.load(Path(path)) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        if "scheme" in meta:
            # Bit-packed quantized checkpoint (io/quantized.py) — params
            # come back dequantized fp32, so every consumer of this dict
            # (evaluate, aggregate-decode, fused decode) works unchanged.
            from nerf_attention_tpu.io.quantized import dequantize_arrays

            params = dequantize_arrays(data, meta)
        else:
            params = [
                (data[f"w_{i}"], data[f"b_{i}"]) for i in range(meta["num_layers"])
            ]
        target_mean = data["target_mean"]
        target_std = data["target_std"]
    cfg = meta["config"]
    config = SIRENConfig(
        hidden_features=cfg["hidden_features"],
        hidden_layers=cfg["hidden_layers"],
        omega_0=cfg["omega_0"],
        name=cfg.get("name", "medium"),
    )
    return {
        "params": params,
        "config": config,
        "out_features": cfg["out_features"],
        "target_mean": target_mean,
        "target_std": target_std,
        "metrics": meta["metrics"],
        "fm_mult": cfg.get("fm_mult"),
        # Storage scheme for quantized checkpoints (io/quantized.py);
        # None for plain fp32 payloads.
        "scheme": meta.get("scheme"),
    }


def checkpoint_glob(directory: Path, pattern: str = "*_model") -> list[Path]:
    """All SIREN checkpoints under a directory, native .npz and reference .pt.

    ``pattern`` is a stem glob (no suffix); patterns that already name a
    suffix keep their exact meaning.
    """
    directory = Path(directory)
    if pattern.endswith((".npz", ".pt")):
        return sorted(directory.glob(pattern))
    # One entry per checkpoint name: where both formats exist for the same
    # stem (e.g. reference .pt beside this framework's .npz), prefer .npz so
    # callers never time/stack the same network twice.
    by_stem = {p.stem: p for p in directory.glob(pattern + ".pt")}
    by_stem.update({p.stem: p for p in directory.glob(pattern + ".npz")})
    return sorted(by_stem.values())
