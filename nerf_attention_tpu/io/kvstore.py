"""On-disk KV-cache store.

Directory contract (compatible with the reference pipeline,
`/root/reference/nerf_attention/extract.py:159-173`):

    <kv_dir>/layer_{NN:02d}.npz   # native: float32 'keys'/'values', shape (H, S, D)
    <kv_dir>/metadata.json        # KVMetadata schema

The reader transparently accepts reference-produced ``layer_NN.pt`` files
(torch.save dicts) as well, so a user can point this framework at KV caches
extracted by the original CUDA pipeline and everything downstream just works.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from nerf_attention_tpu.types import KVMetadata


def save_layer(kv_dir: Path, layer_idx: int, keys: np.ndarray, values: np.ndarray) -> Path:
    """Write one layer's (H, S, D) keys/values as float32 npz."""
    kv_dir = Path(kv_dir)
    kv_dir.mkdir(parents=True, exist_ok=True)
    path = kv_dir / f"layer_{layer_idx:02d}.npz"
    np.savez(
        path,
        keys=np.asarray(keys, dtype=np.float32),
        values=np.asarray(values, dtype=np.float32),
    )
    return path


def layer_path(kv_dir: Path, layer_idx: int) -> Path | None:
    """Locate a layer file, preferring native npz, falling back to torch .pt."""
    kv_dir = Path(kv_dir)
    npz = kv_dir / f"layer_{layer_idx:02d}.npz"
    if npz.exists():
        return npz
    pt = kv_dir / f"layer_{layer_idx:02d}.pt"
    if pt.exists():
        return pt
    return None


def load_layer(kv_dir: Path, layer_idx: int) -> tuple[np.ndarray, np.ndarray]:
    """Read one layer -> (keys, values), each float32 (H, S, D)."""
    path = layer_path(kv_dir, layer_idx)
    if path is None:
        raise FileNotFoundError(f"layer {layer_idx} not found under {kv_dir}")
    if path.suffix == ".npz":
        with np.load(path) as data:
            return data["keys"], data["values"]
    # Reference-format torch checkpoint ({'keys': Tensor, 'values': Tensor}).
    import torch  # local import: torch is optional at runtime

    data = torch.load(path, map_location="cpu", weights_only=True)
    return (
        data["keys"].float().numpy(),
        data["values"].float().numpy(),
    )


def export_layer_torch(kv_dir: Path, layer_idx: int, out_dir: Path | None = None) -> Path:
    """Write one layer as a reference-format torch file (``layer_NN.pt``).

    The payload matches what the reference's extraction writes
    (`/root/reference/nerf_attention/extract.py:159-162`): a dict of float32
    CPU tensors ``{'keys': (H,S,D), 'values': (H,S,D)}`` — so the reference
    pipeline's own readers run unmodified on caches produced here.
    """
    import torch  # local import: torch is optional at runtime

    keys, values = load_layer(kv_dir, layer_idx)
    out_dir = Path(out_dir) if out_dir is not None else Path(kv_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / f"layer_{layer_idx:02d}.pt"
    torch.save(
        {"keys": torch.as_tensor(keys), "values": torch.as_tensor(values)},
        path,
    )
    return path


def has_layer(kv_dir: Path, layer_idx: int) -> bool:
    return layer_path(kv_dir, layer_idx) is not None


def save_metadata(kv_dir: Path, metadata: KVMetadata) -> None:
    kv_dir = Path(kv_dir)
    kv_dir.mkdir(parents=True, exist_ok=True)
    with open(kv_dir / "metadata.json", "w") as f:
        json.dump(metadata.to_dict(), f, indent=2)


def load_metadata(kv_dir: Path) -> KVMetadata:
    with open(Path(kv_dir) / "metadata.json") as f:
        return KVMetadata.from_dict(json.load(f))
