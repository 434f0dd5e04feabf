"""Shared dataclasses and the architecture registry for the TPU pipeline.

Mirrors the data contracts of the reference pipeline
(`/root/reference/nerf_attention/types.py:10-100`) so that metrics and on-disk
JSON schemas are directly comparable, while everything tensor-shaped is a JAX
pytree / numpy array rather than a torch module.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np


@dataclass(frozen=True)
class SIRENConfig:
    """Architecture of one sinusoidal MLP (contract: reference types.py:10-15)."""

    hidden_features: int = 256
    hidden_layers: int = 2
    omega_0: float = 30.0
    name: str = "medium"

    def num_parameters(self, out_features: int) -> int:
        """Parameter count of the network this config describes."""
        h = self.hidden_features
        n = (1 * h + h)                       # first sine layer
        n += self.hidden_layers * (h * h + h)  # hidden sine layers
        n += h * out_features + out_features   # final linear
        return n


@dataclass
class FitResult:
    """Outcome of fitting one SIREN to one (seq_len, d_head) tensor.

    Field-for-field the contract of reference types.py:18-37, except `model`
    (a torch nn.Module there) is replaced by `params`: a JAX pytree of
    numpy arrays (list of (W, b) per layer, W laid out (in, out)).
    """

    params: Any
    config: SIRENConfig
    target_mean: np.ndarray
    target_std: np.ndarray
    losses: list[float]
    final_mse: float
    final_cosine_mean: float
    final_cosine_min: float
    final_cosine_std: float
    per_pos_mse: np.ndarray
    cosine_sims: np.ndarray
    compression_ratio: float
    raw_size_bytes: int
    siren_size_bytes: int
    train_time_seconds: float
    seq_len: int
    d_head: int
    num_parameters: int


@dataclass
class KVMetadata:
    """On-disk metadata.json schema (contract: reference types.py:40-63)."""

    model_name: str
    num_layers: int
    num_kv_heads: int
    seq_len: int
    head_dim: int
    actual_tokens: int
    dtype: str = "float32"  # on-disk dtype; KV caches are natively fp16/bf16
    # MLA caches (DeepSeek, models/mla_jax.py) have a VALUE head dim that
    # differs from the key head dim; None (every other family) keeps the
    # reference schema byte-identical — the key is only emitted when set.
    v_head_dim: int | None = None

    def to_dict(self) -> dict:
        d = {
            "model_name": self.model_name,
            "num_layers": self.num_layers,
            "num_kv_heads": self.num_kv_heads,
            "seq_len": self.seq_len,
            "head_dim": self.head_dim,
            "actual_tokens": self.actual_tokens,
            "dtype": self.dtype,
        }
        if self.v_head_dim is not None:
            d["v_head_dim"] = self.v_head_dim
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "KVMetadata":
        fields = cls.__dataclass_fields__
        return cls(**{k: v for k, v in d.items() if k in fields})


@dataclass
class LayerSummary:
    """Per-layer structure metrics (contract: reference types.py:66-74)."""

    layer: int
    avg_autocorr_k: float
    avg_autocorr_v: float
    avg_energy_10pct_k: float
    avg_energy_10pct_v: float
    avg_rank_ratio_k: float
    avg_rank_ratio_v: float


@dataclass
class AnalysisResult:
    """Aggregate analysis output (contract: reference types.py:77-84)."""

    metadata: KVMetadata
    layer_summaries: list[LayerSummary]
    avg_autocorr_keys: float
    avg_autocorr_values: float
    avg_spectral_keys: float
    avg_spectral_values: float


# Architecture registry — the exact 2 quick / 7 full sweeps of the reference
# (types.py:87-100). Names, widths, depths and omega_0 values are load-bearing:
# downstream figures key off `config.name`.
CONFIGS_QUICK: list[SIRENConfig] = [
    SIRENConfig(128, 1, 30.0, "small"),
    SIRENConfig(256, 2, 30.0, "medium"),
]

CONFIGS_FULL: list[SIRENConfig] = [
    SIRENConfig(64, 1, 30.0, "tiny"),
    SIRENConfig(128, 1, 30.0, "small"),
    SIRENConfig(256, 2, 30.0, "medium"),
    SIRENConfig(512, 2, 30.0, "large"),
    SIRENConfig(256, 3, 30.0, "deep"),
    SIRENConfig(256, 2, 60.0, "hifreq"),
    SIRENConfig(256, 2, 15.0, "lofreq"),
]

CONFIGS_BY_NAME: dict[str, SIRENConfig] = {c.name: c for c in CONFIGS_FULL}
