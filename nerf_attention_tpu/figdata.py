"""Plot-data preparation: pure functions from result records to arrays.

Every figure in this framework is rendered from the output of one of these
helpers, never from ad-hoc aggregation inside matplotlib code. That keeps
the numeric content of each panel unit-testable without a display backend
(`tests/test_figdata.py`) and keeps the rendering functions down to pure
styling. The *outputs* (panel semantics, computed findings) match the
reference's summary figures (`/root/reference/nerf_attention/evaluate.py:245-343`,
`/root/reference/nerf_attention/experiments/summary.py:13-212`); the
structure is this framework's own.

Records are the flat dicts of ``fit_results.json`` (schema:
``fit.py:result_to_record``).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

QUALITY = "final_cosine_mean"


def column(records: Sequence[dict], field: str) -> np.ndarray:
    """One field of every record as a float array (order-preserving)."""
    return np.asarray([rec[field] for rec in records], dtype=float)


def metric_by(
    records: Sequence[dict], group_field: str, metric: str = QUALITY
) -> dict:
    """Group a metric by a record field -> {group: np.ndarray}, sorted keys."""
    grouped: dict = {}
    for rec in records:
        grouped.setdefault(rec[group_field], []).append(rec[metric])
    return {key: np.asarray(grouped[key], dtype=float) for key in sorted(grouped)}


def only(records: Sequence[dict], **field_values) -> list[dict]:
    """Records matching every given field == value filter."""
    return [
        rec
        for rec in records
        if all(rec.get(field) == value for field, value in field_values.items())
    ]


def pareto_series(records: Sequence[dict]) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """Per architecture: (compression ratios, quality) point clouds."""
    return {
        name: (
            column(group_records, "compression_ratio"),
            column(group_records, QUALITY),
        )
        for name, group_records in _by_config(records).items()
    }


def _by_config(records: Sequence[dict]) -> dict[str, list[dict]]:
    grouped: dict[str, list[dict]] = {}
    for rec in records:
        grouped.setdefault(rec["config_name"], []).append(rec)
    return {name: grouped[name] for name in sorted(grouped)}


def kv_quality(records: Sequence[dict], config_name: str | None = None):
    """(keys quality array, values quality array), optionally one config."""
    pool = only(records, config_name=config_name) if config_name else list(records)
    by_type = metric_by(pool, "kv_type")
    empty = np.asarray([], dtype=float)
    return by_type.get("key", empty), by_type.get("value", empty)


def layer_stats(records: Sequence[dict]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Quality grouped by layer -> (layers, per-layer mean, per-layer std)."""
    by_layer = metric_by(records, "layer")
    layers = np.asarray(list(by_layer), dtype=int)
    means = np.asarray([by_layer[layer].mean() for layer in by_layer])
    stds = np.asarray([by_layer[layer].std() for layer in by_layer])
    return layers, means, stds


def kv_gap_by_architecture(records: Sequence[dict]):
    """(architectures, key means, value means) for archs with both types."""
    key_records, value_records = (
        only(records, kv_type="key"),
        only(records, kv_type="value"),
    )
    key_means = metric_by(key_records, "config_name")
    value_means = metric_by(value_records, "config_name")
    names = sorted(set(key_means) & set(value_means))
    return (
        names,
        np.asarray([key_means[n].mean() for n in names]),
        np.asarray([value_means[n].mean() for n in names]),
    )


def architecture_ranking(records: Sequence[dict]) -> tuple[list[str], np.ndarray]:
    """(architectures sorted by name, overall mean quality per arch)."""
    by_config = metric_by(records, "config_name")
    names = list(by_config)
    return names, np.asarray([by_config[n].mean() for n in names])


def headline_fits(records: Sequence[dict], threshold: float = 0.9) -> dict:
    """The records a findings box quotes: best quality, best compression
    among fits above the quality threshold (None if none qualify), count.
    Empty input (e.g. a foreign/truncated fit_results.json) yields
    best=None rather than crashing the figure pipeline."""
    if not records:
        return {"best": None, "most_compressed_above": None, "count": 0}
    best = max(records, key=lambda rec: rec[QUALITY])
    qualifying = [rec for rec in records if rec[QUALITY] > threshold]
    most_compressed = (
        max(qualifying, key=lambda rec: rec["compression_ratio"])
        if qualifying
        else None
    )
    return {"best": best, "most_compressed_above": most_compressed, "count": len(records)}


def local_minima(series: np.ndarray) -> np.ndarray:
    """Indices of strict interior local minima of a 1-D series."""
    series = np.asarray(series)
    if series.size < 3:
        return np.asarray([], dtype=int)
    interior = (series[1:-1] < series[:-2]) & (series[1:-1] < series[2:])
    return np.nonzero(interior)[0] + 1


def spread(values) -> float:
    values = np.asarray(values, dtype=float)
    return float(values.max() - values.min()) if values.size else 0.0


def profile_series(layer_profile: Sequence[dict]) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """Layer-profile records -> {kv_type: (layers, quality)}, layer-sorted."""
    out: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for kv_type in ("key", "value"):
        rows = sorted(only(layer_profile, kv_type=kv_type), key=lambda r: r["layer"])
        out[kv_type] = (column(rows, "layer"), column(rows, QUALITY))
    return out


def summary_kv_series(
    layer_summaries: Sequence, stem: str
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """LayerSummary K/V attribute pair -> (layers, K series, V series).

    ``stem`` names the attribute pair without its ``_k``/``_v`` suffix
    (e.g. ``avg_autocorr`` -> ``avg_autocorr_k`` / ``avg_autocorr_v``).
    """
    layers = np.asarray([s.layer for s in layer_summaries], dtype=int)
    k_series = np.asarray([getattr(s, f"{stem}_k") for s in layer_summaries])
    v_series = np.asarray([getattr(s, f"{stem}_v") for s in layer_summaries])
    return layers, k_series, v_series


def decay_curves(
    analysis_records: Sequence[dict], limit: int = 4
) -> list[tuple[str, np.ndarray]]:
    """First ``limit`` per-head autocorrelation-decay curves as (name, curve)."""
    return [
        (rec["name"], np.asarray(rec["mean_autocorrelation"], dtype=float))
        for rec in analysis_records[:limit]
    ]


def scaling_series(
    scaling_results: dict[int, dict], field: str
) -> tuple[list[int], np.ndarray]:
    """Per-seq-len scaling metric -> (sorted seq lens, values)."""
    seq_lens = sorted(scaling_results)
    return seq_lens, np.asarray(
        [scaling_results[s][field] for s in seq_lens], dtype=float
    )


def prompt_series(
    prompt_results: dict[str, dict], field: str
) -> tuple[list[str], np.ndarray]:
    """Per-content-type metric -> (prompt names in dict order, values)."""
    names = list(prompt_results)
    return names, np.asarray(
        [prompt_results[n][field] for n in names], dtype=float
    )
