"""KV cache structure analysis — determines if SIRENs should work before fitting.

Measures autocorrelation, spectral energy concentration, and effective rank
per sampled layer/head, separately for keys and values, and prints the same
GOOD/CONCERNING/BAD feasibility assessment as the reference
(`/root/reference/nerf_attention/analyze.py:95-213`). Outputs
``analysis_results.json`` and the 4-panel structure figure with identical
schemas/filenames.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from nerf_attention_tpu import figdata
from nerf_attention_tpu.io import kvstore
from nerf_attention_tpu.ops.stats import (
    SPECTRAL_PERCENTS,
    batched_autocorrelation,
    batched_spectral_energy,
    effective_rank,
    sample_dim_indices,
)
from nerf_attention_tpu.types import AnalysisResult, LayerSummary


def analyze_tensor(tensor: np.ndarray, name: str, max_lag: int = 50) -> dict:
    """Structure metrics for one (seq_len, d_head) tensor.

    Output dict schema matches reference analyze.py:61-80 (autocorrelation is
    averaged over ~16 evenly-sampled dims; spectral fractions likewise).
    """
    _, d_head = tensor.shape
    dim_indices = sample_dim_indices(d_head)
    signals = np.asarray(tensor[:, dim_indices], dtype=np.float32).T  # (K, S)

    autocorrs = np.asarray(batched_autocorrelation(signals, max_lag))
    mean_autocorr = autocorrs.mean(axis=0)
    lag1 = float(mean_autocorr[1]) if len(mean_autocorr) > 1 else 0.0

    energy = np.asarray(batched_spectral_energy(signals)).mean(axis=0)
    avg_energy = {
        f"top_{int(p * 100)}pct": float(e) for p, e in zip(SPECTRAL_PERCENTS, energy)
    }

    return {
        "name": name,
        "shape": list(tensor.shape),
        "lag1_autocorrelation": lag1,
        "mean_autocorrelation": mean_autocorr.tolist(),
        "spectral_energy": avg_energy,
        "rank": effective_rank(np.asarray(tensor, dtype=np.float32)),
    }


def select_layers(num_layers: int) -> list[int]:
    """{0, L/4, L/2, 3L/4, L-1} (reference analyze.py:83-84)."""
    return sorted(
        {0, num_layers // 4, num_layers // 2, 3 * num_layers // 4, num_layers - 1}
    )


def feasibility_label(val: float, good: float = 0.5, bad: float = 0.2) -> str:
    if val > good:
        return "GOOD"
    if val > bad:
        return "CONCERNING"
    return "BAD"


def analyze_kv_cache(kv_dir: Path, output_dir: Path, verbose: bool = True) -> AnalysisResult:
    """Run structure analysis across sampled layers and heads."""
    kv_dir, output_dir = Path(kv_dir), Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    metadata = kvstore.load_metadata(kv_dir)

    if verbose:
        print(
            f"Analyzing KV cache: {metadata.num_layers} layers x "
            f"{metadata.num_kv_heads} heads"
        )
        print(f"Sequence length: {metadata.seq_len}, Head dim: {metadata.head_dim}")

    all_results: list[dict] = []
    layer_summaries: list[LayerSummary] = []

    for layer_idx in select_layers(metadata.num_layers):
        if not kvstore.has_layer(kv_dir, layer_idx):
            if verbose:
                print(f"  Skipping layer {layer_idx} (not found)")
            continue
        keys, values = kvstore.load_layer(kv_dir, layer_idx)

        ac_k, ac_v, en_k, en_v, rk_k, rk_v = [], [], [], [], [], []
        for head_idx in range(min(metadata.num_kv_heads, 4)):
            k_result = analyze_tensor(keys[head_idx], f"L{layer_idx}_H{head_idx}_K")
            v_result = analyze_tensor(values[head_idx], f"L{layer_idx}_H{head_idx}_V")
            all_results.extend([k_result, v_result])
            ac_k.append(k_result["lag1_autocorrelation"])
            ac_v.append(v_result["lag1_autocorrelation"])
            en_k.append(k_result["spectral_energy"]["top_10pct"])
            en_v.append(v_result["spectral_energy"]["top_10pct"])
            rk_k.append(k_result["rank"]["rank_ratio"])
            rk_v.append(v_result["rank"]["rank_ratio"])

        summary = LayerSummary(
            layer=layer_idx,
            avg_autocorr_k=float(np.mean(ac_k)),
            avg_autocorr_v=float(np.mean(ac_v)),
            avg_energy_10pct_k=float(np.mean(en_k)),
            avg_energy_10pct_v=float(np.mean(en_v)),
            avg_rank_ratio_k=float(np.mean(rk_k)),
            avg_rank_ratio_v=float(np.mean(rk_v)),
        )
        layer_summaries.append(summary)

        if verbose:
            print(f"\n  Layer {layer_idx}:")
            print(
                f"    Keys   - Autocorr: {summary.avg_autocorr_k:.3f} | "
                f"Spectral: {summary.avg_energy_10pct_k:.3f} | "
                f"Rank: {summary.avg_rank_ratio_k:.3f}"
            )
            print(
                f"    Values - Autocorr: {summary.avg_autocorr_v:.3f} | "
                f"Spectral: {summary.avg_energy_10pct_v:.3f} | "
                f"Rank: {summary.avg_rank_ratio_v:.3f}"
            )

    if not layer_summaries:
        raise FileNotFoundError(
            f"no layer files found under {kv_dir} for sampled layers — "
            "nothing to analyze"
        )
    avg_ac_k = float(np.mean([s.avg_autocorr_k for s in layer_summaries]))
    avg_ac_v = float(np.mean([s.avg_autocorr_v for s in layer_summaries]))
    avg_en_k = float(np.mean([s.avg_energy_10pct_k for s in layer_summaries]))
    avg_en_v = float(np.mean([s.avg_energy_10pct_v for s in layer_summaries]))

    if verbose:
        _print_feasibility(avg_ac_k, avg_ac_v, avg_en_k, avg_en_v)

    _plot_analysis(all_results, layer_summaries, output_dir, verbose)

    results_data = {
        "metadata": metadata.to_dict(),
        "layer_summaries": [
            {
                "layer": s.layer,
                "avg_autocorr_k": s.avg_autocorr_k,
                "avg_autocorr_v": s.avg_autocorr_v,
                "avg_energy_10pct_k": s.avg_energy_10pct_k,
                "avg_energy_10pct_v": s.avg_energy_10pct_v,
                "avg_rank_ratio_k": s.avg_rank_ratio_k,
                "avg_rank_ratio_v": s.avg_rank_ratio_v,
            }
            for s in layer_summaries
        ],
        "assessment": {
            "avg_autocorr_keys": avg_ac_k,
            "avg_autocorr_values": avg_ac_v,
            "avg_spectral_keys": avg_en_k,
            "avg_spectral_values": avg_en_v,
        },
    }
    with open(output_dir / "analysis_results.json", "w") as f:
        json.dump(results_data, f, indent=2)
    if verbose:
        print(f"\nResults saved to {output_dir}/")

    return AnalysisResult(
        metadata=metadata,
        layer_summaries=layer_summaries,
        avg_autocorr_keys=avg_ac_k,
        avg_autocorr_values=avg_ac_v,
        avg_spectral_keys=avg_en_k,
        avg_spectral_values=avg_en_v,
    )


def _print_feasibility(ac_k: float, ac_v: float, en_k: float, en_v: float) -> None:
    """Verdict printout with the reference's thresholds (analyze.py:157-175)."""
    print(f"\n{'=' * 60}")
    print("SIREN FEASIBILITY ASSESSMENT")
    print(f"{'=' * 60}")
    print("\nAutocorrelation (lag-1):")
    print(f"  Keys:   {ac_k:.3f}  {feasibility_label(ac_k)} (>0.5)")
    print(f"  Values: {ac_v:.3f}  {feasibility_label(ac_v)} (>0.5)")
    print("\nSpectral concentration (energy in lowest 10% frequencies):")
    print(f"  Keys:   {en_k:.3f}  {feasibility_label(en_k)} (>0.5)")
    print(f"  Values: {en_v:.3f}  {feasibility_label(en_v)} (>0.5)")
    print("\nOverall prediction:")
    if ac_k > 0.5 and en_k > 0.5:
        print("  PROMISING: KV cache has significant structure. SIREN should compress well.")
    elif ac_k > 0.2 or en_k > 0.3:
        print("  MIXED: Some structure. SIREN may work partially.")
    else:
        print("  CHALLENGING: Noisy/unstructured. Document why it fails.")


# The three per-layer K-vs-V panels of the structure figure, as data: which
# LayerSummary attribute pair to draw (via figdata.summary_kv_series), the
# axis labels, and any horizontal threshold guides. Panel semantics and
# styling match the reference figure (analyze.py:216-257 outputs).
_KV_PANEL_SPECS = (
    {
        "stem": "avg_autocorr",
        "ylabel": "Lag-1 Autocorrelation",
        "title": "Temporal Correlation by Layer",
        "guides": ((0.5, "green", "Good threshold"), (0.2, "red", "Bad threshold")),
    },
    {
        "stem": "avg_energy_10pct",
        "ylabel": "Energy in Low 10% Frequencies",
        "title": "Spectral Concentration by Layer",
        "guides": ((0.5, "green", "Good threshold"),),
    },
    {
        "stem": "avg_rank_ratio",
        "ylabel": "Effective Rank / Full Rank",
        "title": "Effective Dimensionality by Layer",
        "guides": (),
    },
)


def _draw_kv_panel(ax, layer_summaries: list[LayerSummary], spec: dict) -> None:
    """One per-layer panel: K series, V series, threshold guides."""
    layers, k_series, v_series = figdata.summary_kv_series(
        layer_summaries, spec["stem"]
    )
    ax.plot(layers, k_series, "bo-", label="Keys", markersize=8)
    ax.plot(layers, v_series, "rs-", label="Values", markersize=8)
    for level, color, label in spec["guides"]:
        ax.axhline(y=level, color=color, linestyle="--", alpha=0.5, label=label)
    ax.set(xlabel="Layer Index", ylabel=spec["ylabel"], title=spec["title"])
    ax.legend()
    ax.grid(True, alpha=0.3)


def _plot_analysis(
    all_results: list[dict],
    layer_summaries: list[LayerSummary],
    output_dir: Path,
    verbose: bool = True,
) -> None:
    """4-panel structure figure (filename contract: kv_structure_analysis.png)."""
    fig, axes = plt.subplots(2, 2, figsize=(14, 10))
    fig.suptitle(
        "KV Cache Structure Analysis: SIREN Feasibility", fontsize=14, fontweight="bold"
    )

    # Per-layer K/V panels occupy every slot except bottom-left.
    for ax, spec in zip((axes[0, 0], axes[0, 1], axes[1, 1]), _KV_PANEL_SPECS):
        _draw_kv_panel(ax, layer_summaries, spec)

    # Bottom-left: raw autocorrelation-decay curves for the first few heads.
    ax = axes[1, 0]
    for name, curve in figdata.decay_curves(all_results):
        ax.plot(np.arange(curve.size), curve, label=name, alpha=0.7)
    ax.set(xlabel="Lag (tokens)", ylabel="Autocorrelation", title="Autocorrelation Decay")
    ax.legend(fontsize=8)
    ax.grid(True, alpha=0.3)

    plt.tight_layout()
    plt.savefig(output_dir / "kv_structure_analysis.png", dpi=150, bbox_inches="tight")
    plt.close()
    if verbose:
        print(f"  Saved plot: {output_dir}/kv_structure_analysis.png")


def main() -> None:
    parser = argparse.ArgumentParser(description="Analyze KV cache structure")
    parser.add_argument("--kv_dir", type=str, default="results/kv_cache")
    parser.add_argument("--output_dir", type=str, default="results/analysis")
    args = parser.parse_args()
    analyze_kv_cache(Path(args.kv_dir), Path(args.output_dir))


if __name__ == "__main__":
    main()
