"""Evaluation, figure generation, and the latency roofline.

Figure set and JSON outputs match the reference
(`/root/reference/nerf_attention/evaluate.py`), with one upgrade: on TPU the
HBM-read side of the latency comparison is *measured* (a jitted reduction over
a resident bf16 (S, D) block) in addition to the reference's theoretical
bytes/bandwidth constants for RTX 4060 / H100 / TPU v5e.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
from matplotlib.gridspec import GridSpec

import jax
import jax.numpy as jnp

from nerf_attention_tpu import figdata
from nerf_attention_tpu.io import checkpoint, kvstore
from nerf_attention_tpu.models.siren import count_parameters, positions
from nerf_attention_tpu.parallel.sweep import cosine_similarity

# Color/marker contracts (reference evaluate.py:19-26) — figures key off names.
CONFIG_COLORS = {
    "tiny": "#e74c3c",
    "small": "#e67e22",
    "medium": "#2ecc71",
    "large": "#3498db",
    "deep": "#9b59b6",
    "hifreq": "#1abc9c",
    "lofreq": "#f1c40f",
}
CONFIG_MARKERS = {
    "tiny": "v",
    "small": "s",
    "medium": "o",
    "large": "D",
    "deep": "^",
    "hifreq": "P",
    "lofreq": "X",
}

# Bandwidth constants for the theoretical roofline (bytes/s).
HBM_BW = {
    "rtx4060": 272e9,  # reference evaluate.py:210
    "h100": 3350e9,  # reference evaluate.py:211
    "tpu_v5e": 819e9,  # published v5e HBM bandwidth per chip
}


def load_results(siren_dir: Path) -> list[dict]:
    with open(Path(siren_dir) / "fit_results.json") as f:
        return json.load(f)


def plot_pareto_frontier(
    results: list[dict], output_dir: Path, svd_results: list[dict] | None = None
) -> None:
    """Log-x compression vs CosSim scatter with 0.95/0.90 guides."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    fig, ax = plt.subplots(figsize=(10, 7))

    for arch, (ratios, quality) in figdata.pareto_series(results).items():
        ax.scatter(
            ratios,
            quality,
            c=CONFIG_COLORS.get(arch, "#95a5a6"),
            marker=CONFIG_MARKERS.get(arch, "o"),
            s=80,
            alpha=0.7,
            label=f"SIREN {arch}",
            edgecolors="black",
            linewidth=0.5,
        )

    if svd_results:
        for kv_type, color in (("key", "black"), ("value", "gray")):
            rows = figdata.only(svd_results, kv_type=kv_type)
            if rows:
                ax.scatter(
                    figdata.column(rows, "actual_compression"),
                    figdata.column(rows, figdata.QUALITY),
                    c=color,
                    marker="D",
                    s=100,
                    alpha=0.8,
                    label=f"SVD ({kv_type}s)",
                    edgecolors="black",
                    linewidth=0.5,
                    zorder=6,
                )

    ax.axhline(y=0.95, color="green", linestyle="--", alpha=0.4, label="0.95 target")
    ax.axhline(y=0.90, color="orange", linestyle="--", alpha=0.4, label="0.90 minimum")
    ax.set(
        xlabel="Compression Ratio (x)",
        ylabel="Cosine Similarity",
        title="SIREN vs SVD: Compression-Fidelity Tradeoff",
    )
    ax.set_xscale("log")
    ax.legend(bbox_to_anchor=(1.05, 1), loc="upper left", fontsize=9)
    ax.grid(True, alpha=0.3)

    plt.tight_layout()
    plt.savefig(output_dir / "pareto_frontier.png", dpi=150, bbox_inches="tight")
    plt.close()
    print("  Saved: pareto_frontier.png")


def plot_keys_vs_values(results: list[dict], output_dir: Path) -> None:
    """Medium-config K vs V: per-layer scatter + quality histograms."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    fig, axes = plt.subplots(1, 2, figsize=(14, 6))
    styles = {"key": ("Keys", "blue", "o"), "value": ("Values", "red", "s")}
    medium_by_type = {
        kv_type: figdata.only(results, config_name="medium", kv_type=kv_type)
        for kv_type in styles
    }

    ax = axes[0]
    for kv_type, (label, color, marker) in styles.items():
        rows = medium_by_type[kv_type]
        if rows:
            ax.scatter(
                figdata.column(rows, "layer"),
                figdata.column(rows, figdata.QUALITY),
                c=color, marker=marker, s=60, label=label, alpha=0.7,
            )
    ax.set(
        xlabel="Layer Index",
        ylabel="Cosine Similarity",
        title="Reconstruction Quality by Layer (Medium SIREN)",
    )
    ax.legend()
    ax.grid(True, alpha=0.3)

    ax = axes[1]
    if all(medium_by_type.values()):
        for kv_type, (label, color, _) in styles.items():
            ax.hist(
                figdata.column(medium_by_type[kv_type], figdata.QUALITY),
                bins=15, alpha=0.5, label=label, color=color,
            )
    ax.set(xlabel="Cosine Similarity", ylabel="Count", title="Distribution of Reconstruction Quality")
    if ax.get_legend_handles_labels()[0]:
        ax.legend()
    ax.grid(True, alpha=0.3)

    plt.tight_layout()
    plt.savefig(output_dir / "keys_vs_values.png", dpi=150, bbox_inches="tight")
    plt.close()
    print("  Saved: keys_vs_values.png")


def _checkpoint_forward(ckpt: dict, seq_len: int) -> np.ndarray:
    """De-normalized reconstruction from a saved checkpoint.

    Honors the FM-SIREN frequency spread when the checkpoint records one
    (``fit --fm_mult``): the forward must match the trained architecture.
    """
    from nerf_attention_tpu.models.siren import siren_apply_maybe_fm

    pos = positions(seq_len)
    params = [(jnp.asarray(w), jnp.asarray(b)) for w, b in ckpt["params"]]
    pred_norm = siren_apply_maybe_fm(
        params, ckpt["config"].omega_0, ckpt.get("fm_mult"), pos
    )
    pred = pred_norm * jnp.asarray(ckpt["target_std"]) + jnp.asarray(ckpt["target_mean"])
    return np.asarray(pred.reshape(seq_len, -1))


def plot_per_position_error(
    siren_dir: Path, kv_dir: Path, output_dir: Path
) -> None:
    """Reload <=4 medium checkpoints, recompute per-position CosSim vs the
    original tensor, overlay a rolling mean (reference evaluate.py:123-170)."""
    siren_dir, kv_dir, output_dir = Path(siren_dir), Path(kv_dir), Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    model_files = checkpoint.checkpoint_glob(siren_dir, "*medium_model")
    if not model_files:
        print("  No medium models found, skipping per-position plot")
        return

    fig, axes = plt.subplots(2, 2, figsize=(14, 10))
    fig.suptitle("Per-Position Reconstruction Error", fontsize=14)

    for idx, model_file in enumerate(model_files[:4]):
        ax = axes[idx // 2, idx % 2]
        ckpt = checkpoint.load_siren_checkpoint(model_file)
        metrics = ckpt["metrics"]

        keys, values = kvstore.load_layer(kv_dir, metrics["layer"])
        original = (keys if metrics["kv_type"] == "key" else values)[metrics["head"]]
        seq_len = original.shape[0]

        pred = _checkpoint_forward(ckpt, seq_len)
        per_pos_cos = np.asarray(
            cosine_similarity(jnp.asarray(pred), jnp.asarray(original))
        )

        ax.plot(range(seq_len), per_pos_cos, alpha=0.5, linewidth=0.5)
        window = min(50, seq_len // 10)
        if window > 1:
            rolling = np.convolve(per_pos_cos, np.ones(window) / window, mode="valid")
            ax.plot(
                range(window // 2, window // 2 + len(rolling)),
                rolling,
                color="red",
                linewidth=2,
                label=f"Rolling avg (w={window})",
            )

        ax.set(
            xlabel="Token Position",
            ylabel="Cosine Similarity",
            title=f"L{metrics['layer']} H{metrics['head']} {metrics['kv_type']}",
        )
        ax.set_ylim(bottom=max(0, per_pos_cos.min() - 0.05))
        if ax.get_legend_handles_labels()[0]:
            ax.legend(fontsize=8)
        ax.grid(True, alpha=0.3)

    plt.tight_layout()
    plt.savefig(output_dir / "per_position_error.png", dpi=150, bbox_inches="tight")
    plt.close()
    print("  Saved: per_position_error.png")


def profile_latency(
    siren_dir: Path, output_dir: Path, max_models: int = 8,
    num_runs: int | None = None,
) -> list[dict]:
    """SIREN decode forward vs HBM read: measured on-device + theoretical."""
    siren_dir, output_dir = Path(siren_dir), Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    model_files = checkpoint.checkpoint_glob(siren_dir)
    if not model_files:
        print("  No models found for latency profiling")
        return []

    backend = jax.default_backend()
    results = []
    hbm_measured_cache: dict[tuple[int, int], dict] = {}  # replicate stats

    from nerf_attention_tpu.utils.timing import (
        measured_hbm_read_ms,
        time_siren_forward_ms,
    )

    for model_file in model_files[:max_models]:
        ckpt = checkpoint.load_siren_checkpoint(model_file)
        metrics = ckpt["metrics"]
        seq_len = metrics["seq_len"]
        d_head = ckpt["out_features"]
        omega = ckpt["config"].omega_0

        # Dependent-loop timer: fused Pallas decode on TPU, XLA elsewhere.
        siren_stats = time_siren_forward_ms(
            ckpt["params"], omega, seq_len, reps=num_runs, samples=5, stats=True
        )
        fastsin_stats = time_siren_forward_ms(
            ckpt["params"], omega, seq_len, reps=num_runs, samples=5,
            stats=True, sin_impl="fast",
        )
        elapsed = siren_stats["median"] / 1000

        key = (seq_len, d_head)
        if key not in hbm_measured_cache:
            hbm_measured_cache[key] = measured_hbm_read_ms(
                seq_len, d_head, num_runs, samples=5, stats=True
            )
        hbm_stats = hbm_measured_cache[key]

        raw_bytes = metrics["raw_size_bytes"]
        result = {
            "name": metrics["name"],
            "config": metrics["config_name"],
            "siren_time_ms": siren_stats["median"],
            "siren_time_iqr_ms": siren_stats["iqr"],
            "siren_time_fastsin_ms": fastsin_stats["median"],
            "siren_time_fastsin_iqr_ms": fastsin_stats["iqr"],
            "hbm_time_measured_ms": hbm_stats["median"],
            "hbm_time_measured_iqr_ms": hbm_stats["iqr"],
            "hbm_backend": backend,
            "hbm_time_4060_ms": raw_bytes / HBM_BW["rtx4060"] * 1000,
            "hbm_time_h100_ms": raw_bytes / HBM_BW["h100"] * 1000,
            "hbm_time_v5e_ms": raw_bytes / HBM_BW["tpu_v5e"] * 1000,
            "speedup_vs_4060": (raw_bytes / HBM_BW["rtx4060"]) / max(elapsed, 1e-10),
            "speedup_vs_h100": (raw_bytes / HBM_BW["h100"]) / max(elapsed, 1e-10),
            "speedup_vs_v5e": (raw_bytes / HBM_BW["tpu_v5e"]) / max(elapsed, 1e-10),
            "num_params": count_parameters(ckpt["params"]),
        }
        results.append(result)
        print(
            f"  {metrics['name']}: SIREN={elapsed * 1000:.3f}ms | "
            f"HBM(measured/{backend})={result['hbm_time_measured_ms']:.4f}ms | "
            f"HBM(v5e theor.)={result['hbm_time_v5e_ms']:.4f}ms | "
            f"HBM(H100 theor.)={result['hbm_time_h100_ms']:.4f}ms"
        )

    if results:
        fig, ax = plt.subplots(figsize=(10, 6))
        x = np.arange(len(results))
        width = 0.2
        ax.bar(x - 1.5 * width, [r["siren_time_ms"] for r in results], width,
               label="SIREN Forward (measured)", color="#3498db")
        ax.bar(x - 0.5 * width, [r["hbm_time_measured_ms"] for r in results], width,
               label=f"HBM read (measured, {backend})", color="#9b59b6")
        ax.bar(x + 0.5 * width, [r["hbm_time_v5e_ms"] for r in results], width,
               label="HBM v5e (theoretical)", color="#e74c3c")
        ax.bar(x + 1.5 * width, [r["hbm_time_h100_ms"] for r in results], width,
               label="HBM H100 (theoretical)", color="#2ecc71")
        ax.set(ylabel="Time (ms)", title="SIREN Inference vs Memory Read Latency")
        ax.set_xticks(x)
        ax.set_xticklabels([r["name"] for r in results], rotation=45, ha="right", fontsize=8)
        ax.set_yscale("log")
        ax.legend()
        ax.grid(True, alpha=0.3, axis="y")
        plt.tight_layout()
        plt.savefig(output_dir / "latency_comparison.png", dpi=150, bbox_inches="tight")
        plt.close()
        print("  Saved: latency_comparison.png")

    with open(output_dir / "latency_results.json", "w") as f:
        json.dump(results, f, indent=2)
    return results


def sweep_findings_text(results: list[dict]) -> str:
    """Findings-box content for the sweep summary (pure; unit-tested)."""
    highlights = figdata.headline_fits(results, threshold=0.9)
    best = highlights["best"]
    if best is None:
        return "Key Findings\n" + "─" * 30 + "\n\nNo fit results"
    lines = [
        "Key Findings",
        "─" * 30,
        "",
        "Best fidelity:",
        f"  CosSim={best[figdata.QUALITY]:.4f}",
        f"  {best['config_name']}, {best['compression_ratio']:.1f}x",
        "",
    ]
    winner = highlights["most_compressed_above"]
    if winner is not None:
        lines += [
            "Best compression (>0.9):",
            f"  {winner['compression_ratio']:.1f}x",
            f"  CosSim={winner[figdata.QUALITY]:.4f}",
        ]
    else:
        lines.append("No config achieves >0.9 CosSim")
    lines += ["", f"Experiments: {highlights['count']}"]
    return "\n".join(lines)


def generate_summary_figure(results: list[dict], output_dir: Path) -> None:
    """6-panel sweep overview.

    Panel set and semantics match the reference's summary figure
    (reference evaluate.py:245-343); every panel renders arrays prepared by
    the pure helpers in ``figdata``.
    """
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    def pareto(ax):
        for arch, (ratios, quality) in figdata.pareto_series(results).items():
            ax.scatter(ratios, quality, s=40, alpha=0.7, label=arch)
        ax.axhline(y=0.95, color="green", linestyle="--", alpha=0.3)
        ax.legend(fontsize=7)
        ax.set(
            xlabel="Compression Ratio (x)",
            ylabel="Cosine Similarity",
            title="Compression vs Fidelity",
        )
        ax.grid(True, alpha=0.2)

    def kv_boxes(ax):
        key_quality, value_quality = figdata.kv_quality(results, "medium")
        if key_quality.size and value_quality.size:
            ax.boxplot([key_quality, value_quality], tick_labels=["Keys", "Values"])
            ax.set(ylabel="Cosine Similarity", title="Keys vs Values")
            ax.grid(True, alpha=0.2)

    def per_layer(ax):
        medium_records = figdata.only(results, config_name="medium")
        if not medium_records:
            return
        layers, means, stds = figdata.layer_stats(medium_records)
        ax.errorbar(layers, means, yerr=stds, fmt="o-", capsize=3)
        ax.set(
            xlabel="Layer Index",
            ylabel="Avg Cosine Similarity",
            title="Compressibility by Layer",
        )
        ax.grid(True, alpha=0.2)

    def kv_gap(ax):
        archs, key_means, value_means = figdata.kv_gap_by_architecture(results)
        if not archs:
            return
        slots = np.arange(len(archs))
        half = 0.35 / 2
        ax.bar(slots - half, key_means, 0.35, label="Keys", color="#3498db", alpha=0.8)
        ax.bar(slots + half, value_means, 0.35, label="Values", color="#e74c3c", alpha=0.8)
        ax.set_xticks(slots)
        ax.set_xticklabels(archs, fontsize=7, rotation=45, ha="right")
        ax.legend(fontsize=7)
        ax.set(ylabel="Avg CosSim", title="K/V Gap by Architecture")
        ax.grid(True, alpha=0.2, axis="y")

    def ranking(ax):
        archs, means = figdata.architecture_ranking(results)
        ax.barh(np.arange(len(archs)), means, color="steelblue", alpha=0.7)
        ax.set_yticks(np.arange(len(archs)))
        ax.set_yticklabels(archs)
        ax.set(xlabel="Avg Cosine Similarity", title="Architecture Comparison")
        ax.grid(True, alpha=0.2, axis="x")

    def findings(ax):
        ax.axis("off")
        ax.text(
            0.1, 0.9, sweep_findings_text(results),
            transform=ax.transAxes, fontsize=10,
            verticalalignment="top", fontfamily="monospace",
            bbox=dict(boxstyle="round", facecolor="lightyellow", alpha=0.8),
        )

    fig = plt.figure(figsize=(16, 10))
    grid = GridSpec(2, 3, figure=fig, hspace=0.35, wspace=0.35)
    fig.suptitle(
        "NeRF-Attention: SIREN Compression of LLM KV Cache",
        fontsize=16, fontweight="bold", y=1.02,
    )
    for cell, draw in zip(grid, (pareto, kv_boxes, per_layer, kv_gap, ranking, findings)):
        draw(fig.add_subplot(cell))

    plt.savefig(output_dir / "summary_figure.png", dpi=200, bbox_inches="tight")
    plt.close()
    print("  Saved: summary_figure.png")


def main() -> None:
    from nerf_attention_tpu.utils.compile_cache import enable as _enable_cache
    _enable_cache()
    parser = argparse.ArgumentParser(description="Evaluate SIREN compression")
    parser.add_argument("--kv_dir", type=str, default="results/kv_cache")
    parser.add_argument("--siren_dir", type=str, default="results/fits")
    parser.add_argument("--output_dir", type=str, default="results/figures")
    parser.add_argument(
        "--device", type=str, default=None, choices=["cpu", "tpu"],
        help="pin the jax platform (reference evaluate.py:351 --device parity)",
    )
    args = parser.parse_args()
    from nerf_attention_tpu.utils.platform import pin_platform

    pin_platform(args.device)

    output_dir = Path(args.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    print("Loading results...")
    results = load_results(Path(args.siren_dir))

    print("\nGenerating plots...")
    plot_pareto_frontier(results, output_dir)
    plot_keys_vs_values(results, output_dir)
    plot_per_position_error(Path(args.siren_dir), Path(args.kv_dir), output_dir)
    generate_summary_figure(results, output_dir)

    print("\nProfiling latency...")
    profile_latency(Path(args.siren_dir), output_dir)

    print(f"\nAll figures saved to {output_dir}/")


if __name__ == "__main__":
    main()
