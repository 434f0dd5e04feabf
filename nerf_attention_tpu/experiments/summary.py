"""Final combined 6-panel summary figure.

Output contract matches the reference's final summary
(`/root/reference/nerf_attention/experiments/summary.py:13-212`): the same
six panel semantics (SIREN-vs-SVD pareto, K/V boxplot, full layer profile,
scaling quality, multi-prompt bars, computed findings including the total
experiment count and the latency-ratio range), graceful "No ... data"
placeholders for missing inputs, and `final_summary.png`. Structure is this
framework's own: numeric aggregation lives in pure ``figdata`` helpers and
in ``final_findings_lines`` (both unit-testable), panels are closures
rendered over a GridSpec.
"""

from __future__ import annotations

import json
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
from matplotlib.gridspec import GridSpec

from nerf_attention_tpu import figdata

KEY_STYLE = dict(color="#3498db", label="Keys")
VALUE_STYLE = dict(color="#e74c3c", label="Values")


def experiment_count(
    scaling_results, prompt_results, siren_results, svd_results, layer_profile
) -> int:
    """Total fits/records across every experiment the figure draws from."""
    total = len(siren_results or []) + len(svd_results or []) + len(layer_profile or [])
    for per_length in (scaling_results or {}).values():
        total += per_length.get("num_experiments", 0)
    return total


def final_findings_lines(
    scaling_results, prompt_results, siren_results, svd_results, layer_profile
) -> list[str]:
    """The computed findings box, one entry per available experiment."""
    lines = ["NeRF-Attention: Key Findings", "=" * 32, ""]

    if siren_results:
        key_quality, value_quality = figdata.kv_quality(siren_results)
        lines += [
            f"Keys avg:   {key_quality.mean():.4f} CosSim",
            f"Values avg: {value_quality.mean():.4f} CosSim",
            "K/V gap: architectural, not content",
            "",
        ]

    if svd_results and siren_results:
        svd_keys_2x = figdata.only(svd_results, kv_type="key", target_compression=2)
        siren_keys = figdata.only(siren_results, kv_type="key", config_name="medium")
        if svd_keys_2x and siren_keys:
            siren_ratio = figdata.column(siren_keys, "compression_ratio").mean()
            ratio_note = f"{siren_ratio:.1f}x" + (
                " = expansion" if siren_ratio < 1.0 else ""
            )
            lines += [
                f"SVD 2x keys: {figdata.column(svd_keys_2x, figdata.QUALITY).mean():.2f} CosSim",
                f"SIREN keys:  {figdata.column(siren_keys, figdata.QUALITY).mean():.2f} ({ratio_note})",
                "  SVD wins with zero training",
                "",
            ]

    if prompt_results:
        _, key_by_prompt = figdata.prompt_series(prompt_results, "avg_cossim_keys")
        lines += [
            f"Cross-content spread: {figdata.spread(key_by_prompt):.3f}",
            "  Structure is architectural",
            "",
        ]

    if scaling_results:
        _, siren_ms = figdata.scaling_series(scaling_results, "siren_time_ms")
        _, hbm_ms = figdata.scaling_series(scaling_results, "hbm_4060_ms")
        latency_ratios = siren_ms / hbm_ms
        lines += [
            "Both latencies scale with seq len",
            f"  SIREN {latency_ratios.min():.0f}-{latency_ratios.max():.0f}x slower than HBM",
            "  No crossover at practical lengths",
            "",
        ]

    lines += [
        f"Total experiments: {experiment_count(scaling_results, prompt_results, siren_results, svd_results, layer_profile)}",
        "Conclusion: negative result,",
        "  characterization contribution",
    ]
    return lines


def _placeholder(ax, title: str, message: str) -> None:
    ax.text(0.5, 0.5, message, ha="center", va="center", transform=ax.transAxes)
    ax.set_title(title)


def generate_final_summary(
    scaling_results: dict[int, dict] | None,
    prompt_results: dict[str, dict] | None,
    siren_results: list[dict] | None,
    svd_results: list[dict] | None,
    output_dir: Path,
    head_dim: int = 128,
    layer_profile: list[dict] | None = None,
) -> None:
    """Render the six-panel final summary from whichever inputs exist."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    if layer_profile is None:
        default_profile = Path("results/layer_profile/full_layer_profile.json")
        if default_profile.exists():
            layer_profile = json.loads(default_profile.read_text())

    def pareto_vs_svd(ax):
        if siren_results:
            from nerf_attention_tpu.evaluate import CONFIG_COLORS, CONFIG_MARKERS

            for arch, (ratios, quality) in figdata.pareto_series(siren_results).items():
                ax.scatter(
                    ratios, quality,
                    c=CONFIG_COLORS.get(arch, "#95a5a6"),
                    marker=CONFIG_MARKERS.get(arch, "o"),
                    s=40, alpha=0.6, label=f"SIREN {arch}",
                    edgecolors="black", linewidth=0.3,
                )
        if svd_results:
            for kv_type, color in (("key", "black"), ("value", "gray")):
                rows = figdata.only(svd_results, kv_type=kv_type)
                if rows:
                    ax.scatter(
                        figdata.column(rows, "actual_compression"),
                        figdata.column(rows, figdata.QUALITY),
                        c=color, marker="D", s=60, alpha=0.8,
                        label=f"SVD {kv_type}s", zorder=6,
                    )
        ax.axhline(y=0.95, color="green", linestyle="--", alpha=0.3)
        ax.axhline(y=0.90, color="orange", linestyle="--", alpha=0.3)
        ax.set_xscale("log")
        ax.set(
            xlabel="Compression Ratio (x)",
            ylabel="Cosine Similarity",
            title="SVD Dominates at Every Ratio",
        )
        if ax.get_legend_handles_labels()[1]:
            ax.legend(fontsize=6, ncol=2)
        ax.grid(True, alpha=0.2)

    def kv_asymmetry(ax):
        key_quality, value_quality = figdata.kv_quality(siren_results or [], "medium")
        if not (key_quality.size and value_quality.size):
            _placeholder(ax, "Keys vs Values", "No baseline data")
            return
        boxes = ax.boxplot(
            [key_quality, value_quality], tick_labels=["Keys", "Values"],
            patch_artist=True, widths=0.5,
        )
        for box, style in zip(boxes["boxes"], (KEY_STYLE, VALUE_STYLE)):
            box.set_facecolor(style["color"])
            box.set_alpha(0.6)
        ax.set(
            ylabel="Cosine Similarity",
            title=(
                f"K/V Asymmetry (Keys={key_quality.mean():.3f}, "
                f"Values={value_quality.mean():.3f})"
            ),
        )
        ax.grid(True, alpha=0.2, axis="y")

    def layer_structure(ax):
        if not layer_profile:
            _placeholder(ax, "Layer Profile", "No layer profile data")
            return
        series = figdata.profile_series(layer_profile)
        key_layers, key_quality = series["key"]
        value_layers, value_quality = series["value"]
        ax.plot(key_layers, key_quality, "o-", markersize=4, linewidth=1.2, **KEY_STYLE)
        ax.plot(value_layers, value_quality, "s-", markersize=4, linewidth=1.2, **VALUE_STYLE)
        if np.array_equal(key_layers, value_layers):
            # The K/V gap band needs matching layer grids; a profile with
            # only one kv_type (trimmed or foreign) still plots its line.
            ax.fill_between(
                key_layers, key_quality, value_quality, alpha=0.08, color="gray"
            )
        for dip in figdata.local_minima(key_quality):
            ax.annotate(
                f"L{int(key_layers[dip])}",
                xy=(key_layers[dip], key_quality[dip]),
                xytext=(key_layers[dip] + 1, key_quality[dip] - 0.02),
                fontsize=7, color=KEY_STYLE["color"],
                arrowprops=dict(
                    arrowstyle="->", color=KEY_STYLE["color"], alpha=0.6, lw=0.8
                ),
            )
        ax.set(
            xlabel="Layer", ylabel="CosSim",
            title="Layer Profile: Non-Monotonic Structure",
        )
        ax.set_ylim(0.4, 1.0)
        ax.legend(fontsize=7)
        ax.grid(True, alpha=0.2)

    def scaling_quality(ax):
        if not scaling_results:
            _placeholder(ax, "Scaling Quality", "No scaling data")
            return
        seq_lens, key_quality = figdata.scaling_series(scaling_results, "avg_cossim_keys")
        _, value_quality = figdata.scaling_series(scaling_results, "avg_cossim_values")
        ax.plot(seq_lens, key_quality, "o-", markersize=6, linewidth=1.5, **KEY_STYLE)
        ax.plot(seq_lens, value_quality, "s-", markersize=6, linewidth=1.5, **VALUE_STYLE)
        ax.axhline(y=0.95, color="green", linestyle="--", alpha=0.3)
        ax.set_xscale("log")
        ax.set(
            xlabel="Sequence Length", ylabel="CosSim",
            title="Quality Degrades with Length",
        )
        ax.legend(fontsize=7)
        ax.grid(True, alpha=0.2)

    def prompt_invariance(ax):
        if not prompt_results:
            _placeholder(ax, "Multi-Prompt", "No prompt data")
            return
        names, key_quality = figdata.prompt_series(prompt_results, "avg_cossim_keys")
        _, value_quality = figdata.prompt_series(prompt_results, "avg_cossim_values")
        slots = np.arange(len(names))
        half = 0.35 / 2
        bar_style = dict(alpha=0.8, edgecolor="black", linewidth=0.5)
        ax.bar(slots - half, key_quality, 0.35, **{**KEY_STYLE, **bar_style})
        ax.bar(slots + half, value_quality, 0.35, **{**VALUE_STYLE, **bar_style})
        ax.set_xticks(slots)
        ax.set_xticklabels([name.capitalize() for name in names], fontsize=8)
        ax.set(
            ylabel="CosSim",
            title=f"Content Invariant (keys spread={figdata.spread(key_quality):.3f})",
        )
        ax.set_ylim(0, 1.05)
        ax.legend(fontsize=7)
        ax.grid(True, alpha=0.2, axis="y")

    def findings(ax):
        ax.axis("off")
        body = "\n".join(
            final_findings_lines(
                scaling_results, prompt_results, siren_results, svd_results,
                layer_profile,
            )
        )
        ax.text(
            0.05, 0.95, body, transform=ax.transAxes, fontsize=9,
            verticalalignment="top", fontfamily="monospace",
            bbox=dict(boxstyle="round", facecolor="lightyellow", alpha=0.8),
        )

    fig = plt.figure(figsize=(18, 12))
    grid = GridSpec(2, 3, figure=fig, hspace=0.35, wspace=0.35)
    fig.suptitle(
        "NeRF-Attention: SIREN Compression of LLM KV Cache",
        fontsize=16, fontweight="bold", y=1.02,
    )
    panels = (
        pareto_vs_svd, kv_asymmetry, layer_structure,
        scaling_quality, prompt_invariance, findings,
    )
    for cell, draw in zip(grid, panels):
        draw(fig.add_subplot(cell))

    plt.savefig(output_dir / "final_summary.png", dpi=200, bbox_inches="tight")
    plt.close()
    print(f"  Saved: {output_dir}/final_summary.png")
