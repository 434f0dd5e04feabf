"""Experiment 3: SVD baseline comparison.

Truncated SVD at matched compression ratios against SIREN
(`/root/reference/nerf_attention/experiments/svd.py`). Two rank-selection
accountings are supported because the reference's published table and its
current code disagree (SURVEY.md §2 #14):

  * ``fp16`` (default) — the reference's *current-code* formula: raw bytes
    counted as S*D*2 (svd.py:46-51). Ranks 30/15/7/3 at S=2048, D=128.
  * ``fp32`` — the accounting behind the *published* results
    (results/svd/svd_results.json): ranks 60/30/15/7, actual compressions
    1.0/2.0/4.0/8.6x. Use this to reproduce FINDINGS.md:243-250 bit-for-claim.

The SVD itself is computed once per tensor through XLA and reused across all
target ratios (the reference recomputes it per ratio); ``--randomized``
switches to the MXU-friendly randomized range-finder for long sequences.
"""

from __future__ import annotations

import json
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import jax.numpy as jnp
import numpy as np

from nerf_attention_tpu.io import kvstore
from nerf_attention_tpu.ops.svd import (
    randomized_svd,
    svd_rank_for_compression,
    svd_reconstruct,
    svd_size_bytes,
)
from nerf_attention_tpu.parallel.sweep import cosine_similarity


def run_svd_experiment(
    kv_dir: Path,
    base_dir: Path,
    target_compressions: list[float] | None = None,
    accounting: str = "fp16",
    randomized: bool = False,
    verbose: bool = True,
) -> list[dict]:
    """Truncated SVD at matched compression ratios, for SIREN comparison.

    Grid (reference svd.py:34-44): layers {0, L/2, L-1} x min(H,4) heads x
    {key, value} x 4 target ratios -> 96 records for Llama shapes.
    """
    kv_dir, base_dir = Path(kv_dir), Path(base_dir)
    base_dir.mkdir(parents=True, exist_ok=True)
    if target_compressions is None:
        target_compressions = [2.0, 4.0, 8.0, 16.0]
    raw_bytes_per_elem = {"fp16": 2, "fp32": 4}[accounting]

    metadata = kvstore.load_metadata(kv_dir)
    layers_to_fit = sorted(
        {0, metadata.num_layers // 2, metadata.num_layers - 1}
    )
    all_results: list[dict] = []

    for layer_idx in layers_to_fit:
        if not kvstore.has_layer(kv_dir, layer_idx):
            continue
        keys, values = kvstore.load_layer(kv_dir, layer_idx)

        for head_idx in range(min(metadata.num_kv_heads, 4)):
            for kv_type, tensor in (
                ("key", keys[head_idx]),
                ("value", values[head_idx]),
            ):
                seq_len, d_head = tensor.shape
                raw_bytes = seq_len * d_head * 2  # reporting: fp16 KV cache
                x = jnp.asarray(tensor, dtype=jnp.float32)

                ranks = [
                    svd_rank_for_compression(
                        seq_len, d_head, cr, raw_bytes_per_elem
                    )
                    for cr in target_compressions
                ]
                max_rank = max(ranks)

                # One decomposition, reused across every target ratio.
                if randomized:
                    u, s, vt = randomized_svd(x, max_rank)
                else:
                    u, s, vt = jnp.linalg.svd(x, full_matrices=False)

                for target_cr, rank in zip(target_compressions, ranks):
                    recon = svd_reconstruct(u[:, :rank], s[:rank], vt[:rank, :])
                    cos = np.asarray(cosine_similarity(recon, x))
                    svd_bytes = svd_size_bytes(seq_len, d_head, rank)
                    all_results.append(
                        {
                            "name": f"L{layer_idx}_H{head_idx}_{kv_type}_svd_r{rank}",
                            "method": "svd",
                            "layer": layer_idx,
                            "head": head_idx,
                            "kv_type": kv_type,
                            "rank": rank,
                            "target_compression": target_cr,
                            "actual_compression": float(raw_bytes / svd_bytes),
                            "final_cosine_mean": float(cos.mean()),
                            "final_cosine_min": float(cos.min()),
                            "final_cosine_std": float(cos.std(ddof=1)),
                            "raw_size_bytes": raw_bytes,
                            "svd_size_bytes": svd_bytes,
                            "seq_len": seq_len,
                            "d_head": d_head,
                            "accounting": accounting,
                        }
                    )

                if verbose:
                    prefix = f"L{layer_idx}_H{head_idx}_{kv_type}"
                    row = " | ".join(
                        f"r{r['rank']}={r['final_cosine_mean']:.4f}"
                        f"@{r['actual_compression']:.1f}x"
                        for r in all_results
                        if r["name"].startswith(f"{prefix}_svd")
                    )
                    print(f"  {prefix}: {row}")

    out_name = (
        "svd_results.json"
        if accounting == "fp16"
        else "svd_results_published_accounting.json"
    )
    with open(base_dir / out_name, "w") as f:
        json.dump(all_results, f, indent=2)

    if verbose:
        print_svd_summary(all_results, target_compressions)
    return all_results


def print_svd_summary(
    all_results: list[dict], target_compressions: list[float]
) -> None:
    key_r = [r for r in all_results if r["kv_type"] == "key"]
    val_r = [r for r in all_results if r["kv_type"] == "value"]
    print("\nSVD Summary:")
    for tc in target_compressions:
        kr = [r for r in key_r if r["target_compression"] == tc]
        vr = [r for r in val_r if r["target_compression"] == tc]
        if kr and vr:
            print(
                f"  {tc:.0f}x: keys CosSim="
                f"{np.mean([r['final_cosine_mean'] for r in kr]):.4f}, "
                f"values CosSim="
                f"{np.mean([r['final_cosine_mean'] for r in vr]):.4f}"
            )


def _style_axes(ax, title: str, guides: tuple[tuple[float, str], ...]) -> None:
    """Shared Pareto-panel styling: log-x, guide lines, labels, grid."""
    for level, color in guides:
        ax.axhline(y=level, color=color, linestyle="--", alpha=0.3)
    ax.set_xscale("log")
    ax.set(
        xlabel="Compression Ratio (x)",
        ylabel="Cosine Similarity",
        title=title,
    )
    ax.grid(True, alpha=0.3)


def plot_siren_vs_svd(
    siren_results: list[dict], svd_results: list[dict], output_dir: Path
) -> None:
    """Dual-panel Pareto figure, SIREN point clouds vs SVD diamonds.

    Output contract (filename, panel semantics, guides, styling) matches
    the reference figure (`/root/reference/nerf_attention/experiments/
    svd.py:100-161`); data prep goes through figdata.
    """
    from nerf_attention_tpu import figdata
    from nerf_attention_tpu.evaluate import CONFIG_COLORS, CONFIG_MARKERS

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    fig, (ax_all, ax_keys) = plt.subplots(1, 2, figsize=(16, 7))

    # Left panel: every SIREN architecture's cloud plus all SVD points.
    for arch, (ratios, quality) in figdata.pareto_series(siren_results).items():
        ax_all.scatter(
            ratios, quality,
            c=CONFIG_COLORS.get(arch, "#95a5a6"),
            marker=CONFIG_MARKERS.get(arch, "o"),
            s=60, alpha=0.5, label=f"SIREN {arch}",
            edgecolors="black", linewidth=0.3,
        )
    ax_all.scatter(
        figdata.column(svd_results, "actual_compression"),
        figdata.column(svd_results, figdata.QUALITY),
        c="black", marker="D", s=80, alpha=0.7, label="SVD",
        edgecolors="black", linewidth=0.5,
    )
    _style_axes(
        ax_all,
        "SIREN vs SVD: Fidelity vs Compression",
        guides=((0.95, "green"), (0.90, "orange")),
    )
    ax_all.legend(fontsize=7, bbox_to_anchor=(1.05, 1), loc="upper left")

    # Right panel: keys head-to-head, with SVD values for contrast. Each
    # series is (record subset, x-axis field, scatter style).
    head_to_head = (
        (
            figdata.only(siren_results, kv_type="key"),
            "compression_ratio",
            dict(c="#3498db", s=60, alpha=0.5, label="SIREN (keys)",
                 edgecolors="black", linewidth=0.3),
        ),
        (
            figdata.only(svd_results, kv_type="key"),
            "actual_compression",
            dict(c="black", marker="D", s=80, alpha=0.7, label="SVD (keys)"),
        ),
        (
            figdata.only(svd_results, kv_type="value"),
            "actual_compression",
            dict(c="red", marker="D", s=80, alpha=0.7, label="SVD (values)"),
        ),
    )
    for rows, x_field, style in head_to_head:
        if rows:
            ax_keys.scatter(
                figdata.column(rows, x_field),
                figdata.column(rows, figdata.QUALITY),
                **style,
            )
    _style_axes(ax_keys, "Keys: SIREN vs SVD", guides=((0.95, "green"),))
    ax_keys.legend(fontsize=9)

    plt.tight_layout()
    plt.savefig(output_dir / "siren_vs_svd.png", dpi=150, bbox_inches="tight")
    plt.close()
    print(f"  Saved: {output_dir}/siren_vs_svd.png")
