"""Cross-seed summary figure for the attention-sink head-policy study.

Renders ``benchmarks/r4/head_policy_sinks/summary.png`` from the committed
artifacts (no device time): the policy budget curves averaged over the
three wide-offset seeds with min-max bands, and the law-fit R² across
every measured regime. Companion to FINDINGS_TPU.md "Attention sinks
break the sink-blind law". Beyond-reference tooling (the reference has
no serving layer; its figure surface is `nerf_attention/evaluate.py`).

Colors are the data-viz reference categorical palette (validated
light-surface steps), assigned by ENTITY and reused across panels:
sink-aware = blue, sink-blind = orange, oracle = aqua, proxy = yellow.
"""

from __future__ import annotations

import json
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

ROOT = Path(__file__).resolve().parent.parent / "benchmarks/r4"

C_SINKLAW = "#2a78d6"  # blue: the sink-aware law (the fix)
C_LAW = "#eb6834"      # orange: the sink-blind law (the failure)
C_ORACLE = "#1baf7a"   # aqua: measured-solo oracle (solo_asc)
C_PROXY = "#eda100"    # yellow: fit-quality-only ranking
C_CACHE1F = "#4a3aa7"  # violet: cache-conditional single-factor fit
C_BAND = "#b9b8b3"     # neutral: random-order band


def _load(rel: str) -> dict:
    with open(ROOT / rel) as f:
        return json.load(f)


def main(out: Path | None = None) -> Path:
    wide = [
        _load(f"head_policy_sinks/seed{s}/head_policy_results.json")
        for s in (0, 1, 2)
    ]

    fig, (ax, axr) = plt.subplots(1, 2, figsize=(12.6, 4.8))

    # --- Panel A: budget curves, 3-seed mean with min-max band ---
    series = (
        ("law_sink", "sink-aware law", C_SINKLAW),
        ("law", "sink-blind law", C_LAW),
        ("solo_asc", "measured-solo oracle", C_ORACLE),
        ("proxy_desc", "fit quality only", C_PROXY),
    )
    pol0 = wide[0]["payloads"]["master"]["policies"]
    frac = np.asarray(pol0["law"]["fraction"])
    rand = np.array(
        [
            [p["output_cosine"] for k, p in r["payloads"]["master"]["policies"].items()
             if k.startswith("random")]
            for r in wide
        ]
    )  # (seeds, n_random, budgets)
    ax.fill_between(
        frac, rand.min(axis=(0, 1)), rand.max(axis=(0, 1)),
        color=C_BAND, alpha=0.45, linewidth=0,
        label="random orders (range)",
    )
    for key, label, color in series:
        curves = np.array(
            [r["payloads"]["master"]["policies"][key]["output_cosine"]
             for r in wide]
        )
        ax.fill_between(
            frac, curves.min(axis=0), curves.max(axis=0),
            color=color, alpha=0.18, linewidth=0,
        )
        ax.plot(frac, curves.mean(axis=0), "-o", ms=3.5, lw=2, color=color,
                label=label)
    # direct-label the two headline series at their half-budget gap
    mid = len(frac) // 2
    for key, label, color, dy in (
        ("law_sink", "sink-aware", C_SINKLAW, 0.012),
        ("law", "sink-blind", C_LAW, -0.05),
    ):
        y = np.mean(
            [r["payloads"]["master"]["policies"][key]["output_cosine"][mid]
             for r in wide]
        )
        ax.annotate(label, (frac[mid], y + dy), color=color, fontsize=9,
                    fontweight="bold", ha="center")
    ax.set_xlabel("fraction of (layer, kv-head) slices served from parameters")
    ax.set_ylabel("output cosine vs true-cache decode")
    ax.set_title(
        "GPT-OSS sinks: selection policies over the budget axis\n"
        "(3 seeds, S=512, wide sink offsets — mean with min-max band)",
        fontsize=10,
    )
    ax.grid(alpha=0.25)
    ax.legend(fontsize=8, loc="lower left")

    # --- Panel B: law-fit R² across regimes ---
    regimes = [
        ("narrow\noffsets", [
            _load(f"head_policy_sinks/narrow_seed{s}/head_policy_results.json")
            for s in (0, 1, 2)
        ]),
        ("wide\noffsets", wide),
        ("wide\nS=2048", [
            _load("head_policy_sinks/s2048_seed0/head_policy_results.json")
        ]),
        ("full profile\n(+windows+MoE)", [
            _load(
                f"head_policy_windows/gptoss_profile_s2048_seed{s}/"
                f"head_policy_results.json"
            )
            for s in (0, 1, 2)
        ]),
    ]
    laws = (
        ("entropy_law_solo", "sink-blind (full H)", C_LAW),
        ("entropy_law_solo_cache", "cache-conditional H", C_CACHE1F),
        ("entropy_law_solo_sink3", "sink-aware 3-factor", C_SINKLAW),
    )
    width = 0.26
    xs = np.arange(len(regimes))
    for j, (key, label, color) in enumerate(laws):
        offs = xs + (j - 1) * width
        means, points = [], []
        for _, arts in regimes:
            r2s = [a[key]["r2"] for a in arts if a.get(key)]
            means.append(float(np.mean(r2s)))
            points.append(r2s)
        ax2 = axr.bar(offs, means, width * 0.92, color=color, label=label)
        for x0, r2s in zip(offs, points):
            axr.plot([x0] * len(r2s), r2s, "o", ms=3, color="0.25",
                     zorder=3)
        del ax2
    axr.set_xticks(xs, [name for name, _ in regimes], fontsize=9)
    axr.set_ylabel("solo-cost law fit $R^2$")
    axr.set_ylim(0, 1)
    axr.set_title(
        "The sink-blind law collapses with sink mass;\n"
        "the cache-conditional form restores it (dots = seeds)",
        fontsize=10,
    )
    axr.grid(alpha=0.25, axis="y")
    axr.legend(fontsize=8, loc="upper left")

    fig.tight_layout()
    out = out or ROOT / "head_policy_sinks" / "summary.png"
    fig.savefig(out, dpi=140)
    plt.close(fig)
    print(f"saved {out}")
    return out


if __name__ == "__main__":
    main()
