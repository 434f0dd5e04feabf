"""Shared-basis SIREN study: amortize the trunk across a layer's heads.

The reference spends a full network per (layer, head, K|V) tensor
(`/root/reference/nerf_attention/fit.py:54-86`) — in a medium net ~80%
of the parameters are hidden layers that never touch the output. This
study measures the amortized alternative (`models/siren_shared.py`):
ONE sinusoidal trunk per group with per-unit linear heads, in two
regimes — trainable trunk (a learned positional basis shared across the
group) and frozen trunk (random sinusoidal features; the trunk is a
pure function of the seed, so stored bytes per unit collapse to the
head alone). Both are priced against the independent per-unit frontier
(fit_batch at the registry configs) on the SAME hard-mode synthetic
tensors, same optimizer/epochs/normalization, scored by mean per-unit
CosSim at equal stored bytes per unit (fp16 accounting throughout).

Axes: group = one layer's heads (the natural serving unit — one trunk
forward reconstructs the whole layer), keys and values separately, a
trunk-width sweep, and a cross-layer leg (two layers' heads in one
group) probing whether the basis transfers across depth.

Writes ``shared_basis_study.json`` + a bytes-vs-quality figure.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def run_study(
    output_dir: Path,
    *,
    seq_len: int = 2048,
    num_layers: int = 32,
    num_heads: int = 8,
    head_dim: int = 128,
    layer: int = 16,
    cross_layer: int = 0,
    epochs: int = 2000,
    widths: tuple[int, ...] = (64, 128, 256, 512),
    configs: tuple[str, ...] = ("tiny", "small", "medium"),
    values_mode: str = "hard",
    seed: int = 0,
    verbose: bool = True,
) -> dict:
    from nerf_attention_tpu.io import kvstore
    from nerf_attention_tpu.models.siren_shared import (
        fit_shared_batch,
        shared_bytes_per_unit,
        shared_param_counts,
    )
    from nerf_attention_tpu.ops.quantize import param_bytes
    from nerf_attention_tpu.parallel.sweep import fit_batch
    from nerf_attention_tpu.synthetic import generate_synthetic_kv
    from nerf_attention_tpu.types import CONFIGS_BY_NAME, SIRENConfig

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    t0 = time.perf_counter()

    kv_dir = output_dir / "kv_cache"
    layers = sorted({layer, cross_layer} if cross_layer else {layer})
    generate_synthetic_kv(
        seq_len=seq_len,
        num_layers=num_layers,
        num_kv_heads=num_heads,
        head_dim=head_dim,
        output_dir=kv_dir,
        verbose=False,
        layer_indices=layers,
        values_mode=values_mode,
    )
    tensors = {
        li: dict(zip(("keys", "values"), kvstore.load_layer(kv_dir, li)))
        for li in layers
    }  # each {'keys': (H,S,D), 'values': (H,S,D)}

    raw_bytes_per_unit = seq_len * head_dim * 2  # fp16, the study's ruler

    results: dict = {
        "profile": {
            "seq_len": seq_len,
            "num_layers": num_layers,
            "num_heads": num_heads,
            "head_dim": head_dim,
            "layer": layer,
            "cross_layer": cross_layer,
            "values_mode": values_mode,
            "epochs": epochs,
            "seed": seed,
            "raw_fp16_bytes_per_unit": raw_bytes_per_unit,
        },
        "independent": [],
        "shared": [],
    }

    for kv in ("keys", "values"):
        group = np.asarray(tensors[layer][kv], dtype=np.float32)  # (H,S,D)

        for cfg_name in configs:
            cfg = CONFIGS_BY_NAME[cfg_name]
            t1 = time.perf_counter()
            fit = fit_batch(group, cfg, epochs=epochs, seed=seed)
            one = [(np.asarray(w)[0], np.asarray(b)[0]) for w, b in fit.params]
            bpu = param_bytes(one, "fp16")
            row = {
                "kv": kv,
                "config": cfg_name,
                "n_units": int(group.shape[0]),
                "bytes_per_unit": bpu,
                "compression_vs_raw_fp16": raw_bytes_per_unit / bpu,
                "cosine_mean": float(np.mean(fit.cosine_mean)),
                "cosine_min": float(np.min(fit.cosine_min)),
                "wall_seconds": time.perf_counter() - t1,
            }
            results["independent"].append(row)
            if verbose:
                log(
                    f"  independent {kv}/{cfg_name}: "
                    f"{row['compression_vs_raw_fp16']:.2f}x | "
                    f"cos {row['cosine_mean']:.4f} ({row['wall_seconds']:.0f}s)"
                )

        group_legs = [(f"L{layer}", group)]
        if cross_layer:
            both = np.concatenate(
                [group, np.asarray(tensors[cross_layer][kv], np.float32)]
            )
            group_legs.append((f"L{layer}+L{cross_layer}", both))

        for leg_name, leg in group_legs:
            for width in widths:
                cfg = SIRENConfig(
                    hidden_features=width, hidden_layers=2,
                    omega_0=30.0, name=f"shared{width}",
                )
                for trainable in (True, False):
                    t1 = time.perf_counter()
                    fit = fit_shared_batch(
                        leg, cfg, epochs=epochs, seed=seed,
                        trainable_trunk=trainable,
                    )
                    bpu = shared_bytes_per_unit(
                        fit.params, frozen_trunk=not trainable
                    )
                    counts = shared_param_counts(fit.params)
                    row = {
                        "kv": kv,
                        "group": leg_name,
                        "trunk_width": width,
                        "trainable_trunk": trainable,
                        "n_units": fit.n_units,
                        "trunk_params": counts["trunk"],
                        "head_params_per_unit": counts["heads_per_unit"],
                        "bytes_per_unit": bpu,
                        "compression_vs_raw_fp16": raw_bytes_per_unit / bpu,
                        "cosine_mean": float(np.mean(fit.cosine_mean)),
                        "cosine_min": float(np.min(fit.cosine_min)),
                        "wall_seconds": time.perf_counter() - t1,
                    }
                    results["shared"].append(row)
                    if verbose:
                        kind = "trained" if trainable else "frozen "
                        log(
                            f"  shared {kv}/{leg_name} w={width} {kind}: "
                            f"{row['compression_vs_raw_fp16']:.2f}x | "
                            f"cos {row['cosine_mean']:.4f} "
                            f"({row['wall_seconds']:.0f}s)"
                        )

    results["wall_seconds"] = time.perf_counter() - t0
    with open(output_dir / "shared_basis_study.json", "w") as f:
        json.dump(results, f, indent=2)
    if verbose:
        log(
            f"Done in {results['wall_seconds']:.0f}s -> "
            f"{output_dir / 'shared_basis_study.json'}"
        )
    return results


def plot_study(results: dict, output_dir: Path) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11.5, 4.6), sharey=True)
    for ax, kv in zip(axes, ("keys", "values")):
        ind = [r for r in results["independent"] if r["kv"] == kv]
        ax.plot(
            [r["bytes_per_unit"] for r in ind],
            [r["cosine_mean"] for r in ind],
            "-o", color="C0", label="independent nets",
        )
        for r in ind:
            ax.annotate(
                r["config"], (r["bytes_per_unit"], r["cosine_mean"]),
                fontsize=7, xytext=(3, 3), textcoords="offset points",
            )
        groups = sorted({r["group"] for r in results["shared"]})
        styles = {True: "-", False: "--"}
        colors = {g: f"C{1 + i}" for i, g in enumerate(groups)}
        for g in groups:
            for trainable in (True, False):
                rows = [
                    r for r in results["shared"]
                    if r["kv"] == kv and r["group"] == g
                    and r["trainable_trunk"] == trainable
                ]
                if not rows:
                    continue
                rows.sort(key=lambda r: r["bytes_per_unit"])
                kind = "trained" if trainable else "frozen"
                ax.plot(
                    [r["bytes_per_unit"] for r in rows],
                    [r["cosine_mean"] for r in rows],
                    styles[trainable] + "s", ms=4, color=colors[g],
                    label=f"shared {g} ({kind} trunk)",
                )
                for r in rows:
                    ax.annotate(
                        str(r["trunk_width"]),
                        (r["bytes_per_unit"], r["cosine_mean"]),
                        fontsize=6, xytext=(2, -8),
                        textcoords="offset points", color=colors[g],
                    )
        ax.set_xscale("log")
        ax.set_xlabel("stored fp16 bytes per unit")
        ax.set_title(kv)
        ax.grid(alpha=0.3, which="both")
    axes[0].set_ylabel("mean per-unit CosSim")
    axes[0].legend(fontsize=7)
    fig.suptitle(
        "Shared-basis SIREN: one trunk per group vs a net per unit "
        f"(hard values, S={results['profile']['seq_len']})"
    )
    fig.tight_layout()
    fig.savefig(Path(output_dir) / "shared_basis_study.png", dpi=130)
    plt.close(fig)
    log(f"  Saved {Path(output_dir) / 'shared_basis_study.png'}")


def main(argv=None) -> None:
    from nerf_attention_tpu.utils.compile_cache import enable as _enable

    _enable()
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument(
        "--output_dir", type=Path, default=Path("results/shared_basis")
    )
    parser.add_argument("--seq_len", type=int, default=2048)
    parser.add_argument("--layers", type=int, default=32)
    parser.add_argument("--heads", type=int, default=8)
    parser.add_argument("--head_dim", type=int, default=128)
    parser.add_argument("--layer", type=int, default=16)
    parser.add_argument(
        "--cross_layer", type=int, default=0,
        help="if nonzero, add a leg grouping this layer's heads with "
        "--layer's (cross-depth basis sharing)",
    )
    parser.add_argument("--epochs", type=int, default=2000)
    parser.add_argument(
        "--widths", type=int, nargs="+", default=[64, 128, 256, 512]
    )
    parser.add_argument(
        "--configs", type=str, default="tiny,small,medium",
        help="independent-baseline SIREN config names",
    )
    parser.add_argument(
        "--values_mode", type=str, default="hard",
        choices=("reference", "hard"),
    )
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    results = run_study(
        args.output_dir,
        seq_len=args.seq_len,
        num_layers=args.layers,
        num_heads=args.heads,
        head_dim=args.head_dim,
        layer=args.layer,
        cross_layer=args.cross_layer,
        epochs=args.epochs,
        widths=tuple(args.widths),
        configs=tuple(c.strip() for c in args.configs.split(",") if c.strip()),
        values_mode=args.values_mode,
        seed=args.seed,
    )
    plot_study(results, args.output_dir)


if __name__ == "__main__":
    main()
