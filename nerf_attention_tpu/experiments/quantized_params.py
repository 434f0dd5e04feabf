"""Experiment 6 (beyond reference): quantized SIREN parameter storage.

The reference's Pareto counts every SIREN at fp32 storage
(`/root/reference/nerf_attention/siren.py:63-67`), so its medium config at
S=2048 reads as an 0.8x "expansion" and its headline conclusion leans on
that accounting. This experiment re-prices the SAME trained networks under
bf16 / fp16 / int8 storage (`ops/quantize.py`) and measures the
reconstruction delta directly: for each saved medium checkpoint, the
original tensor is reconstructed from the de-quantized parameters and the
per-position CosSim recomputed against the cache on disk.

Round 4 pushes the frontier: ``int4`` (group-wise fp16 scales, packed
nibbles) and ``int4_qat`` — the same int4 payload after a short
quantization-aware fine-tune (`ops/qat.py`: straight-through estimator
against the exact stored grid, every checkpoint fine-tuned in ONE batched
program). The int4 accounting ceiling at the medium geometry is ~5.5x
(nibbles dominate; scales+fp16 biases are the rest). Any parameterized
``int<B>_g<N>`` scheme (`ops/quantize.py:parse_scheme`) can be swept via
``schemes=...``, each with its own ``_qat`` variant — ``int3_g64_qat``
fine-tunes against the 3-bit/64-group grid, etc. — which is how the
compression-frontier study (``experiments quantize --schemes ...``)
probes past 6x.

Outputs ``quantization_results.json`` (one record per checkpoint x scheme)
and ``quantized_pareto.png`` (quality vs effective compression, one series
per scheme), both under the experiment output dir.
"""

from __future__ import annotations

import json
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import jax.numpy as jnp
import numpy as np

from nerf_attention_tpu.io import checkpoint, kvstore
from nerf_attention_tpu.models.siren import positions
from nerf_attention_tpu.ops.quantize import SCHEMES, param_bytes, quantize_params
from nerf_attention_tpu.parallel.sweep import cosine_similarity

SCHEME_STYLE = {
    "fp32": dict(color="#2ecc71", marker="o"),
    "bf16": dict(color="#3498db", marker="s"),
    "fp16": dict(color="#9b59b6", marker="^"),
    "int8": dict(color="#e74c3c", marker="D"),
    "int4": dict(color="#e67e22", marker="v"),
    "int4_qat": dict(color="#c0392b", marker="*"),
}

# The experiment's default scheme set: every storage scheme plus the
# QAT-repaired int4 point (same payload, fine-tuned master weights).
# int8_g32_l0fp32 is in the default grid so an FM study shows its repaired
# shipping point (first-layer fp32 cures FM's storage fragility — FINDINGS)
# next to the rows that motivate it; for shared-omega nets it reads as a
# slightly-larger int8_g32.
EXPERIMENT_SCHEMES = SCHEMES + ("int8_g32_l0fp32", "int4_qat")


def _reconstruct(
    params, omega: float, seq_len: int, mean, std, fm_mult: float | None = None
) -> np.ndarray:
    from nerf_attention_tpu.models.siren import siren_apply_maybe_fm

    pos = positions(seq_len)
    jparams = [(jnp.asarray(w), jnp.asarray(b)) for w, b in params]
    pred = siren_apply_maybe_fm(jparams, omega, fm_mult, pos)
    return np.asarray(pred.reshape(seq_len, -1) * std + mean)


def run_quantization_experiment(
    siren_dir: Path,
    kv_dir: Path,
    output_dir: Path,
    schemes: tuple[str, ...] = EXPERIMENT_SCHEMES,
    max_models: int | None = None,
    qat_epochs: int = 300,
    verbose: bool = True,
) -> list[dict]:
    """Re-price every saved medium checkpoint under each storage scheme.

    ``int4_qat`` is computed in a second pass: all checkpoints stack into
    one batched straight-through fine-tune (``qat_epochs`` steps against
    the sweep's own normalized targets), then the tuned weights are int4-
    quantized and re-priced exactly like the plain schemes.
    """
    from nerf_attention_tpu.ops.quantize import parse_scheme

    # Validate every scheme name up front — a typo must fail before the
    # per-checkpoint loop burns device time, and a _qat scheme must have a
    # group-wise integer base grid to fine-tune against.
    for s in schemes:
        base = s[: -len("_qat")] if s.endswith("_qat") else s
        kind, _, group = parse_scheme(base)
        if s.endswith("_qat") and (kind != "int" or group is None):
            raise ValueError(
                f"QAT needs a group-wise integer base scheme, got {s!r}"
            )

    siren_dir, kv_dir, output_dir = Path(siren_dir), Path(kv_dir), Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    model_files = checkpoint.checkpoint_glob(siren_dir)
    if max_models is not None:
        model_files = model_files[:max_models]
    if not model_files:
        raise FileNotFoundError(f"no checkpoints under {siren_dir}")

    plain_schemes = tuple(s for s in schemes if not s.endswith("_qat"))
    qat_schemes = tuple(s for s in schemes if s.endswith("_qat"))
    results: list[dict] = []
    loaded: list[dict] = []  # per-checkpoint context for the QAT pass
    for model_file in model_files:
        ckpt = checkpoint.load_siren_checkpoint(model_file)
        metrics = ckpt["metrics"]
        keys, values = kvstore.load_layer(kv_dir, metrics["layer"])
        original = np.asarray(
            (keys if metrics["kv_type"] == "key" else values)[metrics["head"]],
            dtype=np.float32,
        )
        seq_len, d_head = original.shape
        raw_bytes = seq_len * d_head * 2  # fp16 KV-cache accounting (reference)
        loaded.append(
            {"ckpt": ckpt, "original": original, "raw_bytes": raw_bytes}
        )

        for scheme in plain_schemes:
            _, dq_params = quantize_params(ckpt["params"], scheme)
            pred = _reconstruct(
                dq_params, ckpt["config"].omega_0, seq_len,
                ckpt["target_mean"], ckpt["target_std"],
                fm_mult=ckpt.get("fm_mult"),
            )
            cos = np.asarray(cosine_similarity(jnp.asarray(pred), jnp.asarray(original)))
            if scheme == "fp32":
                # Guard against a checkpoint/cache mismatch (e.g. kv_dir
                # regenerated under another recipe after the sweep): the
                # fp32 reconstruction must reproduce the quality the sweep
                # recorded for this exact tensor.
                recorded = metrics.get("final_cosine_mean")
                if recorded is not None and abs(float(cos.mean()) - recorded) > 0.02:
                    print(
                        f"  WARNING: {metrics['name']} fp32 CosSim "
                        f"{float(cos.mean()):.4f} != recorded {recorded:.4f} — "
                        f"{kv_dir} likely is NOT the cache this sweep was "
                        f"trained on; quality numbers are meaningless"
                    )
            stored = param_bytes(ckpt["params"], scheme)
            results.append(
                {
                    "name": metrics["name"],
                    "layer": metrics["layer"],
                    "head": metrics["head"],
                    "kv_type": metrics["kv_type"],
                    "scheme": scheme,
                    "stored_bytes": stored,
                    "compression_ratio": float(raw_bytes / stored),
                    "final_cosine_mean": float(cos.mean()),
                    "final_cosine_min": float(cos.min()),
                    "seq_len": seq_len,
                    "d_head": d_head,
                }
            )
        if verbose:
            by_scheme = {r["scheme"]: r for r in results if r["name"] == metrics["name"]}
            row = " | ".join(
                f"{s}={by_scheme[s]['final_cosine_mean']:.4f}"
                f"@{by_scheme[s]['compression_ratio']:.2f}x"
                for s in plain_schemes
            )
            print(f"  {metrics['name']}: {row}")

    for qat_scheme in qat_schemes:
        results.extend(
            _qat_rows(
                loaded, base_scheme=qat_scheme[: -len("_qat")],
                qat_epochs=qat_epochs, verbose=verbose,
            )
        )

    with open(output_dir / "quantization_results.json", "w") as f:
        json.dump(results, f, indent=2)

    if verbose:
        print_quantization_summary(results, schemes)
    return results


def _qat_rows(
    loaded: list[dict], base_scheme: str, qat_epochs: int, verbose: bool
) -> list[dict]:
    """One batched straight-through fine-tune over every checkpoint against
    ``base_scheme``'s stored grid, then re-price the tuned weights as plain
    ``base_scheme`` payloads."""
    from nerf_attention_tpu.ops.qat import qat_finetune_checkpoints

    if not loaded:
        return []
    if verbose:
        print(
            f"  {base_scheme} QAT: fine-tuning {len(loaded)} checkpoints x "
            f"{qat_epochs} epochs (one batched program)"
        )
    per_checkpoint = qat_finetune_checkpoints(loaded, base_scheme, qat_epochs)

    rows = []
    for c, per_net in zip(loaded, per_checkpoint):
        ckpt, metrics = c["ckpt"], c["ckpt"]["metrics"]
        seq_len, d_head = c["original"].shape
        _, dq_params = quantize_params(per_net, base_scheme)
        pred = _reconstruct(
            dq_params, ckpt["config"].omega_0, seq_len,
            ckpt["target_mean"], ckpt["target_std"],
            fm_mult=ckpt.get("fm_mult"),
        )
        cos = np.asarray(
            cosine_similarity(jnp.asarray(pred), jnp.asarray(c["original"]))
        )
        stored = param_bytes(ckpt["params"], base_scheme)
        rows.append(
            {
                "name": metrics["name"],
                "layer": metrics["layer"],
                "head": metrics["head"],
                "kv_type": metrics["kv_type"],
                "scheme": f"{base_scheme}_qat",
                "qat_epochs": qat_epochs,
                "stored_bytes": stored,
                "compression_ratio": float(c["raw_bytes"] / stored),
                "final_cosine_mean": float(cos.mean()),
                "final_cosine_min": float(cos.min()),
                "seq_len": seq_len,
                "d_head": d_head,
            }
        )
        if verbose:
            print(
                f"    {metrics['name']}: "
                f"{rows[-1]['scheme']}={rows[-1]['final_cosine_mean']:.4f}"
                f"@{rows[-1]['compression_ratio']:.2f}x"
            )
    return rows


def print_quantization_summary(results: list[dict], schemes=None) -> None:
    if schemes is None:
        # First-appearance order of whatever was actually measured.
        schemes = tuple(dict.fromkeys(r["scheme"] for r in results))
    print("\nQuantized-storage summary (mean over checkpoints):")
    fp32_cos = None
    for scheme in schemes:
        rows = [r for r in results if r["scheme"] == scheme]
        if not rows:
            continue
        cos = float(np.mean([r["final_cosine_mean"] for r in rows]))
        ratio = float(np.mean([r["compression_ratio"] for r in rows]))
        if scheme == "fp32":
            fp32_cos = cos
        delta = f" (delta {cos - fp32_cos:+.5f})" if fp32_cos is not None and scheme != "fp32" else ""
        print(f"  {scheme:>5}: CosSim {cos:.4f}{delta} at {ratio:.2f}x")


def plot_quantized_pareto(results: list[dict], output_dir: Path) -> None:
    """Quality vs effective compression, one series per storage scheme."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    fig, ax = plt.subplots(figsize=(10, 7))

    extra_markers = iter("PXohsd^v*" * 4)
    present = dict.fromkeys(r["scheme"] for r in results)
    for scheme in present:
        style = SCHEME_STYLE.get(scheme)
        if style is None:
            # Parameterized frontier schemes (int3_g64, int4_g128_qat, ...)
            # get a deterministic fallback so any sweep plots cleanly.
            style = dict(
                color=f"C{list(present).index(scheme) % 10}",
                marker=next(extra_markers),
            )
        rows = [r for r in results if r["scheme"] == scheme]
        ax.scatter(
            [r["compression_ratio"] for r in rows],
            [r["final_cosine_mean"] for r in rows],
            s=70, alpha=0.7, label=f"{scheme} storage",
            edgecolors="black", linewidth=0.4, **style,
        )
    ax.axhline(y=0.95, color="green", linestyle="--", alpha=0.3)
    ax.axvline(x=1.0, color="gray", linestyle=":", alpha=0.5)
    ax.set(
        xlabel="Effective Compression Ratio (x)",
        ylabel="Cosine Similarity",
        title="Same Trained SIRENs, Re-Priced by Parameter Storage",
    )
    ax.legend(fontsize=9)
    ax.grid(True, alpha=0.3)
    plt.tight_layout()
    plt.savefig(output_dir / "quantized_pareto.png", dpi=150, bbox_inches="tight")
    plt.close()
    print(f"  Saved: {output_dir}/quantized_pareto.png")
