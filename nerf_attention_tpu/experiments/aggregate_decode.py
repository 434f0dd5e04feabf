"""Experiment 5 (beyond-reference): aggregate decode vs full-cache HBM read.

The reference profiles ONE SIREN forward against reading ONE (S, D) slice
(`/root/reference/nerf_attention/evaluate.py:173-219`). But the study's
premise — replace the KV cache with networks — means a serving step must
reconstruct EVERY (layer, head, K|V) slice: for Llama-3.1-8B that is
32 layers x 8 kv-heads x 2 = 512 medium SIRENs per decode step. This
experiment measures that aggregate, both sides on-device:

  * SIREN side: all N networks evaluated by ONE batched fused Pallas kernel
    (`ops/siren_pallas.py:siren_decode_batch`) — the most favorable honest
    implementation of the compute-for-memory trade.
  * HBM side: streaming the full (N, S, D) bf16 cache from HBM (dependent-
    loop timer, pool larger than VMEM so reads can't be cached on-chip).

If trained checkpoints exist (a completed sweep), their weights are used;
otherwise SIREN-initialized random weights — decode cost is shape-dependent
only, so the latency conclusion is identical either way.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


import jax
import jax.numpy as jnp

from nerf_attention_tpu.evaluate import HBM_BW
from nerf_attention_tpu.io import checkpoint
from nerf_attention_tpu.models.siren import init_siren, positions, siren_apply
from nerf_attention_tpu.types import CONFIGS_BY_NAME

MEDIUM = CONFIGS_BY_NAME["medium"]


def _stack_params(param_list):
    """[(w, b), ...] per network -> [(W, B), ...] with leading N axis."""
    n_layers = len(param_list[0])
    return [
        (
            jnp.stack([p[i][0] for p in param_list]),
            jnp.stack([p[i][1] for p in param_list]),
        )
        for i in range(n_layers)
    ]


def _gather_networks(siren_dir: Path | None, n_networks: int, head_dim: int):
    """Stacked medium-SIREN params: trained checkpoints if present, else init.

    Only checkpoints whose architecture matches the requested geometry are
    used — a sweep fit on a different head_dim would otherwise make the
    stack ragged. Returns ``(stacked, source, fm_mult)``: an FM sweep's
    checkpoints must be DECODED as FM networks (the kernels take the
    per-unit multipliers), so the stack is built from one forward family —
    the first loaded checkpoint's fm_mult — and mismatched files are
    skipped with a note in the source label.
    """
    loaded = []
    fm_mult = None
    skipped_fm = 0
    if siren_dir is not None:
        for f in checkpoint.checkpoint_glob(Path(siren_dir), "*medium_model"):
            ckpt = checkpoint.load_siren_checkpoint(f)
            if (
                ckpt["out_features"] != head_dim
                or ckpt["config"].hidden_features != MEDIUM.hidden_features
                or ckpt["config"].hidden_layers != MEDIUM.hidden_layers
            ):
                continue
            if not loaded:
                fm_mult = ckpt.get("fm_mult")
            elif ckpt.get("fm_mult") != fm_mult:
                skipped_fm += 1
                continue
            loaded.append([(jnp.asarray(w), jnp.asarray(b)) for w, b in ckpt["params"]])
    nets = list(loaded)
    key = jax.random.PRNGKey(0)
    while len(nets) < n_networks:
        key, sub = jax.random.split(key)
        nets.append(init_siren(sub, MEDIUM, head_dim))
    n_trained = min(len(loaded), n_networks)
    if n_trained == 0:
        source = "SIREN init"
    elif n_trained == n_networks:
        source = f"{n_networks} trained checkpoints"
    else:
        # Be explicit that the stack is mixed — the latency conclusion is
        # shape-only, but the artifact must not claim all-trained weights.
        source = (
            f"{n_trained} trained checkpoints + "
            f"{n_networks - n_trained} random-init"
        )
    if fm_mult is not None:
        source += f", FM-SIREN fm_mult={fm_mult:g}"
    if skipped_fm:
        source += f" ({skipped_fm} skipped: different fm_mult)"
    return _stack_params(nets[:n_networks]), source, fm_mult


def _time_batched_decode_ms(
    stacked, seq_len: int, reps: int | None = None, compute_dtype=jnp.float32,
    sin_impl: str = "exact", fm_mult: float | None = None,
) -> float:
    """Dependent-loop timing of the batched fused decode (ms per full pass)."""
    from nerf_attention_tpu.ops.siren_pallas import siren_decode_batch
    from nerf_attention_tpu.parallel.sweep import _resolve_sin
    from nerf_attention_tpu.utils.timing import _on_tpu, time_perturbed_forward_ms

    omega = MEDIUM.omega_0
    use_fused = _on_tpu()
    pos = positions(seq_len)
    sin = _resolve_sin(sin_impl)
    if reps is None:
        reps = 30 if use_fused else 3

    def forward(p):
        if use_fused:
            return siren_decode_batch(
                p, omega, seq_len, compute_dtype=compute_dtype,
                sin_impl=sin_impl, fm_mult=fm_mult,
            )
        # Non-fused fallback honors the variant options too (mislabeled
        # exact-fp32 re-measurements otherwise land in the bf16/fast columns).
        from nerf_attention_tpu.models.siren import siren_apply_maybe_fm

        def one(q):
            qc = [(w.astype(compute_dtype), b.astype(compute_dtype)) for w, b in q]
            return siren_apply_maybe_fm(
                qc, omega, fm_mult, pos.astype(compute_dtype), sin=sin
            ).astype(jnp.float32)

        return jax.vmap(one)(p)

    samples = 5 if use_fused else 2
    return time_perturbed_forward_ms(stacked, forward, reps, samples=samples)


def _train_full_stack(
    kv_dir: Path | None,
    seq_len: int,
    head_dim: int,
    num_layers: int,
    num_kv_heads: int,
    epochs: int,
    verbose: bool,
):
    """Fit a medium SIREN to EVERY (layer, head, K|V) slice — one batched
    program over all L*H*2 fits (512 for Llama-3.1-8B geometry).

    Returns (stacked params as device arrays, source label, quality dict).
    Uses the synthetic cache at ``kv_dir`` (generated there if absent).
    """
    import numpy as np

    from nerf_attention_tpu.io import kvstore
    from nerf_attention_tpu.parallel.sweep import fit_batch
    from nerf_attention_tpu.synthetic import generate_synthetic_kv

    kv_dir = Path(kv_dir) if kv_dir is not None else Path("results/aggregate_kv")
    if not (kv_dir / "metadata.json").exists():
        generate_synthetic_kv(
            seq_len=seq_len, num_layers=num_layers, num_kv_heads=num_kv_heads,
            head_dim=head_dim, output_dir=kv_dir, verbose=verbose,
        )
    targets = np.empty(
        (num_layers * num_kv_heads * 2, seq_len, head_dim), dtype=np.float32
    )
    quality_index = []  # (kv_type) per row, row order = layer-major, head, K|V
    row = 0
    for layer_idx in range(num_layers):
        keys, values = kvstore.load_layer(kv_dir, layer_idx)
        for head_idx in range(num_kv_heads):
            for kv_type, tensor in (
                ("key", keys[head_idx]), ("value", values[head_idx])
            ):
                targets[row] = tensor
                quality_index.append(kv_type)
                row += 1

    if verbose:
        print(f"  training {row} medium SIRENs as one batched program "
              f"({epochs} epochs) ...")
    batch = fit_batch(targets, MEDIUM, epochs=epochs)
    if verbose:
        print(f"  trained in {batch.train_time_seconds:.1f}s "
              f"({batch.seconds_per_fit * 1e3:.1f} ms/fit)")
    import numpy as _np

    k_mask = _np.asarray([t == "key" for t in quality_index])
    quality = {
        "keys_cosine_mean": float(batch.cosine_mean[k_mask].mean()),
        "values_cosine_mean": float(batch.cosine_mean[~k_mask].mean()),
        "epochs": epochs,
    }
    stacked = [(jnp.asarray(w), jnp.asarray(b)) for w, b in batch.params]
    return stacked, f"{row} freshly trained fits", quality


def run_aggregate_decode_experiment(
    output_dir: Path,
    siren_dir: Path | None = None,
    seq_len: int = 2048,
    head_dim: int = 128,
    num_layers: int = 32,
    num_kv_heads: int = 8,
    verbose: bool = True,
    figures_dir: Path | None = None,
    train: bool = False,
    kv_dir: Path | None = None,
    epochs: int = 2000,
) -> dict:
    """Measure reconstructing the WHOLE cache vs reading it from HBM.

    ``train=True`` fits all L*H*2 medium SIRENs to the synthetic cache
    first (one batched program) so the timed stack is fully trained and the
    artifact also reports serving-scale reconstruction quality.
    """
    from nerf_attention_tpu.utils.timing import measured_hbm_read_ms

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    n_networks = num_layers * num_kv_heads * 2  # K and V per (layer, head)
    quality = None
    fm_mult = None
    if train:
        stacked, source, quality = _train_full_stack(
            kv_dir, seq_len, head_dim, num_layers, num_kv_heads, epochs,
            verbose,
        )
    else:
        stacked, source, fm_mult = _gather_networks(
            siren_dir, n_networks, head_dim
        )
    num_params = sum(int(w.size) + int(b.size) for w, b in stacked)

    if verbose:
        print(
            f"Aggregate decode: {n_networks} medium SIRENs "
            f"({num_layers}L x {num_kv_heads}H x K/V), weights from {source}"
        )

    t0 = time.perf_counter()
    siren_ms = _time_batched_decode_ms(stacked, seq_len, fm_mult=fm_mult)
    siren_bf16_ms = _time_batched_decode_ms(
        stacked, seq_len, compute_dtype=jnp.bfloat16, fm_mult=fm_mult
    )
    siren_fastsin_ms = _time_batched_decode_ms(
        stacked, seq_len, sin_impl="fast", fm_mult=fm_mult
    )
    if verbose:
        print(f"  batched fused decode: fp32 {siren_ms:.3f} ms / "
              f"bf16 {siren_bf16_ms:.3f} ms / "
              f"fast-sin {siren_fastsin_ms:.3f} ms "
              f"(timed in {time.perf_counter() - t0:.0f}s)")

    # HBM side, measured two ways: (a) ONE streaming read of the full
    # (N, S, D) cache — the serving-realistic number (single dispatch, full
    # prefetch behavior); (b) one (S, D) slice read extrapolated ×N — the
    # per-slice accounting matching the reference's single-slice framing.
    from nerf_attention_tpu.utils.timing import measured_hbm_stream_read_ms

    hbm_measured_ms = measured_hbm_stream_read_ms(n_networks, seq_len, head_dim)
    slice_ms = measured_hbm_read_ms(seq_len, head_dim)
    cache_bytes = n_networks * seq_len * head_dim * 2  # bf16
    results = {
        "num_networks": n_networks,
        "seq_len": seq_len,
        "head_dim": head_dim,
        "weights_source": source,
        "fm_mult": fm_mult,
        "total_siren_params": num_params,
        "cache_bytes_bf16": cache_bytes,
        "siren_aggregate_ms": siren_ms,
        "siren_aggregate_bf16_ms": siren_bf16_ms,
        "siren_aggregate_fastsin_ms": siren_fastsin_ms,
        "hbm_measured_aggregate_ms": hbm_measured_ms,
        "hbm_slice_extrapolated_ms": slice_ms * n_networks,
        "hbm_v5e_theoretical_ms": cache_bytes / HBM_BW["tpu_v5e"] * 1000,
        "hbm_h100_theoretical_ms": cache_bytes / HBM_BW["h100"] * 1000,
        "hbm_4060_theoretical_ms": cache_bytes / HBM_BW["rtx4060"] * 1000,
        "ratio_vs_measured": siren_ms / max(hbm_measured_ms, 1e-12),
        "ratio_bf16_vs_measured": siren_bf16_ms / max(hbm_measured_ms, 1e-12),
        "ratio_fastsin_vs_measured": siren_fastsin_ms / max(hbm_measured_ms, 1e-12),
        "ratio_vs_v5e_theoretical": siren_ms
        / max(cache_bytes / HBM_BW["tpu_v5e"] * 1000, 1e-12),
        "backend": jax.default_backend(),
    }
    if quality is not None:
        results["trained_quality"] = quality
        if verbose:
            print(
                f"  serving-scale quality (all {n_networks} fits): "
                f"keys CosSim {quality['keys_cosine_mean']:.4f} / "
                f"values {quality['values_cosine_mean']:.4f}"
            )

    if verbose:
        print(
            f"  full-cache HBM read: measured stream {hbm_measured_ms:.3f} ms "
            f"(per-slice x{n_networks}: {results['hbm_slice_extrapolated_ms']:.3f} ms), "
            f"v5e roofline {results['hbm_v5e_theoretical_ms']:.3f} ms"
        )
        print(
            f"  -> aggregate SIREN decode is {results['ratio_vs_measured']:.1f}x "
            f"slower than the measured HBM read "
            f"({results['ratio_vs_v5e_theoretical']:.1f}x vs the v5e roofline)"
        )

    with open(output_dir / "aggregate_decode.json", "w") as f:
        json.dump(results, f, indent=2)
    plot_aggregate_decode(results, figures_dir if figures_dir is not None else output_dir)
    return results


def plot_aggregate_decode(results: dict, output_dir: Path) -> None:
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    labels = [
        "SIREN decode\n(fused kernel, fp32,\nmeasured)",
        "SIREN decode\n(fused kernel, bf16,\nmeasured)",
        "SIREN decode\n(fused, fast-sin,\nmeasured)",
        "HBM read\n(measured,\nfull-cache stream)",
        "HBM read\n(v5e roofline)",
        "HBM read\n(H100 roofline)",
    ]
    values = [
        results["siren_aggregate_ms"],
        results.get("siren_aggregate_bf16_ms", results["siren_aggregate_ms"]),
        results.get("siren_aggregate_fastsin_ms", results["siren_aggregate_ms"]),
        results["hbm_measured_aggregate_ms"],
        results["hbm_v5e_theoretical_ms"],
        results["hbm_h100_theoretical_ms"],
    ]
    colors = ["#3498db", "#1abc9c", "#e67e22", "#9b59b6", "#f39c12", "#2ecc71"]

    fig, ax = plt.subplots(figsize=(9, 6))
    bars = ax.bar(labels, values, color=colors, edgecolor="black", linewidth=0.5)
    for bar, v in zip(bars, values):
        ax.annotate(
            f"{v:.3f} ms", xy=(bar.get_x() + bar.get_width() / 2, v),
            xytext=(0, 4), textcoords="offset points",
            ha="center", fontsize=9,
        )
    ax.set_yscale("log")
    ax.set(
        ylabel="Time per decode step (ms, log)",
        title=(
            f"Reconstructing the Full KV Cache "
            f"({results['num_networks']} SIRENs, {results['seq_len']} tokens): "
            f"{results['ratio_vs_measured']:.0f}x Slower Than Reading It"
        ),
    )
    ax.grid(True, alpha=0.3, axis="y")
    plt.tight_layout()
    plt.savefig(output_dir / "aggregate_decode.png", dpi=150, bbox_inches="tight")
    plt.close()
    print(f"  Saved: {output_dir}/aggregate_decode.png")
