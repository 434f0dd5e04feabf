"""Experiment 8 (beyond reference): attention-output end-metric.

Every quality number in the reference is a PROXY: per-position cosine
similarity between a reconstructed K or V tensor and the original
(`/root/reference/nerf_attention/fit.py:139-153` and every experiment
downstream of it). But nobody consumes a KV cache directly — attention
does: ``O = softmax(q K^T / sqrt(d)) V``. This experiment measures what a
given K/V reconstruction quality actually costs at the attention OUTPUT,
which the reference never quantifies.

Why the proxy can mislead, in both directions:

  * Key error passes through a softmax. Under PEAKED attention (retrieval
    heads: the query matches one key far better than the rest) a small
    logit perturbation can flip the argmax and swap in the wrong value
    row — error amplification. Under DIFFUSE attention the weights barely
    order the keys and logit noise washes out in the average — error
    suppression.
  * Value error enters linearly: the output is a convex combination of
    value rows, so row errors average with the attention weights and the
    same V CosSim costs far less after mixing.

Protocol. For each probed layer: fit one medium SIREN per K and V head
tensor (the sweep's exact training path, batched in one program), rebuild
K-hat / V-hat, then compare exact attention against three reconstruction
variants — (K-hat, V-hat) full swap, (K-hat, V) key error only,
(K, V-hat) value error only — for the last ``n_queries`` positions under
full causal masking, in two query regimes:

  * sharp   — q_t = k_t + 0.25 * sigma_k * eps: the query matches its own
              position's key (induction/retrieval-like, near-one-hot
              weights; the self-logit ||k||^2/sqrt(d) dominates)
  * diffuse — q ~ N(0, sigma_k^2 I): content-free queries, broad weights
              (the averaging regime)

Reported per (layer, regime, variant): output CosSim (mean/min over
queries), attention-weight total variation, top-1 agreement; plus the
exact weights' entropy (regime sharpness) and the fit-time K/V CosSim
proxies, so the JSON holds the proxy -> end-metric mapping directly.

Outputs ``attention_error_results.json`` under the experiment dir and
``attention_error.png`` under the figures dir.
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
import numpy as np

from nerf_attention_tpu.io import kvstore
from nerf_attention_tpu.models.siren import positions, siren_apply_maybe_fm
from nerf_attention_tpu.parallel.sweep import (
    _resolve_sin,
    cosine_similarity,
    fit_batch,
)
from nerf_attention_tpu.types import CONFIGS_BY_NAME

VARIANTS = ("full", "keys_only", "values_only")


def attention_outputs(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, allowed: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Masked single-head attention for T query rows over an S-token cache.

    q (T, D), k/v (S, D), allowed (T, S) bool. Returns (outputs (T, D),
    weights (T, S)). Plain jnp — fp32 throughout; every row of ``allowed``
    must have at least one True (causal prefixes always do).
    """
    scores = (q @ k.T) / jnp.sqrt(jnp.asarray(k.shape[-1], q.dtype))
    scores = jnp.where(allowed, scores, -jnp.inf)
    weights = jax.nn.softmax(scores, axis=-1)
    return weights @ v, weights


def _variant_metrics(q, k, v, k_hat, v_hat, allowed):
    """All three reconstruction variants against exact, one head."""
    o_exact, w_exact = attention_outputs(q, k, v, allowed)
    out = {
        "exact_entropy_nats": -jnp.mean(
            jnp.sum(jnp.where(w_exact > 0, w_exact * jnp.log(w_exact), 0.0), axis=-1)
        )
    }
    for name, (ka, va) in {
        "full": (k_hat, v_hat),
        "keys_only": (k_hat, v),
        "values_only": (k, v_hat),
    }.items():
        o_hat, w_hat = attention_outputs(q, ka, va, allowed)
        cos = cosine_similarity(o_hat, o_exact)
        out[name] = {
            "output_cosine_mean": jnp.mean(cos),
            "output_cosine_min": jnp.min(cos),
            "attn_tv_mean": jnp.mean(0.5 * jnp.sum(jnp.abs(w_hat - w_exact), axis=-1)),
            "top1_agreement": jnp.mean(
                (jnp.argmax(w_hat, axis=-1) == jnp.argmax(w_exact, axis=-1)).astype(
                    jnp.float32
                )
            ),
        }
    return out


def _layer_metrics(keys, values, keys_hat, values_hat, q_sharp, q_diffuse, allowed):
    """vmapped-over-heads metrics for both query regimes (jit target)."""
    per_head = jax.vmap(_variant_metrics, in_axes=(0, 0, 0, 0, 0, None))
    return {
        "sharp": per_head(q_sharp, keys, values, keys_hat, values_hat, allowed),
        "diffuse": per_head(q_diffuse, keys, values, keys_hat, values_hat, allowed),
    }


def make_queries(
    keys: np.ndarray, n_queries: int, seed: int, sharp_noise: float = 0.25
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (sharp, diffuse) query batches for (H, S, D) keys.

    sharp: the query at position t is that position's own key plus
    ``sharp_noise * sigma_k`` Gaussian jitter — self-logit dominates.
    diffuse: isotropic N(0, sigma_k^2) — content-free averaging.
    """
    h, s, d = keys.shape
    t = min(n_queries, s)
    sigma = keys.std(axis=(1, 2), keepdims=True)  # (H, 1, 1)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    eps = np.asarray(jax.random.normal(k1, (h, t, d), jnp.float32))
    sharp = keys[:, s - t :] + sharp_noise * sigma * eps
    diffuse = sigma * np.asarray(jax.random.normal(k2, (h, t, d), jnp.float32))
    return sharp.astype(np.float32), diffuse.astype(np.float32)


def causal_allowed(seq_len: int, n_queries: int) -> np.ndarray:
    """(T, S) bool mask: query row t sits at position S - T + t and may
    attend to every position up to and including itself."""
    t = min(n_queries, seq_len)
    rows = np.arange(seq_len - t, seq_len)[:, None]
    return (np.arange(seq_len)[None, :] <= rows)


def _reconstruct(metrics, idx, seq_len, config, fm_mult, sin_impl="fast"):
    """Denormalized SIREN reconstructions for fit rows ``idx`` (stacked)."""
    pos = positions(seq_len)
    sin = _resolve_sin(sin_impl)

    def one(params, mean, std):
        pred = siren_apply_maybe_fm(params, config.omega_0, fm_mult, pos, sin=sin)
        return pred * std + mean

    params = [(jnp.asarray(w[idx]), jnp.asarray(b[idx])) for w, b in metrics.params]
    return np.asarray(
        jax.jit(jax.vmap(one))(
            params,
            jnp.asarray(metrics.target_mean[idx]),
            jnp.asarray(metrics.target_std[idx]),
        )
    )


def run_attention_error_experiment(
    kv_dir: Path,
    output_dir: Path,
    *,
    layers: tuple[int, ...] = (0, 8, 17, 31),
    max_heads: int = 2,
    config_name: str = "medium",
    epochs: int = 2000,
    lr: float = 1e-4,
    n_queries: int = 256,
    seed: int = 0,
    fm_mult: float | None = None,
    impl: str = "auto",
    verbose: bool = True,
) -> dict:
    """Fit K/V SIRENs per probed layer and price them at the attention output."""
    kv_dir, output_dir = Path(kv_dir), Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    config = CONFIGS_BY_NAME[config_name]
    metadata = kvstore.load_metadata(kv_dir)
    seq_len = metadata.seq_len
    probe = sorted({min(l, metadata.num_layers - 1) for l in layers})
    n_heads = min(metadata.num_kv_heads, max_heads)
    allowed = jnp.asarray(causal_allowed(seq_len, n_queries))
    metrics_fn = jax.jit(_layer_metrics)

    if verbose:
        print(
            f"Attention end-metric: layers {probe}, {n_heads} heads, "
            f"{config.name} x {epochs} epochs, {min(n_queries, seq_len)} "
            f"causal queries @ S={seq_len}"
            + (f", FM-SIREN M={fm_mult:g}" if fm_mult else "")
        )

    t0 = time.perf_counter()
    layer_rows = []
    for layer_idx in probe:
        keys_a, values_a = kvstore.load_layer(kv_dir, layer_idx)
        keys = np.stack([np.asarray(keys_a[h], np.float32) for h in range(n_heads)])
        values = np.stack(
            [np.asarray(values_a[h], np.float32) for h in range(n_heads)]
        )
        # One batched program: rows [0, H) are keys, rows [H, 2H) values.
        fit = fit_batch(
            np.concatenate([keys, values]), config,
            epochs=epochs, lr=lr, seed=seed, impl=impl, fm_mult=fm_mult,
        )
        k_idx, v_idx = np.arange(n_heads), np.arange(n_heads, 2 * n_heads)
        keys_hat = _reconstruct(fit, k_idx, seq_len, config, fm_mult)
        values_hat = _reconstruct(fit, v_idx, seq_len, config, fm_mult)
        q_sharp, q_diffuse = make_queries(keys, n_queries, seed)
        raw = jax.tree.map(
            lambda x: np.asarray(x),
            metrics_fn(
                jnp.asarray(keys), jnp.asarray(values),
                jnp.asarray(keys_hat), jnp.asarray(values_hat),
                jnp.asarray(q_sharp), jnp.asarray(q_diffuse), allowed,
            ),
        )
        key_cos = float(fit.cosine_mean[k_idx].mean())
        value_cos = float(fit.cosine_mean[v_idx].mean())
        row = {
            "layer": layer_idx,
            "heads": n_heads,
            "key_fit_cosine": key_cos,
            "value_fit_cosine": value_cos,
            "regimes": {},
        }
        for regime in ("sharp", "diffuse"):
            r = raw[regime]
            row["regimes"][regime] = {
                "exact_entropy_nats": float(r["exact_entropy_nats"].mean()),
                "variants": {
                    name: {
                        metric: float(r[name][metric].mean())
                        for metric in (
                            "output_cosine_mean", "output_cosine_min",
                            "attn_tv_mean", "top1_agreement",
                        )
                    }
                    for name in VARIANTS
                },
            }
        layer_rows.append(row)
        if verbose:
            sharp = row["regimes"]["sharp"]["variants"]
            diffuse = row["regimes"]["diffuse"]["variants"]
            print(
                f"  L{layer_idx}: fit K {key_cos:.4f} / V {value_cos:.4f} | "
                f"output sharp {sharp['full']['output_cosine_mean']:.4f} "
                f"(K-only {sharp['keys_only']['output_cosine_mean']:.4f}, "
                f"top1 {sharp['keys_only']['top1_agreement']:.3f}) | "
                f"diffuse {diffuse['full']['output_cosine_mean']:.4f} "
                f"(K-only {diffuse['keys_only']['output_cosine_mean']:.4f})"
            )

    results = {
        "config": config.name,
        "epochs": epochs,
        "fm_mult": fm_mult,
        "seq_len": seq_len,
        "n_queries": int(min(n_queries, seq_len)),
        "seed": seed,
        "sharp_noise": 0.25,
        "layers": layer_rows,
        "wall_seconds": time.perf_counter() - t0,
    }
    with open(output_dir / "attention_error_results.json", "w") as f:
        json.dump(results, f, indent=2)
    if verbose:
        print(
            f"Attention end-metric done in {results['wall_seconds']:.0f}s "
            f"-> {output_dir / 'attention_error_results.json'}"
        )
    return results


def plot_attention_error(results: dict, figures_dir: Path) -> None:
    """Output fidelity by layer/variant/regime + proxy-vs-end scatter."""
    figures_dir = Path(figures_dir)
    figures_dir.mkdir(parents=True, exist_ok=True)
    rows = results["layers"]
    if not rows:
        return
    xs = [r["layer"] for r in rows]
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(13, 5))

    styles = {"sharp": "-", "diffuse": "--"}
    colors = {"full": "#9b59b6", "keys_only": "#3498db", "values_only": "#e67e22"}
    for regime, ls in styles.items():
        for variant, color in colors.items():
            ax1.plot(
                xs,
                [
                    r["regimes"][regime]["variants"][variant]["output_cosine_mean"]
                    for r in rows
                ],
                ls, marker="o", color=color,
                label=f"{variant} ({regime})",
            )
    ax1.plot(
        xs, [r["value_fit_cosine"] for r in rows],
        ":", marker="v", color="#7f8c8d", label="V fit CosSim (proxy)",
    )
    ax1.set(
        xlabel="Layer", ylabel="Attention-output CosSim vs exact",
        title="What K/V reconstruction costs at the output",
    )
    ax1.legend(fontsize=8)
    ax1.grid(True, alpha=0.3)

    for regime, ls in styles.items():
        ax2.plot(
            xs,
            [
                r["regimes"][regime]["variants"]["keys_only"]["top1_agreement"]
                for r in rows
            ],
            ls, marker="s", color="#3498db", label=f"top-1 agreement ({regime})",
        )
        ax2.plot(
            xs,
            [
                r["regimes"][regime]["variants"]["keys_only"]["attn_tv_mean"]
                for r in rows
            ],
            ls, marker="^", color="#e74c3c", label=f"weight TV ({regime})",
        )
    ax2.set(
        xlabel="Layer", ylabel="Attention-weight disturbance (K-only)",
        title="Key error at the softmax",
    )
    ax2.legend(fontsize=8)
    ax2.grid(True, alpha=0.3)
    plt.tight_layout()
    plt.savefig(
        figures_dir / "attention_error.png", dpi=150, bbox_inches="tight"
    )
    plt.close()
    print(f"  Saved: {figures_dir}/attention_error.png")
