"""Experiment 8 (beyond reference): attention-output end-metric.

Every quality number in the reference is a PROXY: per-position cosine
similarity between a reconstructed K or V tensor and the original
(`/root/reference/nerf_attention/fit.py:139-153` and every experiment
downstream of it). But nobody consumes a KV cache directly — attention
does: ``O = softmax(q K^T / sqrt(d)) V``. This experiment measures what a
given K/V reconstruction quality actually costs at the attention OUTPUT,
which the reference never quantifies.

The variable that controls the answer is attention SHARPNESS. The output
is a convex combination of value rows; with broad weights the combination
averages hundreds of rows, the i.i.d. (unfittable) part of the value
error cancels, and the output barely moves — while peaked attention reads
few rows, nothing cancels, and both key error (weight redistribution) and
value error (the read row itself) land at full strength. So the protocol
sweeps sharpness explicitly and reports the exact weights' entropy next
to every number:

  * matched queries at gain g — q = g * (k_t + noise * sigma_k * eps):
    the query matches its own position's key (retrieval-like) and ``g``
    models the trained logit scale. On the hard-mode cache g = 1..64
    spans mean weight entropy ~8.1 -> ~1 nats (measured; the carrier
    makes same-phase keys near-twins, so small gains cannot concentrate
    the softmax over 4096 rows no matter how well the query matches).
  * diffuse — q ~ N(0, sigma_k^2 I): content-free queries, the
    full-averaging floor.

For each probed layer: fit one medium SIREN per K and V head tensor (the
sweep's exact training path, batched in one program), rebuild K-hat /
V-hat, then compare exact attention against three reconstruction variants
— (K-hat, V-hat) full swap, (K-hat, V) key error only, (K, V-hat) value
error only — for the last ``n_queries`` positions under full causal
masking. Reported per (layer, regime, variant): output CosSim (mean/min
over queries), attention-weight total variation, top-1 agreement; plus
the fit-time K/V CosSim proxies, so the JSON holds the proxy ->
end-metric mapping directly.

Outputs ``attention_error_results.json`` under the experiment dir and
``attention_error.png`` under the figures dir.
"""

from __future__ import annotations

import functools
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
DEFAULT_GAINS = (1.0, 8.0, 32.0, 64.0)
MATCHED_NOISE = 0.25  # sigma_k multiple of jitter on matched queries

# Mean-over-positions row-wise CosSim, batched over heads (proxy metric
# for stored payloads; module-level so it traces once per shape).
_proxy_cos = jax.jit(jax.vmap(lambda a, b: jnp.mean(cosine_similarity(a, b))))


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


def _layer_metrics(
    keys, values, keys_hat, values_hat, q_matched, q_diffuse, allowed, gains
):
    """vmapped-over-heads metrics for every sharpness regime (jit target).

    ``gains`` is a static tuple: each entry scales the matched queries,
    modelling the trained logit scale (softmax temperature).
    """
    per_head = jax.vmap(_variant_metrics, in_axes=(0, 0, 0, 0, 0, None))
    out = {
        "diffuse": per_head(q_diffuse, keys, values, keys_hat, values_hat, allowed)
    }
    for g in gains:
        out[f"matched_g{g:g}"] = per_head(
            g * q_matched, keys, values, keys_hat, values_hat, allowed
        )
    return out


def make_queries(
    keys: np.ndarray, n_queries: int, seed: int, noise: float = MATCHED_NOISE
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (matched, diffuse) query batches for (H, S, D) keys.

    matched: the query at position t is that position's own key plus
    ``noise * sigma_k`` Gaussian jitter — unscaled; the caller applies the
    logit gain. diffuse: isotropic N(0, sigma_k^2) — content-free.
    """
    h, s, d = keys.shape
    t = min(n_queries, s)
    sigma = keys.std(axis=(1, 2), keepdims=True)  # (H, 1, 1)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    eps = np.asarray(jax.random.normal(k1, (h, t, d), jnp.float32))
    matched = keys[:, s - t :] + noise * sigma * eps
    diffuse = sigma * np.asarray(jax.random.normal(k2, (h, t, d), jnp.float32))
    return matched.astype(np.float32), diffuse.astype(np.float32)


def _serialize_regimes(raw: dict) -> dict:
    """Host-side JSON block for one metrics_fn result: per regime, the mean
    entropy and the four metrics of every variant (shared by the base-fit
    and stored-payload rows so their schemas cannot diverge)."""
    return {
        regime: {
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
        for regime, r in raw.items()
    }


def causal_allowed(seq_len: int, n_queries: int) -> np.ndarray:
    """(T, S) bool mask: query row t sits at position S - T + t and may
    attend to every position up to and including itself."""
    t = min(n_queries, seq_len)
    rows = np.arange(seq_len - t, seq_len)[:, None]
    return (np.arange(seq_len)[None, :] <= rows)


@functools.lru_cache(maxsize=8)
def _recon_jit(omega: float, fm_mult: float | None, sin_impl: str):
    """Batched denormalizing forward, jitted once per (omega, fm, sin)."""
    sin = _resolve_sin(sin_impl)

    def one(params, mean, std, pos):
        pred = siren_apply_maybe_fm(params, omega, fm_mult, pos, sin=sin)
        return pred * std + mean

    return jax.jit(jax.vmap(one, in_axes=(0, 0, 0, None)))


def _reconstruct(metrics, idx, seq_len, config, fm_mult, sin_impl="fast"):
    """Denormalized SIREN reconstructions for fit rows ``idx`` (stacked)."""
    params = [(jnp.asarray(w[idx]), jnp.asarray(b[idx])) for w, b in metrics.params]
    return np.asarray(
        _recon_jit(config.omega_0, fm_mult, sin_impl)(
            params,
            jnp.asarray(metrics.target_mean[idx]),
            jnp.asarray(metrics.target_std[idx]),
            positions(seq_len),
        )
    )


def _quantized_view(metrics, scheme: str, targets=None, config=None,
                    fm_mult=None, qat_epochs: int = 300):
    """Dequantized view of the batched fit params under a storage scheme —
    what a server restoring from a ``scheme`` artifact actually decodes.
    A ``_qat`` suffix runs the straight-through repair against the scheme's
    stored grid first (the shipped-payload path, `ops/qat.py`); ``targets``
    (N, S, D) raw tensors in fit-row order are required for it. Returns a
    _reconstruct-compatible object (params + target stats)."""
    from types import SimpleNamespace

    from nerf_attention_tpu.ops.quantize import (
        parse_scheme,
        quantize_params,
        split_scheme,
    )

    params = metrics.params
    if scheme.endswith("_qat"):
        scheme = scheme[: -len("_qat")]
        _, bits, group = parse_scheme(scheme)
        if group is None:
            raise ValueError(f"QAT needs a group-wise int base, got {scheme!r}")
        from nerf_attention_tpu.ops.qat import qat_finetune_batch

        targets_norm = (np.asarray(targets) - metrics.target_mean) / (
            metrics.target_std
        )
        params, _ = qat_finetune_batch(
            params, targets_norm.astype(np.float32), omega=config.omega_0,
            fm_mult=fm_mult, epochs=qat_epochs, group=group, bits=bits,
            skip_first=split_scheme(scheme)[1],
        )
    leaves = [(np.asarray(w), np.asarray(b)) for w, b in params]
    n = leaves[0][0].shape[0]
    per_net = [
        quantize_params([(w[i], b[i]) for w, b in leaves], scheme)[1]
        for i in range(n)
    ]
    return SimpleNamespace(
        params=[
            (
                np.stack([net[l][0] for net in per_net]),
                np.stack([net[l][1] for net in per_net]),
            )
            for l in range(len(leaves))
        ],
        target_mean=metrics.target_mean,
        target_std=metrics.target_std,
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
    gains: tuple[float, ...] = DEFAULT_GAINS,
    schemes: tuple[str, ...] = (),
    qat_epochs: int = 300,
    seed: int = 0,
    fm_mult: float | None = None,
    impl: str = "auto",
    verbose: bool = True,
) -> dict:
    """Fit K/V SIRENs per probed layer and price them at the attention output."""
    # Validate scheme names before any device time is spent (same fail-fast
    # contract as run_quantization_experiment): a typo must not cost the
    # probed layers' fits.
    from nerf_attention_tpu.ops.quantize import parse_scheme

    for s in schemes:
        base = s[: -len("_qat")] if s.endswith("_qat") else s
        kind, _, group = parse_scheme(base)
        if s.endswith("_qat") and (kind != "int" or group is None):
            raise ValueError(
                f"QAT needs a group-wise integer base scheme, got {s!r}"
            )

    kv_dir, output_dir = Path(kv_dir), Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    config = CONFIGS_BY_NAME[config_name]
    metadata = kvstore.load_metadata(kv_dir)
    seq_len = metadata.seq_len
    probe = sorted({min(l, metadata.num_layers - 1) for l in layers})
    n_heads = min(metadata.num_kv_heads, max_heads)
    gains = tuple(float(g) for g in gains)
    allowed = jnp.asarray(causal_allowed(seq_len, n_queries))
    metrics_fn = jax.jit(_layer_metrics, static_argnums=(7,))
    sharpest = f"matched_g{max(gains):g}"

    if verbose:
        print(
            f"Attention end-metric: layers {probe}, {n_heads} heads, "
            f"{config.name} x {epochs} epochs, {min(n_queries, seq_len)} "
            f"causal queries @ S={seq_len}, gains {[f'{g:g}' for g in gains]}"
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
        q_matched, q_diffuse = make_queries(keys, n_queries, seed)
        raw = jax.tree.map(
            lambda x: np.asarray(x),
            metrics_fn(
                jnp.asarray(keys), jnp.asarray(values),
                jnp.asarray(keys_hat), jnp.asarray(values_hat),
                jnp.asarray(q_matched), jnp.asarray(q_diffuse), allowed, gains,
            ),
        )
        key_cos = float(fit.cosine_mean[k_idx].mean())
        value_cos = float(fit.cosine_mean[v_idx].mean())
        row = {
            "layer": layer_idx,
            "heads": n_heads,
            "key_fit_cosine": key_cos,
            "value_fit_cosine": value_cos,
            "regimes": _serialize_regimes(raw),
        }
        for scheme in schemes:
            stored = _quantized_view(
                fit, scheme, targets=np.concatenate([keys, values]),
                config=config, fm_mult=fm_mult, qat_epochs=qat_epochs,
            )
            k_hat_q = _reconstruct(stored, k_idx, seq_len, config, fm_mult)
            v_hat_q = _reconstruct(stored, v_idx, seq_len, config, fm_mult)
            raw_q = jax.tree.map(
                lambda x: np.asarray(x),
                metrics_fn(
                    jnp.asarray(keys), jnp.asarray(values),
                    jnp.asarray(k_hat_q), jnp.asarray(v_hat_q),
                    jnp.asarray(q_matched), jnp.asarray(q_diffuse), allowed,
                    gains,
                ),
            )
            block = {
                "key_proxy_cosine": float(
                    np.asarray(
                        _proxy_cos(jnp.asarray(k_hat_q), jnp.asarray(keys))
                    ).mean()
                ),
                "value_proxy_cosine": float(
                    np.asarray(
                        _proxy_cos(jnp.asarray(v_hat_q), jnp.asarray(values))
                    ).mean()
                ),
                "regimes": _serialize_regimes(raw_q),
            }
            row.setdefault("storage", {})[scheme] = block
        layer_rows.append(row)
        if verbose:
            peak = row["regimes"][sharpest]
            broad = row["regimes"]["diffuse"]
            print(
                f"  L{layer_idx}: fit K {key_cos:.4f} / V {value_cos:.4f} | "
                f"output @{peak['exact_entropy_nats']:.1f} nats "
                f"{peak['variants']['full']['output_cosine_mean']:.4f} "
                f"(K-only {peak['variants']['keys_only']['output_cosine_mean']:.4f}, "
                f"top1 {peak['variants']['keys_only']['top1_agreement']:.3f}) | "
                f"diffuse @{broad['exact_entropy_nats']:.1f} nats "
                f"{broad['variants']['full']['output_cosine_mean']:.4f}"
            )
            for scheme, block in row.get("storage", {}).items():
                print(
                    f"    stored {scheme}: proxy K {block['key_proxy_cosine']:.4f}"
                    f" / V {block['value_proxy_cosine']:.4f} | sharpest full "
                    f"{block['regimes'][sharpest]['variants']['full']['output_cosine_mean']:.4f}"
                    f" | diffuse "
                    f"{block['regimes']['diffuse']['variants']['full']['output_cosine_mean']:.4f}"
                )

    results = {
        "config": config.name,
        "epochs": epochs,
        "fm_mult": fm_mult,
        "seq_len": seq_len,
        "n_queries": int(min(n_queries, seq_len)),
        "seed": seed,
        "matched_noise": MATCHED_NOISE,
        "gains": list(gains),
        "schemes": list(schemes),
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
    """Output fidelity vs attention entropy + per-layer proxy comparison."""
    figures_dir = Path(figures_dir)
    figures_dir.mkdir(parents=True, exist_ok=True)
    rows = results["layers"]
    if not rows:
        return
    regimes = list(rows[0]["regimes"])
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(13, 5))

    # Panel 1: layer-averaged output CosSim against the regime's measured
    # entropy — the sharpness axis is the story.
    colors = {"full": "#9b59b6", "keys_only": "#3498db", "values_only": "#e67e22"}
    ent = {
        reg: float(np.mean([r["regimes"][reg]["exact_entropy_nats"] for r in rows]))
        for reg in regimes
    }
    order = sorted(regimes, key=lambda reg: ent[reg])
    for variant, color in colors.items():
        ys = [
            float(
                np.mean(
                    [
                        r["regimes"][reg]["variants"][variant]["output_cosine_mean"]
                        for r in rows
                    ]
                )
            )
            for reg in order
        ]
        ax1.plot([ent[r] for r in order], ys, "o-", color=color, label=variant)
    # Stored payloads (when priced): the full-swap curve per scheme, so
    # the storage story is visible next to the in-memory fits.
    stored_schemes = sorted(
        {s for r in rows for s in r.get("storage", {})},
    )
    stored_colors = plt.cm.Dark2(np.linspace(0, 1, max(len(stored_schemes), 1)))
    for scheme, color in zip(stored_schemes, stored_colors):
        ys = [
            float(
                np.mean(
                    [
                        r["storage"][scheme]["regimes"][reg]["variants"]["full"][
                            "output_cosine_mean"
                        ]
                        for r in rows
                        if scheme in r.get("storage", {})
                    ]
                )
            )
            for reg in order
        ]
        ax1.plot(
            [ent[r] for r in order], ys, "--", marker="x", color=color,
            label=f"stored {scheme}",
        )
    for reg in order:
        marker = "D" if reg == "diffuse" else None
        if marker:
            ax1.axvline(ent[reg], color="#95a5a6", alpha=0.3, linestyle=":")
    ax1.set(
        xlabel="Exact attention entropy (nats)",
        ylabel="Attention-output CosSim vs exact",
        title="Output error vs attention sharpness (layer mean)",
    )
    ax1.invert_xaxis()  # sharper attention to the right
    ax1.legend(fontsize=9)
    ax1.grid(True, alpha=0.3)

    # Panel 2: per-layer proxy (V fit) vs end-metric at the sharpest gain
    # and at the diffuse floor.
    sharpest = order[0]
    xs = [r["layer"] for r in rows]
    width = 0.27
    xpos = np.arange(len(xs))
    ax2.bar(
        xpos - width, [r["value_fit_cosine"] for r in rows], width,
        color="#7f8c8d", label="V fit CosSim (proxy)",
    )
    ax2.bar(
        xpos,
        [
            r["regimes"][sharpest]["variants"]["full"]["output_cosine_mean"]
            for r in rows
        ],
        width, color="#9b59b6", label=f"output ({sharpest})",
    )
    ax2.bar(
        xpos + width,
        [
            r["regimes"]["diffuse"]["variants"]["full"]["output_cosine_mean"]
            for r in rows
        ],
        width, color="#2ecc71", label="output (diffuse)",
    )
    ax2.set_xticks(xpos, [str(x) for x in xs])
    ax2.set(
        xlabel="Layer", ylabel="CosSim",
        title="Proxy vs end-metric by layer",
    )
    ax2.set_ylim(0, 1.05)
    ax2.legend(fontsize=9)
    ax2.grid(True, alpha=0.3, axis="y")
    plt.tight_layout()
    plt.savefig(
        figures_dir / "attention_error.png", dpi=150, bbox_inches="tight"
    )
    plt.close()
    print(f"  Saved: {figures_dir}/attention_error.png")
