"""Fit the MLA latent, or fit the materialized cache it expands into?

Beyond-reference study (the reference has one cache surface; its fit
table is `/root/reference/nerf_attention/fit.py:20-118`). DeepSeek's
Multi-head Latent Attention stores each token as a small latent
(kv_lora_rank + a shared RoPE stub) and re-materializes every head's
K/V from it with one matmul (`models/mla_jax.py`) — the cache itself is
a learned ~8–71× compression (71× at real DeepSeek-V3 geometry). That
poses the operator's question this study measures hermetically: given a
parameter budget for SIREN storage, should the nets fit

* the MATERIALIZED per-head K/V (2·L·H nets — the surface every other
  family exposes, redundant across heads but protected per-head by the
  e^(−H) law), served via `mla_decode_step`, or
* the LATENT itself (L nets, one per layer — 8× fewer input bytes at
  this geometry, but denser: the redundancy was already squeezed out,
  and one latent error perturbs EVERY head's K and V coherently through
  ``kv_b``), served via `mla_decode_step_latent`?

Also priced: a quantized-latent ladder (fp16 → per-channel int8 →
group-wise int8/6/4/3/2, the serializer grids of `ops/quantize.py`) —
the storage an operator gets WITHOUT any fitting. The latent's own
quantized compression is the bar both SIREN strategies must clear.

Protocol: random-init MLA model at real dimensional RATIOS
(materialized/latent = 8× per token), S-token prefill captures both
surfaces, every strategy × SIREN-config cell fits in batched programs,
and each cell is scored at the model output — the mean cosine of the
last ``n_queries`` in-prefix tokens re-decoded over the swapped cache
against the true-cache decode. Writes ``mla_latent_study.json`` + a
bytes-vs-output-cosine figure.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

DEFAULT_CONFIGS = ("tiny", "small", "medium")

# The no-fit quantized-latent ladder: fp16 (lossless bar), the r3
# per-channel int8, then the group-wise frontier down to 2 bits.
DEFAULT_LATENT_SCHEMES = (
    "fp16", "int8", "int8_g32", "int6_g64", "int4_g64", "int4_g32",
    "int3_g64", "int2_g64",
)


def run_study(
    output_dir: Path,
    *,
    seq_len: int = 512,
    n_queries: int = 8,
    epochs: int = 2000,
    num_layers: int = 4,
    num_heads: int = 8,
    kv_lora_rank: int = 32,
    qk_nope_head_dim: int = 16,
    qk_rope_head_dim: int = 8,
    v_head_dim: int = 16,
    hidden_size: int = 128,
    intermediate_size: int = 256,
    configs: tuple[str, ...] = DEFAULT_CONFIGS,
    latent_schemes: tuple[str, ...] = DEFAULT_LATENT_SCHEMES,
    seed: int = 0,
    impl: str = "auto",
    verbose: bool = True,
) -> dict:
    import jax
    import jax.numpy as jnp

    from nerf_attention_tpu.experiments.attention_error import _reconstruct
    from nerf_attention_tpu.models.mla_jax import (
        MLAConfig,
        init_random_mla,
        mla_decode_step,
        mla_decode_step_latent,
        mla_prefill_kv,
    )
    from nerf_attention_tpu.ops.quantize import (
        param_bytes,
        quantize_array,
        tensor_bytes,
    )
    from nerf_attention_tpu.parallel.sweep import fit_batch
    from nerf_attention_tpu.types import CONFIGS_BY_NAME

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    t0 = time.perf_counter()

    config = MLAConfig(
        model_type="deepseek_v3",
        vocab_size=512,
        hidden_size=hidden_size,
        intermediate_size=intermediate_size,
        num_hidden_layers=num_layers,
        num_attention_heads=num_heads,
        kv_lora_rank=kv_lora_rank,
        qk_nope_head_dim=qk_nope_head_dim,
        qk_rope_head_dim=qk_rope_head_dim,
        v_head_dim=v_head_dim,
    )
    n_l, n_h, s = num_layers, num_heads, seq_len
    dk, dv, dl = config.qk_head_dim, config.v_head_dim, config.latent_dim
    params = init_random_mla(config, seed=seed)

    rng = np.random.RandomState(seed)
    ids = jnp.asarray(rng.randint(0, config.vocab_size, s), jnp.int32)
    keys, values, latents = mla_prefill_kv(config, params, ids, return_latent=True)
    tokens = ids[s - n_queries : s]
    positions = jnp.arange(s - n_queries, s, dtype=jnp.int32)

    @jax.jit
    def decode_mat(p, toks, pos, k_c, v_c):
        h, _, _ = jax.vmap(
            lambda t, q: mla_decode_step(config, p, t, q, k_c, v_c),
            in_axes=(0, 0),
        )(toks, pos)
        return h

    @jax.jit
    def decode_lat(p, toks, pos, lat_c):
        h, _, _ = jax.vmap(
            lambda t, q: mla_decode_step_latent(config, p, t, q, lat_c),
            in_axes=(0, 0),
        )(toks, pos)
        return h

    h_true = decode_mat(params, tokens, positions, keys, values)

    def out_cos(h_hat) -> float:
        num = np.sum(np.asarray(h_hat) * np.asarray(h_true), -1)
        den = np.maximum(
            np.linalg.norm(np.asarray(h_hat), axis=-1)
            * np.linalg.norm(np.asarray(h_true), axis=-1),
            1e-12,
        )
        return float((num / den).mean())

    raw_mat_bytes = n_h * s * (dk + dv) * 2  # per layer, fp16
    raw_lat_bytes = s * dl * 2
    if verbose:
        print(
            f"MLA latent study: L={n_l} H={n_h} S={s} | latent {dl} vs "
            f"materialized {n_h * (dk + dv)} per token "
            f"({n_h * (dk + dv) / dl:.1f}x) | {len(configs)} configs x "
            f"{epochs} ep"
        )

    # --- the no-fit baselines: quantized latents are the bar both SIREN
    # strategies must clear. Each scheme uses the shared serializer grid
    # (ops/quantize.py quantize_array / tensor_bytes) so the rows price
    # exactly what the codebase would persist; quantization is PER LAYER
    # (each layer's (S, latent_dim) tensor gets its own scales — the unit
    # an operator would store and evict independently).
    lat_np = np.asarray(latents)
    baselines = {}
    for scheme in latent_schemes:
        lat_stored = np.stack(
            [quantize_array(lat_np[l], scheme, axis=1)[1] for l in range(n_l)]
        )
        bytes_per_layer = tensor_bytes((s, dl), scheme, axis=1)
        cos = out_cos(decode_lat(params, tokens, positions, jnp.asarray(lat_stored)))
        baselines[f"latent_{scheme}"] = {
            "stored_bytes_per_layer": bytes_per_layer,
            "compression_vs_raw_fp16": raw_mat_bytes / bytes_per_layer,
            "output_cosine": cos,
        }
        if verbose:
            print(
                f"  latent_{scheme}: {raw_mat_bytes / bytes_per_layer:.1f}x | "
                f"output {cos:.6f}"
            )

    # --- the serving-planner surface: per-LAYER latent units (round 5) ---
    # The quantized-latent ladder wins on this architecture (measured
    # below/r4), so the planner's MLA tiers are the ladder, not SIREN
    # fits. Each layer's latent is the unit an operator stores/evicts
    # independently; its SOLO cost is measured by decoding with only that
    # layer's latent quantized. The emitted ``mla_latent_units.json`` is
    # the ``serve-plan --latent_json`` input schema.
    from nerf_attention_tpu.serve_plan import build_tiered_plan

    @jax.jit
    def decode_mat_ent(p, toks, pos, k_c, v_c):
        _, _, ent = jax.vmap(
            lambda t, q: mla_decode_step(config, p, t, q, k_c, v_c),
            in_axes=(0, 0),
        )(toks, pos)
        return ent  # (n_queries, L, H)

    ent_layer = np.asarray(
        decode_mat_ent(params, tokens, positions, keys, values)
    ).mean(axis=(0, 2))  # (L,) mean attention entropy per layer, nats

    lat_quant = {}  # scheme -> (L, S, dl) dequantized-latent view
    lat_cos = {}
    for scheme in latent_schemes:
        lq = np.stack(
            [quantize_array(lat_np[l], scheme, axis=1)[1] for l in range(n_l)]
        )
        lat_quant[scheme] = lq
        num = np.sum(lq * lat_np, axis=(1, 2))
        den = np.maximum(
            np.linalg.norm(lq, axis=(1, 2)) * np.linalg.norm(lat_np, axis=(1, 2)),
            1e-12,
        )
        lat_cos[scheme] = num / den  # (L,) latent round-trip cosine

    h_true_lat = decode_lat(params, tokens, positions, jnp.asarray(lat_np))

    def lat_out_cos(lat_c) -> float:
        h_hat = decode_lat(params, tokens, positions, jnp.asarray(lat_c))
        num = np.sum(np.asarray(h_hat) * np.asarray(h_true_lat), -1)
        den = np.maximum(
            np.linalg.norm(np.asarray(h_hat), axis=-1)
            * np.linalg.norm(np.asarray(h_true_lat), axis=-1),
            1e-12,
        )
        return float((num / den).mean())

    MIN_COST = 1e-6
    solo_cost = {
        scheme: np.empty(n_l) for scheme in latent_schemes
    }
    for scheme in latent_schemes:
        for l in range(n_l):
            solo = lat_np.copy()
            solo[l] = lat_quant[scheme][l]
            solo_cost[scheme][l] = max(1.0 - lat_out_cos(solo), MIN_COST)

    latent_units = [
        {
            "layer": l,
            "kv_head": 0,  # the latent is shared by every head
            "entropy_nats": float(ent_layer[l]),
            # proxy slot (the law's fit-quality axis): the fp16 round-trip
            # cosine — the latent surface is lossless at the fp16 bar.
            "proxy": float(lat_cos[latent_schemes[0]][l]),
            "raw_bytes": int(raw_lat_bytes),
            "options": [
                {
                    "scheme": scheme,
                    "cost": float(solo_cost[scheme][l]),
                    "stored_bytes": int(tensor_bytes((s, dl), scheme, axis=1)),
                    "latent_cosine": float(lat_cos[scheme][l]),
                }
                for scheme in latent_schemes
            ],
        }
        for l in range(n_l)
    ]
    units_artifact = {
        "mla_latent": True,
        "model": {
            "num_hidden_layers": n_l,
            "latent_dim": dl,
            "seq_len": s,
            "n_queries": n_queries,
            "seed": seed,
        },
        "raw_latent_fp16_bytes_per_layer": int(raw_lat_bytes),
        "units": latent_units,
    }
    with open(output_dir / "mla_latent_units.json", "w") as f:
        json.dump(units_artifact, f, indent=2)

    # Execute the tiered plan: every layer at its planned tier AT ONCE —
    # the cross-layer additivity measurement the per-layer solos assume.
    tiered_validation = []
    for target in (0.001, 0.01):
        plan = build_tiered_plan(latent_units, cost_target=target)
        composed = lat_np.copy()
        for row in plan["plan"]:
            if row["serve"]:
                composed[row["layer"]] = lat_quant[row["scheme"]][row["layer"]]
        measured = max(1.0 - lat_out_cos(composed), 0.0)
        tiered_validation.append(
            {
                "cost_target": target,
                "n_served": plan["n_served"],
                "schemes_served": sorted(
                    {r["scheme"] for r in plan["plan"] if r["serve"]}
                ),
                "predicted_cost": plan["predicted_cost_at_cut"],
                "measured_cost": measured,
                "measured_over_predicted": measured
                / max(plan["predicted_cost_at_cut"], MIN_COST),
                "stored_bytes_served": plan["stored_bytes_served"],
                "net_bytes_saved": plan["net_bytes_saved"],
            }
        )
        if verbose:
            v = tiered_validation[-1]
            print(
                f"  latent tiered@{target:g}: served {v['n_served']}/{n_l} "
                f"{v['schemes_served']} pred {v['predicted_cost']:.2e} "
                f"measured {v['measured_cost']:.2e} "
                f"(x{v['measured_over_predicted']:.2f})"
            )

    # --- SIREN strategies across the config registry ---
    strategies: dict[str, list] = {"materialized": [], "latent": []}
    targets_k = np.asarray(keys).reshape(n_l * n_h, s, dk)
    targets_v = np.asarray(values).reshape(n_l * n_h, s, dv)
    for cfg_name in configs:
        net = CONFIGS_BY_NAME[cfg_name]

        # materialized: one net per (layer, head, K|V)
        fit_k = fit_batch(targets_k, net, epochs=epochs, seed=seed, impl=impl)
        fit_v = fit_batch(
            targets_v, net, epochs=epochs, seed=seed + 1, impl=impl
        )
        k_hat = _reconstruct(fit_k, np.arange(n_l * n_h), s, net, None)
        v_hat = _reconstruct(fit_v, np.arange(n_l * n_h), s, net, None)
        h_hat = decode_mat(
            params, tokens, positions,
            jnp.asarray(k_hat.reshape(n_l, n_h, s, dk)),
            jnp.asarray(v_hat.reshape(n_l, n_h, s, dv)),
        )
        one_k = [(np.asarray(w)[0], np.asarray(b)[0]) for w, b in fit_k.params]
        one_v = [(np.asarray(w)[0], np.asarray(b)[0]) for w, b in fit_v.params]
        mat_bytes = n_h * (
            param_bytes(one_k, "fp16") + param_bytes(one_v, "fp16")
        )
        strategies["materialized"].append(
            {
                "config": cfg_name,
                "stored_bytes_per_layer": mat_bytes,
                "compression_vs_raw_fp16": raw_mat_bytes / mat_bytes,
                "fit_cosine_k": float(np.mean(fit_k.cosine_mean)),
                "fit_cosine_v": float(np.mean(fit_v.cosine_mean)),
                "output_cosine": out_cos(h_hat),
            }
        )

        # latent: one net per layer
        fit_l = fit_batch(
            lat_np, net, epochs=epochs, seed=seed + 2, impl=impl
        )
        lat_hat = _reconstruct(fit_l, np.arange(n_l), s, net, None)
        h_hat_l = decode_lat(
            params, tokens, positions, jnp.asarray(lat_hat.reshape(n_l, s, dl))
        )
        one_l = [(np.asarray(w)[0], np.asarray(b)[0]) for w, b in fit_l.params]
        lat_bytes = param_bytes(one_l, "fp16")
        strategies["latent"].append(
            {
                "config": cfg_name,
                "stored_bytes_per_layer": lat_bytes,
                "compression_vs_raw_fp16": raw_mat_bytes / lat_bytes,
                "fit_cosine_latent": float(np.mean(fit_l.cosine_mean)),
                "output_cosine": out_cos(h_hat_l),
            }
        )
        if verbose:
            m, l = strategies["materialized"][-1], strategies["latent"][-1]
            print(
                f"  {cfg_name}: materialized {m['compression_vs_raw_fp16']:.1f}x"
                f" fit K {m['fit_cosine_k']:.4f}/V {m['fit_cosine_v']:.4f}"
                f" out {m['output_cosine']:.4f} | latent "
                f"{l['compression_vs_raw_fp16']:.1f}x fit "
                f"{l['fit_cosine_latent']:.4f} out {l['output_cosine']:.4f}"
            )

    results = {
        "model": {
            "num_hidden_layers": n_l,
            "num_attention_heads": n_h,
            "kv_lora_rank": kv_lora_rank,
            "qk_nope_head_dim": qk_nope_head_dim,
            "qk_rope_head_dim": qk_rope_head_dim,
            "v_head_dim": v_head_dim,
            "hidden_size": hidden_size,
            "seq_len": s,
            "n_queries": n_queries,
            "latent_dim": dl,
            "materialized_per_token": n_h * (dk + dv),
        },
        "epochs": epochs,
        "seed": seed,
        "raw_materialized_fp16_bytes_per_layer": raw_mat_bytes,
        "raw_latent_fp16_bytes_per_layer": raw_lat_bytes,
        "baselines": baselines,
        "latent_units": latent_units,
        "layer_entropy_nats": [float(e) for e in ent_layer],
        "tiered_plan_validation_latent": tiered_validation,
        "strategies": strategies,
        "wall_seconds": time.perf_counter() - t0,
    }
    with open(output_dir / "mla_latent_study.json", "w") as f:
        json.dump(results, f, indent=2)
    if verbose:
        print(
            f"Done in {results['wall_seconds']:.0f}s -> "
            f"{output_dir / 'mla_latent_study.json'}"
        )
    return results


def plot_study(results: dict, output_dir: Path) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7.0, 4.8))
    for name, marker in (("materialized", "o"), ("latent", "s")):
        rows = results["strategies"][name]
        xs = [r["compression_vs_raw_fp16"] for r in rows]
        ys = [r["output_cosine"] for r in rows]
        ax.plot(xs, ys, f"-{marker}", ms=5, label=f"SIREN on {name}")
        for r in rows:
            ax.annotate(
                r["config"], (r["compression_vs_raw_fp16"], r["output_cosine"]),
                fontsize=7, xytext=(3, 3), textcoords="offset points",
            )
    base = sorted(
        results["baselines"].items(),
        key=lambda kv: kv[1]["compression_vs_raw_fp16"],
    )
    ax.plot(
        [b["compression_vs_raw_fp16"] for _, b in base],
        [b["output_cosine"] for _, b in base],
        "-D", ms=6, color="0.35", label="quantized latent (no fit)",
    )
    for name, b in base:
        ax.annotate(
            name.removeprefix("latent_"),
            (b["compression_vs_raw_fp16"], b["output_cosine"]),
            fontsize=7, xytext=(3, -9), textcoords="offset points",
            color="0.35",
        )
    ax.set_xscale("log")
    ax.set_xlabel("compression vs raw fp16 materialized cache (per layer)")
    ax.set_ylabel("output cosine vs true-cache decode")
    ax.set_title(
        "MLA: fit the latent or fit the materialized cache?"
    )
    ax.grid(alpha=0.3, which="both")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(Path(output_dir) / "mla_latent_study.png", dpi=130)
    plt.close(fig)
    print(f"  Saved {Path(output_dir) / 'mla_latent_study.png'}")


def main(argv=None) -> None:
    from nerf_attention_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--output_dir", type=Path, default=Path("results/mla_latent"))
    parser.add_argument("--seq_len", type=int, default=512)
    parser.add_argument("--epochs", type=int, default=2000)
    parser.add_argument("--layers", type=int, default=4)
    parser.add_argument("--heads", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--configs", type=str, default=",".join(DEFAULT_CONFIGS),
        help="comma-separated SIREN config names to sweep",
    )
    parser.add_argument("--impl", type=str, default="auto")
    parser.add_argument(
        "--latent_schemes", type=str, default=",".join(DEFAULT_LATENT_SCHEMES),
        help="comma-separated storage schemes for the no-fit quantized-"
        "latent ladder (ops/quantize.py names)",
    )
    args = parser.parse_args(argv)
    results = run_study(
        args.output_dir,
        seq_len=args.seq_len,
        epochs=args.epochs,
        num_layers=args.layers,
        num_heads=args.heads,
        configs=tuple(c.strip() for c in args.configs.split(",") if c.strip()),
        latent_schemes=tuple(
            c.strip() for c in args.latent_schemes.split(",") if c.strip()
        ),
        seed=args.seed,
        impl=args.impl,
    )
    plot_study(results, args.output_dir)


if __name__ == "__main__":
    main()
