"""Full-model end-metric: what cache reconstruction costs at the decode output.

Experiment 8 (`experiments/attention_error.py`) prices K/V reconstruction
error at a SINGLE attention output and found the cost is governed by
attention entropy. This study asks the next question the reference cannot:
what happens to that error through a FULL transformer stack — does it
compound layer over layer (each layer's query drifts, re-reading the next
layer's cache wrong), or wash out in the residual stream?

Protocol (hermetic — a small random-init model; no weights exist in this
environment, BASELINE.md):

  * a gain knob g scales the Q/K projections (sqrt(g) each), sweeping the
    model's attention sharpness the same way experiment 8 swept query gain
    — per-head entropies are measured from the decode step itself
    (`llama_decode_step`'s entropy output), not assumed;
  * every (layer, kv-head, K|V) slice of the prefill cache is fitted by
    one SIREN (single batched program, the sweep's exact trainer), giving
    the proxy CosSim table;
  * the decode step for the last T positions runs against swapped caches —
    full / keys-only / values-only, each under fp32 master params and
    bit-packed storage schemes (`_quantized_view`, the shipped-payload
    path) — and reports output cosine vs the true-cache decode;
  * a propagation profile swaps the reconstruction into layers < j only
    (j = 0..L): the shape of drift(j) distinguishes compounding from
    washout.

Writes ``model_end_metric.json`` under --out.

Run on the real chip:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/model_end_metric_study.py \
        --out benchmarks/r4
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DEFAULT_GAINS = (1.0, 8.0, 32.0)
DEFAULT_SCHEMES = ("master", "int8_g32_l0fp32", "int6_g64_l0fp32")
VARIANTS = ("full", "keys_only", "values_only")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default="benchmarks/r4")
    parser.add_argument("--seq_len", type=int, default=512)
    parser.add_argument("--n_queries", type=int, default=8)
    parser.add_argument("--epochs", type=int, default=2000)
    parser.add_argument("--net", type=str, default="small")
    parser.add_argument("--gains", type=str, default=None)
    parser.add_argument("--schemes", type=str, default=None)
    parser.add_argument("--layers", type=int, default=8)
    parser.add_argument(
        "--seed", type=int, default=0,
        help="seeds the model init, token ids, and fits (replicate runs)",
    )
    parser.add_argument(
        "--tag", type=str, default="",
        help="suffix for the output filename (replicate runs)",
    )
    args = parser.parse_args()
    gains = (
        [float(x) for x in args.gains.split(",")] if args.gains else list(DEFAULT_GAINS)
    )
    schemes = (
        args.schemes.split(",") if args.schemes else list(DEFAULT_SCHEMES)
    )

    from nerf_attention_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_attention_tpu.experiments.attention_error import (
        _quantized_view,
        _reconstruct,
    )
    from nerf_attention_tpu.models.llama_jax import (
        LlamaConfig,
        init_random_llama,
        llama_decode_step,
        llama_prefill_kv,
    )
    from nerf_attention_tpu.parallel.sweep import cosine_similarity, fit_batch
    from nerf_attention_tpu.types import CONFIGS_BY_NAME

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    net = CONFIGS_BY_NAME[args.net]
    s, t_q, n_l = args.seq_len, args.n_queries, args.layers

    config = LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_hidden_layers=n_l, num_attention_heads=8, num_key_value_heads=4,
        head_dim=32,
    )
    n_kv, d = config.num_key_value_heads, config.head_dim
    log(f"backend={jax.default_backend()}  model L={n_l} H=8/kv4 d=32 "
        f"S={s}  net={net.name}  epochs={args.epochs}")
    np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))  # warm the client

    @jax.jit
    def decode_many(params, tokens, positions, ck, cv):
        """T decode steps (same cache) in one jitted dispatch."""
        fn = jax.vmap(
            lambda tok, pos: llama_decode_step(config, params, tok, pos, ck, cv),
            in_axes=(0, 0),
        )
        h, _, ent = fn(tokens, positions)
        return h, ent  # (T, hidden), (T, L, H)

    out_cos = jax.jit(
        lambda a, b: jnp.sum(a * b, -1)
        / jnp.maximum(jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1), 1e-12)
    )
    row_cos = jax.jit(jax.vmap(lambda a, b: jnp.mean(cosine_similarity(a, b))))

    results = {
        "model": {
            "num_hidden_layers": n_l, "num_attention_heads": 8,
            "num_key_value_heads": n_kv, "head_dim": d, "hidden_size": 256,
            "seq_len": s, "n_queries": t_q,
        },
        "net": net.name,
        "epochs": args.epochs,
        "schemes": schemes,
        # A query at position p attends its p cache rows + its own key;
        # the deepest in-prefix query sees s tokens (decode-mask semantics,
        # `models/llama_jax.py:_layer_decode`).
        "uniform_entropy_nats": float(np.log(s)),
        "gains": [],
    }

    results["seed"] = args.seed

    for gain in gains:
        t0 = time.perf_counter()
        rng = np.random.RandomState(args.seed)
        params = init_random_llama(config, seed=args.seed)
        layers = dict(params["layers"])
        scale = jnp.asarray(np.sqrt(gain), jnp.float32)
        layers["q"] = layers["q"] * scale
        layers["k"] = layers["k"] * scale
        params = {**params, "layers": layers}

        ids = jnp.asarray(rng.randint(0, config.vocab_size, s + t_q), jnp.int32)
        keys, values = llama_prefill_kv(config, params, ids)
        ck = jnp.asarray(keys[:, :, :s, :])
        cv = jnp.asarray(values[:, :, :s, :])

        # Query token i sits at cache-tail position s - t_q + i and attends
        # its causal prefix via the decode step's position mask (rows past
        # the query would be future context the cache cannot supply).
        tokens = ids[s - t_q : s]
        positions = jnp.arange(s - t_q, s, dtype=jnp.int32)
        h_true, ent_true = decode_many(params, tokens, positions, ck, cv)
        ent = np.asarray(ent_true)  # (T, L, H)

        # --- fit every slice in one batched program ---
        targets = np.concatenate(
            [np.asarray(ck), np.asarray(cv)]
        ).reshape(2 * n_l * n_kv, s, d)
        batch = fit_batch(targets, net, epochs=args.epochs, seed=args.seed)
        n_half = n_l * n_kv
        log(f"  gain={gain}: fit K CosSim "
            f"{float(batch.cosine_mean[:n_half].mean()):.4f} / V "
            f"{float(batch.cosine_mean[n_half:].mean()):.4f}  "
            f"entropy {float(ent.mean()):.2f} nats")

        row = {
            "gain": gain,
            "attn_entropy_nats": {
                "mean": float(ent.mean()),
                "per_layer_mean": [float(x) for x in ent.mean(axis=(0, 2))],
                "min": float(ent.min()),
            },
            "payloads": {},
        }

        for scheme in schemes:
            if scheme == "master":
                view = batch
            else:
                view = _quantized_view(
                    batch, scheme, targets=targets, config=net
                )
            recon = _reconstruct(view, np.arange(2 * n_half), s, net, None)
            k_cos = float(row_cos(jnp.asarray(recon[:n_half]),
                                  jnp.asarray(targets[:n_half])).mean())
            v_cos = float(row_cos(jnp.asarray(recon[n_half:]),
                                  jnp.asarray(targets[n_half:])).mean())
            rec = recon.reshape(2 * n_l, n_kv, s, d)
            ck_hat = jnp.asarray(rec[:n_l])
            cv_hat = jnp.asarray(rec[n_l:])

            payload = {"key_proxy_cosine": k_cos, "value_proxy_cosine": v_cos}
            for variant, (ka, va) in {
                "full": (ck_hat, cv_hat),
                "keys_only": (ck_hat, cv),
                "values_only": (ck, cv_hat),
            }.items():
                h_hat, _ = decode_many(params, tokens, positions, ka, va)
                cos = np.asarray(out_cos(h_hat, h_true))
                payload[variant] = {
                    "output_cosine_mean": float(cos.mean()),
                    "output_cosine_min": float(cos.min()),
                }
            row["payloads"][scheme] = payload
            log(f"    {scheme}: proxy K {k_cos:.4f} V {v_cos:.4f} -> output "
                + " ".join(
                    f"{v}={payload[v]['output_cosine_mean']:.5f}"
                    for v in VARIANTS
                ))

            # --- propagation profiles (master only) ---
            # prefix: swap layers < j (early-to-late rollout); suffix:
            # swap layers >= j (late-to-early). Comparing them separates
            # "partial swaps are bad" (both dip below the full swap) from
            # "early layers are fragile" (only prefix dips).
            if scheme == "master":
                def swap_profile(member):
                    prof = []
                    for j in range(n_l + 1):
                        mask = member(jnp.arange(n_l), j)[:, None, None, None]
                        kj = jnp.where(mask, ck_hat, ck)
                        vj = jnp.where(mask, cv_hat, cv)
                        h_j, _ = decode_many(params, tokens, positions, kj, vj)
                        prof.append(
                            float(np.asarray(out_cos(h_j, h_true)).mean())
                        )
                    return prof

                prefix = swap_profile(lambda l, j: l < j)
                suffix = swap_profile(lambda l, j: l >= n_l - j)
                row["propagation_output_cosine_by_swapped_prefix"] = prefix
                row["propagation_output_cosine_by_swapped_suffix"] = suffix
                log(f"    propagation prefix (j=0..{n_l}): "
                    + " ".join(f"{p:.5f}" for p in prefix))
                log(f"    propagation suffix (j=0..{n_l}): "
                    + " ".join(f"{p:.5f}" for p in suffix))

        results["gains"].append(row)
        log(f"  gain={gain} done in {time.perf_counter() - t0:.0f}s")

    name = f"model_end_metric{args.tag}.json"
    with open(out_dir / name, "w") as f:
        json.dump(results, f, indent=2)
    log(f"wrote {out_dir / name}")


if __name__ == "__main__":
    main()
