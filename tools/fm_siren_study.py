"""FM-SIREN frequency-diversity study on the hard-mode value gap.

The study's central negative quality result is that VALUES resist SIREN
fitting (hard-mode sweep: K 0.9432 / V 0.7524). The retrieved FM-SIREN work
(PAPERS.md) argues per-unit first-layer frequencies reduce neuron redundancy
versus a shared omega_0 — the one architecture axis the reference never
explored (its hifreq/lofreq sweep retunes the SHARED omega only). This tool
measures whether that closes any of the value gap at EQUAL parameter count:
medium geometry, same init/optimizer/epochs, the sweep grid's value tensors
(plus a key control group), baseline shared-omega vs linear 1..M multiplier
spreads.

Run on the chip (after the hard cache exists):
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/fm_siren_study.py \
        --kv_dir results/hard_study/kv_cache
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default="benchmarks/r3/fm_siren_study.json")
    parser.add_argument("--kv_dir", type=str, default="results/hard_study/kv_cache")
    parser.add_argument("--epochs", type=int, default=2000)
    parser.add_argument(
        "--max_mults", type=float, nargs="+", default=[2.0, 4.0, 8.0]
    )
    args = parser.parse_args()

    from nerf_attention_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from nerf_attention_tpu.fit import sweep_layers
    from nerf_attention_tpu.io import kvstore
    from nerf_attention_tpu.models.siren import (
        fm_frequency_multipliers,
        init_siren,
        positions,
        siren_apply,
        siren_apply_fm,
    )
    from nerf_attention_tpu.ops.fastmath import fast_sin
    from nerf_attention_tpu.parallel.sweep import (
        _make_optimizer,
        cosine_similarity,
        normalize_targets,
    )
    from nerf_attention_tpu.types import CONFIGS_BY_NAME

    medium = CONFIGS_BY_NAME["medium"]
    backend = jax.default_backend()
    log(f"backend={backend}")

    kv_dir = Path(args.kv_dir)
    metadata = kvstore.load_metadata(kv_dir)
    groups: dict[str, list[np.ndarray]] = {"key": [], "value": []}
    for layer_idx in sweep_layers(metadata.num_layers, quick=False):
        keys_a, values_a = kvstore.load_layer(kv_dir, layer_idx)
        for head_idx in range(min(metadata.num_kv_heads, 4)):
            groups["key"].append(np.asarray(keys_a[head_idx], np.float32))
            groups["value"].append(np.asarray(values_a[head_idx], np.float32))

    def train_batch(targets: jnp.ndarray, mult, seed: int):
        """jit(vmap(scan)) training; mult=None is the shared-omega baseline."""
        n, seq_len, d_head = targets.shape
        pos = positions(seq_len)
        tx = _make_optimizer(1e-4, args.epochs)
        omega = medium.omega_0

        def apply(p):
            if mult is None:
                return siren_apply(p, omega, pos, sin=fast_sin)
            return siren_apply_fm(p, omega, mult, pos, sin=fast_sin)

        def one_fit(key, target):
            tn, mean, std = normalize_targets(target)
            params = init_siren(key, medium, d_head)
            opt_state = tx.init(params)

            def loss_fn(p):
                return jnp.mean((apply(p) - tn) ** 2)

            def step(carry, _):
                p, s = carry
                loss, grads = jax.value_and_grad(loss_fn)(p)
                updates, s = tx.update(grads, s, p)
                return (optax.apply_updates(p, updates), s), loss

            (params, _), _ = jax.lax.scan(
                step, (params, opt_state), length=args.epochs
            )
            pred = apply(params) * std + mean
            return jnp.mean(cosine_similarity(pred, target))

        keys = jax.random.split(jax.random.PRNGKey(seed), n)
        run = jax.jit(jax.vmap(one_fit))
        return np.asarray(run(keys, jnp.asarray(targets)))

    variants: list[tuple[str, object]] = [("baseline_shared_omega", None)]
    variants += [
        (f"fm_mult_{m:g}", fm_frequency_multipliers(medium.hidden_features, m))
        for m in args.max_mults
    ]

    results: dict = {}
    for kv_type, tensors in groups.items():
        stacked = np.stack(tensors)
        results[kv_type] = {}
        for name, mult in variants:
            t0 = time.perf_counter()
            cos = train_batch(stacked, mult, seed=0)
            results[kv_type][name] = {
                "cosine_mean": float(cos.mean()),
                "cosine_min": float(cos.min()),
                "cosine_std": float(cos.std(ddof=1)),
                "n_fits": int(cos.size),
            }
            log(
                f"  {kv_type} {name}: CosSim {cos.mean():.4f} "
                f"(min {cos.min():.4f}) in {time.perf_counter() - t0:.0f}s"
            )

    base_v = results["value"]["baseline_shared_omega"]["cosine_mean"]
    best_name, best = max(
        ((n, r) for n, r in results["value"].items() if n != "baseline_shared_omega"),
        key=lambda kv: kv[1]["cosine_mean"],
    )
    payload = {
        "backend": backend,
        "grid": {
            "config": "medium",
            "epochs": args.epochs,
            "seq_len": metadata.seq_len,
            "kv_dir": str(kv_dir),
            "cache": metadata.model_name,
        },
        "results": results,
        "value_gap_delta_best": best["cosine_mean"] - base_v,
        "best_value_variant": best_name,
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    log(
        f"value baseline {base_v:.4f} -> best {best_name} "
        f"{best['cosine_mean']:.4f} (delta {best['cosine_mean'] - base_v:+.4f})"
    )
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
