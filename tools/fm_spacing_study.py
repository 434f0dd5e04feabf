"""FM multiplier SPACING study: linear vs log-spaced vs learned spreads.

Round-3 established that per-unit first-layer frequencies close most of the
hard-mode value gap (`tools/fm_siren_study.py`, FINDINGS "Frequency-diverse
SIRENs"), using one spacing: linspace(1, M, hidden). This tool asks the
follow-up the roadmap queued: is LINEAR the right spacing, and does learning
the multipliers jointly with the weights beat any fixed schedule?

Variants per max-mult M (equal parameter count except `learned*`, which add
`hidden` trainable scalars — 0.15% of the medium network, priced in the
artifact):

  * linear   — linspace(1, M, H), the production spread (fixed)
  * log      — geomspace(1, M, H): denser coverage of LOW frequencies,
               the classic choice for 1/f-ish spectra (fixed)
  * learned  — multipliers are trainable, init linear
  * learned_log — trainable, init geomspace

The learned variants train LOG-multipliers (mult = init * exp(rho)) under
their own Adam learning rate via optax.multi_transform: Adam's per-param
unit step means the weights' 1e-4 schedule would move a multiplier by at
most ~lr*epochs = 0.2 over a 1..64 range — structurally frozen. A separate
3e-3 log-space rate lets SGD actually reshape the schedule (up to ~e^6
relative) while the weights keep the production schedule.

Measured on the sweep grid's tensors (20 key + 20 value, medium config,
hard cache) like the r3 study; the artifact also records the LEARNED
multiplier distribution (quantiles of |mult|) so the discovered schedule is
inspectable against the fixed ones.

Run on the chip (after the hard cache exists):
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/fm_spacing_study.py \
        --kv_dir benchmarks/r4/hard_study/kv_cache
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--out", type=str, default="benchmarks/r4/fm_spacing_study.json"
    )
    parser.add_argument(
        "--kv_dir", type=str, default="benchmarks/r4/hard_study/kv_cache"
    )
    parser.add_argument("--epochs", type=int, default=2000)
    parser.add_argument("--max_mults", type=float, nargs="+", default=[16.0, 64.0])
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
    hidden = medium.hidden_features
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

    MULT_LR = 3e-3  # log-space learning rate for the learned variants

    def train_batch(targets: jnp.ndarray, mult_init, learn_mult: bool, seed: int):
        """jit(vmap(scan)); mult_init=None is the shared-omega baseline.

        When ``learn_mult`` the schedule trains as mult = init * exp(rho)
        with rho under its own Adam rate (module docstring); sin is odd, so
        a sign flip would be absorbed by the next layer anyway — the exp
        parameterization just keeps the schedule positive and scale-aware.
        Returns (final CosSim per fit, final mult per fit or None).
        """
        n, seq_len, d_head = targets.shape
        pos = positions(seq_len)
        omega = medium.omega_0
        if learn_mult:
            tx = optax.multi_transform(
                {
                    "params": _make_optimizer(1e-4, args.epochs),
                    "mult": _make_optimizer(MULT_LR, args.epochs),
                },
                lambda ps: (
                    jax.tree.map(lambda _: "params", ps[0]),
                    "mult",
                ),
            )
        else:
            tx = _make_optimizer(1e-4, args.epochs)

        def apply(p, mult):
            if mult is None:
                return siren_apply(p, omega, pos, sin=fast_sin)
            return siren_apply_fm(p, omega, mult, pos, sin=fast_sin)

        def one_fit(key, target):
            tn, mean, std = normalize_targets(target)
            params = init_siren(key, medium, d_head)
            if learn_mult:
                train_state = (params, jnp.zeros(hidden, jnp.float32))
                split = lambda ps: (ps[0], jnp.asarray(mult_init) * jnp.exp(ps[1]))
            else:
                train_state = params
                split = lambda ps: (ps, mult_init)
            opt_state = tx.init(train_state)

            def loss_fn(ps):
                p, mult = split(ps)
                return jnp.mean((apply(p, mult) - tn) ** 2)

            def step(carry, _):
                ps, s = carry
                loss, grads = jax.value_and_grad(loss_fn)(ps)
                updates, s = tx.update(grads, s, ps)
                return (optax.apply_updates(ps, updates), s), loss

            (ps, _), _ = jax.lax.scan(step, (train_state, opt_state), length=args.epochs)
            p, mult = split(ps)
            pred = apply(p, mult) * std + mean
            cos = jnp.mean(cosine_similarity(pred, target))
            return cos, (mult if learn_mult else jnp.zeros((0,)))

        keys = jax.random.split(jax.random.PRNGKey(seed), n)
        run = jax.jit(jax.vmap(one_fit))
        cos, mults = run(keys, jnp.asarray(targets))
        return np.asarray(cos), (np.asarray(mults) if learn_mult else None)

    def variants_for(m: float):
        lin = np.linspace(1.0, m, hidden, dtype=np.float32)
        geo = np.geomspace(1.0, m, hidden, dtype=np.float32)
        return [
            (f"linear_{m:g}", lin, False),
            (f"log_{m:g}", geo, False),
            (f"learned_{m:g}", lin, True),
            (f"learned_log_{m:g}", geo, True),
        ]

    all_variants = [("baseline_shared_omega", None, False)]
    for m in args.max_mults:
        all_variants += variants_for(m)

    results: dict = {}
    for kv_type, tensors in groups.items():
        stacked = np.stack(tensors)
        results[kv_type] = {}
        for name, mult_init, learn in all_variants:
            t0 = time.perf_counter()
            cos, mults = train_batch(stacked, mult_init, learn, seed=0)
            rec = {
                "cosine_mean": float(cos.mean()),
                "cosine_min": float(cos.min()),
                "cosine_std": float(cos.std(ddof=1)),
                "n_fits": int(cos.size),
            }
            if mults is not None and mults.size:
                q = np.quantile(np.abs(mults), [0.0, 0.25, 0.5, 0.75, 1.0])
                rec["learned_abs_mult_quantiles"] = [float(x) for x in q]
                rec["extra_trainable_scalars"] = hidden
            results[kv_type][name] = rec
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
