"""FINER / FM-FINER exploration: is variable-periodic activation a better
quality lever than FM-SIREN's per-unit multipliers?

PAPERS.md retrieved "FM-SIREN & FM-FINER: Implicit Neural Representation
Using Nyquist-based Orthogonality" (arxiv 2509.23438). FINER replaces
``sin(omega * a)`` with the variable-periodic ``sin(omega * (|a|+1) * a)``
and widens the first-layer bias init to U(-k, k), so a unit's effective
frequency follows its pre-activation magnitude instead of a fixed
multiplier table. This study fits hard-mode value tensors (the study's
quality axis) with shared-omega, FM, FINER at several k, and FM-FINER
compositions — same trainer shape as the sweep (jit(vmap(scan)),
`parallel/sweep.py:114`), XLA path — and prices the strongest FINER
variant under quantized storage (``ops/quantize.py`` schemes, incl. the
``_l0fp32`` modifier).

Finding (r4, benchmarks/r4/finer_study.json): every strong variant
saturates at the same ~0.962-0.963 V CosSim (FINER k=80 0.9628, FM-64
0.9518, FM+FINER compositions 0.9629) — the frequency SPREAD is the
lever, not its parameterization — and FINER is even more storage-fragile
than FM (fp16 collapses to 0.03) with the same complete _l0fp32 fix
(0.9573 vs master 0.9574). Not productized: +0.011 over FM-64 does not
pay for a second activation family across both fused kernels.

Run on the chip (expects the hard 2048 cache, e.g. /tmp/fm_kv):
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/finer_study.py \
        --kv_dir /tmp/fm_kv --out benchmarks/r4/finer_study.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--kv_dir", type=str, default="/tmp/fm_kv")
    parser.add_argument("--out", type=str, default="benchmarks/r4/finer_study.json")
    parser.add_argument("--layer", type=int, default=8)
    parser.add_argument("--max_heads", type=int, default=4)
    parser.add_argument("--epochs", type=int, default=2000)
    parser.add_argument(
        "--schemes", type=str,
        default="fp16,fp16_l0fp32,int8_g32_l0fp32,int6_g64_l0fp32",
        help="storage schemes to price the strongest FINER variant under",
    )
    args = parser.parse_args()

    from nerf_attention_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from nerf_attention_tpu.io import kvstore
    from nerf_attention_tpu.models.siren import (
        fm_frequency_multipliers,
        init_siren,
        positions,
    )
    from nerf_attention_tpu.ops.quantize import quantize_params
    from nerf_attention_tpu.parallel.sweep import (
        _make_optimizer,
        cosine_similarity,
        normalize_targets,
    )
    from nerf_attention_tpu.types import CONFIGS_BY_NAME

    cfg = CONFIGS_BY_NAME["medium"]
    _, values_a = kvstore.load_layer(args.kv_dir, args.layer)
    targets = np.stack(
        [np.asarray(values_a[h], np.float32) for h in range(args.max_heads)]
    )
    n, s, d = targets.shape
    pos = positions(s)
    omega = cfg.omega_0
    tj = jnp.asarray(targets)
    print(
        f"backend={jax.default_backend()}, {n} value tensors (L{args.layer}) "
        f"@ S={s}, {cfg.name} x {args.epochs} epochs",
        file=sys.stderr, flush=True,
    )

    def apply_net(params, x, *, fm=None, finer=False):
        def act(a, first):
            scale = (jnp.abs(a) + 1.0) if finer else 1.0
            m = (
                fm_frequency_multipliers(a.shape[-1], fm, dtype=a.dtype)
                if (fm and first)
                else 1.0
            )
            return jnp.sin(omega * m * scale * a)

        w, b = params[0]
        h = act(x @ w + b, True)
        for w, b in params[1:-1]:
            h = act(h @ w + b, False)
        w, b = params[-1]
        return h @ w + b

    def fit(seed, *, fm=None, finer=False, bias_k=None, lr=1e-4):
        keys = jax.random.split(jax.random.PRNGKey(seed), n)
        params0 = jax.vmap(lambda k: init_siren(k, cfg, d))(keys)
        if bias_k is not None:  # FINER: widened first-layer bias init
            kb = jax.random.PRNGKey(seed + 999)
            b0 = jax.random.uniform(
                kb, params0[0][1].shape, jnp.float32, -bias_k, bias_k
            )
            params0 = [(params0[0][0], b0)] + list(params0[1:])
        tx = _make_optimizer(lr, args.epochs)

        def one(params, target):
            tn, mean, std = normalize_targets(target)
            st = tx.init(params)

            def loss_fn(p):
                pred = apply_net(p, pos, fm=fm, finer=finer)
                return jnp.mean((pred - tn) ** 2)

            def step(carry, _):
                p, s_ = carry
                g = jax.grad(loss_fn)(p)
                up, s_ = tx.update(g, s_, p)
                return (optax.apply_updates(p, up), s_), 0.0

            (pf, _), _ = jax.lax.scan(step, (params, st), length=args.epochs)
            return pf

        pf = jax.jit(jax.vmap(one))(params0, tj)

        def evalp(leaves):
            def one_eval(p, target):
                _, mean, std = normalize_targets(target)
                pred = apply_net(p, pos, fm=fm, finer=finer)
                return jnp.mean(cosine_similarity(pred * std + mean, target))

            return np.asarray(jax.jit(jax.vmap(one_eval))(leaves, tj))

        return pf, evalp

    t0 = time.perf_counter()
    variants = [
        ("shared", {}),
        ("fm64", {"fm": 64.0}),
        ("finer_k1", {"finer": True, "bias_k": 1.0}),
        ("finer_k10", {"finer": True, "bias_k": 10.0}),
        ("finer_k40", {"finer": True, "bias_k": 40.0}),
        ("finer_k80", {"finer": True, "bias_k": 80.0}),
        ("finer_k160", {"finer": True, "bias_k": 160.0}),
        ("fm64_finer_k1", {"fm": 64.0, "finer": True, "bias_k": 1.0}),
        ("fm64_finer_k2", {"fm": 64.0, "finer": True, "bias_k": 2.0}),
        ("fm32_finer_k4", {"fm": 32.0, "finer": True, "bias_k": 4.0}),
        ("fm8_finer_k10", {"fm": 8.0, "finer": True, "bias_k": 10.0}),
    ]
    results = {"config": cfg.name, "epochs": args.epochs, "layer": args.layer,
               "seq_len": s, "n_tensors": n, "variants": {}, "storage": {}}
    best_name, best_cos, best_state = None, -2.0, None
    for name, kw in variants:
        pf, evalp = fit(0, **kw)
        cos = evalp(pf)
        results["variants"][name] = {
            "value_cosine_mean": float(cos.mean()),
            "per_net": [float(c) for c in cos],
            **{k: v for k, v in kw.items()},
        }
        print(f"  {name:16s} V cos {cos.mean():.4f}", file=sys.stderr, flush=True)
        if kw.get("finer") and not kw.get("fm") and cos.mean() > best_cos:
            best_name, best_cos, best_state = name, float(cos.mean()), (pf, evalp)

    # Storage pricing of the strongest pure-FINER variant.
    pf, evalp = best_state
    leaves = [(np.asarray(w), np.asarray(b)) for w, b in pf]
    results["storage"]["variant"] = best_name
    for scheme in (x.strip() for x in args.schemes.split(",") if x.strip()):
        per_net = [
            quantize_params([(w[i], b[i]) for w, b in leaves], scheme)[1]
            for i in range(n)
        ]
        stacked = [
            (
                jnp.asarray(np.stack([net[l][0] for net in per_net])),
                jnp.asarray(np.stack([net[l][1] for net in per_net])),
            )
            for l in range(len(leaves))
        ]
        cos = float(evalp(stacked).mean())
        results["storage"][scheme] = cos
        print(f"  {best_name} stored {scheme}: {cos:.4f}", file=sys.stderr, flush=True)

    results["wall_seconds"] = time.perf_counter() - t0
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out} in {results['wall_seconds']:.0f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
