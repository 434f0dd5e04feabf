"""Per-epoch training-step time: XLA autodiff vs fused Pallas kernel.

Round-2 follow-up to the MFU profile (`tools/mfu_profile.py`): the
polynomial sine moved the XLA step off the sine bound, leaving it
HBM-activation-bound (every step writes each hidden activation plus the
cosine residuals to HBM and reads them back — ~1 GB/step for the medium
group vs a ~100 MB/step floor of targets+params). The fused kernel
(`ops/siren_train_pallas.py`) keeps activations in VMEM scratch; with the
polynomial sine now also inside the kernel, this measures whether the
fusion finally beats XLA (r1 verdict with exact sine: never faster).

Run on the real chip:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/train_impl_bench.py \
        --out benchmarks/r2/train_impl.json
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
    parser.add_argument("--out", type=str, default="benchmarks/r2/train_impl.json")
    parser.add_argument("--samples", type=int, default=3)
    parser.add_argument("--n1", type=int, default=200)
    parser.add_argument("--n_fits", type=int, default=40)
    parser.add_argument("--seq_len", type=int, default=2048)
    parser.add_argument("--head_dim", type=int, default=128)
    parser.add_argument(
        "--configs", type=str, default="",
        help="comma-separated config names; default all 7",
    )
    parser.add_argument(
        "--variants", type=str, default="xla:fast,pallas:fast",
        help="comma-separated impl:sin_impl[:stash] triples (stash: act|sincos)",
    )
    args = parser.parse_args()

    from nerf_attention_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from nerf_attention_tpu.models.siren import init_siren
    from nerf_attention_tpu.ops.siren_train_pallas import siren_train_grads
    from nerf_attention_tpu.parallel.sweep import (
        _make_optimizer,
        _resolve_sin,
        normalize_targets,
    )
    from nerf_attention_tpu.models.siren import positions, siren_apply
    from nerf_attention_tpu.types import CONFIGS_FULL
    from nerf_attention_tpu.utils.timing import _per_iter_samples, replicate_stats

    backend = jax.default_backend()
    log(f"backend={backend}")
    np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))  # client warm

    rng = np.random.default_rng(0)
    targets = jnp.asarray(
        rng.standard_normal((args.n_fits, args.seq_len, args.head_dim)).astype(
            np.float32
        )
    )
    keys = jax.random.split(jax.random.PRNGKey(0), args.n_fits)
    pos = positions(args.seq_len)
    interpret = backend != "tpu"

    def make_runner(config, impl: str, sin_impl: str, stash: str = "act"):
        """Dynamic-epoch trainer: one compile, differenced trip counts."""
        tx = _make_optimizer(1e-4, 2000)
        omega = config.omega_0
        sin = _resolve_sin(sin_impl)

        @jax.jit
        def run(keys, targets, n):
            tn, _, _ = jax.vmap(normalize_targets)(targets)
            params = jax.vmap(
                lambda k: init_siren(k, config, args.head_dim)
            )(keys)
            opt_state = tx.init(params)

            if impl == "xla":
                def loss_fn(p):
                    pred = jax.vmap(
                        lambda q: siren_apply(q, omega, pos, sin=sin)
                    )(p)
                    return jnp.mean((pred - tn) ** 2)

                def body(_, carry):
                    p, s = carry
                    _, grads = jax.value_and_grad(loss_fn)(p)
                    updates, s = tx.update(grads, s, p)
                    return (optax.apply_updates(p, updates), s)
            else:
                def body(_, carry):
                    p, s = carry
                    _, grads = siren_train_grads(
                        p, tn, omega=omega, interpret=interpret,
                        sin_impl=sin_impl, stash=stash,
                    )
                    updates, s = tx.update(grads, s, p)
                    return (optax.apply_updates(p, updates), s)

            params, _ = jax.lax.fori_loop(0, n, body, (params, opt_state))
            return jnp.mean(params[-1][1])

        return run

    names = [c.strip() for c in args.configs.split(",") if c.strip()]
    configs = [c for c in CONFIGS_FULL if not names or c.name in names]
    variants = [tuple((v.split(":") + ["act"])[:3]) for v in args.variants.split(",")]
    for impl, _, stash in variants:
        if impl == "xla" and stash != "act":
            raise SystemExit(
                f"stash={stash!r} only applies to the pallas kernel; "
                f"an xla variant would silently run without it"
            )

    results = []
    for config in configs:
        row = {"config": config.name}
        for impl, sin_impl, stash in variants:
            run = make_runner(config, impl, sin_impl, stash)
            t0 = time.perf_counter()
            deltas = _per_iter_samples(
                run, keys, targets, reps=args.n1, samples=args.samples
            )
            stats = replicate_stats([d * 1e3 for d in deltas])
            key = f"{impl}_{sin_impl}" + ("" if stash == "act" else f"_{stash}")
            row[f"{key}_ms_per_epoch"] = stats
            log(
                f"  {config.name} {impl}:{sin_impl}:{stash}: "
                f"{stats['median']:.3f} ms/epoch "
                f"[{stats['q25']:.3f},{stats['q75']:.3f}] "
                f"(took {time.perf_counter() - t0:.0f}s)"
            )
        results.append(row)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "backend": backend,
        "geometry": {
            "n_fits": args.n_fits,
            "seq_len": args.seq_len,
            "head_dim": args.head_dim,
        },
        "results": results,
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
