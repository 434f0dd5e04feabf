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
    parser.add_argument("--out", type=str, default="benchmarks/r3/train_impl.json")
    # N>=5 interleaved replicates: the floor FINDINGS' replicate-policy
    # claim commits every archived latency stat to.
    parser.add_argument("--samples", type=int, default=5)
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
        help="comma-separated impl:sin_impl[:stash[:mxu[:fmN]]] entries "
        "(stash: act|sincos|auto, omitted = auto, the production default; "
        "mxu: fp32|bf16, omitted = fp32 — bf16 rounds only the kernel's MXU "
        "pass operands, fp32 accumulate; fmN e.g. fm64 trains FM-SIRENs "
        "with per-unit first-layer multipliers up to N)",
    )
    args = parser.parse_args()

    from nerf_attention_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_attention_tpu.types import CONFIGS_FULL
    from nerf_attention_tpu.utils.timing import _per_iter_samples, replicate_stats
    from tools.bench_common import make_group_runner

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

    def make_runner(
        config, impl: str, sin_impl: str, stash: str = "auto",
        mxu: str = "fp32", fm_mult: float | None = None,
    ):
        return make_group_runner(
            config, args.head_dim, args.seq_len, impl=impl,
            sin_impl=sin_impl, stash=stash, mxu=mxu, fm_mult=fm_mult,
        )

    names = [c.strip() for c in args.configs.split(",") if c.strip()]
    configs = [c for c in CONFIGS_FULL if not names or c.name in names]
    def parse_variant(v: str):
        parts = v.split(":")
        # fmN is positionless (both impls support FM); pull it out first.
        fm_mult = None
        for p in list(parts[2:]):
            if p.startswith("fm"):
                try:
                    fm_mult = float(p[2:])
                except ValueError:
                    raise SystemExit(
                        f"bad variant {v!r}: fm token {p!r} is not fm<number>"
                    )
                parts.remove(p)
        if not 2 <= len(parts) <= 4:
            raise SystemExit(
                f"bad variant {v!r}: expected impl:sin_impl[:stash[:mxu[:fmN]]]"
            )
        if len(parts) > 2 and parts[0] == "xla":
            raise SystemExit(
                f"variant {v!r}: stash/mxu only apply to the pallas "
                f"kernel; an xla variant would silently run without them"
            )
        impl, sin_impl = parts[0], parts[1]
        stash = parts[2] if len(parts) > 2 else "auto"
        mxu = parts[3] if len(parts) > 3 else "fp32"
        return impl, sin_impl, stash, mxu, fm_mult

    variants = [parse_variant(v) for v in args.variants.split(",")]

    results = []
    for config in configs:
        row = {"config": config.name}
        for impl, sin_impl, stash, mxu, fm_mult in variants:
            run = make_runner(config, impl, sin_impl, stash, mxu, fm_mult)
            t0 = time.perf_counter()
            deltas = _per_iter_samples(
                run, keys, targets, reps=args.n1, samples=args.samples
            )
            stats = replicate_stats([d * 1e3 for d in deltas])
            key = f"{impl}_{sin_impl}" + (
                "" if stash == "auto" else f"_{stash}"
            ) + ("" if mxu == "fp32" else f"_{mxu}mxu") + (
                "" if fm_mult is None else f"_fm{fm_mult:g}"
            )
            row[f"{key}_ms_per_epoch"] = stats
            log(
                f"  {config.name} {impl}:{sin_impl}:{stash}:{mxu}:fm={fm_mult}: "
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
