"""bf16-MXU-pass experiment: step time AND sweep quality delta (r2 VERDICT #6).

The fused training kernel (`ops/siren_train_pallas.py`) runs within ~10% of
its binding fp32 rooflines; the one remaining honest lever on its step time
is the fp32-vs-bf16 MXU rate gap (measured 102 vs 207 TFLOP/s at the sweep
shape, `benchmarks/r2/mfu_profile.json`). ``mxu='bf16'`` rounds ONLY the dot
operands (fp32 accumulate; params/trig/reductions stay fp32) — this is NOT
the full-bf16 training already measured and rejected at -0.014 CosSim.

Measures per architecture group, on the real chip:
  * ms/epoch for pallas:fast (production) vs pallas:fast + bf16 MXU, at
    N>=5 interleaved replicates (`tools/bench_common.py` runner);
  * the 40-fit sweep-grid CosSim delta per config (2000 epochs, the same
    (layer, head, kv) grid as fit.py) — adoption bar is |delta| <= 0.005.

Writes benchmarks/r3/train_impl_bf16mxu.json. Run:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/mxu_bf16_study.py \
        --kv_dir results/hard_study/kv_cache
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
    parser.add_argument("--out", type=str, default="benchmarks/r3/train_impl_bf16mxu.json")
    parser.add_argument("--kv_dir", type=str, default="results/hard_study/kv_cache")
    parser.add_argument("--samples", type=int, default=5)
    parser.add_argument("--n1", type=int, default=200)
    parser.add_argument("--epochs", type=int, default=2000)
    parser.add_argument(
        "--configs", type=str, default="",
        help="comma-separated config names; default all 7",
    )
    parser.add_argument(
        "--skip_timing", action="store_true",
        help="quality deltas only (for CPU smoke runs)",
    )
    args = parser.parse_args()

    from nerf_attention_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_attention_tpu.fit import sweep_layers
    from nerf_attention_tpu.io import kvstore
    from nerf_attention_tpu.parallel.sweep import fit_batch
    from nerf_attention_tpu.types import CONFIGS_FULL
    from nerf_attention_tpu.utils.timing import _per_iter_samples, replicate_stats
    from tools.bench_common import make_group_runner

    backend = jax.default_backend()
    log(f"backend={backend}")
    np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))  # client warm

    # The fit.py sweep grid: 5 layers x min(H,4) heads x {K,V}.
    kv_dir = Path(args.kv_dir)
    metadata = kvstore.load_metadata(kv_dir)
    tensors = []
    for layer_idx in sweep_layers(metadata.num_layers, quick=False):
        keys_a, values_a = kvstore.load_layer(kv_dir, layer_idx)
        for head_idx in range(min(metadata.num_kv_heads, 4)):
            tensors.append(np.asarray(keys_a[head_idx], dtype=np.float32))
            tensors.append(np.asarray(values_a[head_idx], dtype=np.float32))
    stacked = np.stack(tensors)
    n_fits, seq_len, head_dim = stacked.shape
    log(f"grid: {n_fits} fits x ({seq_len}, {head_dim}) from {kv_dir}")

    names = [c.strip() for c in args.configs.split(",") if c.strip()]
    configs = [c for c in CONFIGS_FULL if not names or c.name in names]

    timing_keys = jax.random.split(jax.random.PRNGKey(0), 40)
    rng = np.random.default_rng(0)
    timing_targets = jnp.asarray(
        rng.standard_normal((40, seq_len, head_dim)).astype(np.float32)
    )

    results = []
    for gi, config in enumerate(configs):
        row = {"config": config.name}

        if not args.skip_timing:
            for mxu in ("fp32", "bf16"):
                run = make_group_runner(
                    config, head_dim, seq_len, impl="pallas",
                    sin_impl="fast", mxu=mxu,
                )
                t0 = time.perf_counter()
                deltas = _per_iter_samples(
                    run, timing_keys, timing_targets,
                    reps=args.n1, samples=args.samples,
                )
                stats = replicate_stats([d * 1e3 for d in deltas])
                row[f"pallas_fast_{mxu}_ms_per_epoch"] = stats
                log(
                    f"  {config.name} mxu={mxu}: {stats['median']:.3f} ms/epoch "
                    f"[{stats['q25']:.3f},{stats['q75']:.3f}] "
                    f"({time.perf_counter() - t0:.0f}s)"
                )
            fp32_t = row["pallas_fast_fp32_ms_per_epoch"]["median"]
            bf16_t = row["pallas_fast_bf16_ms_per_epoch"]["median"]
            row["speedup"] = fp32_t / bf16_t

        # Quality: the sweep grid at full epochs, same seed both ways.
        # The seed derives from the config's REGISTRY index (fit.py's
        # per-group derivation) so a --configs-filtered run still produces
        # the same per-config numbers as the full sweep.
        registry_idx = CONFIGS_FULL.index(config)
        cos = {}
        for mxu in ("fp32", "bf16"):
            batch = fit_batch(
                stacked, config, epochs=args.epochs,
                seed=registry_idx * 10_000, impl="pallas", mxu=mxu,
            )
            cos[mxu] = batch.cosine_mean
        delta = cos["bf16"] - cos["fp32"]
        row["cosine_mean_fp32"] = float(np.mean(cos["fp32"]))
        row["cosine_mean_bf16"] = float(np.mean(cos["bf16"]))
        row["cosine_delta_mean"] = float(np.mean(delta))
        row["cosine_delta_max_abs"] = float(np.max(np.abs(delta)))
        row["parity_within_0.005"] = bool(np.max(np.abs(delta)) <= 0.005)
        log(
            f"  {config.name} CosSim: fp32 {row['cosine_mean_fp32']:.4f} "
            f"bf16 {row['cosine_mean_bf16']:.4f} "
            f"max|delta| {row['cosine_delta_max_abs']:.5f}"
        )
        results.append(row)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "backend": backend,
        "grid": {"n_fits": n_fits, "seq_len": seq_len, "head_dim": head_dim,
                 "epochs": args.epochs, "kv_dir": str(kv_dir)},
        "adoption_bar": "max |CosSim delta| <= 0.005 across every fit",
        "results": results,
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
