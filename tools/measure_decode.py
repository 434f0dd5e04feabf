"""Decode-latency ladder with error bars + the bf16 variant + quality delta.

Produces the FINDINGS decode table (VERDICT r1 items 4 and 8):
  * per seq_len: fused decode fp32 and bf16, HBM (S,D) slice read — each as
    median/q25/q75 over N>=5 interleaved replicates;
  * at the headline point (S=2048): reconstruction quality of fp32 vs bf16
    decode from a trained medium checkpoint (CosSim vs the target tensor);
  * the aggregate-decode experiment (512 nets) re-measured with the direct
    full-cache stream read and the bf16 kernel.

Run on the real chip:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/measure_decode.py \
        --out benchmarks/r2
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

LADDER = [512, 1024, 2048, 4096, 8192, 16384, 32768]
MEDIUM_PARAM_BYTES = 164_992 * 4  # medium SIREN, fp32 (reference FINDINGS.md:61)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default="benchmarks/r2")
    parser.add_argument("--samples", type=int, default=5)
    parser.add_argument("--epochs", type=int, default=2000)
    parser.add_argument("--head_dim", type=int, default=128)
    parser.add_argument("--skip_aggregate", action="store_true")
    parser.add_argument("--quality_seq_len", type=int, default=2048)
    parser.add_argument(
        "--ladder", type=str, default=None,
        help="comma-separated seq_len override (smoke tests)",
    )
    args = parser.parse_args()
    ladder = (
        [int(x) for x in args.ladder.split(",")] if args.ladder else LADDER
    )

    from nerf_attention_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_attention_tpu.models.siren import init_siren
    from nerf_attention_tpu.ops.siren_pallas import siren_decode_fused
    from nerf_attention_tpu.parallel.sweep import cosine_similarity, fit_batch
    from nerf_attention_tpu.synthetic import generate_synthetic_kv
    from nerf_attention_tpu.io import kvstore
    from nerf_attention_tpu.types import CONFIGS_BY_NAME
    from nerf_attention_tpu.utils.timing import (
        measured_hbm_read_ms,
        time_siren_forward_ms,
    )

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    medium = CONFIGS_BY_NAME["medium"]
    log(f"backend={jax.default_backend()}")

    # Warm the client before any timed work.
    np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))

    # --- quality delta at the headline point, from a trained checkpoint ---
    log(f"training medium fits at S={args.quality_seq_len} for the quality delta ...")
    kv_dir = Path("results/bench_kv")
    md = None
    if (kv_dir / "metadata.json").exists():
        md = kvstore.load_metadata(kv_dir)
        if md.seq_len != args.quality_seq_len or md.head_dim != args.head_dim:
            md = None
    if md is None:
        kv_dir = out_dir / "quality_kv"
        # num_kv_heads must match the bench cache (8): the per-head RNG seed
        # is layer*H+head, so a 1-head regeneration would measure a
        # DIFFERENT layer-16 signal than the cache-reuse path.
        generate_synthetic_kv(
            seq_len=args.quality_seq_len, num_layers=32, num_kv_heads=8,
            head_dim=args.head_dim, output_dir=kv_dir, verbose=False,
            layer_indices=[16],
        )
    keys, values = kvstore.load_layer(kv_dir, 16)
    targets = np.stack([keys[0], values[0]])
    batch = fit_batch(targets, medium, epochs=args.epochs, seed=0)
    quality = {"seq_len": args.quality_seq_len, "epochs": args.epochs}
    for i, kv_type in enumerate(("key", "value")):
        params = [(jnp.asarray(w[i]), jnp.asarray(b[i])) for w, b in batch.params]
        mean = jnp.asarray(batch.target_mean[i])
        std = jnp.asarray(batch.target_std[i])
        target = jnp.asarray(targets[i])
        row = {}
        variants = (
            ("fp32", jnp.float32, "exact"),
            ("bf16", jnp.bfloat16, "exact"),
            ("fp32_fastsin", jnp.float32, "fast"),
        )
        for label, dtype, sin_impl in variants:
            pred = siren_decode_fused(
                params, medium.omega_0, args.quality_seq_len,
                compute_dtype=dtype, sin_impl=sin_impl,
            ).astype(jnp.float32) * std + mean
            row[label] = float(jnp.mean(cosine_similarity(pred, target)))
        row["delta"] = row["fp32"] - row["bf16"]
        row["delta_fastsin"] = row["fp32"] - row["fp32_fastsin"]
        quality[kv_type] = row
        log(f"  {kv_type}: fp32 CosSim {row['fp32']:.4f}  bf16 {row['bf16']:.4f} "
            f"(delta {row['delta']:.5f})  fastsin {row['fp32_fastsin']:.4f} "
            f"(delta {row['delta_fastsin']:.6f})")

    # --- the ladder ---
    ladder_rows = []
    params_fp32 = init_siren(jax.random.PRNGKey(0), medium, args.head_dim)
    for seq_len in ladder:
        t0 = time.perf_counter()
        fp32 = time_siren_forward_ms(
            params_fp32, medium.omega_0, seq_len,
            samples=args.samples, stats=True,
        )
        bf16 = time_siren_forward_ms(
            params_fp32, medium.omega_0, seq_len,
            compute_dtype=jnp.bfloat16, samples=args.samples, stats=True,
        )
        fast = time_siren_forward_ms(
            params_fp32, medium.omega_0, seq_len,
            sin_impl="fast", samples=args.samples, stats=True,
        )
        hbm = measured_hbm_read_ms(
            seq_len, args.head_dim, samples=args.samples, stats=True
        )
        row = {
            "seq_len": seq_len,
            "siren_fp32_ms": fp32,
            "siren_bf16_ms": bf16,
            "siren_fastsin_ms": fast,
            "hbm_read_ms": hbm,
            "ratio_fp32": fp32["median"] / max(hbm["median"], 1e-12),
            "ratio_bf16": bf16["median"] / max(hbm["median"], 1e-12),
            "ratio_fastsin": fast["median"] / max(hbm["median"], 1e-12),
            "compression_medium": seq_len * args.head_dim * 2 / MEDIUM_PARAM_BYTES,
        }
        ladder_rows.append(row)
        log(
            f"  S={seq_len}: fp32 {fp32['median']:.4f}ms "
            f"[{fp32['q25']:.4f},{fp32['q75']:.4f}]  "
            f"bf16 {bf16['median']:.4f}ms [{bf16['q25']:.4f},{bf16['q75']:.4f}]  "
            f"fastsin {fast['median']:.4f}ms [{fast['q25']:.4f},{fast['q75']:.4f}]  "
            f"hbm {hbm['median']:.5f}ms [{hbm['q25']:.5f},{hbm['q75']:.5f}]  "
            f"(took {time.perf_counter() - t0:.0f}s)"
        )

    payload = {
        "backend": jax.default_backend(),
        "samples_per_point": args.samples,
        "quality_at_headline": quality,
        "ladder": ladder_rows,
    }
    with open(out_dir / "decode_ladder.json", "w") as f:
        json.dump(payload, f, indent=2)
    log(f"wrote {out_dir / 'decode_ladder.json'}")

    # --- aggregate decode (512 nets), stream read + bf16 kernel ---
    if not args.skip_aggregate:
        from nerf_attention_tpu.experiments.aggregate_decode import (
            run_aggregate_decode_experiment,
        )

        siren_dir = Path("results/bench_fits")
        run_aggregate_decode_experiment(
            out_dir,
            siren_dir=siren_dir if siren_dir.exists() else None,
            seq_len=2048,
            head_dim=args.head_dim,
            figures_dir=out_dir,
        )


if __name__ == "__main__":
    main()
