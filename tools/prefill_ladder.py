"""Native-extraction prefill ladder on one chip: tokens/s, TFLOP/s, HBM vs S.

The reference's extraction ladder dies at S=8192 — its single-GPU prefill
OOMs on the 8 GB RTX 4060 and the experiment catches it and stops
(`/root/reference/nerf_attention/experiments/scaling.py:111-116`). This tool
measures the TPU-native answer: the scanned, query-chunked prefill
(`models/llama_jax.py:llama_prefill_kv`, ATTN_BLOCK-row logits bound) on a
realistic Llama-3.2-3B geometry over S = 2048..32768 on one v5e chip.
Weights are random bf16 — throughput and memory do not read the values, and
no real checkpoints exist in this image (CLAUDE.md) — so the artifact is a
speed/memory characterization, not a quality one.

Run on the real chip:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/prefill_ladder.py \
        --out benchmarks/r4
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nerf_attention_tpu.utils import compile_cache

# v5e bf16 dense peak (matmul units); the MFU denominator.
V5E_BF16_PEAK_TFLOPS = 197.0

GEOMETRIES = {
    # Llama-3.2-3B shapes (config.json fields; weights random).
    "3b": dict(
        vocab_size=128256, hidden_size=3072, intermediate_size=8192,
        num_hidden_layers=28, num_attention_heads=24, num_key_value_heads=8,
        head_dim=128, rope_theta=500000.0, rope_scaling_factor=32.0,
        rope_low_freq_factor=1.0, rope_high_freq_factor=4.0,
        rope_original_max_position=8192,
    ),
    # CPU-testable miniature with the same head structure.
    "tiny": dict(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16,
    ),
}


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def prefill_flops(config, seq_len: int) -> float:
    """Causal-prefill FLOPs: 2*S*P over the layer matmuls + 2*n_q*d*S^2
    per layer for the causal QK^T + PV pair (half the full S^2 rectangle,
    counted once each at 2 FLOPs/MAC). Embedding gather and norms ignored.
    """
    h, i = config.hidden_size, config.intermediate_size
    nq, nkv, d = (
        config.num_attention_heads, config.num_key_value_heads, config.head_dim,
    )
    per_layer_mm = h * nq * d + 2 * h * nkv * d + nq * d * h + 3 * h * i
    mm = 2.0 * seq_len * per_layer_mm * config.num_hidden_layers
    attn = 2.0 * nq * d * float(seq_len) ** 2 * config.num_hidden_layers
    return mm + attn


def device_memory(dev) -> dict:
    """PJRT memory stats if the backend exposes them (axon may not)."""
    try:
        stats = dev.memory_stats()
    except Exception:
        return {}
    return {
        k: int(v)
        for k, v in (stats or {}).items()
        if k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default="benchmarks/r4")
    parser.add_argument("--geometry", type=str, default="3b", choices=GEOMETRIES)
    parser.add_argument(
        "--ladder", type=int, nargs="+",
        default=[2048, 4096, 8192, 16384, 32768],
    )
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    compile_cache.enable()
    import jax
    import jax.numpy as jnp

    from nerf_attention_tpu.models.llama_jax import (
        LlamaConfig, init_random_llama, llama_prefill_kv,
    )

    dev = jax.devices()[0]
    backend = jax.default_backend()
    config = LlamaConfig(**GEOMETRIES[args.geometry])

    log(f"[prefill_ladder] backend={backend} geometry={args.geometry}")
    t0 = time.time()
    params = init_random_llama(config, seed=args.seed, dtype=jnp.bfloat16)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    jax.block_until_ready(params)
    log(
        f"[prefill_ladder] {n_params/1e9:.2f}B random bf16 params "
        f"({n_params*2/2**30:.1f} GiB) in {time.time()-t0:.1f}s; "
        f"mem={device_memory(dev)}"
    )

    rng = np.random.RandomState(args.seed)
    rows = []
    for seq_len in args.ladder:
        ids = jnp.asarray(
            rng.randint(0, config.vocab_size, size=seq_len), dtype=jnp.int32
        )

        def run() -> float:
            t = time.time()
            keys, values = llama_prefill_kv(config, params, ids)
            # The tunnel's block_until_ready can return early; materializing
            # a dependent host value forces completion (CLAUDE.md).
            np.asarray(keys[0, 0, 0, :2])
            return time.time() - t

        try:
            first_s = run()
        except Exception as exc:  # XLA OOM arrives as RuntimeError
            log(f"[prefill_ladder] S={seq_len}: FAILED ({exc})")
            rows.append({"seq_len": seq_len, "error": str(exc)[:400]})
            break
        samples = [run() for _ in range(args.reps)]
        median_s = float(np.median(samples))
        flops = prefill_flops(config, seq_len)
        row = {
            "seq_len": seq_len,
            "first_call_s": round(first_s, 3),
            "samples_s": [round(s, 3) for s in samples],
            "median_s": round(median_s, 3),
            "tokens_per_s": round(seq_len / median_s, 1),
            "tflops": round(flops / median_s / 1e12, 2),
            "mfu_vs_v5e_bf16_peak": round(
                flops / median_s / 1e12 / V5E_BF16_PEAK_TFLOPS, 4
            ),
            "memory": device_memory(dev),
        }
        rows.append(row)
        log(f"[prefill_ladder] {row}")

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    payload = {
        "backend": backend,
        "geometry": args.geometry,
        "config": GEOMETRIES[args.geometry],
        "n_params": n_params,
        "param_dtype": "bfloat16",
        "reps": args.reps,
        "flops_model": "2*S*P_matmul + 2*n_q*d*S^2 per layer (causal half)",
        "peak_tflops_denominator": V5E_BF16_PEAK_TFLOPS,
        "note": (
            "random weights; wall-clock on a SHARED chip — samples disclosed, "
            "judge by the best (see CLAUDE.md contention band)"
        ),
        "ladder": rows,
    }
    out_path = out_dir / "prefill_ladder.json"
    out_path.write_text(json.dumps(payload, indent=2))
    print(json.dumps({"written": str(out_path), "rows": len(rows)}))


if __name__ == "__main__":
    main()
