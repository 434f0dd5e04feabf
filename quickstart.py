"""Full pipeline on synthetic data. No model download needed.

TPU-native equivalent of the reference quickstart
(`/root/reference/quickstart.py`): synthetic extract -> structure analysis ->
quick fit sweep (one batched XLA program per architecture) -> figures.
Runs on CPU JAX (--cpu) or whatever accelerator JAX finds.
"""

import argparse
from pathlib import Path


def main() -> None:
    from nerf_attention_tpu.utils.compile_cache import enable as _enable_cache
    _enable_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true", help="Force CPU mode")
    parser.add_argument("--epochs", type=int, default=2000)
    parser.add_argument("--seq_len", type=int, default=512)
    parser.add_argument(
        "--mesh", action="store_true", help="shard the fit sweep over all devices"
    )
    parser.add_argument(
        "--hard_values", action="store_true",
        help="attention-sharpened synthetic values (reproduces the real "
        "study's K>>V gap hermetically; see synthetic.py)",
    )
    args = parser.parse_args()

    import jax

    if args.cpu:
        # jax is already imported (compile-cache enable above), so the env
        # route is closed; the config knob still works pre-backend-init.
        jax.config.update("jax_platforms", "cpu")

    from nerf_attention_tpu import (
        analyze_kv_cache,
        extract_kv_cache_synthetic,
        fit_kv_cache,
        fit_mesh,
        generate_summary_figure,
        load_results,
        plot_pareto_frontier,
    )

    print(f"Backend: {jax.default_backend()}, devices: {len(jax.devices())}\n")

    kv_dir = Path("results/kv_cache_quick")
    analysis_dir = Path("results/analysis_quick")
    fits_dir = Path("results/fits_quick")
    figures_dir = Path("results/figures_quick")

    print("=" * 60)
    print("STEP 1: Generate synthetic KV cache")
    print("=" * 60)
    extract_kv_cache_synthetic(
        seq_len=args.seq_len,
        num_layers=4,
        num_kv_heads=4,
        head_dim=128,
        output_dir=kv_dir,
        values_mode="hard" if args.hard_values else "reference",
    )

    print("\n" + "=" * 60)
    print("STEP 2: Analyze KV structure")
    print("=" * 60)
    analyze_kv_cache(kv_dir=kv_dir, output_dir=analysis_dir)

    print("\n" + "=" * 60)
    print("STEP 3: Fit SIRENs (quick mode, batched)")
    print("=" * 60)
    mesh = fit_mesh() if args.mesh else None
    fit_kv_cache(
        kv_dir=kv_dir,
        output_dir=fits_dir,
        epochs=args.epochs,
        quick=True,
        mesh=mesh,
    )

    print("\n" + "=" * 60)
    print("STEP 4: Evaluate and plot")
    print("=" * 60)
    figures_dir.mkdir(parents=True, exist_ok=True)
    results = load_results(fits_dir)
    plot_pareto_frontier(results, figures_dir)
    generate_summary_figure(results, figures_dir)

    print("\n" + "=" * 60)
    print("DONE!")
    print("=" * 60)
    print(f"\nResults in: {figures_dir}/")
    print("\nNext: run on REAL Llama KV cache:")
    print("  python -m nerf_attention_tpu.extract --model meta-llama/Llama-3.1-8B")
    print("  python -m nerf_attention_tpu.analyze")
    print("  python -m nerf_attention_tpu.fit --epochs 5000")
    print("  python -m nerf_attention_tpu.evaluate")


if __name__ == "__main__":
    main()
