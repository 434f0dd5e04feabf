"""CLI for running follow-up experiments.

Usage:
    python -m nerf_attention_tpu.experiments scaling
    python -m nerf_attention_tpu.experiments multi_prompt
    python -m nerf_attention_tpu.experiments svd
    python -m nerf_attention_tpu.experiments layer_profile
    python -m nerf_attention_tpu.experiments all

Subcommands, defaults, and the 'all' chaining mirror the reference
(`/root/reference/nerf_attention/experiments/__main__.py`), plus a
``--backend`` flag (hf / jax / synthetic) so every experiment runs
hermetically without model weights.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from nerf_attention_tpu.experiments.multi_prompt import (
    plot_multi_prompt,
    run_multi_prompt_experiment,
)
from nerf_attention_tpu.experiments.scaling import (
    plot_full_layer_profile,
    plot_scaling_crossover,
    plot_scaling_quality,
    run_full_layer_profile,
    run_scaling_experiment,
)
from nerf_attention_tpu.experiments.summary import generate_final_summary
from nerf_attention_tpu.experiments.svd import plot_siren_vs_svd, run_svd_experiment


def _synth_cache_geometry(kv_dir: Path) -> dict | None:
    """Geometry of an existing SYNTHETIC cache under kv_dir, else None.

    Used to default the kv_dir-backed stages (svd/layer_profile/quantize)
    to the cache that is already there: ensure_synthetic_cache regenerates
    on ANY geometry mismatch, so a 32-layer default run against a
    quickstart-scale (4-layer) cache would silently destroy the tensors
    the saved fits were trained on.
    """
    try:
        meta = json.loads((kv_dir / "metadata.json").read_text())
        if not str(meta.get("model_name", "")).startswith("synthetic"):
            return None
        return {
            "seq_len": int(meta["seq_len"]),
            "num_layers": int(meta["num_layers"]),
            "num_kv_heads": int(meta["num_kv_heads"]),
            "head_dim": int(meta["head_dim"]),
        }
    except (OSError, KeyError, ValueError, json.JSONDecodeError):
        return None


def _sweep_seq_len(siren_dir: Path, fallback: int = 2048) -> int:
    """Resolve the default --seq_len from the fit sweep's recorded geometry.

    Synthetic svd/layer_profile/quantize inputs must match the cache the
    checkpoints under --siren_dir were trained on: ensure_synthetic_cache
    REGENERATES an other-geometry cache, which would silently invalidate
    every saved fit. sweep_meta.json (then fit_results.json records) carry
    the trained seq_len; only a sweep-less run falls back to 2048.
    """
    try:
        meta = json.loads((siren_dir / "sweep_meta.json").read_text())
        inferred = int(meta["seq_len"])
        print(f"  --seq_len defaulted to {inferred} (from {siren_dir}/sweep_meta.json)")
        return inferred
    except (OSError, KeyError, ValueError, json.JSONDecodeError):
        pass
    try:
        records = json.loads((siren_dir / "fit_results.json").read_text())
        inferred = int(records[0]["seq_len"])
        print(f"  --seq_len defaulted to {inferred} (from {siren_dir}/fit_results.json)")
        return inferred
    except (OSError, KeyError, ValueError, IndexError, json.JSONDecodeError):
        return fallback


def main() -> None:
    from nerf_attention_tpu.utils.compile_cache import enable as _enable_cache
    _enable_cache()
    parser = argparse.ArgumentParser(description="Run follow-up experiments")
    parser.add_argument(
        "experiment",
        choices=[
            "scaling", "multi_prompt", "svd", "layer_profile",
            "aggregate_decode", "quantize", "incremental",
            "attention_error", "head_policy", "all",
        ],
    )
    parser.add_argument("--model", type=str, default="unsloth/Llama-3.1-8B")
    parser.add_argument(
        "--backend", type=str, default="synthetic", choices=["hf", "jax", "synthetic"]
    )
    parser.add_argument("--epochs", type=int, default=2000)
    parser.add_argument("--kv_dir", type=str, default="results/kv_cache")
    parser.add_argument("--siren_dir", type=str, default="results/fits")
    parser.add_argument(
        "--seq_lengths", type=int, nargs="+", default=[512, 1024, 2048, 4096, 8192]
    )
    parser.add_argument(
        "--train_weights", action="store_true",
        help="aggregate_decode: fit ALL L*H*2 medium SIRENs first (one "
        "batched program) so the timed stack is fully trained",
    )
    parser.add_argument(
        "--synth_layers", type=int, default=None,
        help="synthetic backend: layer count for generated caches "
        "(default: match a synthetic cache already under --kv_dir for the "
        "cache-backed stages, else 32)",
    )
    parser.add_argument(
        "--svd_accounting", type=str, default="fp16", choices=["fp16", "fp32", "both"],
        help="rank-selection accounting (fp32 reproduces the published table)",
    )
    parser.add_argument("--randomized_svd", action="store_true")
    parser.add_argument(
        "--values_mode", type=str, default="reference",
        choices=["reference", "hard"],
        help="synthetic backend: value-signal recipe ('hard' reproduces the "
        "real study's K>>V gap and quality-degradation trends hermetically)",
    )
    parser.add_argument(
        "--results_root", type=str, default="results",
        help="root directory for experiment outputs (lets a hard-mode study "
        "run side-by-side with the default one)",
    )
    parser.add_argument(
        "--seq_len", type=int, default=None,
        help="sequence length for multi_prompt and the synthetic caches "
        "backing svd/layer_profile/quantize (scaling uses --seq_lengths); "
        "must match the cache the fit sweep trained on. Default: the "
        "geometry recorded by the fit sweep under --siren_dir (so a "
        "quickstart-scale study never regenerates its cache at the wrong "
        "length), else 2048",
    )
    parser.add_argument(
        "--schemes", type=str, default=None,
        help="quantize/attention_error: comma-separated storage schemes "
        "(named schemes, parameterized int<B>_g<N>, an _l0fp32 modifier, "
        "and any group-wise integer scheme's _qat variant, e.g. "
        "fp16,int4_g64_qat,int8_g32_l0fp32); default for quantize: "
        "fp32,bf16,fp16,int8,int4,int8_g32_l0fp32,int4_qat",
    )
    parser.add_argument(
        "--qat_epochs", type=int, default=300,
        help="quantize: straight-through fine-tune length for _qat schemes",
    )
    parser.add_argument(
        "--incr_final_len", type=int, default=None,
        help="incremental: cache length the growth runs TO (default "
        "2x the start length); synthetic backend generates its own cache "
        "at this length under <results_root>/incremental/kv_cache",
    )
    parser.add_argument(
        "--incr_chunk", type=int, default=256,
        help="incremental: tokens appended per growth step",
    )
    parser.add_argument(
        "--incr_warm_epochs", type=int, default=1000,
        help="incremental: warm fine-tune budget per growth step",
    )
    parser.add_argument(
        "--incr_coords", choices=["relative", "absolute"],
        default="relative",
        help="incremental: coordinate convention while the cache grows — "
        "relative recompresses linspace(0,1,S) every append (the fit "
        "pipeline's convention), absolute pins token i at i/(final-1) so "
        "appends never move learned coordinates",
    )
    parser.add_argument(
        "--attn_layers", type=int, nargs="+", default=[0, 8, 17, 31],
        help="attention_error: layer indices to probe (clipped to the cache)",
    )
    parser.add_argument(
        "--attn_queries", type=int, default=256,
        help="attention_error: causal query positions evaluated per head",
    )
    parser.add_argument(
        "--attn_gains", type=float, nargs="+", default=[1.0, 8.0, 32.0, 64.0],
        help="attention_error: matched-query logit gains (the sharpness "
        "sweep; on the hard cache 1..64 spans ~8.1 -> ~1 nats of weight "
        "entropy)",
    )
    parser.add_argument(
        "--hp_seq_len", type=int, default=512,
        help="head_policy: cache length for the full-stack policy study "
        "(its own flag — the study builds a hermetic random-init model, "
        "not the sweep's cache, so --seq_len's checkpoint-matching default "
        "does not apply)",
    )
    parser.add_argument(
        "--hp_layers", type=int, default=8,
        help="head_policy: transformer depth of the hermetic model",
    )
    parser.add_argument(
        "--hp_gains", type=float, nargs=2, default=[1.0, 64.0],
        metavar=("LO", "HI"),
        help="head_policy: per-head K-gain range inducing the entropy spread",
    )
    parser.add_argument(
        "--hp_experts", type=int, default=None,
        help="head_policy: swap every dense FFN for a Mixtral-style "
        "sparse-MoE block with this many experts (top-2 routing) and "
        "measure router flip rate along the serving budget axis",
    )
    parser.add_argument(
        "--hp_moe_style", type=str, default="mixtral",
        choices=["mixtral", "gpt_oss"],
        help="head_policy: sparse-MoE routing flavor when --hp_experts is "
        "set (gpt_oss = top-k of raw biased logits then softmax over the "
        "k, the GPT-OSS order)",
    )
    parser.add_argument(
        "--hp_sinks", action="store_true",
        help="head_policy: give every head a learnable attention SINK "
        "(GPT-OSS attention) with induced per-head sink-logit offsets, "
        "capture per-head sink mass from the true decode, and add the "
        "sink-aware law_sink / cache_mass_asc rankings to the sweep",
    )
    parser.add_argument(
        "--hp_sink_offsets", type=float, nargs=2, default=[-4.0, 18.0],
        metavar=("LO", "HI"),
        help="head_policy: sink-logit offset range inducing the sink-mass "
        "spread (with --hp_sinks)",
    )
    parser.add_argument(
        "--hp_window", type=int, default=None,
        help="head_policy: give the hermetic model GPT-OSS-style "
        "alternating sliding/full attention layers with this window "
        "(layers 0, 2, ... sliding); raw-byte accounting and the "
        "executed tiered plans then cap sliding slices at min(S, W) "
        "rows and skip net-negative units",
    )
    parser.add_argument(
        "--hp_softcap", type=float, default=None,
        help="head_policy: gemma2-style attention logit soft-capping "
        "(logits -> cap * tanh(logits / cap)) on the hermetic model — "
        "stresses the entropy law where the logit range it is computed "
        "from is compressed",
    )
    parser.add_argument(
        "--hp_nope", action="store_true",
        help="head_policy: cohere2-style NoPE — full-attention layers get "
        "NO rope (with --hp_window the sliding layers keep it, the "
        "command-r7b pattern; alone, every layer is position-blind)",
    )
    parser.add_argument(
        "--hp_seed", type=int, default=0,
        help="head_policy: model init / gain-shuffle / fit seed (the "
        "3-seed replication in benchmarks/r4/head_policy uses 0, 1, 2)",
    )
    parser.add_argument(
        "--fm_mult", type=float, default=None,
        help="run scaling + layer_profile on FM-SIRENs (per-unit first-layer "
        "frequency multipliers up to this value, equal parameter count); "
        "quantize/aggregate_decode pick FM up from checkpoints automatically",
    )
    args = parser.parse_args()

    # Resolve defaults against what is already on disk: the fit sweep's
    # recorded seq_len beats the existing cache's, which beats 2048 — the
    # cache-backed stages must line up with the trained checkpoints.
    geom = _synth_cache_geometry(Path(args.kv_dir))
    if args.seq_len is None:
        args.seq_len = _sweep_seq_len(
            Path(args.siren_dir),
            fallback=geom["seq_len"] if geom else 2048,
        )
    if args.synth_layers is None:
        cache_layers = geom["num_layers"] if geom else 32
        cache_heads = geom["num_kv_heads"] if geom else 8
        args.synth_layers = 32
    else:
        cache_layers, cache_heads = args.synth_layers, 8
    # head_dim is part of the same_geometry check too: an API-generated
    # non-128 cache must not be regenerated at the default width.
    cache_head_dim = geom["head_dim"] if geom else 128

    root = Path(args.results_root)
    figures_dir = root / "figures"
    figures_dir.mkdir(parents=True, exist_ok=True)

    if args.experiment in ("scaling", "all"):
        print("\n" + "=" * 60)
        print("EXPERIMENT 1: Sequence Length Scaling")
        print("=" * 60)
        scaling = run_scaling_experiment(
            model_name=args.model,
            seq_lengths=args.seq_lengths,
            base_dir=root / "scaling",
            epochs=args.epochs,
            backend=args.backend,
            synth_layers=args.synth_layers,
            values_mode=args.values_mode,
            fm_mult=args.fm_mult,
        )
        plot_scaling_crossover(scaling, figures_dir)
        plot_scaling_quality(scaling, figures_dir)

    if args.experiment in ("multi_prompt", "all"):
        print("\n" + "=" * 60)
        print("EXPERIMENT 2: Multi-Prompt Robustness")
        print("=" * 60)
        prompts = run_multi_prompt_experiment(
            model_name=args.model,
            base_dir=root / "multi_prompt",
            epochs=args.epochs,
            seq_len=args.seq_len,
            backend=args.backend,
            synth_layers=args.synth_layers,
            values_mode=args.values_mode,
        )
        plot_multi_prompt(prompts, figures_dir)

    needs_kv_dir = args.experiment in (
        "svd", "layer_profile", "quantize", "attention_error", "all"
    ) or (args.experiment == "aggregate_decode" and args.train_weights)
    if args.backend == "synthetic" and needs_kv_dir:
        # Hermetic SVD/layer-profile/quantize inputs. ensure_synthetic_cache
        # reuses same-recipe synthetic AND real-model caches (an extraction
        # is never overwritten); only other-recipe synthetic regenerates.
        from nerf_attention_tpu.synthetic import ensure_synthetic_cache

        ensure_synthetic_cache(
            Path(args.kv_dir),
            values_mode=args.values_mode,
            seq_len=args.seq_len,
            num_layers=cache_layers,
            num_kv_heads=cache_heads,
            head_dim=cache_head_dim,
        )

    kv_dir_ok = (Path(args.kv_dir) / "metadata.json").exists()

    if args.experiment in ("svd", "all") and not kv_dir_ok:
        # Same warn-and-skip treatment the missing fit_results.json gets:
        # 'all' must not abort after scaling/multi_prompt burned device time.
        print(f"  Warning: {args.kv_dir} has no extracted cache, skipping SVD")
    elif args.experiment in ("svd", "all"):
        print("\n" + "=" * 60)
        print("EXPERIMENT 3: SVD Baseline Comparison")
        print("=" * 60)
        accountings = (
            ["fp16", "fp32"] if args.svd_accounting == "both" else [args.svd_accounting]
        )
        svd = None
        for accounting in accountings:
            svd_run = run_svd_experiment(
                kv_dir=Path(args.kv_dir),
                base_dir=root / "svd",
                accounting=accounting,
                randomized=args.randomized_svd,
            )
            if accounting == accountings[0]:
                svd = svd_run
        siren_path = Path(args.siren_dir) / "fit_results.json"
        if siren_path.exists():
            siren = json.loads(siren_path.read_text())
            plot_siren_vs_svd(siren, svd, figures_dir)
        else:
            print(f"  Warning: {siren_path} not found, skipping SIREN-vs-SVD plot")

    if args.experiment in ("layer_profile", "all") and not kv_dir_ok:
        print(f"  Warning: {args.kv_dir} has no extracted cache, skipping layer profile")
    elif args.experiment in ("layer_profile", "all"):
        print("\n" + "=" * 60)
        print("EXPERIMENT 4: Full Layer Profile")
        print("=" * 60)
        layer_results = run_full_layer_profile(
            kv_dir=Path(args.kv_dir),
            output_dir=root / "layer_profile",
            epochs=args.epochs,
            backend=args.backend,
            values_mode=args.values_mode,
            synth_layers=cache_layers,
            synth_seq_len=args.seq_len,
            synth_heads=cache_heads,
            fm_mult=args.fm_mult,
        )
        plot_full_layer_profile(layer_results, figures_dir)

    if args.experiment in ("aggregate_decode", "all"):
        print("\n" + "=" * 60)
        print("EXPERIMENT 5: Aggregate Decode vs Full-Cache HBM Read")
        print("=" * 60)
        from nerf_attention_tpu.experiments.aggregate_decode import (
            run_aggregate_decode_experiment,
        )

        siren_dir = Path(args.siren_dir)
        run_aggregate_decode_experiment(
            output_dir=root / "aggregate_decode",
            siren_dir=siren_dir if siren_dir.exists() else None,
            figures_dir=figures_dir,
            train=args.train_weights,
            kv_dir=Path(args.kv_dir) if args.train_weights else None,
            epochs=args.epochs,
        )

    if args.experiment in ("quantize", "all"):
        print("\n" + "=" * 60)
        print("EXPERIMENT 6: Quantized Parameter Storage")
        print("=" * 60)
        siren_dir = Path(args.siren_dir)
        if not (siren_dir.exists() and kv_dir_ok):
            print(
                f"  Warning: needs checkpoints under {siren_dir} and a cache "
                f"under {args.kv_dir}, skipping quantization experiment"
            )
        else:
            from nerf_attention_tpu.experiments.quantized_params import (
                EXPERIMENT_SCHEMES,
                plot_quantized_pareto,
                run_quantization_experiment,
            )

            schemes = (
                tuple(s.strip() for s in args.schemes.split(",") if s.strip())
                if args.schemes
                else EXPERIMENT_SCHEMES
            )
            quant = run_quantization_experiment(
                siren_dir, Path(args.kv_dir), root / "quantized_params",
                schemes=schemes, qat_epochs=args.qat_epochs,
            )
            plot_quantized_pareto(quant, figures_dir)

    if args.experiment == "attention_error":
        # Opt-in like 'incremental': it re-trains 2*heads fits per probed
        # layer (the sweep's medium path), minutes of device time on a
        # first run — not part of the reference's 'all' chain.
        print("\n" + "=" * 60)
        print("EXPERIMENT 8: Attention-Output End-Metric")
        print("=" * 60)
        if not kv_dir_ok:
            print(
                f"  Warning: {args.kv_dir} has no extracted cache, "
                "skipping attention end-metric"
            )
        else:
            from nerf_attention_tpu.experiments.attention_error import (
                plot_attention_error,
                run_attention_error_experiment,
            )

            attn = run_attention_error_experiment(
                Path(args.kv_dir),
                root / "attention_error",
                layers=tuple(args.attn_layers),
                epochs=args.epochs,
                n_queries=args.attn_queries,
                gains=tuple(args.attn_gains),
                schemes=(
                    tuple(s.strip() for s in args.schemes.split(",") if s.strip())
                    if args.schemes
                    else ()
                ),
                qat_epochs=args.qat_epochs,
                fm_mult=args.fm_mult,
            )
            plot_attention_error(attn, figures_dir)

    if args.experiment == "head_policy":
        # Opt-in like 'incremental'/'attention_error': trains 2*L*kv fits
        # plus a full-stack prefill — minutes of device time on a first run.
        print("\n" + "=" * 60)
        print("EXPERIMENT 9: Head-Selection Policy at a Memory Budget")
        print("=" * 60)
        from nerf_attention_tpu.experiments.head_policy import (
            plot_head_policy,
            run_head_policy_experiment,
        )

        hp = run_head_policy_experiment(
            root / "head_policy",
            seq_len=args.hp_seq_len,
            epochs=args.epochs,
            num_layers=args.hp_layers,
            gain_lo=args.hp_gains[0],
            gain_hi=args.hp_gains[1],
            num_local_experts=args.hp_experts,
            moe_style=args.hp_moe_style,
            attn_sinks=args.hp_sinks,
            sink_lo=args.hp_sink_offsets[0],
            sink_hi=args.hp_sink_offsets[1],
            sliding_window=args.hp_window,
            attn_logit_softcap=args.hp_softcap,
            nope=args.hp_nope,
            seed=args.hp_seed,
            schemes=(
                tuple(s.strip() for s in args.schemes.split(",") if s.strip())
                if args.schemes
                else ("int8_g32_l0fp32",)
            ),
            qat_epochs=args.qat_epochs,
            fm_mult=args.fm_mult,
        )
        plot_head_policy(hp, figures_dir)

    if args.experiment == "incremental":
        # Deliberately NOT part of 'all': each growth step compiles two
        # fresh-length programs, which is minutes of compile on the first
        # run — an opt-in study, like the reference treats its heavy extras.
        print("\n" + "=" * 60)
        print("EXPERIMENT 7: Incremental Refit of a Growing Cache")
        print("=" * 60)
        from nerf_attention_tpu.experiments.incremental import (
            run_incremental_experiment,
        )

        start_len = args.seq_len
        final_len = args.incr_final_len or 2 * start_len
        incr_root = root / (
            "incremental"
            if args.incr_coords == "relative"
            else f"incremental_{args.incr_coords}"
        )
        if args.backend == "synthetic":
            from nerf_attention_tpu.synthetic import ensure_synthetic_cache

            incr_kv = incr_root / "kv_cache"
            ensure_synthetic_cache(
                incr_kv,
                values_mode=args.values_mode,
                seq_len=final_len,
                num_layers=cache_layers,
                num_kv_heads=cache_heads,
                head_dim=cache_head_dim,
            )
        else:
            # A real extraction at the final length is the growing cache;
            # prefixes of it are its earlier states.
            incr_kv = Path(args.kv_dir)
        run_incremental_experiment(
            incr_kv,
            incr_root,
            start_len=start_len,
            chunk=args.incr_chunk,
            epochs_full=args.epochs,
            warm_epochs=args.incr_warm_epochs,
            fm_mult=args.fm_mult,
            coords=args.incr_coords,
        )

    if args.experiment == "all":
        print("\n" + "=" * 60)
        print("FINAL SUMMARY")
        print("=" * 60)

        def _load_json(path: Path):
            if path.exists():
                return json.loads(path.read_text())
            print(f"  Warning: {path} not found, skipping")
            return None

        scaling_data = _load_json(root / "scaling" / "scaling_results.json")
        if scaling_data:
            scaling_data = {int(k): v for k, v in scaling_data.items()}
        prompt_data = _load_json(root / "multi_prompt" / "multi_prompt_results.json")
        svd_data = _load_json(root / "svd" / "svd_results.json")
        siren_data = _load_json(Path(args.siren_dir) / "fit_results.json")
        profile_data = _load_json(
            root / "layer_profile" / "full_layer_profile.json"
        )
        generate_final_summary(
            scaling_data, prompt_data, siren_data, svd_data, figures_dir,
            layer_profile=profile_data,
        )


if __name__ == "__main__":
    main()
