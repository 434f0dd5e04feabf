"""One-command full study: extract -> fit -> evaluate -> experiments -> summary.

The reference documents its study as five separate commands
(`/root/reference/README.md:73-78`; quickstart.py covers only a reduced
synthetic slice). This driver runs the COMPLETE study — the same chain the
archived hard-mode study used (`benchmarks/r3/hard_study/`) — with one
command, under any backend and value recipe, into a self-contained results
root:

    python -m nerf_attention_tpu.study                       # default recipe
    python -m nerf_attention_tpu.study --values_mode hard \
        --root results_hard                                  # hard-mode study
    python -m nerf_attention_tpu.study --backend jax --model /path/to/ckpt

Stages (each skippable via --skip, resumable where the stage supports it):

  1. extract   — synthetic generator or real-model extraction into
                 <root>/kv_cache
  2. fit       — the 280-fit architecture sweep into <root>/fits
                 (reference-format .pt checkpoints included for interop)
  3. evaluate  — full figure set + measured latency roofline
  4. experiments — scaling ladder, multi-prompt, SVD, layer profile,
                 aggregate decode, quantized storage, final summary
                 (delegates to experiments/__main__ with --results_root)
  5. attention — opt-in (--attention): price the fitted reconstruction at
                 the attention OUTPUT (experiments/attention_error.py)
  6. compress  — opt-in (--compress SCHEME): ship the sweep as bit-packed
                 quantized checkpoints under <root>/fits_<scheme>, QAT
                 repair included for _qat schemes (compress.py)
  7. serving   — opt-in (--serving): the head-selection policy study
                 (experiments/head_policy.py) plus the greedy and tiered
                 serving plans emitted from its measured artifact
                 (serve_plan.py) at --cost_target
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

STAGES = (
    "extract", "fit", "evaluate", "experiments", "attention", "compress",
    "serving",
)


def _delegate_experiments(argv: list[str]) -> None:
    """Run the experiments CLI in-process with a temporary sys.argv."""
    from nerf_attention_tpu.experiments.__main__ import main as experiments_main

    saved_argv = sys.argv
    sys.argv = ["experiments", *argv]
    try:
        experiments_main()
    finally:
        sys.argv = saved_argv


def _experiments_argv(
    subcommand: str,
    args,
    root: Path,
    kv_dir: Path,
    fits_dir: Path,
    *,
    model: bool = False,
    geometry: bool = True,
) -> list[str]:
    """The shared flag tail every delegated experiments stage threads.

    ``geometry`` carries the backend/value-recipe/cache-shape flags (a
    study at --seq_len != 2048 must not regenerate its cache at 2048
    mid-run); head_policy builds its own hermetic model and skips them.
    """
    argv = [
        subcommand,
        "--results_root", str(root),
        "--kv_dir", str(kv_dir),
        "--siren_dir", str(fits_dir),
        "--epochs", str(args.epochs),
    ]
    if model:
        argv += ["--model", args.model]
    if geometry:
        argv += [
            "--backend", args.backend,
            "--values_mode", args.values_mode,
            "--synth_layers", str(args.synth_layers),
            "--seq_len", str(args.seq_len),
        ]
    if args.fm_mult is not None:
        argv += ["--fm_mult", str(args.fm_mult)]
    if args.schemes is not None:
        argv += ["--schemes", args.schemes]
    return argv


def main(argv: list[str] | None = None) -> None:
    from nerf_attention_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    parser = argparse.ArgumentParser(
        description="Run the complete study end-to-end"
    )
    parser.add_argument("--root", type=str, default="results")
    parser.add_argument("--model", type=str, default="meta-llama/Llama-3.1-8B")
    parser.add_argument(
        "--backend", type=str, default="synthetic",
        choices=["synthetic", "hf", "jax"],
    )
    parser.add_argument(
        "--values_mode", type=str, default="reference",
        choices=["reference", "hard"],
        help="synthetic backend value recipe ('hard' reproduces the real "
        "study's K>>V shapes hermetically)",
    )
    parser.add_argument("--seq_len", type=int, default=2048)
    parser.add_argument("--epochs", type=int, default=2000)
    parser.add_argument(
        "--synth_layers", type=int, default=32,
        help="synthetic backend: layer count for generated caches",
    )
    parser.add_argument(
        "--skip", type=str, nargs="*", default=[], choices=list(STAGES),
        help="stages to skip (e.g. --skip extract fit when resuming)",
    )
    parser.add_argument(
        "--mesh", action="store_true",
        help="shard the fit sweep over all local devices",
    )
    parser.add_argument(
        "--schemes", type=str, default=None,
        help="quantize stage: comma-separated storage schemes "
        "(named, int<B>_g<N>, and _qat variants); default experiment set",
    )
    parser.add_argument(
        "--compress", type=str, default=None, metavar="SCHEME",
        help="after the experiments, ship the sweep as bit-packed quantized "
        "checkpoints under <root>/fits_<scheme> (io/quantized.py); a _qat "
        "suffix (e.g. int4_g128_qat, the measured 6x frontier point) runs "
        "the straight-through repair first",
    )
    parser.add_argument(
        "--attention", action="store_true",
        help="after the experiments, run the attention-output end-metric "
        "(experiments attention_error): what the sweep's K/V CosSim "
        "actually costs at softmax(qK^T/sqrt(d))V",
    )
    parser.add_argument(
        "--serving", action="store_true",
        help="after the experiments, run the head-selection policy study "
        "(experiments head_policy, hermetic model) and emit the greedy + "
        "tiered serving plans from its measured solo costs (serve-plan)",
    )
    parser.add_argument(
        "--cost_target", type=float, default=0.01,
        help="serving: output-cost target for the emitted plans",
    )
    parser.add_argument(
        "--hp_experts", type=int, default=None,
        help="serving: run the policy study on a sparse-MoE stack with "
        "this many experts per layer and measure router flip rate "
        "(experiments head_policy --hp_experts)",
    )
    parser.add_argument(
        "--hp_moe_style", type=str, default="mixtral",
        choices=["mixtral", "gpt_oss"],
        help="serving: MoE routing flavor for --hp_experts "
        "(experiments head_policy --hp_moe_style)",
    )
    parser.add_argument(
        "--hp_sinks", action="store_true",
        help="serving: run the policy study with GPT-OSS attention sinks "
        "and the sink-aware rankings (experiments head_policy --hp_sinks)",
    )
    parser.add_argument(
        "--hp_window", type=int, default=None,
        help="serving: alternating sliding/full layers with this window "
        "(experiments head_policy --hp_window)",
    )
    parser.add_argument(
        "--fm_mult", type=float, default=None,
        help="run the whole study on FM-SIRENs (per-unit first-layer "
        "frequencies, equal parameter count): the fit sweep trains FM nets, "
        "evaluate/quantize pick FM up from the checkpoints, and the scaling "
        "ladder + layer profile re-fit with the same fm_mult",
    )
    args = parser.parse_args(argv)

    root = Path(args.root)
    kv_dir = root / "kv_cache"
    fits_dir = root / "fits"
    figures_dir = root / "figures"

    def banner(stage: str, detail: str) -> None:
        print(f"\n{'=' * 60}\nSTUDY {stage.upper()}: {detail}\n{'=' * 60}")

    if "extract" not in args.skip:
        banner("extract", f"{args.backend} backend -> {kv_dir}")
        if args.backend == "synthetic":
            from nerf_attention_tpu.synthetic import ensure_synthetic_cache

            ensure_synthetic_cache(
                kv_dir,
                values_mode=args.values_mode,
                seq_len=args.seq_len,
                num_layers=args.synth_layers,
            )
        elif args.backend == "jax":
            from nerf_attention_tpu.extract import extract_kv_cache_jax

            extract_kv_cache_jax(args.model, args.seq_len, kv_dir)
        else:
            from nerf_attention_tpu.extract import extract_kv_cache

            extract_kv_cache(args.model, args.seq_len, kv_dir, "cpu")

        from nerf_attention_tpu.analyze import analyze_kv_cache

        analyze_kv_cache(kv_dir, root / "analysis")

    if "fit" not in args.skip:
        banner("fit", f"architecture sweep ({args.epochs} epochs) -> {fits_dir}")
        from nerf_attention_tpu.fit import fit_kv_cache

        mesh = None
        if args.mesh:
            from nerf_attention_tpu.parallel.mesh import fit_mesh

            mesh = fit_mesh()
        fit_kv_cache(
            kv_dir, fits_dir, epochs=args.epochs, resume=True, mesh=mesh,
            torch_checkpoints=True, fm_mult=args.fm_mult,
        )

    if "evaluate" not in args.skip:
        banner("evaluate", f"figures + latency roofline -> {figures_dir}")
        from nerf_attention_tpu.evaluate import (
            generate_summary_figure,
            load_results,
            plot_keys_vs_values,
            plot_pareto_frontier,
            plot_per_position_error,
            profile_latency,
        )

        records = load_results(fits_dir)
        plot_pareto_frontier(records, figures_dir)
        plot_keys_vs_values(records, figures_dir)
        plot_per_position_error(fits_dir, kv_dir, figures_dir)
        generate_summary_figure(records, figures_dir)
        profile_latency(fits_dir, figures_dir)

    if "experiments" not in args.skip:
        banner("experiments", f"all follow-ups -> {root}")
        _delegate_experiments(
            _experiments_argv("all", args, root, kv_dir, fits_dir, model=True)
        )

    if args.attention and "attention" not in args.skip:
        banner("attention", f"output end-metric -> {root}/attention_error")
        # --schemes prices the stored payloads at the output too.
        _delegate_experiments(
            _experiments_argv("attention_error", args, root, kv_dir, fits_dir)
        )

    if args.compress is not None and "compress" not in args.skip:
        scheme = args.compress
        qat = scheme.endswith("_qat")
        if qat:
            scheme = scheme[: -len("_qat")]
        out_dir = root / f"fits_{args.compress}"
        banner("compress", f"{args.compress} storage -> {out_dir}")
        from nerf_attention_tpu.compress import main as compress_main

        compress_main(
            [
                "--siren_dir", str(fits_dir),
                "--out_dir", str(out_dir),
                "--scheme", scheme,
                "--kv_dir", str(kv_dir),
                *(["--qat"] if qat else []),
            ]
        )

    if args.serving and "serving" not in args.skip:
        banner("serving", f"head policy + serving plans -> {root}/head_policy")
        hp_argv = _experiments_argv(
            "head_policy", args, root, kv_dir, fits_dir, geometry=False
        )
        if args.hp_experts is not None:
            hp_argv += [
                "--hp_experts", str(args.hp_experts),
                "--hp_moe_style", args.hp_moe_style,
            ]
        if args.hp_sinks:
            hp_argv += ["--hp_sinks"]
        if args.hp_window is not None:
            hp_argv += ["--hp_window", str(args.hp_window)]
        _delegate_experiments(hp_argv)

        from nerf_attention_tpu.serve_plan import main as serve_plan_main

        policy_json = root / "head_policy" / "head_policy_results.json"
        serve_plan_main(
            [
                "--policy_json", str(policy_json),
                "--cost_target", str(args.cost_target),
                "--out", str(root / "serve_plan.json"),
            ]
        )
        serve_plan_main(
            [
                "--policy_json", str(policy_json), "--tiered",
                "--cost_target", str(args.cost_target),
                "--out", str(root / "serve_plan_tiered.json"),
            ]
        )

    print(f"\nStudy complete. Everything under {root}/")


if __name__ == "__main__":
    main()
