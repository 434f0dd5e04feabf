"""One-command study driver: stage wiring and a tiny end-to-end run."""

import json

import pytest

from nerf_attention_tpu import study


def test_study_skip_controls_stages(tmp_path, monkeypatch):
    """--skip gates each stage; args thread through (compute stubbed)."""
    calls = []

    import nerf_attention_tpu.analyze as analyze_mod
    import nerf_attention_tpu.experiments.__main__ as exp_cli
    import nerf_attention_tpu.fit as fit_mod
    import nerf_attention_tpu.synthetic as synthetic_mod

    monkeypatch.setattr(
        synthetic_mod, "ensure_synthetic_cache",
        lambda kv_dir, **kw: calls.append(("extract", kw)),
    )
    monkeypatch.setattr(
        analyze_mod, "analyze_kv_cache",
        lambda *a, **k: calls.append(("analyze", {})),
    )
    monkeypatch.setattr(
        fit_mod, "fit_kv_cache",
        lambda *a, **kw: calls.append(("fit", kw)) or [],
    )
    import sys

    import nerf_attention_tpu.compress as compress_mod

    monkeypatch.setattr(
        exp_cli, "main",
        lambda: calls.append(("experiments", {"argv": list(sys.argv)})),
    )
    monkeypatch.setattr(
        compress_mod, "main",
        lambda argv: calls.append(("compress", {"argv": list(argv)})),
    )
    import nerf_attention_tpu.serve_plan as serve_plan_mod

    monkeypatch.setattr(
        serve_plan_mod, "main",
        lambda argv: calls.append(("serve_plan", {"argv": list(argv)})),
    )

    study.main(
        [
            "--root", str(tmp_path), "--values_mode", "hard",
            "--epochs", "7", "--seq_len", "1024", "--fm_mult", "64",
            "--compress", "int4_g128_qat",
            "--attention", "--serving", "--cost_target", "0.03",
            "--skip", "evaluate",
        ]
    )
    stages = [name for name, _ in calls]
    assert stages == [
        "extract", "analyze", "fit", "experiments", "experiments",
        "compress", "experiments", "serve_plan", "serve_plan",
    ]
    # The opt-in serving stage runs head_policy with the study's epochs +
    # fm_mult, then emits both plan flavors at the study's cost target.
    hp_argv = calls[6][1]["argv"]
    assert hp_argv[1] == "head_policy"
    assert hp_argv[hp_argv.index("--epochs") + 1] == "7"
    assert hp_argv[hp_argv.index("--fm_mult") + 1] == "64.0"
    assert "--seq_len" not in hp_argv  # hermetic model: no cache geometry
    flat_argv = calls[7][1]["argv"]
    assert flat_argv[flat_argv.index("--cost_target") + 1] == "0.03"
    assert "--tiered" not in flat_argv
    tiered_argv = calls[8][1]["argv"]
    assert "--tiered" in tiered_argv
    assert tiered_argv[tiered_argv.index("--out") + 1].endswith(
        "serve_plan_tiered.json"
    )
    # The opt-in attention stage delegates to the experiments CLI with the
    # attention_error subcommand and the study's own geometry.
    attn_argv = calls[4][1]["argv"]
    assert attn_argv[1] == "attention_error"
    assert attn_argv[attn_argv.index("--seq_len") + 1] == "1024"
    assert attn_argv[attn_argv.index("--fm_mult") + 1] == "64.0"
    assert "--schemes" not in attn_argv  # only passed when the user sets it
    # A _qat compress scheme splits into the base grid + the --qat flag,
    # and the stage targets the study's own fits/kv dirs.
    comp_argv = calls[5][1]["argv"]
    assert comp_argv[comp_argv.index("--scheme") + 1] == "int4_g128"
    assert "--qat" in comp_argv
    assert comp_argv[comp_argv.index("--out_dir") + 1].endswith(
        "fits_int4_g128_qat"
    )
    extract_kw = dict(calls[0][1])
    assert extract_kw["values_mode"] == "hard"
    assert extract_kw["seq_len"] == 1024
    fit_kw = dict(calls[2][1])
    assert fit_kw["epochs"] == 7
    assert fit_kw["fm_mult"] == 64.0
    assert fit_kw["torch_checkpoints"] and fit_kw["resume"]
    # The experiments stage sees the study's seq_len and fm_mult (a study
    # at seq_len != 2048 must not regenerate its cache at 2048 mid-run).
    exp_argv = calls[3][1]["argv"]
    assert exp_argv[exp_argv.index("--seq_len") + 1] == "1024"
    assert exp_argv[exp_argv.index("--fm_mult") + 1] == "64.0"


def test_study_end_to_end_tiny(tmp_path, figqa):
    """The full chain actually runs on tiny synthetic shapes."""
    study.main(
        [
            "--root", str(tmp_path), "--values_mode", "hard",
            "--seq_len", "64", "--epochs", "60", "--synth_layers", "3",
            "--skip", "experiments",  # covered by test_experiments.py
        ]
    )
    records = json.loads((tmp_path / "fits" / "fit_results.json").read_text())
    assert len(records) == 3 * 4 * 2 * 7  # layers x heads x K/V x configs
    assert (tmp_path / "fits" / "sweep_meta.json").exists()
    # Reference-format interop checkpoints written by the fit stage.
    assert list((tmp_path / "fits").glob("*medium_model.pt"))
    figqa(tmp_path / "figures" / "pareto_frontier.png")
    figqa(tmp_path / "figures" / "summary_figure.png")
    figqa(tmp_path / "analysis" / "kv_structure_analysis.png")
    assert (tmp_path / "figures" / "latency_results.json").exists()
