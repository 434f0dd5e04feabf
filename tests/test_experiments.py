"""Experiment drivers end-to-end on the synthetic backend (tiny shapes)."""

import json
from pathlib import Path

import numpy as np
import pytest

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


@pytest.fixture(scope="module")
def scaling_run(tmp_path_factory):
    base = tmp_path_factory.mktemp("scaling")
    results = run_scaling_experiment(
        model_name="synthetic",
        seq_lengths=[64, 128],
        base_dir=base,
        epochs=60,
        backend="synthetic",
        synth_layers=3,
        verbose=False,
    )
    return base, results


def test_scaling_experiment(scaling_run):
    base, results = scaling_run
    assert sorted(results) == [64, 128]
    for seq_len, rec in results.items():
        assert rec["seq_len"] == seq_len
        assert rec["num_experiments"] == 6  # 3 layers x {K,V} x head 0
        assert rec["siren_time_ms"] > 0
        assert rec["hbm_measured_ms"] > 0
        assert rec["hbm_v5e_ms"] > 0
    data = json.loads((base / "scaling_results.json").read_text())
    assert set(data) == {"64", "128"}
    # Resume: second call must reuse extracted caches (no exception, fast).
    again = run_scaling_experiment(
        model_name="synthetic", seq_lengths=[64], base_dir=base,
        epochs=10, backend="synthetic", synth_layers=3, verbose=False,
    )
    assert 64 in again


def test_scaling_plots(scaling_run, tmp_path, figqa):
    _, results = scaling_run
    plot_scaling_crossover(results, tmp_path)
    plot_scaling_quality(results, tmp_path)
    figqa(tmp_path / "scaling_crossover.png")
    figqa(tmp_path / "scaling_quality.png")
    data = json.loads((tmp_path / "crossover_data.json").read_text())
    assert "siren_fit_log_slope" in data
    assert data["latency_ratio_range"][0] > 0
    assert data["crossover_v5e_tokens"] is not None


def test_layer_profile(tiny_kv_dir, tmp_path, figqa):
    results = run_full_layer_profile(tiny_kv_dir, tmp_path, epochs=60, verbose=False)
    assert len(results) == 8  # 4 layers x {K,V}
    assert {r["layer"] for r in results} == {0, 1, 2, 3}
    plot_full_layer_profile(results, tmp_path)
    assert (tmp_path / "full_layer_profile.json").exists()
    figqa(tmp_path / "full_layer_profile.png")


@pytest.fixture(scope="module")
def multi_prompt_run(tmp_path_factory):
    base = tmp_path_factory.mktemp("mp")
    results = run_multi_prompt_experiment(
        model_name="synthetic",
        base_dir=base,
        epochs=60,
        seq_len=64,
        backend="synthetic",
        synth_layers=3,
        verbose=False,
    )
    return base, results


def test_multi_prompt_experiment(multi_prompt_run):
    base, results = multi_prompt_run
    assert set(results) == {"fiction", "code", "conversational", "technical"}
    for rec in results.values():
        assert 0 <= rec["avg_cossim_keys"] <= 1
        assert rec["actual_tokens"] == 64
    # Synthetic caches per prompt are distinct (different seed offsets).
    from nerf_attention_tpu.io import kvstore

    k_f, _ = kvstore.load_layer(base / "fiction" / "kv_cache", 0)
    k_c, _ = kvstore.load_layer(base / "code" / "kv_cache", 0)
    assert not np.array_equal(k_f, k_c)
    assert (base / "multi_prompt_results.json").exists()


def test_multi_prompt_plot(multi_prompt_run, tmp_path, figqa):
    _, results = multi_prompt_run
    plot_multi_prompt(results, tmp_path)
    figqa(tmp_path / "multi_prompt_comparison.png")


def test_final_summary_full_and_partial(scaling_run, multi_prompt_run, tmp_path, figqa):
    _, scaling = scaling_run
    _, prompts = multi_prompt_run
    siren = [
        {
            "config_name": "medium", "kv_type": kv, "layer": 0,
            "final_cosine_mean": 0.8, "compression_ratio": 1.0,
        }
        for kv in ("key", "value")
    ]
    svd = [
        {
            "kv_type": "key", "actual_compression": 2.0,
            "final_cosine_mean": 0.95, "target_compression": 2,
        }
    ]
    generate_final_summary(scaling, prompts, siren, svd, tmp_path)
    figqa(tmp_path / "final_summary.png")

    # Partial inputs render placeholders instead of crashing.
    generate_final_summary(None, None, None, None, tmp_path / "partial")
    figqa(tmp_path / "partial" / "final_summary.png")


def test_scaling_hard_mode(tmp_path):
    """Hard values flow through the scaling ladder: caches record the hard
    recipe, a reference-mode cache on disk is regenerated rather than
    silently reused, and the K/V quality gap appears."""
    from nerf_attention_tpu.io import kvstore

    # Seed one length in reference mode first to exercise the mode check.
    run_scaling_experiment(
        model_name="synthetic", seq_lengths=[64], base_dir=tmp_path,
        epochs=10, backend="synthetic", synth_layers=3, verbose=False,
    )
    assert (
        kvstore.load_metadata(tmp_path / "seq_64" / "kv_cache").model_name
        == "synthetic"
    )

    results = run_scaling_experiment(
        model_name="synthetic", seq_lengths=[64, 128], base_dir=tmp_path,
        epochs=150, backend="synthetic", synth_layers=3,
        values_mode="hard", verbose=False,
    )
    for seq_len in (64, 128):
        meta = kvstore.load_metadata(tmp_path / f"seq_{seq_len}" / "kv_cache")
        assert meta.model_name == "synthetic_hard_v2"
        rec = results[seq_len]
        assert rec["avg_cossim_keys"] > rec["avg_cossim_values"]


def test_layer_profile_hard_synthetic_backend(tmp_path):
    """backend='synthetic' makes the profile hermetic: it generates its own
    cache under the requested value recipe, and hard values fit worse than
    keys on every layer."""
    from nerf_attention_tpu.io import kvstore

    results = run_full_layer_profile(
        tmp_path / "kv", tmp_path / "out", epochs=150, verbose=False,
        backend="synthetic", values_mode="hard", synth_layers=3,
        synth_seq_len=64,
    )
    assert kvstore.load_metadata(tmp_path / "kv").model_name == "synthetic_hard_v2"
    assert len(results) == 6  # 3 layers x {K,V}
    by_type = {
        kv: [r["final_cosine_mean"] for r in results if r["kv_type"] == kv]
        for kv in ("key", "value")
    }
    assert np.mean(by_type["key"]) > np.mean(by_type["value"])


def test_multi_prompt_hard_mode(tmp_path):
    """Hard values flow through the multi-prompt harness (distinct caches
    per prompt, K > V on every content type)."""
    from nerf_attention_tpu.io import kvstore

    results = run_multi_prompt_experiment(
        model_name="synthetic", base_dir=tmp_path, epochs=150, seq_len=64,
        backend="synthetic", synth_layers=3, values_mode="hard",
        verbose=False,
    )
    assert set(results) == {"fiction", "code", "conversational", "technical"}
    for name, rec in results.items():
        assert rec["avg_cossim_keys"] > rec["avg_cossim_values"], name
        # Content hook: per-prompt measured statistics reach the cache
        # (model_name carries the scales) and the results record.
        meta = kvstore.load_metadata(tmp_path / name / "kv_cache")
        assert meta.model_name.startswith("synthetic_hard_v2")
        assert 0.8 <= rec["carrier_scale"] <= 1.3, name
        assert 0.8 <= rec["noise_scale"] <= 1.2, name


def test_experiments_cli_threads_values_mode(tmp_path, monkeypatch):
    """--values_mode/--results_root reach the experiment runners (wiring
    guard: heavy compute stubbed out)."""
    import sys

    import nerf_attention_tpu.experiments.__main__ as cli
    import nerf_attention_tpu.synthetic as synthetic

    calls = {}
    monkeypatch.setattr(
        cli, "run_scaling_experiment",
        lambda **kw: calls.setdefault("scaling", kw) or {},
    )
    monkeypatch.setattr(cli, "plot_scaling_crossover", lambda *a, **k: None)
    monkeypatch.setattr(cli, "plot_scaling_quality", lambda *a, **k: None)
    monkeypatch.setattr(
        synthetic, "generate_synthetic_kv",
        lambda **kw: calls.setdefault("generate", kw),
    )
    monkeypatch.setattr(
        sys, "argv",
        [
            "experiments", "scaling", "--values_mode", "hard",
            "--results_root", str(tmp_path / "root"),
            "--kv_dir", str(tmp_path / "kv"),
            "--fm_mult", "64",
        ],
    )
    cli.main()
    assert calls["scaling"]["values_mode"] == "hard"
    assert calls["scaling"]["base_dir"] == tmp_path / "root" / "scaling"
    assert calls["scaling"]["fm_mult"] == 64.0
    # scaling never reads --kv_dir: the shared-cache generation must not run.
    assert "generate" not in calls

    # svd DOES need the shared cache; generation gets the recipe AND the
    # requested seq_len (a study at --seq_len != 2048 must not regenerate
    # its cache at 2048 mid-run — that destroys what the fit sweep trained
    # on). The stubbed generator writes no metadata, so the svd run itself
    # is warn-skipped downstream.
    monkeypatch.setattr(
        sys, "argv",
        [
            "experiments", "svd", "--values_mode", "hard",
            "--results_root", str(tmp_path / "root"),
            "--kv_dir", str(tmp_path / "kv"),
            "--seq_len", "1024",
        ],
    )
    cli.main()
    assert calls["generate"]["values_mode"] == "hard"
    assert calls["generate"]["seq_len"] == 1024

    # layer_profile threads fm_mult + seq_len into the profile runner.
    monkeypatch.setattr(
        cli, "run_full_layer_profile",
        lambda **kw: calls.setdefault("profile", kw) or [],
    )
    monkeypatch.setattr(cli, "plot_full_layer_profile", lambda *a, **k: None)
    (tmp_path / "kv").mkdir(exist_ok=True)
    (tmp_path / "kv" / "metadata.json").write_text(
        json.dumps(
            dict(model_name="synthetic", num_layers=32, num_kv_heads=8,
                 seq_len=1024, head_dim=128, actual_tokens=1024)
        )
    )
    monkeypatch.setattr(
        sys, "argv",
        [
            "experiments", "layer_profile",
            "--results_root", str(tmp_path / "root"),
            "--kv_dir", str(tmp_path / "kv"),
            "--seq_len", "1024", "--fm_mult", "64",
        ],
    )
    cli.main()
    assert calls["profile"]["synth_seq_len"] == 1024
    assert calls["profile"]["fm_mult"] == 64.0


def test_experiments_cli_infers_geometry_from_disk(tmp_path, monkeypatch):
    """With no explicit --seq_len/--synth_layers the CLI must adopt the fit
    sweep's recorded seq_len and the existing synthetic cache's layer/head
    geometry — a bare run against a quickstart-scale study must not
    regenerate the cache at 32x8x2048 and orphan the checkpoints."""
    import sys

    import nerf_attention_tpu.experiments.__main__ as cli
    import nerf_attention_tpu.synthetic as synthetic

    fits = tmp_path / "fits"
    fits.mkdir()
    (fits / "sweep_meta.json").write_text(json.dumps({"seq_len": 512}))
    kv = tmp_path / "kv"
    kv.mkdir()
    (kv / "metadata.json").write_text(
        json.dumps(
            dict(model_name="synthetic", num_layers=4, num_kv_heads=4,
                 seq_len=512, head_dim=64, actual_tokens=512)
        )
    )

    calls = {}
    monkeypatch.setattr(
        cli, "run_full_layer_profile",
        lambda **kw: calls.setdefault("profile", kw) or [],
    )
    monkeypatch.setattr(cli, "plot_full_layer_profile", lambda *a, **k: None)
    monkeypatch.setattr(
        synthetic, "ensure_synthetic_cache",
        lambda kv_dir, **kw: calls.setdefault("ensure", kw),
    )
    monkeypatch.setattr(
        sys, "argv",
        [
            "experiments", "layer_profile",
            "--results_root", str(tmp_path / "root"),
            "--kv_dir", str(kv), "--siren_dir", str(fits),
        ],
    )
    cli.main()
    assert calls["ensure"]["seq_len"] == 512       # from sweep_meta.json
    assert calls["ensure"]["num_layers"] == 4      # from cache metadata
    assert calls["ensure"]["num_kv_heads"] == 4
    assert calls["ensure"]["head_dim"] == 64       # non-128 must survive too
    assert calls["profile"]["synth_seq_len"] == 512
    assert calls["profile"]["synth_layers"] == 4
    assert calls["profile"]["synth_heads"] == 4

    # Explicit flags still win over what is on disk.
    monkeypatch.setattr(
        sys, "argv",
        [
            "experiments", "layer_profile",
            "--results_root", str(tmp_path / "root"),
            "--kv_dir", str(kv), "--siren_dir", str(fits),
            "--seq_len", "2048", "--synth_layers", "32",
        ],
    )
    calls.clear()
    cli.main()
    assert calls["ensure"]["seq_len"] == 2048
    assert calls["ensure"]["num_layers"] == 32
    assert calls["ensure"]["num_kv_heads"] == 8
    assert calls["profile"]["synth_layers"] == 32


def test_aggregate_decode_experiment(tmp_path, figqa):
    from nerf_attention_tpu.experiments.aggregate_decode import (
        run_aggregate_decode_experiment,
    )

    results = run_aggregate_decode_experiment(
        output_dir=tmp_path,
        siren_dir=None,
        seq_len=64,
        head_dim=8,
        num_layers=2,
        num_kv_heads=2,
        verbose=False,
    )
    assert results["num_networks"] == 8
    assert results["siren_aggregate_ms"] > 0
    assert results["hbm_measured_aggregate_ms"] > 0
    assert results["ratio_vs_measured"] > 0
    assert (tmp_path / "aggregate_decode.json").exists()
    figqa(tmp_path / "aggregate_decode.png")


def test_aggregate_decode_decodes_fm_checkpoints_as_fm(tmp_path):
    """FM checkpoints must be timed with the FM forward (the multipliers
    are part of the serving network), recorded in the artifact, and not
    silently mixed with shared-omega files."""
    import jax

    from nerf_attention_tpu.experiments.aggregate_decode import (
        run_aggregate_decode_experiment,
    )
    from nerf_attention_tpu.io.checkpoint import save_siren_checkpoint
    from nerf_attention_tpu.models.siren import init_siren
    from nerf_attention_tpu.types import CONFIGS_BY_NAME

    medium = CONFIGS_BY_NAME["medium"]
    fits = tmp_path / "fits"
    for i, fm in enumerate([64.0, 64.0, None]):  # one mismatched file
        params = [
            (np.asarray(w), np.asarray(b))
            for w, b in init_siren(jax.random.PRNGKey(i), medium, 8)
        ]
        save_siren_checkpoint(
            fits / f"L0_H{i}_key_medium_model.npz", params, medium, 8,
            np.zeros(8, np.float32), np.ones(8, np.float32),
            {"name": f"L0_H{i}_key_medium"}, fm_mult=fm,
        )

    results = run_aggregate_decode_experiment(
        output_dir=tmp_path,
        siren_dir=fits,
        seq_len=64,
        head_dim=8,
        num_layers=1,
        num_kv_heads=1,
        verbose=False,
    )
    assert results["fm_mult"] == 64.0
    assert "fm_mult=64" in results["weights_source"]
    assert "1 skipped" in results["weights_source"]


def test_aggregate_decode_trained_stack(tmp_path):
    """train=True fits every (layer, head, K|V) slice first; the artifact
    then reports serving-scale quality and an all-trained weights source."""
    from nerf_attention_tpu.experiments.aggregate_decode import (
        run_aggregate_decode_experiment,
    )

    results = run_aggregate_decode_experiment(
        output_dir=tmp_path,
        seq_len=64,
        head_dim=8,
        num_layers=2,
        num_kv_heads=2,
        verbose=False,
        train=True,
        kv_dir=tmp_path / "kv",
        epochs=30,
    )
    assert results["weights_source"] == "8 freshly trained fits"
    q = results["trained_quality"]
    assert 0.0 < q["keys_cosine_mean"] <= 1.0
    assert 0.0 < q["values_cosine_mean"] <= 1.0
    assert q["epochs"] == 30
