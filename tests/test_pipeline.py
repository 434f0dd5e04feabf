"""End-to-end pipeline: analyze + fit sweep + evaluate on synthetic data."""

import json

import numpy as np
import pytest

from nerf_attention_tpu.analyze import analyze_kv_cache, select_layers
from nerf_attention_tpu.evaluate import (
    generate_summary_figure,
    load_results,
    plot_keys_vs_values,
    plot_pareto_frontier,
    plot_per_position_error,
    profile_latency,
)
from nerf_attention_tpu.fit import fit_kv_cache, sweep_layers
from nerf_attention_tpu.io import checkpoint


def test_select_layers():
    assert select_layers(32) == [0, 8, 16, 24, 31]
    assert select_layers(4) == [0, 1, 2, 3]
    assert sweep_layers(32, quick=True) == [0, 16, 31]
    assert sweep_layers(32, quick=False) == [0, 8, 16, 24, 31]


def test_analyze_pipeline(tiny_kv_dir, tmp_path, figqa):
    result = analyze_kv_cache(tiny_kv_dir, tmp_path, verbose=False)
    assert result.metadata.num_layers == 4
    # 4 layers -> sampled layers {0,1,2,3}
    assert [s.layer for s in result.layer_summaries] == [0, 1, 2, 3]
    # Synthetic values are smoother than keys by construction.
    assert result.avg_autocorr_values > result.avg_autocorr_keys
    assert 0 < result.avg_spectral_keys <= 1

    data = json.loads((tmp_path / "analysis_results.json").read_text())
    assert set(data) == {"metadata", "layer_summaries", "assessment"}
    assert len(data["layer_summaries"]) == 4
    figqa(tmp_path / "kv_structure_analysis.png")


@pytest.fixture(scope="module")
def quick_fit(tiny_kv_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("fits")
    results = fit_kv_cache(
        tiny_kv_dir, out, epochs=150, quick=True, verbose=False
    )
    return out, results


def test_quick_sweep_grid(quick_fit):
    out, results = quick_fit
    # quick: 3 layers x 1 head x {K,V} x 2 configs = 12 fits
    assert len(results) == 12
    names = {r["name"] for r in results}
    assert "L0_H0_key_small" in names
    assert "L3_H0_value_medium" in names
    layers = {r["layer"] for r in results}
    assert layers == {0, 2, 3}
    assert (out / "fit_results.json").exists()
    # Medium checkpoints saved (6 = 3 layers x 2 kv).
    assert len(checkpoint.checkpoint_glob(out)) == 6


def test_evaluate_figures(quick_fit, tiny_kv_dir, tmp_path, figqa):
    out, _ = quick_fit
    results = load_results(out)
    plot_pareto_frontier(results, tmp_path)
    plot_keys_vs_values(results, tmp_path)
    plot_per_position_error(out, tiny_kv_dir, tmp_path)
    generate_summary_figure(results, tmp_path)
    for name in (
        "pareto_frontier.png",
        "keys_vs_values.png",
        "per_position_error.png",
        "summary_figure.png",
    ):
        figqa(tmp_path / name)


def test_profile_latency(quick_fit, tmp_path, figqa):
    out, _ = quick_fit
    results = profile_latency(out, tmp_path, max_models=2, num_runs=5)
    assert len(results) == 2
    r = results[0]
    assert r["siren_time_ms"] > 0
    assert r["hbm_time_measured_ms"] > 0
    assert r["hbm_time_v5e_ms"] > 0
    data = json.loads((tmp_path / "latency_results.json").read_text())
    assert len(data) == 2
    figqa(tmp_path / "latency_comparison.png")


def test_checkpoint_reconstruction_quality(quick_fit, tiny_kv_dir):
    """A reloaded checkpoint reproduces the recorded CosSim."""
    import jax.numpy as jnp

    from nerf_attention_tpu.evaluate import _checkpoint_forward
    from nerf_attention_tpu.io import kvstore
    from nerf_attention_tpu.parallel.sweep import cosine_similarity

    out, _ = quick_fit
    ckpt_path = checkpoint.checkpoint_glob(out)[0]
    ckpt = checkpoint.load_siren_checkpoint(ckpt_path)
    metrics = ckpt["metrics"]
    keys, values = kvstore.load_layer(tiny_kv_dir, metrics["layer"])
    original = (keys if metrics["kv_type"] == "key" else values)[metrics["head"]]
    pred = _checkpoint_forward(ckpt, original.shape[0])
    cos = float(
        np.mean(np.asarray(cosine_similarity(jnp.asarray(pred), jnp.asarray(original))))
    )
    assert abs(cos - metrics["final_cosine_mean"]) < 1e-3


def test_evaluate_runs_on_reference_pt_checkpoints(
    quick_fit, tiny_kv_dir, tmp_path, figqa
):
    """evaluate's checkpoint-driven passes work on reference-format .pt files.

    Converts a trained .npz checkpoint into the reference's torch payload
    (reference fit.py:121-137) and drives per-position + latency over a
    directory containing ONLY .pt checkpoints.
    """
    torch = pytest.importorskip("torch")
    out, _ = quick_fit
    pt_dir = tmp_path / "pt_fits"
    pt_dir.mkdir()

    for src in checkpoint.checkpoint_glob(out)[:2]:
        ckpt = checkpoint.load_siren_checkpoint(src)
        state = {}
        last = len(ckpt["params"]) - 1
        for i, (w, b) in enumerate(ckpt["params"]):
            stem = f"network.{i}" if i == last else f"network.{i}.linear"
            state[f"{stem}.weight"] = torch.from_numpy(np.asarray(w).T.copy())
            state[f"{stem}.bias"] = torch.from_numpy(np.asarray(b))
        torch.save(
            {
                "model_state": state,
                "config": {
                    "hidden_features": ckpt["config"].hidden_features,
                    "hidden_layers": ckpt["config"].hidden_layers,
                    "omega_0": ckpt["config"].omega_0,
                    "name": ckpt["config"].name,
                    "out_features": ckpt["out_features"],
                },
                "target_mean": torch.from_numpy(np.asarray(ckpt["target_mean"])),
                "target_std": torch.from_numpy(np.asarray(ckpt["target_std"])),
                "metrics": ckpt["metrics"],
            },
            pt_dir / (src.stem + ".pt"),
        )

    fig_dir = tmp_path / "figs"
    plot_per_position_error(pt_dir, tiny_kv_dir, fig_dir)
    figqa(fig_dir / "per_position_error.png")
    latency = profile_latency(pt_dir, fig_dir, max_models=2, num_runs=5)
    assert len(latency) == 2 and latency[0]["siren_time_ms"] > 0


def test_analyze_raises_on_empty_cache(tmp_path):
    """No sampled layer file -> explicit FileNotFoundError, not NaN JSON."""
    import json

    import pytest

    from nerf_attention_tpu.analyze import analyze_kv_cache
    from nerf_attention_tpu.types import KVMetadata
    from nerf_attention_tpu.io import kvstore

    kvstore.save_metadata(
        tmp_path, KVMetadata("m", num_layers=4, num_kv_heads=2,
                             seq_len=32, head_dim=8, actual_tokens=32)
    )
    with pytest.raises(FileNotFoundError, match="nothing to analyze"):
        analyze_kv_cache(tmp_path, tmp_path / "analysis", verbose=False)


def test_pareto_with_svd_overlay(quick_fit, tmp_path, figqa):
    """SVD diamonds overlay on the pareto (reference evaluate.py:81-86)."""
    out, _ = quick_fit
    results = load_results(out)
    svd = [
        {"kv_type": "key", "actual_compression": 2.0, "final_cosine_mean": 0.97},
        {"kv_type": "value", "actual_compression": 4.0, "final_cosine_mean": 0.91},
    ]
    plot_pareto_frontier(results, tmp_path, svd_results=svd)
    figqa(tmp_path / "pareto_frontier.png")
