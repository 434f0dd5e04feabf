"""Pure plot-data prep (figdata) + findings-text builders."""

import numpy as np

from nerf_attention_tpu import figdata


def _record(config="medium", kv="key", layer=0, cos=0.9, ratio=1.5):
    return {
        "config_name": config,
        "kv_type": kv,
        "layer": layer,
        "final_cosine_mean": cos,
        "compression_ratio": ratio,
    }


RECORDS = [
    _record("small", "key", 0, 0.90, 0.5),
    _record("small", "value", 0, 0.80, 0.5),
    _record("medium", "key", 0, 0.95, 0.8),
    _record("medium", "value", 0, 0.70, 0.8),
    _record("medium", "key", 2, 0.93, 0.8),
    _record("medium", "value", 2, 0.72, 0.8),
]


def test_metric_by_groups_and_sorts():
    grouped = figdata.metric_by(RECORDS, "config_name")
    assert list(grouped) == ["medium", "small"]
    assert grouped["small"].tolist() == [0.90, 0.80]


def test_only_multi_field_filter():
    rows = figdata.only(RECORDS, config_name="medium", kv_type="key")
    assert [r["layer"] for r in rows] == [0, 2]


def test_pareto_series_shapes():
    series = figdata.pareto_series(RECORDS)
    assert set(series) == {"small", "medium"}
    ratios, quality = series["medium"]
    assert ratios.shape == quality.shape == (4,)


def test_kv_quality_config_filter():
    keys, values = figdata.kv_quality(RECORDS, "medium")
    assert keys.tolist() == [0.95, 0.93]
    assert values.tolist() == [0.70, 0.72]
    all_keys, _ = figdata.kv_quality(RECORDS)
    assert all_keys.size == 3


def test_layer_stats():
    layers, means, stds = figdata.layer_stats(
        figdata.only(RECORDS, config_name="medium")
    )
    assert layers.tolist() == [0, 2]
    np.testing.assert_allclose(means, [0.825, 0.825])
    assert (stds >= 0).all()


def test_kv_gap_by_architecture():
    names, key_means, value_means = figdata.kv_gap_by_architecture(RECORDS)
    assert names == ["medium", "small"]
    np.testing.assert_allclose(key_means, [0.94, 0.90])
    np.testing.assert_allclose(value_means, [0.71, 0.80])


def test_architecture_ranking():
    names, means = figdata.architecture_ranking(RECORDS)
    assert names == ["medium", "small"]
    np.testing.assert_allclose(means, [0.825, 0.85])


def test_headline_fits():
    highlights = figdata.headline_fits(RECORDS, threshold=0.9)
    assert highlights["best"]["final_cosine_mean"] == 0.95
    assert highlights["most_compressed_above"]["compression_ratio"] == 0.8
    assert highlights["count"] == len(RECORDS)
    none_qualify = figdata.headline_fits(RECORDS, threshold=0.99)
    assert none_qualify["most_compressed_above"] is None


def test_local_minima():
    assert figdata.local_minima(np.array([3, 1, 2, 0.5, 4])).tolist() == [1, 3]
    assert figdata.local_minima(np.array([1, 2])).tolist() == []


def test_spread():
    assert abs(figdata.spread([0.3, 0.9, 0.5]) - 0.6) < 1e-12
    assert figdata.spread([]) == 0.0


def test_profile_series_sorted_by_layer():
    profile = [
        _record("medium", "key", 3, 0.9),
        _record("medium", "key", 1, 0.8),
        _record("medium", "value", 1, 0.7),
        _record("medium", "value", 3, 0.6),
    ]
    series = figdata.profile_series(profile)
    assert series["key"][0].tolist() == [1, 3]
    assert series["key"][1].tolist() == [0.8, 0.9]
    assert series["value"][1].tolist() == [0.7, 0.6]


def test_scaling_and_prompt_series():
    scaling = {1024: {"avg_cossim_keys": 0.9}, 512: {"avg_cossim_keys": 0.95}}
    seq_lens, quality = figdata.scaling_series(scaling, "avg_cossim_keys")
    assert seq_lens == [512, 1024]
    assert quality.tolist() == [0.95, 0.9]

    prompts = {"fiction": {"avg_cossim_keys": 0.96}, "code": {"avg_cossim_keys": 0.95}}
    names, quality = figdata.prompt_series(prompts, "avg_cossim_keys")
    assert names == ["fiction", "code"]
    assert quality.tolist() == [0.96, 0.95]


def test_sweep_findings_text_mentions_best_and_count():
    from nerf_attention_tpu.evaluate import sweep_findings_text

    text = sweep_findings_text(RECORDS)
    assert "CosSim=0.9500" in text
    assert f"Experiments: {len(RECORDS)}" in text
    assert "Best compression (>0.9)" in text


def test_sweep_findings_text_no_qualifier():
    from nerf_attention_tpu.evaluate import sweep_findings_text

    low = [_record(cos=0.5), _record(cos=0.6, kv="value")]
    assert "No config achieves >0.9" in sweep_findings_text(low)


def test_final_findings_lines_full_inputs():
    from nerf_attention_tpu.experiments.summary import final_findings_lines

    scaling = {
        512: {"siren_time_ms": 0.06, "hbm_4060_ms": 0.001, "num_experiments": 6},
        2048: {"siren_time_ms": 0.15, "hbm_4060_ms": 0.002, "num_experiments": 6},
    }
    prompts = {
        "fiction": {"avg_cossim_keys": 0.96, "avg_cossim_values": 0.94},
        "code": {"avg_cossim_keys": 0.95, "avg_cossim_values": 0.94},
    }
    svd = [
        {"kv_type": "key", "target_compression": 2, "final_cosine_mean": 0.97},
    ]
    lines = final_findings_lines(scaling, prompts, RECORDS, svd, layer_profile=[])
    body = "\n".join(lines)
    assert "Keys avg:" in body and "Values avg:" in body
    assert "SVD 2x keys: 0.97" in body
    assert "Cross-content spread: 0.010" in body
    assert "60-75x slower" in body
    assert f"Total experiments: {len(RECORDS) + 1 + 12}" in body


def test_final_findings_lines_empty_inputs():
    from nerf_attention_tpu.experiments.summary import final_findings_lines

    lines = final_findings_lines(None, None, None, None, None)
    assert lines[0].startswith("NeRF-Attention")
    assert any("Total experiments: 0" in line for line in lines)
