"""Attention-output end-metric experiment: math properties + tiny e2e."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from nerf_attention_tpu.experiments.attention_error import (
    attention_outputs,
    causal_allowed,
    make_queries,
    plot_attention_error,
    run_attention_error_experiment,
)
from nerf_attention_tpu.io import kvstore
from nerf_attention_tpu.types import KVMetadata


def test_attention_outputs_matches_numpy_softmax():
    rng = np.random.default_rng(0)
    s, t, d = 12, 5, 4
    k = rng.standard_normal((s, d)).astype(np.float32)
    v = rng.standard_normal((s, d)).astype(np.float32)
    q = rng.standard_normal((t, d)).astype(np.float32)
    allowed = causal_allowed(s, t)
    out, w = attention_outputs(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(allowed)
    )
    scores = q @ k.T / np.sqrt(d)
    scores[~allowed] = -np.inf
    ref_w = np.exp(scores - scores.max(axis=-1, keepdims=True))
    ref_w /= ref_w.sum(axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(w), ref_w, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out), ref_w @ v, atol=1e-5)
    # Causal: query row t sits at position s - t + row; no weight beyond it.
    assert np.all(np.asarray(w)[~allowed] == 0.0)


def test_causal_allowed_geometry():
    m = causal_allowed(8, 3)
    assert m.shape == (3, 8)
    # Rows are positions 5, 6, 7; each sees its own prefix inclusively.
    assert m[0].sum() == 6 and m[2].sum() == 8
    # n_queries longer than the cache clamps to a full lower-triangular mask.
    full = causal_allowed(4, 99)
    assert full.shape == (4, 4) and full.sum() == 10


def test_exact_reconstruction_is_lossless():
    rng = np.random.default_rng(1)
    s, t, d = 16, 4, 4
    k = rng.standard_normal((s, d)).astype(np.float32)
    v = rng.standard_normal((s, d)).astype(np.float32)
    q = rng.standard_normal((t, d)).astype(np.float32)
    allowed = jnp.asarray(causal_allowed(s, t))
    o1, w1 = attention_outputs(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), allowed)
    o2, w2 = attention_outputs(
        jnp.asarray(q), jnp.asarray(k.copy()), jnp.asarray(v.copy()), allowed
    )
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_value_only_error_keeps_weights_exact():
    """(K, V-hat) shares the exact attention weights — V error is linear."""
    rng = np.random.default_rng(2)
    s, t, d = 16, 4, 4
    k = rng.standard_normal((s, d)).astype(np.float32)
    v = rng.standard_normal((s, d)).astype(np.float32)
    v_hat = v + 0.1 * rng.standard_normal((s, d)).astype(np.float32)
    q = rng.standard_normal((t, d)).astype(np.float32)
    allowed = jnp.asarray(causal_allowed(s, t))
    _, w_exact = attention_outputs(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), allowed)
    o_hat, w_hat = attention_outputs(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v_hat), allowed
    )
    np.testing.assert_array_equal(np.asarray(w_hat), np.asarray(w_exact))
    np.testing.assert_allclose(
        np.asarray(o_hat), np.asarray(w_exact) @ v_hat, atol=1e-5
    )


def test_gain_sharpens_matched_queries():
    """Higher logit gain concentrates the softmax: entropy must fall and
    the own-position argmax rate must not degrade."""
    rng = np.random.default_rng(3)
    h, s, d = 1, 64, 16
    keys = rng.standard_normal((h, s, d)).astype(np.float32)
    q_matched, q_diffuse = make_queries(keys, n_queries=16, seed=0)
    assert q_matched.shape == (1, 16, d) and q_diffuse.shape == (1, 16, d)
    allowed = jnp.asarray(causal_allowed(s, 16))
    v = rng.standard_normal((s, d)).astype(np.float32)
    own = np.arange(s - 16, s)

    def entropy_and_own(gain):
        _, w = attention_outputs(
            jnp.asarray(gain * q_matched[0]), jnp.asarray(keys[0]),
            jnp.asarray(v), allowed,
        )
        w = np.asarray(w)
        with np.errstate(divide="ignore", invalid="ignore"):
            ent = -np.where(w > 0, w * np.log(w), 0.0).sum(-1).mean()
        return ent, (w.argmax(axis=-1) == own).mean()

    e1, own1 = entropy_and_own(1.0)
    e8, own8 = entropy_and_own(8.0)
    assert e8 < e1
    # i.i.d. keys have no twins: matched queries retrieve their own row.
    assert own1 >= 0.7 and own8 >= own1
    # Heavy key noise must disturb the sharp-regime argmax.
    k_noisy = keys[0] + 1.0 * keys[0].std() * rng.standard_normal((s, d)).astype(
        np.float32
    )
    _, w_exact = attention_outputs(
        jnp.asarray(8.0 * q_matched[0]), jnp.asarray(keys[0]), jnp.asarray(v), allowed
    )
    _, w_noisy = attention_outputs(
        jnp.asarray(8.0 * q_matched[0]), jnp.asarray(k_noisy), jnp.asarray(v), allowed
    )
    agree = (np.asarray(w_noisy).argmax(-1) == np.asarray(w_exact).argmax(-1)).mean()
    assert agree < 1.0


@pytest.fixture
def tiny_cache(tmp_path):
    rng = np.random.default_rng(0)
    seq_len, d_head, heads, layers = 48, 8, 2, 2
    kv_dir = tmp_path / "kv"
    t = np.linspace(0, 1, seq_len)[:, None]
    for layer in range(layers):
        keys = (
            np.sin(2 * np.pi * (layer + 2) * t)
            + 0.1 * rng.standard_normal((seq_len, d_head))
        )[None].repeat(heads, 0).astype(np.float32)
        values = rng.standard_normal((heads, seq_len, d_head)).astype(np.float32)
        kvstore.save_layer(kv_dir, layer, keys, values)
    kvstore.save_metadata(
        kv_dir,
        KVMetadata(
            model_name="test", num_layers=layers, num_kv_heads=heads,
            seq_len=seq_len, head_dim=d_head, actual_tokens=seq_len,
        ),
    )
    return kv_dir


def test_attention_error_experiment_tiny(tmp_path, tiny_cache, figqa):
    out = tmp_path / "attn"
    results = run_attention_error_experiment(
        tiny_cache, out,
        layers=(0, 5),  # 5 clips to the cache's last layer (1)
        max_heads=1, config_name="tiny", epochs=40, n_queries=16,
        gains=(1.0, 8.0), verbose=False,
    )
    assert [r["layer"] for r in results["layers"]] == [0, 1]
    on_disk = json.loads((out / "attention_error_results.json").read_text())
    assert on_disk["n_queries"] == 16
    assert on_disk["gains"] == [1.0, 8.0]
    for row in results["layers"]:
        assert 0 < row["key_fit_cosine"] <= 1.0
        assert set(row["regimes"]) == {"diffuse", "matched_g1", "matched_g8"}
        # The gain sweep is the sharpness axis: entropy must fall with gain.
        assert (
            row["regimes"]["matched_g8"]["exact_entropy_nats"]
            < row["regimes"]["matched_g1"]["exact_entropy_nats"]
        )
        for regime in ("matched_g1", "matched_g8", "diffuse"):
            variants = row["regimes"][regime]["variants"]
            for name in ("full", "keys_only", "values_only"):
                m = variants[name]
                assert -1.0 <= m["output_cosine_mean"] <= 1.0
                assert 0.0 <= m["attn_tv_mean"] <= 1.0 + 1e-6
                assert 0.0 <= m["top1_agreement"] <= 1.0
            # V-only never disturbs the weights; K-only always can.
            assert variants["values_only"]["attn_tv_mean"] <= 1e-6
            assert variants["values_only"]["top1_agreement"] == 1.0
    figs = tmp_path / "figs"
    plot_attention_error(results, figs)
    figqa(figs / "attention_error.png")


def test_attention_error_storage_schemes(tmp_path, tiny_cache):
    """Quantized-payload rows: fp16 storage is output-transparent."""
    results = run_attention_error_experiment(
        tiny_cache, tmp_path / "attn",
        layers=(0,), max_heads=1, config_name="tiny", epochs=30,
        n_queries=8, gains=(8.0,), schemes=("fp16", "int8", "int4_qat"),
        verbose=False,
    )
    assert results["schemes"] == ["fp16", "int8", "int4_qat"]
    row = results["layers"][0]
    assert set(row["storage"]) == {"fp16", "int8", "int4_qat"}
    base = row["regimes"]["matched_g8"]["variants"]["full"]["output_cosine_mean"]
    fp16 = row["storage"]["fp16"]
    assert set(fp16["regimes"]) == {"diffuse", "matched_g8"}
    assert abs(
        fp16["regimes"]["matched_g8"]["variants"]["full"]["output_cosine_mean"]
        - base
    ) < 2e-3
    for block in row["storage"].values():
        assert -1.0 <= block["key_proxy_cosine"] <= 1.0
        assert -1.0 <= block["value_proxy_cosine"] <= 1.0
    # The figure's stored-payload overlay branch renders too.
    figs = tmp_path / "figs"
    plot_attention_error(results, figs)
    from tests.conftest import assert_figure_png

    assert_figure_png(figs / "attention_error.png")


def test_attention_error_rejects_bad_schemes_before_fitting(
    tmp_path, tiny_cache, monkeypatch
):
    """Scheme typos must fail before any device time is spent."""
    import nerf_attention_tpu.experiments.attention_error as mod

    def boom(*a, **k):
        raise AssertionError("fit_batch must not run for an invalid scheme")

    monkeypatch.setattr(mod, "fit_batch", boom)
    with pytest.raises(ValueError, match="scheme"):
        run_attention_error_experiment(
            tiny_cache, tmp_path / "attn", layers=(0,), epochs=5,
            schemes=("bogus",), verbose=False,
        )
    with pytest.raises(ValueError, match="QAT"):
        run_attention_error_experiment(
            tiny_cache, tmp_path / "attn", layers=(0,), epochs=5,
            schemes=("fp16_qat",), verbose=False,
        )


def test_attention_error_cli_wiring(tmp_path, tiny_cache, monkeypatch, capsys):
    """Subcommand reaches the runner with CLI args threaded through."""
    import sys

    import nerf_attention_tpu.experiments.__main__ as cli

    calls = {}

    def fake_run(kv_dir, out_dir, **kw):
        calls.update(kw, kv_dir=kv_dir, out_dir=out_dir)
        return {"layers": [], "config": "medium"}

    monkeypatch.setattr(
        "nerf_attention_tpu.experiments.attention_error."
        "run_attention_error_experiment",
        fake_run,
    )
    monkeypatch.setattr(
        "nerf_attention_tpu.experiments.attention_error.plot_attention_error",
        lambda *a, **k: None,
    )
    monkeypatch.setattr(
        sys, "argv",
        [
            "experiments", "attention_error",
            "--kv_dir", str(tiny_cache),
            "--results_root", str(tmp_path / "root"),
            "--attn_layers", "0", "1",
            "--attn_queries", "8",
            "--attn_gains", "2", "16",
            "--epochs", "7",
            "--qat_epochs", "11",
        ],
    )
    cli.main()
    assert calls["layers"] == (0, 1)
    assert calls["n_queries"] == 8
    assert calls["gains"] == (2.0, 16.0)
    assert calls["epochs"] == 7
    assert calls["qat_epochs"] == 11
    assert calls["kv_dir"] == tiny_cache
