"""Incremental-refit experiment: growing-cache protocol on tiny shapes."""

import json

import numpy as np
import pytest

from nerf_attention_tpu.experiments.incremental import (
    run_incremental_experiment,
)
from nerf_attention_tpu.io import kvstore


@pytest.fixture
def grown_cache(tmp_path):
    """A 2-layer cache at the FINAL length; prefixes are its earlier states."""
    rng = np.random.default_rng(0)
    final_len, d_head, heads = 96, 8, 2
    kv_dir = tmp_path / "kv"
    for layer in range(2):
        t = np.linspace(0, 1, final_len)[:, None]
        keys = (
            np.sin(2 * np.pi * 3 * t) + 0.1 * rng.standard_normal((final_len, d_head))
        )[None].repeat(heads, 0).astype(np.float32)
        values = rng.standard_normal((heads, final_len, d_head)).astype(np.float32)
        kvstore.save_layer(kv_dir, layer, keys, values)
    from nerf_attention_tpu.types import KVMetadata

    kvstore.save_metadata(
        kv_dir,
        KVMetadata(
            model_name="test",
            num_layers=2,
            num_kv_heads=heads,
            seq_len=final_len,
            head_dim=d_head,
            actual_tokens=final_len,
        ),
    )
    return kv_dir


def test_incremental_growth_protocol(tmp_path, grown_cache, figqa):
    out = tmp_path / "incr"
    results = run_incremental_experiment(
        grown_cache,
        out,
        start_len=64,
        chunk=16,
        layer_idx=0,
        max_heads=1,
        epochs_full=60,
        warm_epochs=40,
        verbose=False,
    )
    # Snapshots 64 -> 80 -> 96: one initial fit + two growth steps.
    assert [s["seq_len"] for s in results["steps"]] == [64, 80, 96]
    assert results["steps"][0]["role"] == "initial fit"
    assert results["growth_steps"] == 2
    for step in results["steps"][1:]:
        assert step["role"] == "growth step"
        # stale <= warm final (fine-tuning can only have helped the mean
        # on these smooth targets) and everything is a valid CosSim.
        assert -1.0 <= step["stale_cosine"] <= 1.0
        assert step["warm_final_cosine"] >= step["stale_cosine"] - 0.05
        if step["epochs_to_parity"] is not None:
            assert 0 <= step["epochs_to_parity"] <= 40
        assert len(step["warm_trajectory_every_50"]) == 0  # 40 < 50 epochs
    # Totals account every growth step, by parity epochs or full budget.
    assert results["total_scratch_epochs"] == 2 * 60
    assert 0 <= results["total_warm_epochs_to_parity"] <= 2 * 40
    saved = json.loads((out / "incremental_results.json").read_text())
    assert saved["final_len"] == 96
    figqa(out / "incremental_refit.png")


def test_incremental_absolute_coords_preserve_stale_quality(
    tmp_path, grown_cache
):
    """Absolute coordinates leave learned positions untouched on append, so
    the stale (0-epoch) floor must beat the relative convention's, where
    every coordinate recompresses."""
    results = {}
    for coords in ("relative", "absolute"):
        results[coords] = run_incremental_experiment(
            grown_cache,
            tmp_path / coords,
            start_len=64,
            chunk=32,
            layer_idx=0,
            max_heads=1,
            epochs_full=80,
            warm_epochs=20,
            coords=coords,
            verbose=False,
        )
        assert results[coords]["coords"] == coords
    stale = {
        c: results[c]["steps"][1]["stale_cosine"] for c in results
    }
    assert stale["absolute"] > stale["relative"]


def test_incremental_cli_wiring(tmp_path, monkeypatch):
    """The subcommand generates its own cache at the final length under
    <root>/incremental and threads start/final/chunk/warm/fm through."""
    import sys

    import nerf_attention_tpu.experiments.__main__ as cli
    import nerf_attention_tpu.synthetic as synthetic

    calls = {}
    monkeypatch.setattr(
        synthetic, "ensure_synthetic_cache",
        lambda kv_dir, **kw: calls.setdefault("ensure", (kv_dir, kw)),
    )
    monkeypatch.setattr(
        cli, "run_incremental_experiment",
        lambda kv, out, **kw: calls.setdefault("run", (kv, out, kw)),
        raising=False,
    )
    # The CLI imports the runner inside the branch; patch the module it
    # imports from instead.
    import nerf_attention_tpu.experiments.incremental as incr_mod

    monkeypatch.setattr(
        incr_mod, "run_incremental_experiment",
        lambda kv, out, **kw: calls.setdefault("run", (kv, out, kw)),
    )
    monkeypatch.setattr(
        sys, "argv",
        [
            "experiments", "incremental",
            "--results_root", str(tmp_path),
            "--kv_dir", str(tmp_path / "kv"),
            "--siren_dir", str(tmp_path / "nofits"),
            "--seq_len", "512", "--incr_chunk", "128",
            "--incr_warm_epochs", "300", "--epochs", "900",
            "--fm_mult", "64", "--values_mode", "hard",
            "--synth_layers", "2",
        ],
    )
    cli.main()
    kv_dir, ensure_kw = calls["ensure"]
    assert kv_dir == tmp_path / "incremental" / "kv_cache"
    assert ensure_kw["seq_len"] == 1024  # default final = 2x start
    assert ensure_kw["values_mode"] == "hard"
    kv, out, run_kw = calls["run"]
    assert kv == tmp_path / "incremental" / "kv_cache"
    assert out == tmp_path / "incremental"
    assert run_kw == dict(
        start_len=512, chunk=128, epochs_full=900, warm_epochs=300,
        fm_mult=64.0, coords="relative",
    )


def test_incremental_cli_absolute_coords_dir(tmp_path, monkeypatch):
    """--incr_coords absolute lands in its own dir (no artifact clobber)."""
    import sys

    import nerf_attention_tpu.experiments.__main__ as cli
    import nerf_attention_tpu.experiments.incremental as incr_mod
    import nerf_attention_tpu.synthetic as synthetic

    calls = {}
    monkeypatch.setattr(
        synthetic, "ensure_synthetic_cache",
        lambda kv_dir, **kw: calls.setdefault("ensure", (kv_dir, kw)),
    )
    monkeypatch.setattr(
        incr_mod, "run_incremental_experiment",
        lambda kv, out, **kw: calls.setdefault("run", (kv, out, kw)),
    )
    monkeypatch.setattr(
        sys, "argv",
        [
            "experiments", "incremental",
            "--results_root", str(tmp_path),
            "--kv_dir", str(tmp_path / "kv"),
            "--siren_dir", str(tmp_path / "nofits"),
            "--incr_coords", "absolute",
        ],
    )
    cli.main()
    _, out, run_kw = calls["run"]
    assert out == tmp_path / "incremental_absolute"
    assert run_kw["coords"] == "absolute"


def test_incremental_rejects_short_cache(tmp_path, grown_cache):
    with pytest.raises(ValueError, match="must exceed"):
        run_incremental_experiment(
            grown_cache, tmp_path / "o", start_len=96, verbose=False
        )
