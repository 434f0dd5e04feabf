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


def test_incremental_rejects_short_cache(tmp_path, grown_cache):
    with pytest.raises(ValueError, match="must exceed"):
        run_incremental_experiment(
            grown_cache, tmp_path / "o", start_len=96, verbose=False
        )
