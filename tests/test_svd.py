"""SVD ops and the SVD baseline experiment."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from nerf_attention_tpu.experiments.svd import run_svd_experiment
from nerf_attention_tpu.ops.svd import (
    randomized_svd,
    svd_rank_for_compression,
    svd_size_bytes,
    truncated_reconstruct,
)


def test_rank_formula_current_code():
    # Reference svd.py:50 at S=2048, D=128, fp16 raw accounting.
    ranks = [svd_rank_for_compression(2048, 128, cr, 2) for cr in (2, 4, 8, 16)]
    assert ranks == [30, 15, 7, 3]


def test_rank_formula_published_accounting():
    # The committed results table used fp32 raw bytes (SURVEY.md §2 #14):
    # ranks 60/30/15/7 at S=2048, D=128.
    ranks = [svd_rank_for_compression(2048, 128, cr, 4) for cr in (2, 4, 8, 16)]
    assert ranks == [60, 30, 15, 7]
    # Actual compression for rank 60 is ~1.0x (the published "2x" row).
    actual = 2048 * 128 * 2 / svd_size_bytes(2048, 128, 60)
    assert abs(actual - 1.0) < 0.01


def test_truncated_reconstruct_exact_for_low_rank(rng):
    u = rng.standard_normal((64, 4)).astype(np.float32)
    v = rng.standard_normal((4, 16)).astype(np.float32)
    m = u @ v
    recon = np.asarray(truncated_reconstruct(jnp.asarray(m), 4))
    np.testing.assert_allclose(recon, m, atol=1e-3)


def test_randomized_svd_close_to_exact(rng):
    # Fast-decaying spectrum: randomized SVD should match the exact one.
    u, _ = np.linalg.qr(rng.standard_normal((200, 20)))
    v, _ = np.linalg.qr(rng.standard_normal((40, 20)))
    s = np.geomspace(10.0, 1e-3, 20)
    m = (u * s) @ v.T
    m = m.astype(np.float32)

    ur, sr, vtr = randomized_svd(
        jnp.asarray(m), rank=10, key=jax.random.PRNGKey(1)
    )
    exact_s = np.linalg.svd(m, compute_uv=False)
    np.testing.assert_allclose(np.asarray(sr), exact_s[:10], rtol=1e-2)
    recon = np.asarray((ur * sr[None, :]) @ vtr)
    best = (u[:, :10] * s[:10]) @ v[:, :10].T
    assert np.linalg.norm(recon - m) < 1.05 * np.linalg.norm(best - m) + 1e-4


def test_svd_experiment_end_to_end(tiny_kv_dir, tmp_path):
    results = run_svd_experiment(
        tiny_kv_dir, tmp_path, target_compressions=[2.0, 4.0], verbose=False
    )
    # 3 layers x 2 heads x {K,V} x 2 ratios = 24 records (H=2 < 4 cap).
    assert len(results) == 24
    r = results[0]
    assert r["method"] == "svd"
    assert set(r) >= {
        "name", "layer", "head", "kv_type", "rank", "target_compression",
        "actual_compression", "final_cosine_mean", "raw_size_bytes",
        "svd_size_bytes", "seq_len", "d_head",
    }
    assert (tmp_path / "svd_results.json").exists()
    # SVD at mild compression should reconstruct well.
    two_x = [x for x in results if x["target_compression"] == 2.0]
    assert np.mean([x["final_cosine_mean"] for x in two_x]) > 0.5
    # Higher compression never improves mean fidelity for the same tensor.
    by_tensor = {}
    for x in results:
        by_tensor.setdefault((x["layer"], x["head"], x["kv_type"]), {})[
            x["target_compression"]
        ] = x["final_cosine_mean"]
    for fid in by_tensor.values():
        assert fid[2.0] >= fid[4.0] - 1e-6


def test_svd_experiment_published_accounting(tiny_kv_dir, tmp_path):
    results = run_svd_experiment(
        tiny_kv_dir, tmp_path, target_compressions=[2.0],
        accounting="fp32", verbose=False,
    )
    assert (tmp_path / "svd_results_published_accounting.json").exists()
    assert all(r["accounting"] == "fp32" for r in results)


def test_svd_experiment_randomized_mode(tiny_kv_dir, tmp_path):
    exact = run_svd_experiment(
        tiny_kv_dir, tmp_path / "e", target_compressions=[2.0], verbose=False
    )
    rand = run_svd_experiment(
        tiny_kv_dir, tmp_path / "r", target_compressions=[2.0],
        randomized=True, verbose=False,
    )
    for e, r in zip(exact, rand):
        assert abs(e["final_cosine_mean"] - r["final_cosine_mean"]) < 0.05
