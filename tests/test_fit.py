"""Fit engine: convergence, normalization numerics, batch/single consistency."""

import jax.numpy as jnp
import numpy as np

from nerf_attention_tpu.fit import fit_siren, result_to_record
from nerf_attention_tpu.parallel.sweep import (
    cosine_similarity,
    fit_batch,
    normalize_targets,
)
from nerf_attention_tpu.types import SIRENConfig

TINY = SIRENConfig(32, 1, 30.0, "t")


def _smooth_target(seq_len=128, d_head=8):
    t = np.linspace(0, 1, seq_len)[:, None]
    freqs = np.arange(1, d_head + 1)[None, :]
    return (np.sin(2 * np.pi * freqs * t) + 0.1 * freqs * t).astype(np.float32)


def test_normalize_matches_torch_semantics(rng):
    x = rng.standard_normal((50, 6)).astype(np.float32)
    norm, mean, std = normalize_targets(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mean)[0], x.mean(axis=0), atol=1e-5)
    # torch .std() is unbiased (ddof=1)
    np.testing.assert_allclose(np.asarray(std)[0], x.std(axis=0, ddof=1), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(norm), (x - x.mean(0)) / np.maximum(x.std(0, ddof=1), 1e-3),
        atol=1e-4,
    )


def test_normalize_clamps_tiny_std():
    x = jnp.ones((10, 3)) * 5.0  # zero variance
    _, _, std = normalize_targets(x)
    np.testing.assert_allclose(np.asarray(std), 1e-3)


def test_cosine_similarity_matches_torch_formula(rng):
    a = rng.standard_normal((20, 8)).astype(np.float32)
    b = rng.standard_normal((20, 8)).astype(np.float32)
    got = np.asarray(cosine_similarity(jnp.asarray(a), jnp.asarray(b)))
    want = (a * b).sum(1) / (
        np.maximum(np.linalg.norm(a, axis=1), 1e-8)
        * np.maximum(np.linalg.norm(b, axis=1), 1e-8)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
    # Identical rows -> 1.0
    same = np.asarray(cosine_similarity(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(same, 1.0, atol=1e-5)


def test_single_fit_converges_on_smooth_signal():
    target = _smooth_target()
    result = fit_siren(
        target, SIRENConfig(64, 1, 30.0, "t64"), epochs=2000, verbose=False
    )
    assert result.final_cosine_mean > 0.97
    assert result.final_mse < 0.05
    # Loss history is recorded per epoch and decreases overall.
    assert len(result.losses) == 2000
    assert result.losses[-1] < result.losses[0] * 0.5
    assert result.seq_len == 128 and result.d_head == 8
    # Compression accounting: raw fp16 bytes / fp32 param bytes.
    assert result.raw_size_bytes == 128 * 8 * 2
    assert result.siren_size_bytes == result.num_parameters * 4


def test_batch_matches_individual_fits(rng):
    targets = np.stack(
        [_smooth_target(), _smooth_target() * 2.0 + 1.0], axis=0
    )
    batch = fit_batch(targets, TINY, epochs=300, seed=7)
    for i in range(2):
        # Per-fit PRNG keys differ between batch layouts, so compare quality
        # (init-invariant at convergence), not bits.
        single = fit_batch(targets[i][None], TINY, epochs=300, seed=7)
        assert abs(float(batch.cosine_mean[i]) - float(single.cosine_mean[0])) < 0.05
    assert batch.num_fits == 2
    assert batch.losses.shape == (2, 300)
    assert batch.cosine_sims.shape == (2, 128)


def test_record_schema_matches_reference():
    target = _smooth_target(64, 4)
    result = fit_siren(target, TINY, epochs=50, verbose=False)
    record = result_to_record("L0_H0_key_t", 0, 0, "key", result)
    expected_keys = {
        "name", "layer", "head", "kv_type", "config_name", "hidden_features",
        "hidden_layers", "omega_0", "final_mse", "final_cosine_mean",
        "final_cosine_min", "final_cosine_std", "compression_ratio",
        "raw_size_bytes", "siren_size_bytes", "train_time_seconds",
        "num_parameters", "seq_len", "d_head",
    }
    assert set(record) == expected_keys
    assert isinstance(record["final_cosine_mean"], float)


def test_deterministic_given_seed():
    target = _smooth_target(64, 4)
    a = fit_batch(target[None], TINY, epochs=100, seed=3)
    b = fit_batch(target[None], TINY, epochs=100, seed=3)
    np.testing.assert_array_equal(a.final_mse, b.final_mse)


def test_sweep_sizes_correct_without_param_pull(tiny_kv_dir, tmp_path):
    """Non-checkpointing groups skip the device->host param pull; their
    record sizes must still equal the true parameter counts."""
    from nerf_attention_tpu.fit import fit_kv_cache
    from nerf_attention_tpu.types import CONFIGS_QUICK

    records = fit_kv_cache(tiny_kv_dir, tmp_path, epochs=20, quick=True, verbose=False)
    by_name = {c.name: c for c in CONFIGS_QUICK}
    for r in records:
        config = by_name[r["config_name"]]
        assert r["num_parameters"] == config.num_parameters(r["d_head"])
        assert r["siren_size_bytes"] == r["num_parameters"] * 4
    # Only the medium group writes checkpoints; its params did get pulled.
    assert list(tmp_path.glob("*medium_model.npz"))


def test_sweep_resume_skips_completed_groups(tiny_kv_dir, tmp_path, capsys):
    from nerf_attention_tpu.fit import fit_kv_cache

    first = fit_kv_cache(tiny_kv_dir, tmp_path, epochs=30, quick=True, verbose=False)
    # Drop one config's records to simulate a crash mid-sweep.
    import json

    results_path = tmp_path / "fit_results.json"
    records = json.loads(results_path.read_text())
    kept = [r for r in records if r["config_name"] != "medium"]
    results_path.write_text(json.dumps(kept))

    resumed = fit_kv_cache(
        tiny_kv_dir, tmp_path, epochs=30, quick=True, verbose=True, resume=True
    )
    out = capsys.readouterr().out
    assert "Resume: skipping completed groups ['small']" in out
    assert len(resumed) == len(first)
    # The skipped group's records are identical to the first run's.
    small_first = sorted(
        (r["name"], r["final_cosine_mean"]) for r in first if r["config_name"] == "small"
    )
    small_resumed = sorted(
        (r["name"], r["final_cosine_mean"]) for r in resumed if r["config_name"] == "small"
    )
    assert small_first == small_resumed


def test_resume_keeps_later_done_groups_durable(tiny_kv_dir, tmp_path, monkeypatch):
    """A resumed group later in config order must hit disk up front.

    Previously resumed records were appended lazily when their slot came up
    in collect order, so a crash while an earlier group was training wiped
    a later already-complete group from fit_results.json.
    """
    import json

    import pytest

    import nerf_attention_tpu.fit as fit_mod
    from nerf_attention_tpu.fit import fit_kv_cache

    fit_kv_cache(tiny_kv_dir, tmp_path, epochs=30, quick=True, verbose=False)
    results_path = tmp_path / "fit_results.json"
    records = json.loads(results_path.read_text())
    # Keep only 'medium' — the LATER group in CONFIGS_QUICK order — so the
    # resume run must re-train 'small' first.
    done = [r for r in records if r["config_name"] == "medium"]
    results_path.write_text(json.dumps(done))

    def boom(*args, **kwargs):
        raise RuntimeError("simulated crash before any new group completes")

    monkeypatch.setattr(fit_mod, "fit_batch_dispatch", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        fit_kv_cache(
            tiny_kv_dir, tmp_path, epochs=30, quick=True, verbose=False, resume=True
        )

    on_disk = json.loads(results_path.read_text())
    assert sorted((r["name"], r["final_cosine_mean"]) for r in on_disk) == sorted(
        (r["name"], r["final_cosine_mean"]) for r in done
    )


def test_resume_rejects_parameter_mismatch(tiny_kv_dir, tmp_path, capsys):
    """A prior run with different epochs must be rerun, not adopted."""
    from nerf_attention_tpu.fit import fit_kv_cache

    fit_kv_cache(tiny_kv_dir, tmp_path, epochs=20, quick=True, verbose=False)
    resumed = fit_kv_cache(
        tiny_kv_dir, tmp_path, epochs=40, quick=True, verbose=True, resume=True
    )
    out = capsys.readouterr().out
    assert "different parameters" in out
    assert "skipping completed groups" not in out
    assert len(resumed) == 12  # full rerun at the new epoch count


def test_sweep_rejects_empty_kv_dir(tmp_path):
    """metadata.json without layer files must raise early, not wipe results."""
    import pytest

    from nerf_attention_tpu.fit import fit_kv_cache
    from nerf_attention_tpu.io import kvstore
    from nerf_attention_tpu.types import KVMetadata

    kv_dir = tmp_path / "kv_cache"
    kv_dir.mkdir()
    kvstore.save_metadata(
        kv_dir,
        KVMetadata(
            model_name="t", num_layers=4, num_kv_heads=2, seq_len=64,
            head_dim=8, actual_tokens=64,
        ),
    )
    out = tmp_path / "fits"
    with pytest.raises(FileNotFoundError, match="no layer files"):
        fit_kv_cache(kv_dir, out, epochs=10, quick=True, verbose=False)
    # A prior good fit_results.json must survive the failed resume attempt.
    out.mkdir(exist_ok=True)
    (out / "fit_results.json").write_text('[{"name": "keep"}]')
    with pytest.raises(FileNotFoundError):
        fit_kv_cache(kv_dir, out, epochs=10, quick=True, verbose=False, resume=True)
    assert (out / "fit_results.json").read_text() == '[{"name": "keep"}]'


def test_sweep_recovers_from_torn_meta_stamp(tiny_kv_dir, tmp_path):
    """A crash mid-write of sweep_meta.json must not brick later sweeps."""
    from nerf_attention_tpu.fit import fit_kv_cache

    (tmp_path / "sweep_meta.json").write_text('{"epochs": 3')  # torn JSON
    records = fit_kv_cache(
        tiny_kv_dir, tmp_path, epochs=10, quick=True, verbose=False
    )
    assert records
    import json

    assert json.loads((tmp_path / "sweep_meta.json").read_text())["epochs"] == 10


def test_fit_batch_fm_mult(rng):
    """fm_mult changes results vs shared omega and (since r4) trains on the
    fused kernel too, landing at the same optimum as the XLA path."""
    from nerf_attention_tpu.parallel.sweep import fit_batch
    from nerf_attention_tpu.types import SIRENConfig

    config = SIRENConfig(16, 1, 30.0, "t")
    targets = rng.standard_normal((2, 48, 8)).astype(np.float32)
    base = fit_batch(targets, config, epochs=100, seed=0)
    fm = fit_batch(targets, config, epochs=100, seed=0, fm_mult=4.0)
    assert fm.cosine_mean.shape == (2,)
    assert not np.allclose(fm.cosine_mean, base.cosine_mean, atol=1e-5)
    fm_pal = fit_batch(
        targets, config, epochs=100, seed=0, impl="pallas", fm_mult=4.0
    )
    np.testing.assert_allclose(fm_pal.cosine_mean, fm.cosine_mean, atol=2e-3)


def test_fit_kv_cache_fm_checkpoint_roundtrip(tmp_path, rng):
    """--fm_mult sweeps record the spread in medium checkpoints, and the
    evaluate reconstruction honors it (matches the recorded quality)."""
    from nerf_attention_tpu.evaluate import _checkpoint_forward
    from nerf_attention_tpu.fit import fit_kv_cache
    from nerf_attention_tpu.io import checkpoint, kvstore
    from nerf_attention_tpu.synthetic import generate_synthetic_kv

    kv_dir = tmp_path / "kv"
    generate_synthetic_kv(
        seq_len=48, num_layers=2, num_kv_heads=1, head_dim=8,
        output_dir=kv_dir, verbose=False,
    )
    fit_kv_cache(
        kv_dir, tmp_path / "fits", epochs=150, quick=True, verbose=False,
        fm_mult=4.0,
    )
    import json

    meta = json.loads((tmp_path / "fits" / "sweep_meta.json").read_text())
    assert meta["fm_mult"] == 4.0
    assert set(meta["impl"].values()) == {"xla"}

    ckpt_files = checkpoint.checkpoint_glob(tmp_path / "fits")
    assert ckpt_files
    ckpt = checkpoint.load_siren_checkpoint(ckpt_files[0])
    assert ckpt["fm_mult"] == 4.0

    metrics = ckpt["metrics"]
    keys, values = kvstore.load_layer(kv_dir, metrics["layer"])
    original = (keys if metrics["kv_type"] == "key" else values)[metrics["head"]]
    pred = _checkpoint_forward(ckpt, original.shape[0])
    num = (pred * original).sum(axis=1)
    den = np.linalg.norm(pred, axis=1) * np.linalg.norm(original, axis=1)
    cos = float((num / np.maximum(den, 1e-8)).mean())
    import pytest

    assert cos == pytest.approx(metrics["final_cosine_mean"], abs=1e-4)
