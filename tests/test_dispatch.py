"""Dispatch/collect sweep API, tracing hook, and the compile-cache helper."""

import json
from pathlib import Path

import numpy as np

from nerf_attention_tpu.parallel.sweep import (
    fit_batch,
    fit_batch_collect,
    fit_batch_dispatch,
)
from nerf_attention_tpu.types import SIRENConfig

TINY = SIRENConfig(32, 1, 30.0, "tiny32")


def _targets(n=3, s=64, d=8):
    rng = np.random.default_rng(0)
    return rng.standard_normal((n, s, d)).astype(np.float32)


def test_dispatch_collect_matches_fit_batch():
    targets = _targets()
    sync = fit_batch(targets, TINY, epochs=50, seed=1)
    handle = fit_batch_dispatch(targets, TINY, epochs=50, seed=1)
    async_ = fit_batch_collect(handle, train_time_seconds=0.0)
    np.testing.assert_array_equal(sync.final_mse, async_.final_mse)
    np.testing.assert_array_equal(sync.cosine_mean, async_.cosine_mean)
    assert async_.num_fits == 3


def test_overlapped_dispatch_of_two_groups():
    targets = _targets()
    h1 = fit_batch_dispatch(targets, TINY, epochs=30, seed=1)
    h2 = fit_batch_dispatch(targets, SIRENConfig(16, 1, 30.0, "t16"), epochs=30, seed=2)
    b2 = fit_batch_collect(h2, 0.0)  # out-of-order collection is fine
    b1 = fit_batch_collect(h1, 0.0)
    assert np.isfinite(b1.final_mse).all() and np.isfinite(b2.final_mse).all()


def test_trace_context_writes_profile(tmp_path):
    import jax
    import jax.numpy as jnp

    from nerf_attention_tpu.utils.tracing import annotate, trace

    with trace(tmp_path / "prof"):
        with annotate("tiny-op"):
            jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    produced = list((tmp_path / "prof").rglob("*"))
    assert produced, "profiler trace directory is empty"


def test_trace_none_is_noop():
    from nerf_attention_tpu.utils.tracing import trace

    with trace(None):
        pass


def test_compile_cache_enable(tmp_path, monkeypatch):
    import jax

    from nerf_attention_tpu.utils import compile_cache

    prior = jax.config.jax_compilation_cache_dir
    try:
        if prior:  # helper must respect an existing setting
            compile_cache.enable(tmp_path / "cc")
            assert jax.config.jax_compilation_cache_dir == prior
        else:
            compile_cache.enable(tmp_path / "cc")
            assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")
    finally:
        jax.config.update("jax_compilation_cache_dir", prior)
