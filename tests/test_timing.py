"""Timing utilities: sanity on CPU (real measurement happens on TPU)."""

import jax

from nerf_attention_tpu.models.siren import init_siren
from nerf_attention_tpu.utils.timing import (
    measured_hbm_read_ms,
    time_siren_forward_ms,
)
from nerf_attention_tpu.types import SIRENConfig


def test_siren_forward_timer_positive():
    config = SIRENConfig(32, 1, 30.0, "t")
    params = init_siren(jax.random.PRNGKey(0), config, out_features=8)
    t = time_siren_forward_ms(params, 30.0, 64, reps=50)
    assert t > 0


def test_hbm_read_timer_positive():
    t = measured_hbm_read_ms(64, 16, reps=100)
    assert t >= 0


def test_hbm_stream_read_timer_positive():
    from nerf_attention_tpu.utils.timing import measured_hbm_stream_read_ms

    t = measured_hbm_stream_read_ms(4, 64, 16, reps=20)
    assert t >= 0


def test_stats_mode_returns_replicate_spread():
    from nerf_attention_tpu.utils.timing import (
        measured_hbm_read_ms,
        replicate_stats,
    )

    st = measured_hbm_read_ms(64, 16, reps=50, samples=5, stats=True)
    assert set(st) >= {"median", "q25", "q75", "iqr", "n"}
    assert st["n"] == 5
    assert st["q25"] <= st["median"] <= st["q75"]
    assert st["iqr"] >= 0

    r = replicate_stats([3.0, 1.0, 2.0])
    assert r["median"] == 2.0 and r["n"] == 3


def test_siren_forward_timer_stats_and_bf16():
    import jax.numpy as jnp

    config = SIRENConfig(32, 1, 30.0, "t")
    params = init_siren(jax.random.PRNGKey(0), config, out_features=8)
    st = time_siren_forward_ms(params, 30.0, 64, reps=30, samples=5, stats=True)
    assert st["n"] == 5 and st["median"] > 0
    t_bf16 = time_siren_forward_ms(
        params, 30.0, 64, reps=30, compute_dtype=jnp.bfloat16
    )
    assert t_bf16 > 0


def test_trace_context_manager(tmp_path, capsys):
    """trace() must import cleanly and write a trace dir; its completion
    message goes to stderr (stdout is bench.py's JSON contract). Regression:
    a broken edit once left tracing.py with an IndentationError that only
    the fit CLI's unconditional import surfaced."""
    import jax.numpy as jnp

    from nerf_attention_tpu.utils.tracing import annotate, trace

    with trace(None):
        pass  # no-op path

    with trace(tmp_path / "tr"):
        with annotate("region"):
            jnp.ones(4).sum().block_until_ready()
    out = capsys.readouterr()
    assert "Profiler trace written" in out.err
    assert out.out == ""
    assert any((tmp_path / "tr").rglob("*"))
