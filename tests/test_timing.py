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
