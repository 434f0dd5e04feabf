"""Fused attention-from-parameters kernel vs the two-pass XLA oracle.

The kernel (`ops/siren_attention_pallas.py`) reconstructs K/V tiles in VMEM
and consumes them with an online softmax; the oracle materializes the same
reconstructions and runs exact masked attention
(`experiments.attention_error.attention_outputs`). Both run the identical
layer stack, so parity is tight fp32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_attention_tpu.models.siren import init_siren
from nerf_attention_tpu.ops.siren_attention_pallas import (
    siren_attention_decode,
    siren_attention_decode_reference,
)
from nerf_attention_tpu.types import SIRENConfig

D = 32


def _heads(n, config, seed=0):
    """n (key-net, value-net) pairs with leading head axis + denorm stats."""
    keys = jax.random.split(jax.random.PRNGKey(seed), 2 * n + 2)
    stack = lambda plist: [
        (jnp.stack([p[i][0] for p in plist]), jnp.stack([p[i][1] for p in plist]))
        for i in range(len(plist[0]))
    ]
    k_params = stack([init_siren(keys[i], config, out_features=D) for i in range(n)])
    v_params = stack(
        [init_siren(keys[n + i], config, out_features=D) for i in range(n)]
    )
    k_mean = jax.random.normal(keys[-2], (n, 1, D)) * 0.3
    v_mean = jax.random.normal(keys[-1], (n, 1, D)) * 0.3
    k_std = jnp.abs(k_mean) + 0.7
    v_std = jnp.abs(v_mean) + 0.5
    return k_params, v_params, k_mean, k_std, v_mean, v_std


def _queries(n, t, seed=1):
    return jax.random.normal(jax.random.PRNGKey(seed), (n, t, D)) * 0.8


@pytest.mark.parametrize("causal", [True, False], ids=["causal", "full"])
def test_fused_attention_matches_oracle(causal):
    config = SIRENConfig(64, 2, 30.0, "t64")
    args = _heads(2, config)
    q = _queries(2, 8)
    want = np.asarray(
        siren_attention_decode_reference(*args, q, 30.0, 300, causal=causal)
    )
    got = np.asarray(
        siren_attention_decode(*args, q, 30.0, 300, causal=causal, tile=128)
    )
    assert got.shape == want.shape == (2, 8, D)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_single_query_decode_step():
    """T=1, one head — the autoregressive serving step; causal == full."""
    config = SIRENConfig(64, 1, 30.0, "tiny")
    args = _heads(1, config, seed=3)
    q = _queries(1, 1, seed=4)
    want = np.asarray(siren_attention_decode_reference(*args, q, 30.0, 257))
    got = np.asarray(siren_attention_decode(*args, q, 30.0, 257, tile=64))
    full = np.asarray(siren_attention_decode(*args, q, 30.0, 257, causal=False, tile=64))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(got, full, atol=5e-5, rtol=1e-4)


def test_causal_mask_actually_masks():
    """The causal output must differ from full attention for early queries
    (they see a strict prefix), and the final row must agree."""
    config = SIRENConfig(64, 1, 30.0, "tiny")
    args = _heads(1, config, seed=5)
    q = _queries(1, 16, seed=6)
    causal = np.asarray(siren_attention_decode(*args, q, 30.0, 200, tile=64))
    full = np.asarray(
        siren_attention_decode(*args, q, 30.0, 200, causal=False, tile=64)
    )
    assert not np.allclose(causal[0, 0], full[0, 0], atol=1e-4)
    np.testing.assert_allclose(causal[0, -1], full[0, -1], atol=5e-5, rtol=1e-4)


def test_fm_attention_matches_oracle():
    config = SIRENConfig(64, 2, 30.0, "t64")
    args = _heads(2, config, seed=7)
    q = _queries(2, 4, seed=8)
    want = np.asarray(
        siren_attention_decode_reference(*args, q, 30.0, 150, fm_mult=64.0)
    )
    got = np.asarray(
        siren_attention_decode(*args, q, 30.0, 150, fm_mult=64.0, tile=64)
    )
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)
    plain = np.asarray(siren_attention_decode(*args, q, 30.0, 150, tile=64))
    assert not np.allclose(got, plain, atol=1e-3)  # mult not silently dropped


def test_exact_sin_variant():
    config = SIRENConfig(64, 1, 30.0, "tiny")
    args = _heads(1, config, seed=9)
    q = _queries(1, 2, seed=10)
    want = np.asarray(
        siren_attention_decode_reference(*args, q, 30.0, 100, sin_impl="exact")
    )
    got = np.asarray(
        siren_attention_decode(*args, q, 30.0, 100, sin_impl="exact", tile=64)
    )
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_unaligned_seq_and_tile_padding():
    """seq_len not a multiple of the tile: padded positions carry zero
    weight, so results match a run whose tile divides seq_len exactly."""
    config = SIRENConfig(64, 1, 30.0, "tiny")
    args = _heads(1, config, seed=11)
    q = _queries(1, 3, seed=12)
    a = np.asarray(siren_attention_decode(*args, q, 30.0, 130, tile=64))
    b = np.asarray(siren_attention_decode(*args, q, 30.0, 130, tile=65))
    want = np.asarray(siren_attention_decode_reference(*args, q, 30.0, 130))
    np.testing.assert_allclose(a, want, atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(b, want, atol=5e-5, rtol=1e-4)


def test_sharded_attention_matches_local():
    """shard_map over the head axis on the 8-device CPU mesh == local."""
    from nerf_attention_tpu.ops.siren_attention_pallas import (
        siren_attention_decode_sharded,
    )
    from nerf_attention_tpu.parallel.mesh import fit_mesh

    config = SIRENConfig(32, 1, 30.0, "t32")
    args = _heads(8, config, seed=15)
    q = _queries(8, 2, seed=16)
    mesh = fit_mesh()
    got = np.asarray(
        siren_attention_decode_sharded(*args, q, 30.0, 128, mesh, interpret=True)
    )
    want = np.asarray(siren_attention_decode(*args, q, 30.0, 128, tile=64))
    assert got.shape == (8, 2, D)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_sharded_attention_rejects_ragged():
    from nerf_attention_tpu.ops.siren_attention_pallas import (
        siren_attention_decode_sharded,
    )
    from nerf_attention_tpu.parallel.mesh import fit_mesh

    config = SIRENConfig(16, 1, 30.0, "t")
    args = _heads(6, config, seed=17)  # 6 % 8 != 0
    q = _queries(6, 1, seed=18)
    with pytest.raises(ValueError, match="divisible"):
        siren_attention_decode_sharded(*args, q, 30.0, 64, fit_mesh(), interpret=True)


def test_softmax_normalization():
    """With identical value nets collapsed to a constant, the attention
    output must equal that constant regardless of key content — the online
    softmax denominator is exact."""
    config = SIRENConfig(64, 1, 30.0, "tiny")
    k_params, v_params, k_mean, k_std, v_mean, v_std = _heads(1, config, seed=13)
    v_std = jnp.zeros_like(v_std)  # v_hat == v_mean everywhere
    q = _queries(1, 4, seed=14)
    got = np.asarray(
        siren_attention_decode(
            k_params, v_params, k_mean, k_std, v_mean, v_std, q, 30.0, 192, tile=64
        )
    )
    want = np.broadcast_to(np.asarray(v_mean), (1, 4, D))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)
