"""Sequence-parallel prefill parity (llama_prefill_kv_sp vs single-device).

The reference extraction is single-device and OOMs at S=8192 on 8 GB
(`/root/reference/nerf_attention/experiments/scaling.py:111-116`); the
TPU-native rebuild shards the token axis over the mesh instead. These tests
assert the sharded program is the SAME function: identical post-RoPE KV
(up to collective reduction-order fp noise) across every family-specific
attention variant — GQA, uniform sliding window, Gemma2 sandwich norms +
logit softcap + alternating per-layer windows, and Gemma3 dual rope tables —
since each exercises a different piece of the global-coordinate masking and
per-shard rope construction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from nerf_attention_tpu.models.llama_jax import (
    LlamaConfig,
    init_random_llama,
    llama_prefill_kv,
    llama_prefill_kv_sp,
)


def _sp_mesh(n: int = 4) -> Mesh:
    return Mesh(np.array(jax.devices()[:n]), ("sp",))


def _assert_sp_parity(config: LlamaConfig, seq_len: int = 32, n_dev: int = 4):
    params = init_random_llama(config)
    ids = jnp.asarray(np.arange(seq_len, dtype=np.int32) % config.vocab_size)
    k_ref, v_ref = llama_prefill_kv(config, params, ids)
    k_sp, v_sp = llama_prefill_kv_sp(config, params, ids, _sp_mesh(n_dev))
    assert k_sp.shape == k_ref.shape
    np.testing.assert_allclose(np.asarray(k_sp), np.asarray(k_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_sp), np.asarray(v_ref), atol=1e-5)


def test_sp_parity_gqa_llama():
    """Plain Llama-style GQA: the baseline SP path."""
    _assert_sp_parity(
        LlamaConfig(
            vocab_size=64, hidden_size=16, intermediate_size=32,
            num_hidden_layers=3, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8,
        )
    )


def test_sp_parity_sliding_window():
    """Mistral-style uniform window: the mask crosses shard boundaries (a
    window of 6 rows spans the 8-row shards), so any local-coordinate bug
    in the windowed mask shows up as a KV/hidden mismatch."""
    _assert_sp_parity(
        LlamaConfig(
            vocab_size=64, hidden_size=16, intermediate_size=32,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, head_dim=8, sliding_window=6,
        )
    )


def test_sp_parity_gemma2_style():
    """Sandwich norms + logit softcap + alternating per-layer windows."""
    _assert_sp_parity(
        LlamaConfig(
            vocab_size=64, hidden_size=16, intermediate_size=32,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8,
            hidden_act="gelu_pytorch_tanh", norm_offset=True,
            scale_embeddings=True, sandwich_norms=True,
            attn_logit_softcap=50.0, attn_scale=0.125,
            layer_windows=(6, None, 6, None),
        )
    )


def test_sp_parity_gemma3_style():
    """Dual rope tables (local base on sliding layers) + QK-norm: the SP
    rope tables are rebuilt per shard at global positions for BOTH bases."""
    _assert_sp_parity(
        LlamaConfig(
            vocab_size=64, hidden_size=16, intermediate_size=32,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8,
            hidden_act="gelu_pytorch_tanh", norm_offset=True,
            scale_embeddings=True, qk_norm=True,
            layer_windows=(8, 8, None, 8), rope_local_theta=10000.0,
            rope_theta=1000000.0,
        )
    )


def test_sp_parity_llama31_rope_scaling():
    """Llama-3.1 long-context rope rescaling rides the per-shard tables."""
    _assert_sp_parity(
        LlamaConfig(
            vocab_size=64, hidden_size=16, intermediate_size=32,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8, rope_theta=500000.0,
            rope_scaling_factor=8.0, rope_low_freq_factor=1.0,
            rope_high_freq_factor=4.0, rope_original_max_position=8192,
        )
    )


def test_sp_rejects_indivisible_seq():
    config = LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=1, num_attention_heads=2,
        num_key_value_heads=2, head_dim=8,
    )
    params = init_random_llama(config)
    ids = jnp.arange(30, dtype=jnp.int32)
    with pytest.raises(ValueError, match="not divisible"):
        llama_prefill_kv_sp(config, params, ids, _sp_mesh(4))


def test_sp_prefill_and_save_pads_to_mesh(tmp_path):
    """The extraction entry (prefill_and_save_kv seq_mesh=...) END-pads an
    arbitrary-length token sequence up to a mesh multiple and slices the
    cache back — saved layers must be bit-comparable to the single-device
    path at the ORIGINAL length (causal mask: pad rows can't leak back)."""
    from nerf_attention_tpu.io import kvstore
    from nerf_attention_tpu.models.llama_jax import prefill_and_save_kv

    config = LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8,
    )
    params = init_random_llama(config)
    ids = np.arange(30, dtype=np.int32) % config.vocab_size  # 30 % 4 != 0

    meta = prefill_and_save_kv(
        config, params, ids, tmp_path / "sp", "toy", seq_mesh=_sp_mesh(4)
    )
    assert meta.actual_tokens == 30
    k_ref, v_ref = llama_prefill_kv(config, params, jnp.asarray(ids))
    for layer in range(config.num_hidden_layers):
        k, v = kvstore.load_layer(tmp_path / "sp", layer)
        assert k.shape == (config.num_key_value_heads, 30, config.head_dim)
        np.testing.assert_allclose(k, np.asarray(k_ref[layer]), atol=1e-5)
        np.testing.assert_allclose(v, np.asarray(v_ref[layer]), atol=1e-5)


def test_sp_kv_is_row_sharded():
    """The returned cache shards its row axis over the mesh (no gather of
    the output — the point is that nothing materializes full-S per device
    except the per-layer n_kv-head K/V)."""
    config = LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8,
    )
    params = init_random_llama(config)
    mesh = _sp_mesh(4)
    keys, _ = llama_prefill_kv_sp(
        config, params, jnp.arange(32, dtype=jnp.int32), mesh
    )
    spec = keys.sharding.spec
    assert spec[2] == "sp", f"expected row axis sharded, got {spec}"
