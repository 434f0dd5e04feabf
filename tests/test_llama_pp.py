"""Pipeline-parallel prefill parity (llama_prefill_kv_pp vs single-device).

Stage i owns layers [i*L/n, (i+1)*L/n); sequence chunks flow through stages
via ppermute with cache-masked attention in global coordinates. These tests
assert the pipelined program is the SAME function as the single-device
prefill across the family-specific attention variants, since each exercises
a different piece of the chunked masking, the per-chunk rope tables, and the
scanned per-layer flags.
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
    llama_prefill_kv_pp,
)


def _pp_mesh(n: int = 4) -> Mesh:
    return Mesh(np.array(jax.devices()[:n]), ("pp",))


def _assert_pp_parity(
    config: LlamaConfig, seq_len: int = 32, n_dev: int = 4, n_chunks=None
):
    params = init_random_llama(config)
    ids = jnp.asarray(np.arange(seq_len, dtype=np.int32) % config.vocab_size)
    k_ref, v_ref = llama_prefill_kv(config, params, ids)
    k_pp, v_pp = llama_prefill_kv_pp(
        config, params, ids, _pp_mesh(n_dev), n_chunks=n_chunks
    )
    assert k_pp.shape == k_ref.shape
    np.testing.assert_allclose(np.asarray(k_pp), np.asarray(k_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_pp), np.asarray(v_ref), atol=1e-5)


def test_pp_parity_gqa_llama():
    """Plain GQA, default n_chunks=2n (bubble-minimizing split)."""
    _assert_pp_parity(
        LlamaConfig(
            vocab_size=64, hidden_size=16, intermediate_size=32,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8,
        )
    )


def test_pp_parity_single_chunk_per_stage():
    """n_chunks == n: every tick is either pure bubble or one full hop."""
    _assert_pp_parity(
        LlamaConfig(
            vocab_size=64, hidden_size=16, intermediate_size=32,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=4, head_dim=8,
        ),
        n_chunks=4,
    )


def test_pp_parity_sliding_window():
    """Window smaller than a chunk AND crossing chunk boundaries."""
    _assert_pp_parity(
        LlamaConfig(
            vocab_size=64, hidden_size=16, intermediate_size=32,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8, sliding_window=6,
        )
    )


def test_pp_parity_gemma2_style():
    """Sandwich norms + logit softcap + alternating per-layer windows — the
    scanned window flag leaf shards over the layer axis with the weights."""
    _assert_pp_parity(
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


def test_pp_parity_gemma3_style():
    """Dual rope tables: per-chunk tables rebuilt at global positions for
    both bases, the local flag sharded with its layer."""
    _assert_pp_parity(
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


def test_pp_rejects_indivisible_layers():
    config = LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=3, num_attention_heads=2,
        num_key_value_heads=2, head_dim=8,
    )
    params = init_random_llama(config)
    with pytest.raises(ValueError, match="not divisible"):
        llama_prefill_kv_pp(
            config, params, jnp.arange(32, dtype=jnp.int32), _pp_mesh(4)
        )


def test_pp_rejects_indivisible_chunks():
    config = LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=4, num_attention_heads=2,
        num_key_value_heads=2, head_dim=8,
    )
    params = init_random_llama(config)
    with pytest.raises(ValueError, match="not divisible"):
        llama_prefill_kv_pp(
            config, params, jnp.arange(32, dtype=jnp.int32), _pp_mesh(4),
            n_chunks=3,
        )


def test_pp_prefill_and_save_pads_to_mesh(tmp_path):
    """prefill_and_save_kv(pipe_mesh=...) END-pads to 2n (PP's default
    chunking) and slices back; saved layers match single-device at the
    original length."""
    from nerf_attention_tpu.io import kvstore
    from nerf_attention_tpu.models.llama_jax import prefill_and_save_kv

    config = LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8,
    )
    params = init_random_llama(config)
    ids = np.arange(30, dtype=np.int32) % config.vocab_size  # 30 % 8 != 0

    meta = prefill_and_save_kv(
        config, params, ids, tmp_path / "pp", "toy", pipe_mesh=_pp_mesh(4)
    )
    assert meta.actual_tokens == 30
    k_ref, v_ref = llama_prefill_kv(config, params, jnp.asarray(ids))
    for layer in range(config.num_hidden_layers):
        k, v = kvstore.load_layer(tmp_path / "pp", layer)
        assert k.shape == (config.num_key_value_heads, 30, config.head_dim)
        np.testing.assert_allclose(k, np.asarray(k_ref[layer]), atol=1e-5)
        np.testing.assert_allclose(v, np.asarray(v_ref[layer]), atol=1e-5)


def test_pp_kv_is_layer_sharded():
    """The returned cache shards its LAYER axis — each stage holds only its
    own layers' full-sequence KV (the memory layout that is PP's point)."""
    config = LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8,
    )
    params = init_random_llama(config)
    keys, _ = llama_prefill_kv_pp(
        config, params, jnp.arange(32, dtype=jnp.int32), _pp_mesh(4)
    )
    assert keys.sharding.spec[0] == "pp", f"got {keys.sharding.spec}"
