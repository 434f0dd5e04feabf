"""JAX Llama: numeric KV parity against HF transformers on a tiny model."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from nerf_attention_tpu.models.llama_jax import (
    LlamaConfig,
    init_random_llama,
    llama_prefill_kv,
    load_llama_params,
)


def _hf_kv_layers(past):
    """Per-layer (keys, values) across the three HF cache API generations."""
    if hasattr(past, "layers"):  # transformers v5 layout
        return [(l.keys, l.values) for l in past.layers]
    if hasattr(past, "key_cache"):
        return list(zip(past.key_cache, past.value_cache))
    return [(k, v) for k, v in past]



TINY_HF_KWARGS = dict(
    vocab_size=128,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=64,
    rope_theta=10000.0,
    tie_word_embeddings=True,
)


@pytest.fixture(scope="module")
def tiny_hf_model(tmp_path_factory):
    """A random tiny HF Llama saved to disk (no network)."""
    cfg = transformers.LlamaConfig(**TINY_HF_KWARGS)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("tiny_llama")
    model.save_pretrained(d, safe_serialization=True)
    return d, model


def test_config_from_hf_dict(tiny_hf_model):
    d, _ = tiny_hf_model
    with open(d / "config.json") as f:
        config = LlamaConfig.from_hf_dict(json.load(f))
    assert config.num_hidden_layers == 2
    assert config.num_key_value_heads == 2
    assert config.head_dim == 8
    assert config.rope_scaling_factor is None


def test_kv_parity_with_hf(tiny_hf_model):
    """Our prefill emits the same post-RoPE KV tensors HF caches."""
    d, model = tiny_hf_model
    config, params = load_llama_params(d, dtype=jnp.float32)

    ids = np.array([3, 17, 42, 9, 9, 120, 64, 5], dtype=np.int32)
    with torch.no_grad():
        out = model(torch.from_numpy(ids)[None].long(), use_cache=True)
    hf_layers = _hf_kv_layers(out.past_key_values)

    keys, values = llama_prefill_kv(config, params, jnp.asarray(ids))
    assert keys.shape == (2, 2, 8, 8)  # (L, H_kv, S, D)

    for layer_idx, (hf_k, hf_v) in enumerate(hf_layers):
        np.testing.assert_allclose(
            np.asarray(keys[layer_idx]),
            hf_k.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(values[layer_idx]),
            hf_v.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )


def test_llama31_rope_scaling_parity():
    """llama3 rope rescaling matches HF's implementation."""
    from nerf_attention_tpu.models.llama_jax import _rope_frequencies

    config = LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, rope_theta=500000.0,
        rope_scaling_factor=8.0, rope_low_freq_factor=1.0,
        rope_high_freq_factor=4.0, rope_original_max_position=8192,
    )
    got = _rope_frequencies(config)

    # Independent oracle: HF's rope_utils formula.
    inv_freq = 1.0 / (500000.0 ** (np.arange(0, 8, 2) / 8))
    wavelen = 2 * np.pi / inv_freq
    want = []
    for ifq, wl in zip(inv_freq, wavelen):
        if wl < 8192 / 4.0:
            want.append(ifq)
        elif wl > 8192 / 1.0:
            want.append(ifq / 8.0)
        else:
            smooth = (8192 / wl - 1.0) / (4.0 - 1.0)
            want.append((1 - smooth) * ifq / 8.0 + smooth * ifq)
    np.testing.assert_allclose(got, np.array(want, dtype=np.float32), rtol=1e-6)


def test_random_init_forward_runs():
    config = LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
        head_dim=4,
    )
    params = init_random_llama(config)
    keys, values = llama_prefill_kv(
        config, params, jnp.arange(10, dtype=jnp.int32)
    )
    assert keys.shape == values.shape == (3, 4, 10, 4)
    assert np.isfinite(np.asarray(keys)).all()


def test_prefill_and_save_kv(tiny_hf_model, tmp_path):
    """Native extraction (minus tokenization) writes the standard layout."""
    from nerf_attention_tpu.analyze import analyze_kv_cache
    from nerf_attention_tpu.io import kvstore
    from nerf_attention_tpu.models.llama_jax import prefill_and_save_kv

    d, _ = tiny_hf_model
    config, params = load_llama_params(d, dtype=jnp.float32)
    ids = np.arange(16, dtype=np.int32) % 100
    metadata = prefill_and_save_kv(config, params, ids, tmp_path, "tiny")

    assert metadata.num_layers == 2
    assert metadata.seq_len == 16
    keys, values = kvstore.load_layer(tmp_path, 0)
    assert keys.shape == (2, 16, 8)
    assert keys.dtype == np.float32
    # The cache is consumable by the rest of the pipeline.
    result = analyze_kv_cache(tmp_path, tmp_path / "analysis", verbose=False)
    assert len(result.layer_summaries) == 2


def test_shard_llama_params_tp_mesh(tiny_hf_model):
    """Tensor-sharded prefill on a 4-way mesh matches the unsharded KV."""
    import jax
    from jax.sharding import Mesh

    from nerf_attention_tpu.models.llama_jax import shard_llama_params

    d, _ = tiny_hf_model
    config, params = load_llama_params(d, dtype=jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:4]), ("tp",))
    sharded = shard_llama_params(params, mesh)

    ids = jnp.asarray(np.array([5, 3, 8, 1, 2, 99], dtype=np.int32))
    k_ref, v_ref = llama_prefill_kv(config, params, ids)
    k_tp, v_tp = llama_prefill_kv(config, sharded, ids)
    np.testing.assert_allclose(np.asarray(k_tp), np.asarray(k_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_tp), np.asarray(v_ref), atol=1e-4)


def test_kv_parity_with_hf_mistral(tmp_path):
    """Mistral-family checkpoints (same projection layout, GQA, RoPE) load
    and produce the same post-RoPE KV as HF — the extraction path is
    Llama-architecture-family generic, not Llama-only."""
    cfg = transformers.MistralConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10000.0,
        sliding_window=None,
    )
    torch.manual_seed(1)
    model = transformers.MistralForCausalLM(cfg)
    model.eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    config, params = load_llama_params(tmp_path, dtype=jnp.float32)
    ids = np.array([7, 99, 3, 42, 5, 5, 18, 76], dtype=np.int32)
    with torch.no_grad():
        out = model(torch.from_numpy(ids)[None].long(), use_cache=True)
    hf_layers = _hf_kv_layers(out.past_key_values)

    keys, values = llama_prefill_kv(config, params, jnp.asarray(ids))
    for layer_idx, (hf_k, hf_v) in enumerate(hf_layers):
        np.testing.assert_allclose(
            np.asarray(keys[layer_idx]), hf_k.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(values[layer_idx]), hf_v.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )


def test_chunked_attention_matches_single_shot(monkeypatch):
    """Query-chunked causal attention (S > ATTN_BLOCK, incl. a ragged last
    block) must equal the naive full-logits computation."""
    import jax
    import jax.numpy as jnp

    from nerf_attention_tpu.models import llama_jax

    rng = np.random.default_rng(11)
    h_heads, s, d = 3, 70, 16
    q = jnp.asarray(rng.standard_normal((h_heads, s, d)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((h_heads, s, d)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((h_heads, s, d)), dtype=jnp.float32)

    def naive(q, k, v):
        logits = jnp.einsum("hqd,hkd->hqk", q, k) / jnp.sqrt(jnp.float32(d))
        mask = jnp.tril(jnp.ones((s, s), dtype=bool))
        logits = jnp.where(mask[None], logits, jnp.finfo(jnp.float32).min)
        return jnp.einsum("hqk,hkd->hqd", jax.nn.softmax(logits, axis=-1), v)

    want = naive(q, k, v)
    monkeypatch.setattr(llama_jax, "ATTN_BLOCK", 32)  # 70 -> blocks 32/32/6
    got = llama_jax._causal_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_kv_parity_with_hf_qwen2(tmp_path):
    """Qwen2-family checkpoints carry QKV projection BIASES — the loader
    must pick them up (zeros for Llama/Mistral) and still match HF's
    post-RoPE KV exactly."""
    cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10000.0,
        use_sliding_window=False,
    )
    torch.manual_seed(2)
    model = transformers.Qwen2ForCausalLM(cfg)
    model.eval()
    # HF initializes biases to zero — fill them with random values so the
    # test actually exercises the bias path end-to-end.
    with torch.no_grad():
        for layer in model.model.layers:
            for proj in (
                layer.self_attn.q_proj,
                layer.self_attn.k_proj,
                layer.self_attn.v_proj,
            ):
                assert proj.bias is not None
                proj.bias.normal_(std=0.5)
    model.save_pretrained(tmp_path, safe_serialization=True)

    config, params = load_llama_params(tmp_path, dtype=jnp.float32)
    assert float(np.abs(params["layers"]["q_bias"]).max()) > 0  # loaded, not zeros
    ids = np.array([7, 99, 3, 42, 5, 5, 18, 76], dtype=np.int32)
    with torch.no_grad():
        out = model(torch.from_numpy(ids)[None].long(), use_cache=True)
    hf_layers = _hf_kv_layers(out.past_key_values)

    keys, values = llama_prefill_kv(config, params, jnp.asarray(ids))
    for layer_idx, (hf_k, hf_v) in enumerate(hf_layers):
        np.testing.assert_allclose(
            np.asarray(keys[layer_idx]), hf_k.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(values[layer_idx]), hf_v.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )


def test_kv_parity_with_hf_qwen3(tmp_path):
    """Qwen3 applies per-head RMSNorm to Q and K BEFORE RoPE (q_norm/k_norm)
    and drops Qwen2's projection biases — post-RoPE keys must match HF, and
    skipping the norm must visibly change them."""
    cfg = transformers.Qwen3Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=64, rope_theta=10000.0,
        use_sliding_window=False,
    )
    torch.manual_seed(4)
    model = transformers.Qwen3ForCausalLM(cfg)
    model.eval()
    # HF initializes the norm weights to ones; perturb them so the test
    # exercises the learned-scale path, not just the normalization.
    with torch.no_grad():
        for layer in model.model.layers:
            layer.self_attn.q_norm.weight.normal_(mean=1.0, std=0.3)
            layer.self_attn.k_norm.weight.normal_(mean=1.0, std=0.3)
    model.save_pretrained(tmp_path, safe_serialization=True)

    config, params = load_llama_params(tmp_path, dtype=jnp.float32)
    assert config.qk_norm and config.sliding_window is None
    assert params["layers"]["k_norm"].shape == (2, 8)
    assert float(np.abs(params["layers"]["q_bias"]).max()) == 0  # no biases

    ids = np.array([7, 99, 3, 42, 5, 5, 18, 76], dtype=np.int32)
    with torch.no_grad():
        out = model(torch.from_numpy(ids)[None].long(), use_cache=True)
    hf_layers = _hf_kv_layers(out.past_key_values)

    keys, values = llama_prefill_kv(config, params, jnp.asarray(ids))
    for layer_idx, (hf_k, hf_v) in enumerate(hf_layers):
        np.testing.assert_allclose(
            np.asarray(keys[layer_idx]), hf_k.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(values[layer_idx]), hf_v.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )

    # The norm must actually bite: disabling it diverges the keys.
    no_norm = LlamaConfig(**{**config.__dict__, "qk_norm": False})
    keys_nn, _ = llama_prefill_kv(no_norm, params, jnp.asarray(ids))
    assert not np.allclose(np.asarray(keys[0]), np.asarray(keys_nn[0]), atol=1e-4)


def test_kv_parity_with_hf_mistral_sliding_window(tmp_path):
    """A Mistral checkpoint with an active sliding_window must produce HF's
    KV: the window changes deeper layers' KV through the attention output
    feeding the next layer, so ignoring it would extract wrong tensors."""
    cfg = transformers.MistralConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10000.0,
        sliding_window=3, attn_implementation="eager",
    )
    torch.manual_seed(3)
    model = transformers.MistralForCausalLM(cfg)
    model.eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    config, params = load_llama_params(tmp_path, dtype=jnp.float32)
    assert config.sliding_window == 3
    ids = np.array([7, 99, 3, 42, 5, 5, 18, 76, 12, 1], dtype=np.int32)
    with torch.no_grad():
        out = model(torch.from_numpy(ids)[None].long(), use_cache=True)
    hf_layers = _hf_kv_layers(out.past_key_values)

    keys, values = llama_prefill_kv(config, params, jnp.asarray(ids))
    # The window must actually bite: layer-1 KV differs from the
    # full-attention result (layer 0's KV is pre-attention, identical).
    full_cfg = LlamaConfig(**{**config.__dict__, "sliding_window": None})
    keys_full, _ = llama_prefill_kv(full_cfg, params, jnp.asarray(ids))
    assert not np.allclose(np.asarray(keys[1]), np.asarray(keys_full[1]), atol=1e-5)

    # HF's sliding-window cache RETAINS only the window tail; our
    # extraction keeps the full length (a superset). Compare the kept rows
    # — off-by-one window semantics would show up as ~1e-1 diffs (probed:
    # window 2/4/None give 0.035-0.094, window 3 gives 5.7e-4).
    for layer_idx, (hf_k, hf_v) in enumerate(hf_layers):
        hf_k = hf_k.squeeze(0).float().numpy()
        hf_v = hf_v.squeeze(0).float().numpy()
        kept = hf_k.shape[1]
        np.testing.assert_allclose(
            np.asarray(keys[layer_idx])[:, -kept:], hf_k, atol=1e-3, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(values[layer_idx])[:, -kept:], hf_v, atol=1e-3, rtol=1e-3,
        )


def test_kv_parity_with_hf_gemma(tmp_path):
    """Gemma-family: sqrt(hidden) embedding scaling, (1+w) RMSNorm, and
    tanh-GELU MLP — all three must be active to match HF's KV."""
    cfg = transformers.GemmaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=64, rope_theta=10000.0,
    )
    torch.manual_seed(4)
    model = transformers.GemmaForCausalLM(cfg)
    model.eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    config, params = load_llama_params(tmp_path, dtype=jnp.float32)
    assert config.norm_offset and config.scale_embeddings
    assert config.hidden_act == "gelu_pytorch_tanh"
    ids = np.array([7, 99, 3, 42, 5, 5, 18, 76], dtype=np.int32)
    with torch.no_grad():
        out = model(torch.from_numpy(ids)[None].long(), use_cache=True)
    hf_layers = _hf_kv_layers(out.past_key_values)

    keys, values = llama_prefill_kv(config, params, jnp.asarray(ids))
    for layer_idx, (hf_k, hf_v) in enumerate(hf_layers):
        np.testing.assert_allclose(
            np.asarray(keys[layer_idx]), hf_k.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(values[layer_idx]), hf_v.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )


def test_unsupported_model_type_rejected():
    # dbrx's fused attention/MoE layouts diverge from every supported
    # family; silently loading it would produce plausible-but-wrong KV.
    with pytest.raises(NotImplementedError, match="dbrx"):
        LlamaConfig.from_hf_dict(
            dict(model_type="dbrx", vocab_size=8, hidden_size=8,
                 intermediate_size=8, num_hidden_layers=1,
                 num_attention_heads=1)
        )


@pytest.fixture(scope="module")
def tiny_hf_mixtral(tmp_path_factory):
    """A random tiny HF Mixtral saved to disk (no network)."""
    cfg = transformers.MixtralConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=64, tie_word_embeddings=True,
    )
    torch.manual_seed(11)
    model = transformers.MixtralForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("tiny_mixtral")
    model.save_pretrained(d, safe_serialization=True)
    return d, model


def test_kv_parity_with_hf_mixtral(tiny_hf_mixtral):
    """Mixtral: the sparse-MoE FFN (fp32 router softmax over all experts,
    top-2 renormalized, weighted SwiGLU sum) replaces the dense MLP. Layer
    1's KV sees layer 0's MoE output, so parity covers the routing math."""
    d, model = tiny_hf_mixtral
    config, params = load_llama_params(d, dtype=jnp.float32)
    assert config.num_local_experts == 4
    assert config.num_experts_per_tok == 2
    assert params["layers"]["w1"].shape == (2, 4, 32, 64)

    ids = np.array([3, 17, 42, 9, 9, 120, 64, 5], dtype=np.int32)
    with torch.no_grad():
        out = model(torch.from_numpy(ids)[None].long(), use_cache=True)
    hf_layers = _hf_kv_layers(out.past_key_values)

    keys, values = llama_prefill_kv(config, params, jnp.asarray(ids))
    assert keys.shape == (2, 2, 8, 8)
    for layer_idx, (hf_k, hf_v) in enumerate(hf_layers):
        np.testing.assert_allclose(
            np.asarray(keys[layer_idx]), hf_k.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(values[layer_idx]), hf_v.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )


def test_mixtral_decode_rollout_consistency():
    """MoE decode path: rollout over a random tiny Mixtral refills the same
    rows prefill computes (autoregressive consistency through the MoE FFN)."""
    from nerf_attention_tpu.models.llama_jax import (
        llama_decode_rollout,
    )

    config = LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=4, num_local_experts=4, num_experts_per_tok=2,
    )
    params = init_random_llama(config, seed=7)
    ids = jnp.arange(12, dtype=jnp.int32)
    k_ref, v_ref = llama_prefill_kv(config, params, ids)

    s_pfx, t_roll = 8, 4
    pad = jnp.zeros(k_ref.shape[:2] + (t_roll, k_ref.shape[3]), k_ref.dtype)
    k_buf = jnp.concatenate([k_ref[:, :, :s_pfx, :], pad], axis=2)
    v_buf = jnp.concatenate([v_ref[:, :, :s_pfx, :], pad], axis=2)
    hs, (k_fill, v_fill), _, _ = llama_decode_rollout(
        config, params, ids[s_pfx:], s_pfx, k_buf, v_buf
    )
    assert np.isfinite(np.asarray(hs)).all()
    np.testing.assert_allclose(
        np.asarray(k_fill), np.asarray(k_ref), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(v_fill), np.asarray(v_ref), atol=1e-4
    )


def test_decode_step_capture_ffn_input_replays_moe_routing():
    """capture_ffn_input exposes each layer's normed FFN input without
    changing the default outputs, and replaying the router on it
    (head_policy.route_weights) reproduces the forward's own expert mix:
    the last layer's residual h_out - MoE(ffn_x) must be collinear with
    ffn_x / post_norm_weight (the rms-norm direction of the pre-FFN
    hidden state) — wrong captured tensors or wrong replayed top-k would
    break the collinearity."""
    from nerf_attention_tpu.experiments.head_policy import route_weights
    from nerf_attention_tpu.models.llama_jax import llama_decode_step

    config = LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=4, num_local_experts=4, num_experts_per_tok=2,
    )
    params = init_random_llama(config, seed=11)
    ids = jnp.arange(9, dtype=jnp.int32)
    keys, values = llama_prefill_kv(config, params, ids[:8])

    h_ref, (k_ref, v_ref), ent_ref = llama_decode_step(
        config, params, ids[8], 8, keys, values
    )
    h_cap, (k_cap, v_cap), ent_cap, ffn_x = llama_decode_step(
        config, params, ids[8], 8, keys, values, capture_ffn_input=True
    )
    assert ffn_x.shape == (2, 1, 16)
    np.testing.assert_array_equal(np.asarray(h_cap), np.asarray(h_ref))
    np.testing.assert_array_equal(np.asarray(k_cap), np.asarray(k_ref))
    np.testing.assert_array_equal(np.asarray(v_cap), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(ent_cap), np.asarray(ent_ref))

    lp = params["layers"]
    weights, _ = route_weights(
        np.asarray(ffn_x)[None], np.asarray(lp["router"]), 2
    )  # (1, L, E)
    x = np.asarray(ffn_x, np.float64)[-1, 0]  # last layer's router input
    silu = x @ np.asarray(lp["w1"], np.float64)[-1]  # (E, inter)
    gated = silu / (1.0 + np.exp(-silu)) * (
        x @ np.asarray(lp["w3"], np.float64)[-1]
    )
    expert_out = np.einsum("ei,eih->eh", gated, np.asarray(lp["w2"], np.float64)[-1])
    moe_out = weights[0, -1].astype(np.float64) @ expert_out  # (hidden,)

    resid = np.asarray(h_ref, np.float64) - moe_out
    direction = x / np.asarray(lp["post_norm"], np.float64)[-1]
    cos = resid @ direction / (
        np.linalg.norm(resid) * np.linalg.norm(direction)
    )
    assert cos == pytest.approx(1.0, abs=1e-5)


def test_mixtral_expert_parallel_prefill_parity(tiny_hf_mixtral):
    """EP sharding: expert weights sharded over the mesh's expert axis must
    reproduce the unsharded prefill (one all-reduce closes the combine)."""
    import jax
    from jax.sharding import Mesh

    from nerf_attention_tpu.models.llama_jax import shard_llama_params

    d, _ = tiny_hf_mixtral
    config, params = load_llama_params(d, dtype=jnp.float32)
    ids = jnp.asarray(np.array([3, 17, 42, 9, 9, 120, 64, 5], np.int32))
    k_ref, v_ref = llama_prefill_kv(config, params, ids)

    devices = jax.devices()[:4]  # E=4 experts, one per device
    ep_mesh = Mesh(np.array(devices), ("ep",))
    sharded = shard_llama_params(params, ep_mesh, axis=None, expert_axis="ep")
    k_ep, v_ep = llama_prefill_kv(config, sharded, ids)
    np.testing.assert_allclose(np.asarray(k_ep), np.asarray(k_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_ep), np.asarray(v_ref), atol=1e-4)


def test_mixtral_tp_ep_2d_mesh_prefill_parity(tiny_hf_mixtral):
    """2-D mesh: attention tensor-parallel x FFN expert-parallel in one
    program still matches the single-device prefill."""
    import jax
    from jax.sharding import Mesh

    from nerf_attention_tpu.models.llama_jax import shard_llama_params

    d, _ = tiny_hf_mixtral
    config, params = load_llama_params(d, dtype=jnp.float32)
    ids = jnp.asarray(np.array([5, 64, 120, 9, 9, 42, 17, 3], np.int32))
    k_ref, v_ref = llama_prefill_kv(config, params, ids)

    devices = np.array(jax.devices()[:8]).reshape(2, 4)  # (ep, tp)
    mesh = Mesh(devices, ("ep", "tp"))
    sharded = shard_llama_params(params, mesh, axis="tp", expert_axis="ep")
    k_2d, v_2d = llama_prefill_kv(config, sharded, ids)
    np.testing.assert_allclose(np.asarray(k_2d), np.asarray(k_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_2d), np.asarray(v_ref), atol=1e-4)


def test_mixtral_moe_tp_intermediate_split_parity(tiny_hf_mixtral):
    """Without an expert axis, MoE expert FFNs shard their intermediate dim
    over the TP axis (Megatron split) — same oracle."""
    import jax
    from jax.sharding import Mesh

    from nerf_attention_tpu.models.llama_jax import shard_llama_params

    d, _ = tiny_hf_mixtral
    config, params = load_llama_params(d, dtype=jnp.float32)
    ids = jnp.asarray(np.array([1, 2, 3, 4, 5, 6, 7, 8], np.int32))
    k_ref, v_ref = llama_prefill_kv(config, params, ids)

    tp_mesh = Mesh(np.array(jax.devices()[:4]), ("tp",))
    sharded = shard_llama_params(params, tp_mesh, axis="tp")
    k_tp, v_tp = llama_prefill_kv(config, sharded, ids)
    np.testing.assert_allclose(np.asarray(k_tp), np.asarray(k_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_tp), np.asarray(v_ref), atol=1e-4)


def test_kv_parity_with_hf_gemma2(tmp_path):
    """Gemma2: sandwich norms (post-attn + pre/post-ffn), logit
    soft-capping, query_pre_attn_scalar scaling, and ALTERNATING per-layer
    sliding windows — post-RoPE KV must match HF's eager path."""
    cfg = transformers.Gemma2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=64, rope_theta=10000.0,
        sliding_window=3, query_pre_attn_scalar=16,
        attn_logit_softcapping=1.0,  # tight cap so it bites at random-init scale
        attn_implementation="eager",
    )
    torch.manual_seed(6)
    model = transformers.Gemma2ForCausalLM(cfg)
    model.eval()
    # Random-init logits are ~1e-3, where tanh is identity; scale Q/K so
    # logits are O(1) and the soft-cap demonstrably shapes the output.
    with torch.no_grad():
        for layer in model.model.layers:
            layer.self_attn.q_proj.weight *= 8.0
            layer.self_attn.k_proj.weight *= 8.0
    model.save_pretrained(tmp_path, safe_serialization=True)

    config, params = load_llama_params(tmp_path, dtype=jnp.float32)
    assert config.sandwich_norms and config.norm_offset
    assert config.attn_logit_softcap == 1.0
    assert config.attn_scale == pytest.approx(16 ** -0.5)
    # Gemma2 alternates sliding/full starting at layer 0.
    assert config.sliding_window is None
    assert config.layer_windows == (3, None, 3, None)
    assert params["layers"]["pre_ffn_norm"].shape == (4, 32)

    ids = np.array([7, 99, 3, 42, 5, 5, 18, 76, 12, 1], dtype=np.int32)
    with torch.no_grad():
        out = model(torch.from_numpy(ids)[None].long(), use_cache=True)
    hf_layers = _hf_kv_layers(out.past_key_values)

    keys, values = llama_prefill_kv(config, params, jnp.asarray(ids))
    # HF's sliding layers may retain only the window tail in the cache;
    # compare the kept rows (full-attention layers keep everything).
    for layer_idx, (hf_k, hf_v) in enumerate(hf_layers):
        hf_k = hf_k.squeeze(0).float().numpy()
        hf_v = hf_v.squeeze(0).float().numpy()
        kept = hf_k.shape[1]
        np.testing.assert_allclose(
            np.asarray(keys[layer_idx])[:, -kept:], hf_k, atol=1e-3, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(values[layer_idx])[:, -kept:], hf_v, atol=1e-3, rtol=1e-3,
        )

    # Both gemma2-specific mechanisms must bite: no-softcap and all-full-
    # attention variants each diverge the deeper layers' KV.
    no_cap = LlamaConfig(**{**config.__dict__, "attn_logit_softcap": None})
    keys_nc, _ = llama_prefill_kv(no_cap, params, jnp.asarray(ids))
    assert not np.allclose(np.asarray(keys[1]), np.asarray(keys_nc[1]), atol=1e-5)
    no_win = LlamaConfig(**{**config.__dict__, "layer_windows": None})
    keys_nw, _ = llama_prefill_kv(no_win, params, jnp.asarray(ids))
    assert not np.allclose(np.asarray(keys[1]), np.asarray(keys_nw[1]), atol=1e-5)


def test_kv_parity_with_hf_gemma3(tmp_path):
    """Gemma3 (text): offset per-head Q/K norms, sandwich norms,
    query_pre_attn_scalar, 5:1 sliding/full layer pattern with a SEPARATE
    rope base for sliding layers — post-RoPE KV must match HF."""
    cfg = transformers.Gemma3TextConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=7, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=64,
        rope_theta=1_000_000.0, rope_local_base_freq=10_000.0,
        sliding_window=3, query_pre_attn_scalar=16,
        attn_implementation="eager",
    )
    torch.manual_seed(8)
    model = transformers.Gemma3ForCausalLM(cfg)
    model.eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    config, params = load_llama_params(tmp_path, dtype=jnp.float32)
    assert config.qk_norm and config.sandwich_norms and config.norm_offset
    assert config.rope_local_theta == 10_000.0
    assert config.attn_logit_softcap is None
    # 5:1 pattern: full attention only at layer 5.
    assert config.layer_windows == (3, 3, 3, 3, 3, None, 3)

    ids = np.array([7, 99, 3, 42, 5, 5, 18, 76, 12, 1], dtype=np.int32)
    with torch.no_grad():
        out = model(torch.from_numpy(ids)[None].long(), use_cache=True)
    hf_layers = _hf_kv_layers(out.past_key_values)

    keys, values = llama_prefill_kv(config, params, jnp.asarray(ids))
    for layer_idx, (hf_k, hf_v) in enumerate(hf_layers):
        hf_k = hf_k.squeeze(0).float().numpy()
        hf_v = hf_v.squeeze(0).float().numpy()
        kept = hf_k.shape[1]  # sliding layers may retain only the tail
        np.testing.assert_allclose(
            np.asarray(keys[layer_idx])[:, -kept:], hf_k, atol=1e-3, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(values[layer_idx])[:, -kept:], hf_v, atol=1e-3, rtol=1e-3,
        )

    # The dual rope table must bite: forcing every layer onto the global
    # base changes the sliding layers' keys directly.
    one_base = LlamaConfig(**{**config.__dict__, "rope_local_theta": None})
    keys_ob, _ = llama_prefill_kv(one_base, params, jnp.asarray(ids))
    assert not np.allclose(np.asarray(keys[0]), np.asarray(keys_ob[0]), atol=1e-4)


def test_kv_parity_with_hf_qwen2_mixed_windows(tmp_path):
    """Qwen2 with use_sliding_window and max_window_layers: the first
    max_window_layers layers attend fully, the rest through the window —
    previously rejected, now supported via per-layer windows."""
    cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10000.0,
        use_sliding_window=True, sliding_window=3, max_window_layers=1,
        attn_implementation="eager",
    )
    torch.manual_seed(7)
    model = transformers.Qwen2ForCausalLM(cfg)
    model.eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    config, params = load_llama_params(tmp_path, dtype=jnp.float32)
    assert config.layer_windows == (None, 3, 3)

    ids = np.array([7, 99, 3, 42, 5, 5, 18, 76, 12, 1], dtype=np.int32)
    with torch.no_grad():
        out = model(torch.from_numpy(ids)[None].long(), use_cache=True)
    hf_layers = _hf_kv_layers(out.past_key_values)

    keys, values = llama_prefill_kv(config, params, jnp.asarray(ids))
    for layer_idx, (hf_k, hf_v) in enumerate(hf_layers):
        hf_k = hf_k.squeeze(0).float().numpy()
        hf_v = hf_v.squeeze(0).float().numpy()
        kept = hf_k.shape[1]
        np.testing.assert_allclose(
            np.asarray(keys[layer_idx])[:, -kept:], hf_k, atol=1e-3, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(values[layer_idx])[:, -kept:], hf_v, atol=1e-3, rtol=1e-3,
        )


def test_kv_parity_with_hf_phi3(tmp_path):
    """Phi-3-family: fused qkv_proj (q|k|v columns) and gate_up_proj
    (gate|up) checkpoints split correctly and match HF's post-RoPE KV."""
    cfg = transformers.Phi3Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10000.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,  # defaults exceed the tiny vocab
    )
    torch.manual_seed(5)
    model = transformers.Phi3ForCausalLM(cfg)
    model.eval()
    assert hasattr(model.model.layers[0].self_attn, "qkv_proj")  # fused
    model.save_pretrained(tmp_path, safe_serialization=True)

    config, params = load_llama_params(tmp_path, dtype=jnp.float32)
    ids = np.array([7, 99, 3, 42, 5, 5, 18, 76], dtype=np.int32)
    with torch.no_grad():
        out = model(torch.from_numpy(ids)[None].long(), use_cache=True)
    hf_layers = _hf_kv_layers(out.past_key_values)

    keys, values = llama_prefill_kv(config, params, jnp.asarray(ids))
    for layer_idx, (hf_k, hf_v) in enumerate(hf_layers):
        np.testing.assert_allclose(
            np.asarray(keys[layer_idx]), hf_k.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(values[layer_idx]), hf_v.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )


def test_gemma_hub_configs_without_layer_types():
    """Published gemma-2/3 hub config.json files predate layer_types; the
    per-layer window pattern must be derived from the family rule (gemma2:
    alternate starting sliding; gemma3: sliding unless (i+1) %
    sliding_window_pattern == 0) — a uniform fallback would silently build
    the wrong architecture."""
    gemma2 = LlamaConfig.from_hf_dict(
        dict(
            model_type="gemma2", vocab_size=64, hidden_size=32,
            intermediate_size=64, num_hidden_layers=4,
            num_attention_heads=4, num_key_value_heads=2, head_dim=8,
            sliding_window=4096, query_pre_attn_scalar=16,
        )
    )
    assert gemma2.layer_windows == (4096, None, 4096, None)

    gemma3 = LlamaConfig.from_hf_dict(
        dict(
            model_type="gemma3_text", vocab_size=64, hidden_size=32,
            intermediate_size=64, num_hidden_layers=7,
            num_attention_heads=4, num_key_value_heads=2, head_dim=8,
            sliding_window=1024, sliding_window_pattern=3,
            query_pre_attn_scalar=16,
        )
    )
    # pattern 3: full attention at layers 2 and 5.
    assert gemma3.layer_windows == (1024, 1024, None, 1024, 1024, None, 1024)
    assert gemma3.rope_local_theta == 10_000.0


# ---------------------------------------------------------------------------
# Decode step over a KV cache (the cache-swap serving surface)
# ---------------------------------------------------------------------------

_DECODE_CONFIGS = {
    "base_gqa": LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=4,
    ),
    "qwen3ish": LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=4, qk_norm=True,
    ),
    "gemma2ish": LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=4, hidden_act="gelu_pytorch_tanh", norm_offset=True,
        scale_embeddings=True, attn_scale=16**-0.5,
        attn_logit_softcap=1.0, sandwich_norms=True,
        layer_windows=(3, None, 3),
    ),
    "gemma3ish": LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=4, norm_offset=True, rope_local_theta=1000.0,
        layer_windows=(4, None, 4),
    ),
    "cohereish": LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=4, layernorm=True, parallel_residual=True,
        rope_interleaved=True, qk_norm=True, rms_norm_eps=1e-5,
    ),
    "cohere2ish": LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=4, layernorm=True, parallel_residual=True,
        rope_interleaved=True, rope_skip_full_layers=True,
        layer_windows=(4, None, 4), rms_norm_eps=1e-5,
    ),
    "glm4ish": LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=4, rotary_dim=2, rope_interleaved=True,
        sandwich_norms=True,
    ),
}


def _spiced_params(config, seed=0):
    """Random params with nonzero QKV biases so the bias path bites."""
    params = init_random_llama(config, seed=seed)
    rng = np.random.RandomState(seed + 1)
    layers = dict(params["layers"])
    for name in ("q_bias", "k_bias", "v_bias"):
        layers[name] = jnp.asarray(
            rng.randn(*layers[name].shape) * 0.02, dtype=jnp.float32
        )
    return {**params, "layers": layers}


@pytest.mark.parametrize("name", list(_DECODE_CONFIGS), ids=list(_DECODE_CONFIGS))
def test_decode_step_matches_prefill(name):
    """Autoregressive consistency: the decode step's new per-layer K/V over
    the first-S cache must equal prefill's position-S rows (which
    transitively checks every layer's hidden state through attention over
    the cache — any drift in any earlier layer would shift them)."""
    from nerf_attention_tpu.models.llama_jax import llama_decode_step

    config = _DECODE_CONFIGS[name]
    params = _spiced_params(config)
    rng = np.random.RandomState(7)
    s = 10
    ids = jnp.asarray(rng.randint(0, config.vocab_size, s + 1), jnp.int32)
    keys, values = llama_prefill_kv(config, params, ids)

    h_last, (k_new, v_new), entropy = llama_decode_step(
        config, params, ids[s], s, keys[:, :, :s, :], values[:, :, :s, :]
    )
    assert h_last.shape == (config.hidden_size,)
    assert entropy.shape == (
        config.num_hidden_layers, config.num_attention_heads
    )
    ent = np.asarray(entropy)
    assert np.isfinite(ent).all() and (ent >= 0).all()
    # Random-init attention over 10 tokens is near-uniform: entropy close
    # to log(S+1) unless a sliding window trims the support.
    if config.layer_windows is None and config.sliding_window is None:
        assert float(ent.mean()) > 0.5 * np.log(s + 1)
    assert np.isfinite(np.asarray(h_last)).all()
    np.testing.assert_allclose(
        np.asarray(k_new), np.asarray(keys[:, :, s : s + 1, :]),
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(v_new), np.asarray(values[:, :, s : s + 1, :]),
        atol=1e-5, rtol=1e-5,
    )


def test_decode_step_cache_swap_semantics():
    """Swapping in a perturbed cache moves the output, monotonically in the
    perturbation — the end-to-end surface a SIREN-reconstructed cache
    plugs into."""
    from nerf_attention_tpu.models.llama_jax import llama_decode_step

    config = _DECODE_CONFIGS["base_gqa"]
    params = _spiced_params(config, seed=3)
    rng = np.random.RandomState(11)
    s = 12
    ids = jnp.asarray(rng.randint(0, config.vocab_size, s + 1), jnp.int32)
    keys, values = llama_prefill_kv(config, params, ids)
    ck, cv = keys[:, :, :s, :], values[:, :, :s, :]

    h_true, _, _ = llama_decode_step(config, params, ids[s], s, ck, cv)
    h_same, _, _ = llama_decode_step(config, params, ids[s], s, ck, cv)
    np.testing.assert_array_equal(np.asarray(h_true), np.asarray(h_same))

    noise = jnp.asarray(rng.randn(*ck.shape), jnp.float32)
    drifts = []
    for eps in (0.01, 0.1, 1.0):
        h_hat, _, _ = llama_decode_step(
            config, params, ids[s], s, ck + eps * noise, cv
        )
        drifts.append(float(jnp.linalg.norm(h_hat - h_true)))
    assert drifts[0] > 0.0
    assert drifts[0] < drifts[1] < drifts[2]


def test_decode_step_from_siren_reconstructed_cache():
    """The full pipeline: prefill a tiny model, fit one SIREN per
    (layer, head, K|V) slice with the sweep trainer, rebuild the cache
    from the nets, and run the decode step on the reconstruction."""
    from nerf_attention_tpu.models.llama_jax import llama_decode_step
    from nerf_attention_tpu.models.siren import positions, siren_apply
    from nerf_attention_tpu.parallel.sweep import fit_batch
    from nerf_attention_tpu.types import SIRENConfig

    config = _DECODE_CONFIGS["base_gqa"]
    params = _spiced_params(config, seed=5)
    rng = np.random.RandomState(13)
    s = 32
    ids = jnp.asarray(rng.randint(0, config.vocab_size, s + 1), jnp.int32)
    keys, values = llama_prefill_kv(config, params, ids)
    ck, cv = np.asarray(keys[:, :, :s, :]), np.asarray(values[:, :, :s, :])

    n_l, n_kv, _, d = ck.shape
    targets = np.concatenate([ck, cv]).reshape(2 * n_l * n_kv, s, d)
    net = SIRENConfig(32, 2, 30.0, "t32")
    batch = fit_batch(targets, net, epochs=400, seed=0)

    import jax

    pos = positions(s)
    recon = jax.vmap(
        lambda p, m, sd: siren_apply(p, net.omega_0, pos) * sd + m
    )(
        [(jnp.asarray(w), jnp.asarray(b)) for w, b in batch.params],
        jnp.asarray(batch.target_mean),
        jnp.asarray(batch.target_std),
    )
    recon = np.asarray(recon).reshape(2 * n_l, n_kv, s, d)
    ck_hat, cv_hat = jnp.asarray(recon[:n_l]), jnp.asarray(recon[n_l:])

    h_true, _, _ = llama_decode_step(config, params, ids[s], s, ck, cv)
    h_hat, (k_new, v_new), _ = llama_decode_step(
        config, params, ids[s], s, ck_hat, cv_hat
    )
    assert np.isfinite(np.asarray(h_hat)).all()
    assert k_new.shape == (n_l, n_kv, 1, d)
    # The reconstruction trained to reasonable CosSim; the decode output
    # must land near the true-cache output (loose bound — tiny nets).
    cos = float(
        jnp.dot(h_hat, h_true)
        / (jnp.linalg.norm(h_hat) * jnp.linalg.norm(h_true))
    )
    assert cos > 0.9, (cos, float(batch.cosine_mean.mean()))


def test_decode_step_padded_buffer_matches_exact_length():
    """Static-cache serving pattern: decoding at position p over a
    PRE-ALLOCATED buffer (filled prefix + zero rows) must equal decoding
    over the exact-length cache — rows past ``position`` are masked and
    the new token's own (concatenated) key stays visible. This is the
    surface the rollout-drift study's lax.scan writes appends into."""
    import jax
    from nerf_attention_tpu.models.llama_jax import llama_decode_step

    config = _DECODE_CONFIGS["base_gqa"]
    params = _spiced_params(config, seed=9)
    rng = np.random.RandomState(17)
    s, pad = 12, 6
    ids = jnp.asarray(rng.randint(0, config.vocab_size, s + 1), jnp.int32)
    keys, values = llama_prefill_kv(config, params, ids)
    ck, cv = keys[:, :, :s, :], values[:, :, :s, :]

    h_exact, (k_exact, v_exact), ent_exact = llama_decode_step(
        config, params, ids[s], s, ck, cv
    )
    zeros = jnp.zeros(ck.shape[:2] + (pad, ck.shape[3]), ck.dtype)
    h_pad, (k_pad, v_pad), ent_pad = llama_decode_step(
        config, params, ids[s], s,
        jnp.concatenate([ck, zeros], axis=2),
        jnp.concatenate([cv, zeros], axis=2),
    )
    np.testing.assert_allclose(
        np.asarray(h_pad), np.asarray(h_exact), atol=1e-6, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(k_pad), np.asarray(k_exact), atol=1e-6, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ent_pad), np.asarray(ent_exact), atol=1e-5, rtol=1e-5
    )

    # Garbage (not zeros) past the prefix must be equally invisible.
    junk = jnp.asarray(rng.randn(*zeros.shape) * 100, ck.dtype)
    h_junk, _, _ = llama_decode_step(
        config, params, ids[s], s,
        jnp.concatenate([ck, junk], axis=2),
        jnp.concatenate([cv, junk], axis=2),
    )
    np.testing.assert_allclose(
        np.asarray(h_junk), np.asarray(h_exact), atol=1e-6, rtol=1e-6
    )


def test_decode_rollout_matches_sequential_steps():
    """`llama_decode_rollout` (one jitted scan) must equal T sequential
    `llama_decode_step` calls with manual buffer writes — hidden states,
    appended rows, buffers, and entropies."""
    import jax
    from nerf_attention_tpu.models.llama_jax import (
        llama_decode_rollout,
        llama_decode_step,
    )

    config = _DECODE_CONFIGS["base_gqa"]
    params = _spiced_params(config, seed=21)
    rng = np.random.RandomState(23)
    s, t_steps = 10, 4
    ids = jnp.asarray(rng.randint(0, config.vocab_size, s + t_steps), jnp.int32)
    keys, values = llama_prefill_kv(config, params, ids)
    zeros = jnp.zeros(keys.shape[:2] + (t_steps, keys.shape[3]), keys.dtype)
    k_buf0 = jnp.concatenate([keys[:, :, :s, :], zeros], axis=2)
    v_buf0 = jnp.concatenate([values[:, :, :s, :], zeros], axis=2)

    hs, (k_buf, v_buf), (k_new, v_new), ents = llama_decode_rollout(
        config, params, ids[s:], s, k_buf0, v_buf0
    )
    assert hs.shape == (t_steps, config.hidden_size)
    assert k_buf.shape == k_buf0.shape

    kb, vb = k_buf0, v_buf0
    for t in range(t_steps):
        h, (kn, vn), ent = llama_decode_step(
            config, params, ids[s + t], s + t, kb, vb
        )
        np.testing.assert_allclose(
            np.asarray(hs[t]), np.asarray(h), atol=1e-6, rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(k_new[t]), np.asarray(kn), atol=1e-6, rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(ents[t]), np.asarray(ent), atol=1e-5, rtol=1e-5
        )
        kb = jax.lax.dynamic_update_slice(kb, kn, (0, 0, s + t, 0))
        vb = jax.lax.dynamic_update_slice(vb, vn, (0, 0, s + t, 0))
    np.testing.assert_allclose(
        np.asarray(k_buf), np.asarray(kb), atol=1e-6, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(v_buf), np.asarray(vb), atol=1e-6, rtol=1e-6
    )

    # The rollout's appended rows equal prefill's rows at those positions
    # (autoregressive consistency extended over the generated span).
    np.testing.assert_allclose(
        np.asarray(k_buf), np.asarray(keys[:, :, : s + t_steps, :]),
        atol=1e-5, rtol=1e-5,
    )

    # Forcing the self-computed rows reproduces self-append exactly.
    hs_f, _, _, _ = llama_decode_rollout(
        config, params, ids[s:], s, k_buf0, v_buf0,
        forced_keys=k_new, forced_values=v_new,
    )
    np.testing.assert_allclose(
        np.asarray(hs_f), np.asarray(hs), atol=1e-7, rtol=1e-7
    )


def test_mixtral_ep_decode_step_and_rollout_parity():
    """EP-sharded weights must reproduce the unsharded serving path too:
    one decode step and a T-token rollout (the MoE combine all-reduces
    inside every step of the scan)."""
    import jax
    from jax.sharding import Mesh

    from nerf_attention_tpu.models.llama_jax import (
        llama_decode_rollout,
        llama_decode_step,
        shard_llama_params,
    )

    config = LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=4, num_local_experts=4, num_experts_per_tok=2,
    )
    params = init_random_llama(config, seed=9)
    ids = jnp.arange(12, dtype=jnp.int32)
    k_ref, v_ref = llama_prefill_kv(config, params, ids)

    ep_mesh = Mesh(np.array(jax.devices()[:4]), ("ep",))
    sharded = shard_llama_params(params, ep_mesh, axis=None, expert_axis="ep")

    s_pfx, t_roll = 8, 4
    ck, cv = k_ref[:, :, :s_pfx, :], v_ref[:, :, :s_pfx, :]
    h_ref, (kn_ref, _), _ = llama_decode_step(
        config, params, ids[s_pfx], s_pfx, ck, cv
    )
    h_ep, (kn_ep, _), _ = llama_decode_step(
        config, sharded, ids[s_pfx], s_pfx, ck, cv
    )
    np.testing.assert_allclose(np.asarray(h_ep), np.asarray(h_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(kn_ep), np.asarray(kn_ref), atol=1e-4)

    pad = jnp.zeros(ck.shape[:2] + (t_roll, ck.shape[3]), ck.dtype)
    k_buf = jnp.concatenate([ck, pad], axis=2)
    v_buf = jnp.concatenate([cv, pad], axis=2)
    hs_ref, (k_fill_ref, _), _, _ = llama_decode_rollout(
        config, params, ids[s_pfx:], s_pfx, k_buf, v_buf
    )
    hs_ep, (k_fill_ep, _), _, _ = llama_decode_rollout(
        config, sharded, ids[s_pfx:], s_pfx, k_buf, v_buf
    )
    np.testing.assert_allclose(np.asarray(hs_ep), np.asarray(hs_ref), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(k_fill_ep), np.asarray(k_fill_ref), atol=1e-4
    )


def test_shard_llama_params_rejects_expert_axis_on_dense_model():
    import jax
    from jax.sharding import Mesh

    from nerf_attention_tpu.models.llama_jax import shard_llama_params

    config = LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        head_dim=4,
    )
    params = init_random_llama(config)
    mesh = Mesh(np.array(jax.devices()[:4]), ("ep",))
    with pytest.raises(ValueError, match="no MoE leaves"):
        shard_llama_params(params, mesh, axis=None, expert_axis="ep")


@pytest.fixture(scope="module")
def tiny_hf_gpt_oss(tmp_path_factory):
    """A random tiny HF GPT-OSS saved to disk (no network).

    Biases and sinks are re-randomized after init (HF zeros Linear biases)
    so the q/k/v/o bias paths and the sink logits all carry signal the
    parity test would catch if mishandled.
    """
    cfg = transformers.GptOssConfig(
        vocab_size=128, hidden_size=32, intermediate_size=16,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, num_local_experts=4, num_experts_per_tok=2,
        sliding_window=3, max_position_embeddings=64,
        tie_word_embeddings=True, attn_implementation="eager",
    )
    torch.manual_seed(13)
    model = transformers.GptOssForCausalLM(cfg)
    model.eval()
    with torch.no_grad():
        for layer in model.model.layers:
            for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
                getattr(layer.self_attn, proj).bias.normal_(std=0.5)
            layer.self_attn.sinks.normal_(std=1.0)
            layer.mlp.router.bias.normal_(std=0.5)
    d = tmp_path_factory.mktemp("tiny_gpt_oss")
    model.save_pretrained(d, safe_serialization=True)
    return d, model


def test_kv_parity_with_hf_gpt_oss(tiny_hf_gpt_oss):
    """GPT-OSS (11th family): attention sinks (softmax over [scores, sink],
    sink column dropped), alternating sliding/full layers, YaRN rope with
    the attention factor on cos/sin, biased q/k/v/o projections, and the
    interleaved clamped-swiglu MoE. Layer 1's KV sees layer 0's full
    output, so parity covers sinks + MoE + biases end to end."""
    d, model = tiny_hf_gpt_oss
    config, params = load_llama_params(d, dtype=jnp.float32)
    assert config.attn_sinks and config.moe_style == "gpt_oss"
    assert config.num_local_experts == 4
    assert config.layer_windows == (3, None)  # alternating, sliding first
    assert config.yarn_factor == 32.0 and config.yarn_truncate is False
    assert config.attention_scaling == pytest.approx(
        0.1 * np.log(32.0) + 1.0
    )
    assert params["layers"]["gate_up"].shape == (2, 4, 32, 32)
    assert params["layers"]["sinks"].shape == (2, 4)
    assert float(np.abs(params["layers"]["o_bias"]).max()) > 0

    ids = np.array([3, 17, 42, 9, 9, 120, 64, 5], dtype=np.int32)
    # Explicit full DynamicCache: HF's default cache TRIMS sliding layers
    # to the window, while this framework's extraction contract is the
    # full post-RoPE KV for every layer.
    with torch.no_grad():
        out = model(
            torch.from_numpy(ids)[None].long(), use_cache=True,
            past_key_values=transformers.DynamicCache(),
        )
    hf_layers = _hf_kv_layers(out.past_key_values)

    keys, values = llama_prefill_kv(config, params, jnp.asarray(ids))
    assert keys.shape == (2, 2, 8, 8)
    for layer_idx, (hf_k, hf_v) in enumerate(hf_layers):
        np.testing.assert_allclose(
            np.asarray(keys[layer_idx]), hf_k.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3, err_msg=f"keys layer {layer_idx}",
        )
        np.testing.assert_allclose(
            np.asarray(values[layer_idx]), hf_v.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3, err_msg=f"values layer {layer_idx}",
        )


def test_gpt_oss_yarn_rope_matches_hf(tiny_hf_gpt_oss):
    """The yarn branch of _rope_frequencies and the attention factor must
    equal HF's _compute_yarn_parameters for the saved config."""
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    from nerf_attention_tpu.models.llama_jax import _rope_frequencies

    d, model = tiny_hf_gpt_oss
    config, _ = load_llama_params(d, dtype=jnp.float32)
    hf_inv, hf_factor = ROPE_INIT_FUNCTIONS["yarn"](model.config, "cpu")
    np.testing.assert_allclose(
        _rope_frequencies(config), hf_inv.numpy(), rtol=1e-6
    )
    assert config.attention_scaling == pytest.approx(hf_factor)


def test_gpt_oss_decode_rollout_consistency(tiny_hf_gpt_oss):
    """Decode/rollout through sinks + window + MoE: rolling the prefill's
    tokens over a pre-allocated buffer refills exactly the prefill's KV
    rows, and the sink-aware entropy is within the enlarged support's
    bound (log of cache+self+sink outcomes)."""
    from nerf_attention_tpu.models.llama_jax import (
        llama_decode_rollout,
        llama_decode_step,
    )

    d, _ = tiny_hf_gpt_oss
    config, params = load_llama_params(d, dtype=jnp.float32)
    ids = jnp.arange(12, dtype=jnp.int32)
    k_ref, v_ref = llama_prefill_kv(config, params, ids)

    s_pfx, t_roll = 8, 4
    pad = jnp.zeros(k_ref.shape[:2] + (t_roll, k_ref.shape[3]), k_ref.dtype)
    k_buf = jnp.concatenate([k_ref[:, :, :s_pfx, :], pad], axis=2)
    v_buf = jnp.concatenate([v_ref[:, :, :s_pfx, :], pad], axis=2)
    hs, (k_fill, v_fill), _, ents = llama_decode_rollout(
        config, params, ids[s_pfx:], s_pfx, k_buf, v_buf
    )
    np.testing.assert_allclose(np.asarray(k_fill), np.asarray(k_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_fill), np.asarray(v_ref), atol=1e-4)

    h1, _, ent1 = llama_decode_step(
        config, params, ids[s_pfx], s_pfx, k_buf, v_buf
    )
    np.testing.assert_allclose(np.asarray(hs[0]), np.asarray(h1), atol=1e-5)
    # Entropy support: sliding layer sees min(window, pos)+self+sink
    # outcomes, full layer pos+self+sink.
    assert np.all(np.asarray(ents) >= 0.0)
    assert np.all(np.asarray(ents) <= np.log(12 + 2))


def test_gpt_oss_ep_and_tp_prefill_parity(tiny_hf_gpt_oss):
    """EP: gpt_oss expert tensors shard their expert axis (combine closes
    with one all-reduce). TP: attention Megatron-splits while the
    interleaved experts replicate. Both must match the unsharded oracle."""
    import jax
    from jax.sharding import Mesh

    from nerf_attention_tpu.models.llama_jax import shard_llama_params

    d, _ = tiny_hf_gpt_oss
    config, params = load_llama_params(d, dtype=jnp.float32)
    ids = jnp.asarray(np.array([3, 17, 42, 9, 9, 120, 64, 5], np.int32))
    k_ref, v_ref = llama_prefill_kv(config, params, ids)

    ep_mesh = Mesh(np.array(jax.devices()[:4]), ("ep",))
    ep = shard_llama_params(params, ep_mesh, axis=None, expert_axis="ep")
    k_ep, v_ep = llama_prefill_kv(config, ep, ids)
    np.testing.assert_allclose(np.asarray(k_ep), np.asarray(k_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_ep), np.asarray(v_ref), atol=1e-4)

    tp_mesh = Mesh(np.array(jax.devices()[:2]), ("tp",))
    tp = shard_llama_params(params, tp_mesh, axis="tp")
    k_tp, v_tp = llama_prefill_kv(config, tp, ids)
    np.testing.assert_allclose(np.asarray(k_tp), np.asarray(k_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_tp), np.asarray(v_ref), atol=1e-4)


def test_decode_step_capture_sink_mass():
    """capture_sink_mass exposes per-head sink probabilities without
    changing the default outputs; sink mass lives in [0, 1] for a sink
    model and is exactly zero for families without sinks. Raising one
    head's sink logit must raise ITS mass and no other head's."""
    from nerf_attention_tpu.models.llama_jax import llama_decode_step

    config = LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=4, attn_sinks=True,
    )
    params = init_random_llama(config, seed=5)
    ids = jnp.arange(9, dtype=jnp.int32)
    keys, values = llama_prefill_kv(config, params, ids[:8])

    h_ref, (k_ref, v_ref), ent_ref = llama_decode_step(
        config, params, ids[8], 8, keys, values
    )
    h_cap, kv_cap, ent_cap, smass = llama_decode_step(
        config, params, ids[8], 8, keys, values, capture_sink_mass=True
    )
    assert smass.shape == (2, 4)
    s = np.asarray(smass)
    assert ((s >= 0.0) & (s <= 1.0)).all()
    assert s.max() > 0.0  # random sinks hold SOME mass
    np.testing.assert_array_equal(np.asarray(h_cap), np.asarray(h_ref))
    np.testing.assert_array_equal(np.asarray(ent_cap), np.asarray(ent_ref))

    # drive one head's sink logit up: its mass -> ~1, others unchanged
    boosted = {**params, "layers": dict(params["layers"])}
    sinks = np.asarray(boosted["layers"]["sinks"]).copy()
    sinks[1, 2] += 30.0
    boosted["layers"]["sinks"] = jnp.asarray(sinks)
    *_, s_boost = llama_decode_step(
        config, boosted, ids[8], 8, keys, values, capture_sink_mass=True
    )
    s_boost = np.asarray(s_boost)
    assert s_boost[1, 2] > 0.999
    mask = np.ones_like(s, dtype=bool)
    mask[1, 2] = False
    np.testing.assert_allclose(s_boost[mask], s[mask], atol=1e-6)

    # both captures compose: ffn_x then sink mass, in that order
    _, _, _, ffn_x, smass2 = llama_decode_step(
        config, params, ids[8], 8, keys, values,
        capture_ffn_input=True, capture_sink_mass=True,
    )
    assert ffn_x.shape == (2, 1, 16)
    np.testing.assert_array_equal(np.asarray(smass2), s)

    # sink-free family: the capture is all zeros
    config_ns = LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=4,
    )
    params_ns = init_random_llama(config_ns, seed=5)
    k_ns, v_ns = llama_prefill_kv(config_ns, params_ns, ids[:8])
    *_, s_ns = llama_decode_step(
        config_ns, params_ns, ids[8], 8, k_ns, v_ns, capture_sink_mass=True
    )
    assert np.asarray(s_ns).sum() == 0.0


def test_kv_parity_with_hf_qwen3_moe(tmp_path):
    """Qwen3-MoE: qwen3 attention (pre-RoPE QK-norm, no biases) over a
    Mixtral-style sparse-MoE FFN whose experts are sized by
    moe_intermediate_size and whose top-k weights are NOT renormalized
    when norm_topk_prob is false (HF Qwen3MoeSparseMoeBlock's "only diff
    with mixtral"). Layer 1's KV sees layer 0's MoE output, so parity
    covers the un-renormalized routing math."""
    cfg = transformers.Qwen3MoeConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        decoder_sparse_step=1, mlp_only_layers=[],
        max_position_embeddings=64, rope_theta=10000.0,
        use_sliding_window=False,
    )
    torch.manual_seed(13)
    model = transformers.Qwen3MoeForCausalLM(cfg)
    model.eval()
    with torch.no_grad():
        for layer in model.model.layers:
            layer.self_attn.q_norm.weight.normal_(mean=1.0, std=0.3)
            layer.self_attn.k_norm.weight.normal_(mean=1.0, std=0.3)
    model.save_pretrained(tmp_path, safe_serialization=True)

    config, params = load_llama_params(tmp_path, dtype=jnp.float32)
    assert config.qk_norm
    assert config.moe_style == "qwen3_moe"
    assert config.moe_renormalize is False
    assert config.num_local_experts == 4 and config.num_experts_per_tok == 2
    # experts sized by moe_intermediate_size, stacked in mixtral layout
    assert params["layers"]["w1"].shape == (2, 4, 32, 48)
    assert params["layers"]["w2"].shape == (2, 4, 48, 32)

    ids = np.array([7, 99, 3, 42, 5, 5, 18, 76], dtype=np.int32)
    with torch.no_grad():
        out = model(torch.from_numpy(ids)[None].long(), use_cache=True)
    hf_layers = _hf_kv_layers(out.past_key_values)

    keys, values = llama_prefill_kv(config, params, jnp.asarray(ids))
    for layer_idx, (hf_k, hf_v) in enumerate(hf_layers):
        np.testing.assert_allclose(
            np.asarray(keys[layer_idx]), hf_k.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(values[layer_idx]), hf_v.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )

    # the renormalize gate must bite: flipping it diverges layer-1 KV
    import dataclasses

    config_rn = dataclasses.replace(config, moe_renormalize=True)
    keys_rn, _ = llama_prefill_kv(config_rn, params, jnp.asarray(ids))
    assert float(np.abs(np.asarray(keys_rn[1]) - np.asarray(keys[1])).max()) > 1e-4


def test_qwen3_moe_rejects_mixed_dense_sparse_stacks():
    """mlp_only_layers / decoder_sparse_step produce mixed dense+MoE layer
    stacks that cannot share one scanned pytree — reject, never mis-load."""
    base = {
        "model_type": "qwen3_moe", "vocab_size": 128, "hidden_size": 32,
        "intermediate_size": 64, "moe_intermediate_size": 48,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 8,
        "num_experts": 4, "num_experts_per_tok": 2,
    }
    with pytest.raises(NotImplementedError, match="mixed dense/MoE"):
        LlamaConfig.from_hf_dict({**base, "mlp_only_layers": [0]})
    with pytest.raises(NotImplementedError, match="mixed dense/MoE"):
        LlamaConfig.from_hf_dict({**base, "decoder_sparse_step": 2})
    cfg = LlamaConfig.from_hf_dict(base)  # all-sparse default loads
    assert cfg.moe_style == "qwen3_moe"
    assert cfg.intermediate_size == 48  # experts sized by moe_intermediate


def test_qwen3_moe_expert_parallel_prefill_parity(tmp_path):
    """Qwen3-MoE shares Mixtral's stacked expert layout, so the EP
    sharding specs apply unchanged: expert-sharded prefill must match
    the unsharded one (un-renormalized top-k combine included)."""
    import jax
    from jax.sharding import Mesh

    from nerf_attention_tpu.models.llama_jax import shard_llama_params

    cfg = transformers.Qwen3MoeConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        max_position_embeddings=64, use_sliding_window=False,
    )
    torch.manual_seed(21)
    model = transformers.Qwen3MoeForCausalLM(cfg)
    model.eval()
    model.save_pretrained(tmp_path, safe_serialization=True)
    config, params = load_llama_params(tmp_path, dtype=jnp.float32)
    ids = jnp.asarray(np.array([3, 17, 42, 9, 9, 120, 64, 5], np.int32))
    k_ref, v_ref = llama_prefill_kv(config, params, ids)

    ep_mesh = Mesh(np.array(jax.devices()[:4]), ("ep",))
    sharded = shard_llama_params(params, ep_mesh, axis=None, expert_axis="ep")
    k_ep, v_ep = llama_prefill_kv(config, sharded, ids)
    np.testing.assert_allclose(np.asarray(k_ep), np.asarray(k_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_ep), np.asarray(v_ref), atol=1e-4)


def test_kv_parity_with_hf_olmo2(tmp_path):
    """OLMo-2: RMSNorm on the FLAT q/k projections (whole heads*head_dim
    vector, before the head reshape and RoPE) and norm-AFTER-sublayer
    wiring (no pre-norms; h += norm(attn(h)), h += norm(mlp(h))). Layer
    1's KV sees layer 0's reordered residual stream, so parity covers
    the wiring."""
    cfg = transformers.Olmo2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10000.0,
    )
    torch.manual_seed(17)
    model = transformers.Olmo2ForCausalLM(cfg)
    model.eval()
    with torch.no_grad():
        for layer in model.model.layers:
            layer.self_attn.q_norm.weight.normal_(mean=1.0, std=0.3)
            layer.self_attn.k_norm.weight.normal_(mean=1.0, std=0.3)
            layer.post_attention_layernorm.weight.normal_(mean=1.0, std=0.3)
            layer.post_feedforward_layernorm.weight.normal_(mean=1.0, std=0.3)
    model.save_pretrained(tmp_path, safe_serialization=True)

    config, params = load_llama_params(tmp_path, dtype=jnp.float32)
    assert config.qk_norm_full and config.norm_after_only
    assert not config.qk_norm and not config.sandwich_norms
    # flat norms: q over n_q*d=32, k over n_kv*d=16
    assert params["layers"]["q_norm"].shape == (2, 32)
    assert params["layers"]["k_norm"].shape == (2, 16)
    assert params["layers"]["post_ffn_norm"].shape == (2, 32)
    # no input norm exists in this family — the leaf is omitted entirely
    assert "input_norm" not in params["layers"]

    ids = np.array([7, 99, 3, 42, 5, 5, 18, 76], dtype=np.int32)
    with torch.no_grad():
        out = model(torch.from_numpy(ids)[None].long(), use_cache=True)
    hf_layers = _hf_kv_layers(out.past_key_values)

    keys, values = llama_prefill_kv(config, params, jnp.asarray(ids))
    for layer_idx, (hf_k, hf_v) in enumerate(hf_layers):
        np.testing.assert_allclose(
            np.asarray(keys[layer_idx]), hf_k.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(values[layer_idx]), hf_v.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )


def test_olmo2_decode_rollout_consistency():
    """OLMo-2 decode path: rollout over a random tiny model refills the
    same rows prefill computes (the reordered norms and flat QK-norm run
    identically in both paths)."""
    import dataclasses

    from nerf_attention_tpu.models.llama_jax import llama_decode_rollout

    config = LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=4, qk_norm_full=True, norm_after_only=True,
    )
    params = init_random_llama(config, seed=9)
    # random norm weights so the flat-norm path actually bites
    import jax

    lay = dict(params["layers"])
    for i, nm in enumerate(("q_norm", "k_norm", "post_norm", "post_ffn_norm")):
        lay[nm] = lay[nm] + 0.3 * jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(42), i), lay[nm].shape
        )
    params = {**params, "layers": lay}

    ids = jnp.arange(12, dtype=jnp.int32)
    k_ref, v_ref = llama_prefill_kv(config, params, ids)
    s_pfx = 8
    k_buf = jnp.where(
        (jnp.arange(12) < s_pfx)[None, None, :, None], k_ref, 0.0
    )
    v_buf = jnp.where(
        (jnp.arange(12) < s_pfx)[None, None, :, None], v_ref, 0.0
    )
    hs, (k_fill, v_fill), _, _ = llama_decode_rollout(
        config, params, ids[s_pfx:], s_pfx, k_buf, v_buf
    )
    assert np.isfinite(np.asarray(hs)).all()
    np.testing.assert_allclose(
        np.asarray(k_fill), np.asarray(k_ref), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(v_fill), np.asarray(v_ref), atol=1e-4
    )
    # the flat QK-norm must bite: disabling it diverges the keys
    config_off = dataclasses.replace(config, qk_norm_full=False)
    k_off, _ = llama_prefill_kv(config_off, params, ids)
    assert float(np.abs(np.asarray(k_off) - np.asarray(k_ref)).max()) > 1e-3


def test_olmo2_tp_prefill_parity(tmp_path):
    """OLMo-2 under tensor parallelism: the flat whole-projection QK-norm
    reduces across the Megatron head split (mean of squares over ALL
    n_q*d columns), so TP parity specifically exercises the cross-shard
    normalization GSPMD must insert."""
    import jax
    from jax.sharding import Mesh

    from nerf_attention_tpu.models.llama_jax import shard_llama_params

    cfg = transformers.Olmo2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    )
    torch.manual_seed(23)
    model = transformers.Olmo2ForCausalLM(cfg)
    model.eval()
    with torch.no_grad():
        for layer in model.model.layers:
            layer.self_attn.q_norm.weight.normal_(mean=1.0, std=0.3)
            layer.self_attn.k_norm.weight.normal_(mean=1.0, std=0.3)
    model.save_pretrained(tmp_path, safe_serialization=True)
    config, params = load_llama_params(tmp_path, dtype=jnp.float32)

    ids = jnp.asarray(np.array([5, 3, 8, 1, 2, 99], np.int32))
    k_ref, v_ref = llama_prefill_kv(config, params, ids)
    mesh = Mesh(np.array(jax.devices()[:2]), ("tp",))
    sharded = shard_llama_params(params, mesh)
    k_tp, v_tp = llama_prefill_kv(config, sharded, ids)
    np.testing.assert_allclose(np.asarray(k_tp), np.asarray(k_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_tp), np.asarray(v_ref), atol=1e-4)


def test_kv_parity_with_hf_qwen2_moe(tmp_path):
    """Qwen2-MoE: qwen2 attention (QKV biases) over a sparse-MoE FFN with
    a sigmoid-gated SHARED expert added to every token's routed combine
    (HF Qwen2MoeSparseMoeBlock) — previously an explicitly-rejected
    architecture. Layer 1's KV sees layer 0's shared+routed output."""
    cfg = transformers.Qwen2MoeConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=48, shared_expert_intermediate_size=80,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        decoder_sparse_step=1, mlp_only_layers=[],
        max_position_embeddings=64, use_sliding_window=False,
    )
    torch.manual_seed(29)
    model = transformers.Qwen2MoeForCausalLM(cfg)
    model.eval()
    # HF zero-initializes projection biases; randomize so the qwen2-family
    # bias path actually bites in the parity comparison.
    with torch.no_grad():
        for layer in model.model.layers:
            layer.self_attn.q_proj.bias.normal_(std=0.1)
            layer.self_attn.k_proj.bias.normal_(std=0.1)
            layer.self_attn.v_proj.bias.normal_(std=0.1)
    model.save_pretrained(tmp_path, safe_serialization=True)

    config, params = load_llama_params(tmp_path, dtype=jnp.float32)
    assert config.moe_style == "qwen2_moe"
    assert config.shared_expert_intermediate_size == 80
    assert config.moe_renormalize is False
    assert params["layers"]["w1"].shape == (2, 4, 32, 48)
    assert params["layers"]["sh_w1"].shape == (2, 32, 80)
    assert params["layers"]["sh_gate"].shape == (2, 32, 1)
    # qwen2-family attention biases are real tensors, not zeros
    assert float(np.abs(params["layers"]["q_bias"]).max()) > 0

    ids = np.array([7, 99, 3, 42, 5, 5, 18, 76], dtype=np.int32)
    with torch.no_grad():
        out = model(torch.from_numpy(ids)[None].long(), use_cache=True)
    hf_layers = _hf_kv_layers(out.past_key_values)

    keys, values = llama_prefill_kv(config, params, jnp.asarray(ids))
    for layer_idx, (hf_k, hf_v) in enumerate(hf_layers):
        np.testing.assert_allclose(
            np.asarray(keys[layer_idx]), hf_k.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(values[layer_idx]), hf_v.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )

    # the shared expert must bite: zeroing its gate diverges layer-1 KV
    lay = dict(params["layers"])
    lay["sh_gate"] = lay["sh_gate"] - 100.0  # sigmoid -> ~0
    keys_off, _ = llama_prefill_kv(config, {**params, "layers": lay}, jnp.asarray(ids))
    assert float(np.abs(np.asarray(keys_off[1]) - np.asarray(keys[1])).max()) > 1e-4


def test_qwen2_moe_tp_and_ep_prefill_parity(tmp_path):
    """Shared-expert MoE under TP (shared expert Megatron-split) and EP
    (routed experts sharded, shared expert replicated) must match the
    unsharded prefill."""
    import jax
    from jax.sharding import Mesh

    from nerf_attention_tpu.models.llama_jax import shard_llama_params

    cfg = transformers.Qwen2MoeConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=48, shared_expert_intermediate_size=80,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2,
        max_position_embeddings=64, use_sliding_window=False,
    )
    torch.manual_seed(31)
    model = transformers.Qwen2MoeForCausalLM(cfg)
    model.eval()
    model.save_pretrained(tmp_path, safe_serialization=True)
    config, params = load_llama_params(tmp_path, dtype=jnp.float32)
    ids = jnp.asarray(np.array([3, 17, 42, 9, 9, 120, 64, 5], np.int32))
    k_ref, v_ref = llama_prefill_kv(config, params, ids)

    tp_mesh = Mesh(np.array(jax.devices()[:2]), ("tp",))
    k_tp, v_tp = llama_prefill_kv(
        config, shard_llama_params(params, tp_mesh), ids
    )
    np.testing.assert_allclose(np.asarray(k_tp), np.asarray(k_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_tp), np.asarray(v_ref), atol=1e-4)

    ep_mesh = Mesh(np.array(jax.devices()[:4]), ("ep",))
    k_ep, v_ep = llama_prefill_kv(
        config, shard_llama_params(params, ep_mesh, axis=None, expert_axis="ep"),
        ids,
    )
    np.testing.assert_allclose(np.asarray(k_ep), np.asarray(k_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_ep), np.asarray(v_ref), atol=1e-4)


def test_kv_parity_with_hf_granite(tmp_path):
    """Granite: scalar embedding/attention/residual multipliers ("main
    diff with Llama" in HF's own comments). Non-default values on all
    three so each knob bites; layer 1's KV sees layer 0's scaled
    residual stream."""
    cfg = transformers.GraniteConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        embedding_multiplier=12.0, attention_multiplier=0.13,
        residual_multiplier=0.22, max_position_embeddings=64,
    )
    torch.manual_seed(37)
    model = transformers.GraniteForCausalLM(cfg)
    model.eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    config, params = load_llama_params(tmp_path, dtype=jnp.float32)
    assert config.embedding_multiplier == 12.0
    assert config.attn_scale == 0.13
    assert config.residual_multiplier == 0.22

    ids = np.array([7, 99, 3, 42, 5, 5, 18, 76], dtype=np.int32)
    with torch.no_grad():
        out = model(torch.from_numpy(ids)[None].long(), use_cache=True)
    hf_layers = _hf_kv_layers(out.past_key_values)

    keys, values = llama_prefill_kv(config, params, jnp.asarray(ids))
    for layer_idx, (hf_k, hf_v) in enumerate(hf_layers):
        np.testing.assert_allclose(
            np.asarray(keys[layer_idx]), hf_k.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(values[layer_idx]), hf_v.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )

    # decode path consistency: rollout refills what prefill computed
    from nerf_attention_tpu.models.llama_jax import llama_decode_rollout

    ids_j = jnp.asarray(np.concatenate([ids, [11, 23, 4, 90]]).astype(np.int32))
    k_ref, v_ref = llama_prefill_kv(config, params, ids_j)
    mask = (jnp.arange(12) < 8)[None, None, :, None]
    hs, (k_fill, v_fill), _, _ = llama_decode_rollout(
        config, params, ids_j[8:], 8,
        jnp.where(mask, k_ref, 0.0), jnp.where(mask, v_ref, 0.0),
    )
    np.testing.assert_allclose(np.asarray(k_fill), np.asarray(k_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_fill), np.asarray(v_ref), atol=1e-4)


def test_kv_parity_with_hf_cohere(tmp_path):
    """Cohere (command-r): mean-centered LayerNorm everywhere (not RMS),
    PARALLEL attention+MLP residual off one input norm, interleaved rope
    (even/odd lane pairs), per-head LayerNorm QK-norm with per-head
    weights, and biased attention projections — four operators no other
    family uses, all feeding layer 1+'s KV through layer 0's output."""
    cfg = transformers.CohereConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, use_qk_norm=True, attention_bias=True,
        attn_implementation="eager",
    )
    torch.manual_seed(11)
    model = transformers.CohereForCausalLM(cfg)
    model.eval()
    with torch.no_grad():
        # QK-norm weights init to ones — randomize so a transposed or
        # misbroadcast per-head weight mapping cannot hide.
        for layer in model.model.layers:
            layer.self_attn.q_norm.weight.normal_(mean=1.0, std=0.3)
            layer.self_attn.k_norm.weight.normal_(mean=1.0, std=0.3)
    model.save_pretrained(tmp_path, safe_serialization=True)

    config, params = load_llama_params(tmp_path, dtype=jnp.float32)
    assert config.layernorm and config.parallel_residual
    assert config.rope_interleaved and config.qk_norm
    assert params["layers"]["q_norm"].shape == (3, 4, 8)
    assert "post_norm" not in params["layers"]

    ids = np.array([3, 17, 42, 9, 9, 57, 33, 5, 21, 60], dtype=np.int32)
    with torch.no_grad():
        out = model(torch.from_numpy(ids)[None].long(), use_cache=True)
    keys, values = llama_prefill_kv(config, params, jnp.asarray(ids))
    for layer_idx, (hf_k, hf_v) in enumerate(_hf_kv_layers(out.past_key_values)):
        np.testing.assert_allclose(
            np.asarray(keys[layer_idx]), hf_k.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(values[layer_idx]), hf_v.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )


def test_kv_parity_with_hf_cohere2(tmp_path):
    """Cohere2 (command-r7b): cohere's block plus the sliding/full layer
    pattern where full-attention layers get NO rope at all (NoPE) —
    Cohere2Attention gates apply_rotary_pos_emb on the layer's window."""
    cfg = transformers.Cohere2Config(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, sliding_window=4,
        sliding_window_pattern=2, attn_implementation="eager",
    )
    torch.manual_seed(5)
    model = transformers.Cohere2ForCausalLM(cfg)
    model.eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    config, params = load_llama_params(tmp_path, dtype=jnp.float32)
    assert config.layer_windows == (4, None, 4, None)
    assert config.rope_skip_full_layers

    ids = np.array([3, 17, 42, 9, 9, 57, 33, 5, 21, 60], dtype=np.int32)
    with torch.no_grad():
        out = model(torch.from_numpy(ids)[None].long(), use_cache=True)
    keys, values = llama_prefill_kv(config, params, jnp.asarray(ids))

    # The NoPE gate must bite: roping the full layers too would shift
    # their keys (probed: max diff ~0.3 without the skip).
    no_skip = LlamaConfig(
        **{**config.__dict__, "rope_skip_full_layers": False}
    )
    keys_roped, _ = llama_prefill_kv(no_skip, params, jnp.asarray(ids))
    assert not np.allclose(
        np.asarray(keys[1]), np.asarray(keys_roped[1]), atol=1e-3
    )

    # HF's sliding-window cache retains only the window tail; compare the
    # kept rows (same convention as the Mistral sliding-window test).
    for layer_idx, (hf_k, hf_v) in enumerate(_hf_kv_layers(out.past_key_values)):
        hf_k = hf_k.squeeze(0).float().numpy()
        hf_v = hf_v.squeeze(0).float().numpy()
        kept = hf_k.shape[1]
        np.testing.assert_allclose(
            np.asarray(keys[layer_idx])[:, -kept:], hf_k,
            atol=2e-4, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(values[layer_idx])[:, -kept:], hf_v,
            atol=2e-4, rtol=1e-3,
        )


def test_kv_parity_with_hf_glm(tmp_path):
    """GLM (glm-4 9B lineage): PARTIAL rotary — only the first
    head_dim * partial_rotary_factor lanes rotate, interleaved
    (even/odd) lane pairing, the rest pass through — plus a fused
    gate_up MLP projection and biased q/k/v with an unbiased o."""
    cfg = transformers.GlmConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, head_dim=8, pad_token_id=0,
        attn_implementation="eager",
    )
    torch.manual_seed(13)
    model = transformers.GlmForCausalLM(cfg)
    model.eval()
    with torch.no_grad():
        # HF zero-inits attention biases; randomize so the glm bias path
        # (biased q/k/v, unbiased o — GlmConfig attention_bias=True)
        # actually bites in the comparison.
        for layer in model.model.layers:
            layer.self_attn.q_proj.bias.normal_(std=0.05)
            layer.self_attn.k_proj.bias.normal_(std=0.05)
            layer.self_attn.v_proj.bias.normal_(std=0.05)
    model.save_pretrained(tmp_path, safe_serialization=True)

    config, params = load_llama_params(tmp_path, dtype=jnp.float32)
    assert config.rotary_dim == 4 and config.rope_interleaved
    assert not config.sandwich_norms
    assert float(np.abs(np.asarray(params["layers"]["k_bias"])).max()) > 0

    ids = np.array([3, 17, 42, 9, 9, 57, 33, 5, 21, 60], dtype=np.int32)
    with torch.no_grad():
        out = model(torch.from_numpy(ids)[None].long(), use_cache=True)
    keys, values = llama_prefill_kv(config, params, jnp.asarray(ids))
    for layer_idx, (hf_k, hf_v) in enumerate(_hf_kv_layers(out.past_key_values)):
        np.testing.assert_allclose(
            np.asarray(keys[layer_idx]), hf_k.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(values[layer_idx]), hf_v.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )


def test_kv_parity_with_hf_glm4(tmp_path):
    """GLM-4: glm's partial interleaved rotary plus gemma2's sandwich
    wiring under DIFFERENT checkpoint names — post_self_attn_layernorm
    norms the attention output before its residual add,
    post_attention_layernorm is the pre-FFN norm, post_mlp_layernorm the
    FFN-output norm (Glm4DecoderLayer)."""
    cfg = transformers.Glm4Config(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, head_dim=8, pad_token_id=0,
        attn_implementation="eager",
    )
    torch.manual_seed(17)
    model = transformers.Glm4ForCausalLM(cfg)
    model.eval()
    with torch.no_grad():
        # All four norm families init to ones — randomize so a swapped
        # sandwich-norm name mapping cannot hide.
        for layer in model.model.layers:
            layer.post_self_attn_layernorm.weight.normal_(mean=1.0, std=0.3)
            layer.post_attention_layernorm.weight.normal_(mean=1.0, std=0.3)
            layer.post_mlp_layernorm.weight.normal_(mean=1.0, std=0.3)
    model.save_pretrained(tmp_path, safe_serialization=True)

    config, params = load_llama_params(tmp_path, dtype=jnp.float32)
    assert config.sandwich_norms and config.rotary_dim == 4

    ids = np.array([3, 17, 42, 9, 9, 57, 33, 5, 21, 60], dtype=np.int32)
    with torch.no_grad():
        out = model(torch.from_numpy(ids)[None].long(), use_cache=True)
    keys, values = llama_prefill_kv(config, params, jnp.asarray(ids))
    for layer_idx, (hf_k, hf_v) in enumerate(_hf_kv_layers(out.past_key_values)):
        np.testing.assert_allclose(
            np.asarray(keys[layer_idx]), hf_k.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(values[layer_idx]), hf_v.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )


def test_kv_parity_with_hf_phi3_partial_rotary(tmp_path):
    """Phi-3 with partial_rotary_factor < 1 (the phi-3-small layout):
    the first rotary_dim lanes rotate with CONCATENATED-halves pairing
    (unlike GLM's interleave), the tail passes through — previously an
    explicitly-rejected configuration."""
    cfg = transformers.Phi3Config(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, partial_rotary_factor=0.5,
        pad_token_id=0, attn_implementation="eager",
    )
    torch.manual_seed(19)
    model = transformers.Phi3ForCausalLM(cfg)
    model.eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    config, params = load_llama_params(tmp_path, dtype=jnp.float32)
    assert config.rotary_dim == 4 and not config.rope_interleaved

    ids = np.array([3, 17, 42, 9, 9, 57, 33, 5, 21, 60], dtype=np.int32)
    with torch.no_grad():
        out = model(torch.from_numpy(ids)[None].long(), use_cache=True)
    keys, values = llama_prefill_kv(config, params, jnp.asarray(ids))
    for layer_idx, (hf_k, hf_v) in enumerate(_hf_kv_layers(out.past_key_values)):
        np.testing.assert_allclose(
            np.asarray(keys[layer_idx]), hf_k.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(values[layer_idx]), hf_v.squeeze(0).float().numpy(),
            atol=2e-4, rtol=1e-3,
        )


def test_cohere_tp_prefill_parity(tmp_path):
    """Cohere under tensor parallelism: the per-head QK-norm weights
    (heads, head_dim) shard along the SAME head axis as their projections
    (each head normalizes within itself — no cross-shard reduction), and
    the parallel-residual block must still sum both sublayers once."""
    import jax
    from jax.sharding import Mesh

    from nerf_attention_tpu.models.llama_jax import shard_llama_params

    cfg = transformers.CohereConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, use_qk_norm=True,
    )
    torch.manual_seed(29)
    model = transformers.CohereForCausalLM(cfg)
    model.eval()
    with torch.no_grad():
        for layer in model.model.layers:
            layer.self_attn.q_norm.weight.normal_(mean=1.0, std=0.3)
            layer.self_attn.k_norm.weight.normal_(mean=1.0, std=0.3)
    model.save_pretrained(tmp_path, safe_serialization=True)
    config, params = load_llama_params(tmp_path, dtype=jnp.float32)

    ids = jnp.asarray(np.array([5, 3, 8, 1, 2, 77], np.int32))
    k_ref, v_ref = llama_prefill_kv(config, params, ids)
    mesh = Mesh(np.array(jax.devices()[:2]), ("tp",))
    sharded = shard_llama_params(params, mesh)
    assert sharded["layers"]["q_norm"].shape == (2, 4, 8)
    k_tp, v_tp = llama_prefill_kv(config, sharded, ids)
    np.testing.assert_allclose(np.asarray(k_tp), np.asarray(k_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_tp), np.asarray(v_ref), atol=1e-4)


def test_cohere_tp_nondividing_kv_heads_falls_back_to_replication(tmp_path):
    """Per-head QK-norm weights shard along the head axis ONLY when the mesh
    axis divides the head count; otherwise NamedSharding placement would
    fail outright, so shard_llama_params must fall back to replicating the
    (tiny) norm while the projections stay sharded — and parity must hold."""
    import jax
    from jax.sharding import Mesh

    from nerf_attention_tpu.models.llama_jax import shard_llama_params

    cfg = transformers.CohereConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, use_qk_norm=True,
    )
    torch.manual_seed(31)
    model = transformers.CohereForCausalLM(cfg)
    model.eval()
    with torch.no_grad():
        for layer in model.model.layers:
            layer.self_attn.q_norm.weight.normal_(mean=1.0, std=0.3)
            layer.self_attn.k_norm.weight.normal_(mean=1.0, std=0.3)
    model.save_pretrained(tmp_path, safe_serialization=True)
    config, params = load_llama_params(tmp_path, dtype=jnp.float32)

    ids = jnp.asarray(np.array([5, 3, 8, 1, 2, 77], np.int32))
    k_ref, v_ref = llama_prefill_kv(config, params, ids)
    # tp=4 divides q_norm's 4 heads but NOT k_norm's 2 kv-heads.
    mesh = Mesh(np.array(jax.devices()[:4]), ("tp",))
    sharded = shard_llama_params(params, mesh)
    qspec = sharded["layers"]["q_norm"].sharding.spec
    kspec = sharded["layers"]["k_norm"].sharding.spec
    assert qspec[1] == "tp" and kspec[1] is None
    k_tp, v_tp = llama_prefill_kv(config, sharded, ids)
    np.testing.assert_allclose(np.asarray(k_tp), np.asarray(k_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_tp), np.asarray(v_ref), atol=1e-4)


@pytest.mark.parametrize("family", ["glm", "glm4"])
def test_glm_tp_prefill_parity(family, tmp_path):
    """GLM/GLM-4 under tensor parallelism: partial interleaved rotary is
    head-local (each head rotates its own first rotary_dim lanes), so the
    Megatron head split must be exact — and for glm4 the sandwich norms
    (full-hidden RMSNorms on the all-reduced sublayer outputs) must see the
    complete activation, not a shard."""
    import jax
    from jax.sharding import Mesh

    from nerf_attention_tpu.models.llama_jax import shard_llama_params

    cls_cfg, cls_model = (
        (transformers.GlmConfig, transformers.GlmForCausalLM)
        if family == "glm"
        else (transformers.Glm4Config, transformers.Glm4ForCausalLM)
    )
    cfg = cls_cfg(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, head_dim=8, pad_token_id=0,
        attn_implementation="eager",
    )
    torch.manual_seed(37)
    model = cls_model(cfg)
    model.eval()
    with torch.no_grad():
        for layer in model.model.layers:
            layer.self_attn.q_proj.bias.normal_(std=0.05)
            layer.self_attn.k_proj.bias.normal_(std=0.05)
            layer.self_attn.v_proj.bias.normal_(std=0.05)
    model.save_pretrained(tmp_path, safe_serialization=True)
    config, params = load_llama_params(tmp_path, dtype=jnp.float32)
    assert config.rotary_dim == 4 and config.rope_interleaved

    ids = jnp.asarray(np.array([3, 17, 42, 9, 9, 57], np.int32))
    k_ref, v_ref = llama_prefill_kv(config, params, ids)
    mesh = Mesh(np.array(jax.devices()[:2]), ("tp",))
    sharded = shard_llama_params(params, mesh)
    k_tp, v_tp = llama_prefill_kv(config, sharded, ids)
    np.testing.assert_allclose(np.asarray(k_tp), np.asarray(k_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_tp), np.asarray(v_ref), atol=1e-4)


_FAMILY_SMOKE_DICTS = {
    "llama": {},
    "mistral": {"sliding_window": 6},
    "qwen2": {"use_sliding_window": False},
    "qwen2_moe": {
        "num_experts": 4, "num_experts_per_tok": 2,
        "moe_intermediate_size": 24, "shared_expert_intermediate_size": 40,
        "use_sliding_window": False,
    },
    "qwen3": {"use_sliding_window": False},
    "qwen3_moe": {
        "num_experts": 4, "num_experts_per_tok": 2,
        "moe_intermediate_size": 24, "use_sliding_window": False,
    },
    "gemma": {},
    "gemma2": {"sliding_window": 6},
    "gemma3_text": {"sliding_window": 6, "sliding_window_pattern": 2,
                    "rope_local_base_freq": 10000.0},
    "phi3": {},
    "mixtral": {"num_local_experts": 4, "num_experts_per_tok": 2},
    "gpt_oss": {"num_local_experts": 4, "num_experts_per_tok": 2,
                "sliding_window": 6},
    "olmo2": {},
    "granite": {"embedding_multiplier": 4.0, "attention_multiplier": 0.2,
                "residual_multiplier": 0.5},
    "cohere": {"use_qk_norm": True, "layer_norm_eps": 1e-5},
    "cohere2": {"sliding_window": 6, "sliding_window_pattern": 2},
    "glm": {"partial_rotary_factor": 0.5},
    "glm4": {"partial_rotary_factor": 0.5},
}


@pytest.mark.parametrize("model_type", sorted(_FAMILY_SMOKE_DICTS))
def test_family_config_prefill_decode_rollout_smoke(model_type):
    """Every supported family's config round-trips from_hf_dict ->
    init_random_llama -> prefill -> rollout, and the rollout refills
    exactly the rows prefill computed — one guard over the shared
    forward/decode code paths for all 19 architectures (DeepSeek MLA
    lives in models/mla_jax.py with its own suite)."""
    from nerf_attention_tpu.models.llama_jax import llama_decode_rollout

    d = {
        "model_type": model_type,
        "vocab_size": 64, "hidden_size": 16, "intermediate_size": 32,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 4,
        "max_position_embeddings": 64,
        **_FAMILY_SMOKE_DICTS[model_type],
    }
    config = LlamaConfig.from_hf_dict(d)
    params = init_random_llama(config, seed=3)
    ids = jnp.arange(12, dtype=jnp.int32)
    k_ref, v_ref = llama_prefill_kv(config, params, ids)
    assert np.isfinite(np.asarray(k_ref)).all()
    assert np.isfinite(np.asarray(v_ref)).all()

    s_pfx = 8
    mask = (jnp.arange(12) < s_pfx)[None, None, :, None]
    hs, (k_fill, v_fill), _, _ = llama_decode_rollout(
        config, params, ids[s_pfx:], s_pfx,
        jnp.where(mask, k_ref, 0.0), jnp.where(mask, v_ref, 0.0),
    )
    assert np.isfinite(np.asarray(hs)).all()
    np.testing.assert_allclose(
        np.asarray(k_fill), np.asarray(k_ref), atol=1e-4, rtol=1e-4,
        err_msg=model_type,
    )
    np.testing.assert_allclose(
        np.asarray(v_fill), np.asarray(v_ref), atol=1e-4, rtol=1e-4,
        err_msg=model_type,
    )
