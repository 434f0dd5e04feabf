"""DeepSeek-V2/V3 MLA backend (`models/mla_jax.py`).

Parity contract is the installed transformers (4.57): tiny random HF
models saved to disk, loaded by `load_mla_params`, prefill KV compared
tensor-for-tensor against HF's DynamicCache. Covers both rope
conventions (V2 complex-interleaved, V3 de-interleave and plain), both
router families (V2 softmax greedy / group-limited, V3 sigmoid + bias +
top-2 group scores), YaRN scaling, the q LoRA and full-q variants, and
the latent cache's exactness guarantees.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch
import transformers

import jax.numpy as jnp

from nerf_attention_tpu.models.mla_jax import (
    MLAConfig,
    init_random_mla,
    load_mla_params,
    materialize_from_latent,
    mla_decode_rollout,
    mla_decode_step,
    mla_decode_step_absorbed,
    mla_decode_step_latent,
    mla_prefill_kv,
)


def _hf_kv_layers(past):
    if hasattr(past, "layers"):  # transformers v5 layout
        return [(l.keys, l.values) for l in past.layers]
    if hasattr(past, "key_cache"):
        return list(zip(past.key_cache, past.value_cache))
    return [(k, v) for k, v in past]


TINY_MLA = dict(
    vocab_size=128,
    hidden_size=32,
    intermediate_size=48,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=4,
    kv_lora_rank=16,
    q_lora_rank=24,
    qk_nope_head_dim=8,
    qk_rope_head_dim=4,
    v_head_dim=8,
    first_k_dense_replace=1,
    moe_intermediate_size=16,
    n_routed_experts=8,
    num_experts_per_tok=2,
    n_shared_experts=1,
    routed_scaling_factor=2.5,
    max_position_embeddings=64,
    tie_word_embeddings=True,
    attention_bias=False,
)

IDS = np.array([3, 17, 42, 9, 9, 120, 64, 5], dtype=np.int32)


def _save_tiny(tmp_path_factory, cls, name, seed, **kw):
    cfg = cls(**kw)
    torch.manual_seed(seed)
    model = transformers.AutoModelForCausalLM.from_config(cfg)
    model.eval()
    d = tmp_path_factory.mktemp(name)
    model.save_pretrained(d, safe_serialization=True)
    return d, model


def _assert_prefill_parity(model_dir, hf_model, atol=3e-4):
    config, params = load_mla_params(model_dir)
    with torch.no_grad():
        out = hf_model(
            torch.from_numpy(IDS)[None].long(), use_cache=True
        )
    hf_layers = _hf_kv_layers(out.past_key_values)
    keys, values = mla_prefill_kv(config, params, jnp.asarray(IDS))
    assert keys.shape[-1] == config.qk_head_dim
    assert values.shape[-1] == config.v_head_dim
    for i, (hf_k, hf_v) in enumerate(hf_layers):
        np.testing.assert_allclose(
            np.asarray(keys[i]), hf_k.squeeze(0).float().numpy(),
            atol=atol, rtol=1e-3, err_msg=f"layer {i} keys",
        )
        np.testing.assert_allclose(
            np.asarray(values[i]), hf_v.squeeze(0).float().numpy(),
            atol=atol, rtol=1e-3, err_msg=f"layer {i} values",
        )
    return config, params


@pytest.fixture(scope="module")
def tiny_hf_v3(tmp_path_factory):
    """Random tiny DeepSeek-V3: q LoRA, 1 dense + 2 MoE layers (sigmoid
    router, bias, 2 groups with top-2 group scores, shared expert),
    interleaved rope (the V3 default)."""
    return _save_tiny(
        tmp_path_factory, transformers.DeepseekV3Config, "tiny_dsv3", 5,
        n_group=2, topk_group=1, norm_topk_prob=True, **TINY_MLA,
    )


def test_kv_parity_with_hf_deepseek_v3(tiny_hf_v3):
    d, model = tiny_hf_v3
    config, params = _assert_prefill_parity(d, model)
    assert config.model_type == "deepseek_v3"
    assert config.rope_interleave is True
    assert config.num_dense_layers == 1 and config.num_moe_layers == 2
    assert params["moe_layers"]["router_bias"].shape == (2, 8)
    # V3 router bias is a buffer initialized to zeros; perturb it and
    # verify it actually moves the routing-dependent KV of later layers
    # (guards against silently ignoring the correction bias).
    import jax.numpy as jnp_

    bumped = {
        **params,
        "moe_layers": {
            **params["moe_layers"],
            "router_bias": params["moe_layers"]["router_bias"]
            + jnp_.asarray(np.linspace(-2, 2, 8, dtype=np.float32))[None, :],
        },
    }
    k0, _ = mla_prefill_kv(config, params, jnp.asarray(IDS))
    k1, _ = mla_prefill_kv(config, bumped, jnp.asarray(IDS))
    assert float(jnp.abs(k1[2] - k0[2]).max()) > 1e-6


def test_kv_parity_v3_plain_rope_and_full_q(tmp_path_factory):
    """rope_interleave=False (plain rotate-half) + q_lora_rank=None
    (full q_proj) — the two config branches the default fixture misses."""
    kw = dict(TINY_MLA, q_lora_rank=None)
    d, model = _save_tiny(
        tmp_path_factory, transformers.DeepseekV3Config,
        "tiny_dsv3_plain", 7, rope_interleave=False,
        n_group=2, topk_group=2, norm_topk_prob=False, **kw,
    )
    config, params = _assert_prefill_parity(d, model)
    assert config.rope_interleave is False
    assert "q" in params["dense_layers"] and "q_a" not in params["dense_layers"]


def test_kv_parity_with_hf_deepseek_v2_greedy(tmp_path_factory):
    """V2: complex/interleaved rope, softmax router, greedy top-k."""
    d, model = _save_tiny(
        tmp_path_factory, transformers.DeepseekV2Config, "tiny_dsv2", 3,
        topk_method="greedy", n_group=None, topk_group=None,
        aux_loss_alpha=0.0, **TINY_MLA,
    )
    config, params = _assert_prefill_parity(d, model)
    assert config.model_type == "deepseek_v2"
    assert "router_bias" not in params["moe_layers"]


def test_kv_parity_with_hf_deepseek_v2_group_limited(tmp_path_factory):
    """V2 group_limited_greedy: group score = max over the group."""
    d, model = _save_tiny(
        tmp_path_factory, transformers.DeepseekV2Config, "tiny_dsv2_gl", 13,
        topk_method="group_limited_greedy", n_group=4, topk_group=2,
        aux_loss_alpha=0.0, **TINY_MLA,
    )
    _assert_prefill_parity(d, model)


def test_kv_parity_v3_yarn(tmp_path_factory):
    """YaRN rope scaling (what real DeepSeek checkpoints ship): ramped
    interpolation inv_freqs, attention factor on cos/sin, mscale² on the
    logit scale."""
    d, model = _save_tiny(
        tmp_path_factory, transformers.DeepseekV3Config, "tiny_dsv3_yarn", 9,
        n_group=2, topk_group=1, norm_topk_prob=True,
        rope_scaling={
            "rope_type": "yarn",
            "factor": 8.0,
            "beta_fast": 32,
            "beta_slow": 1,
            "mscale": 1.0,
            "mscale_all_dim": 1.0,
            "original_max_position_embeddings": 16,
        },
        **TINY_MLA,
    )
    config, params = _assert_prefill_parity(d, model)
    assert config.yarn_factor == 8.0
    assert config.attn_scale != pytest.approx(config.qk_head_dim**-0.5)


def test_decode_step_matches_prefill(tiny_hf_v3):
    """Decoding token S over the first S rows reproduces the prefill's
    row S (K, V) and hidden path — autoregressive consistency through
    dense + MoE layers."""
    d, _ = tiny_hf_v3
    config, params = load_mla_params(d)
    ids = jnp.asarray(IDS)
    keys, values = mla_prefill_kv(config, params, ids)
    s = 6
    h, (k_new, v_new), entropy = mla_decode_step(
        config, params, ids[s], s, keys[:, :, :s, :], values[:, :, :s, :]
    )
    np.testing.assert_allclose(
        np.asarray(k_new[:, :, 0, :]), np.asarray(keys[:, :, s, :]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(v_new[:, :, 0, :]), np.asarray(values[:, :, s, :]), atol=1e-5
    )
    assert entropy.shape == (3, 4)
    assert np.isfinite(np.asarray(entropy)).all()


def test_latent_cache_is_exact(tiny_hf_v3):
    """The latent cache is lossless: materialize_from_latent reproduces
    the prefill's materialized K/V exactly, and the latent decode step
    equals the materialized decode step bit-for-bit."""
    d, _ = tiny_hf_v3
    config, params = load_mla_params(d)
    ids = jnp.asarray(IDS)
    keys, values, latents = mla_prefill_kv(config, params, ids, return_latent=True)
    assert latents.shape == (3, 8, config.latent_dim)

    kv_b = jnp.concatenate(
        [params["dense_layers"]["kv_b"], params["moe_layers"]["kv_b"]], axis=0
    )
    for layer in range(3):
        k_m, v_m = materialize_from_latent(config, latents[layer], kv_b[layer])
        np.testing.assert_array_equal(np.asarray(k_m), np.asarray(keys[layer]))
        np.testing.assert_array_equal(np.asarray(v_m), np.asarray(values[layer]))

    s = 6
    h_mat, _, ent_mat = mla_decode_step(
        config, params, ids[s], s, keys[:, :, :s, :], values[:, :, :s, :]
    )
    h_lat, lat_new, ent_lat = mla_decode_step_latent(
        config, params, ids[s], s, latents[:, :s, :]
    )
    np.testing.assert_array_equal(np.asarray(h_mat), np.asarray(h_lat))
    np.testing.assert_array_equal(np.asarray(ent_mat), np.asarray(ent_lat))
    np.testing.assert_allclose(
        np.asarray(lat_new[:, 0, :]), np.asarray(latents[:, s, :]), atol=1e-5
    )


def test_absorbed_decode_matches_latent(tiny_hf_v3):
    """Weight absorption is a re-association, not an approximation: the
    absorbed step (attention in latent space, per-head K/V never formed)
    reproduces the rematerializing latent step through dense + MoE
    layers to fp32 matmul-reassociation tolerance."""
    d, _ = tiny_hf_v3
    config, params = load_mla_params(d)
    ids = jnp.asarray(IDS)
    _, _, latents = mla_prefill_kv(config, params, ids, return_latent=True)
    s = 6
    h_lat, lat_new_l, ent_lat = mla_decode_step_latent(
        config, params, ids[s], s, latents[:, :s, :]
    )
    h_abs, lat_new_a, ent_abs = mla_decode_step_absorbed(
        config, params, ids[s], s, latents[:, :s, :]
    )
    assert lat_new_a.shape == (3, 1, config.latent_dim)
    np.testing.assert_allclose(
        np.asarray(h_abs), np.asarray(h_lat), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ent_abs), np.asarray(ent_lat), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(lat_new_a), np.asarray(lat_new_l), atol=1e-5
    )


def test_absorbed_pallas_step_matches_xla(tiny_hf_v3):
    """The fused one-pass cache kernel (`ops/mla_absorbed_pallas.py`) is
    a lowering of the absorbed step, not a reformulation: h, the new
    latent row, and the per-head entropies match the XLA absorbed step
    through dense + MoE layers (interpret mode off-TPU)."""
    d, _ = tiny_hf_v3
    config, params = load_mla_params(d)
    ids = jnp.asarray(IDS)
    _, _, latents = mla_prefill_kv(config, params, ids, return_latent=True)
    s = 6
    h_x, lat_x, ent_x = mla_decode_step_absorbed(
        config, params, ids[s], s, latents[:, :s, :]
    )
    h_p, lat_p, ent_p = mla_decode_step_absorbed(
        config, params, ids[s], s, latents[:, :s, :], attn_impl="pallas"
    )
    np.testing.assert_allclose(
        np.asarray(h_p), np.asarray(h_x), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ent_p), np.asarray(ent_x), atol=1e-5
    )
    # Later layers' latent rows see an h perturbed by the kernel's matmul
    # re-association — close, not bit-equal.
    np.testing.assert_allclose(
        np.asarray(lat_p), np.asarray(lat_x), atol=1e-5
    )


def test_absorbed_pallas_kernel_oracle():
    """Direct kernel-vs-oracle parity where the kernel's online machinery
    actually engages: multiple cache tiles (tile < S), a partially
    filled pre-allocated buffer (position < S_buf, garbage rows beyond),
    and the empty-cache edge (position=0: only the self row attends —
    the all-masked first tiles must be annihilated, not NaN)."""
    import jax

    from nerf_attention_tpu.ops.mla_absorbed_pallas import (
        mla_absorbed_attention,
    )

    h_heads, r, rope = 4, 16, 4
    latent_dim = r + rope
    s_buf = 40
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(h_heads, latent_dim), jnp.float32)
    cache = jnp.asarray(rng.randn(s_buf, latent_dim), jnp.float32)
    new = jnp.asarray(rng.randn(1, latent_dim), jnp.float32)
    scale = (r + rope) ** -0.5

    def oracle(pos):
        lat_full = jnp.concatenate([cache, new], axis=0)
        s = (q @ lat_full.T) * scale  # (H, S_buf+1)
        cols = jnp.arange(s_buf + 1)
        keep = (cols < pos) | (cols == s_buf)
        s = jnp.where(keep[None, :], s, jnp.finfo(jnp.float32).min)
        p = jax.nn.softmax(s, axis=-1)
        ent = -jnp.sum(jnp.where(p > 0, p * jnp.log(p), 0.0), axis=-1)
        return p @ lat_full[:, :r], ent

    for pos in (0, 7, 23, s_buf):
        o_ref, ent_ref = oracle(pos)
        o_k, ent_k = mla_absorbed_attention(
            q, cache, new, pos, kv_lora_rank=r, scale=scale, tile=16
        )
        np.testing.assert_allclose(
            np.asarray(o_k), np.asarray(o_ref), atol=1e-5, rtol=1e-5,
            err_msg=f"o_lat at position {pos}",
        )
        np.testing.assert_allclose(
            np.asarray(ent_k), np.asarray(ent_ref), atol=1e-5,
            err_msg=f"entropy at position {pos}",
        )

    # A literally 0-row cache buffer (first token of a fresh sequence,
    # no pre-allocation): must not divide by zero sizing the tile grid;
    # equals the self-row-only oracle. Regression: r4 self-review.
    o_ref0, ent_ref0 = oracle(0)
    o_k0, ent_k0 = mla_absorbed_attention(
        q, cache[:0], new, 0, kv_lora_rank=r, scale=scale, tile=16
    )
    np.testing.assert_allclose(
        np.asarray(o_k0), np.asarray(o_ref0), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ent_k0), np.asarray(ent_ref0), atol=1e-5
    )


def test_mla_decode_rollout_replays_prefill(tiny_hf_v3):
    """The absorbed rollout is autoregressive-consistent: replaying the
    prefill's tokens over a pre-allocated latent buffer reproduces the
    prefill's latent rows, and its last hidden state equals the
    single-step absorbed decode at that position."""
    d, _ = tiny_hf_v3
    config, params = load_mla_params(d)
    ids = jnp.asarray(IDS)
    _, _, latents = mla_prefill_kv(config, params, ids, return_latent=True)
    start = 5
    buf = jnp.zeros((3, len(IDS), config.latent_dim))
    buf = buf.at[:, :start, :].set(latents[:, :start, :])
    hs, lat_buf, lat_new, ents = mla_decode_rollout(
        config, params, ids[start:], start, buf
    )
    t = len(IDS) - start
    assert hs.shape == (t, config.hidden_size)
    assert lat_new.shape == (t, 3, 1, config.latent_dim)
    assert ents.shape == (t, 3, config.num_attention_heads)
    np.testing.assert_allclose(
        np.asarray(lat_buf), np.asarray(latents), atol=1e-5
    )
    h_last, _, _ = mla_decode_step_absorbed(
        config, params, ids[-1], len(IDS) - 1, latents[:, :-1, :]
    )
    np.testing.assert_allclose(
        np.asarray(hs[-1]), np.asarray(h_last), atol=1e-5, rtol=1e-5
    )
    # The fused-kernel rollout walks the same pre-allocated buffer
    # (position < S_buf every step — the kernel's masking contract under
    # the serving loop) and reproduces the XLA rollout.
    hs_p, lat_buf_p, _, ents_p = mla_decode_rollout(
        config, params, ids[start:], start, buf, attn_impl="pallas"
    )
    np.testing.assert_allclose(
        np.asarray(hs_p), np.asarray(hs), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(lat_buf_p), np.asarray(lat_buf), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ents_p), np.asarray(ents), atol=1e-5
    )


def test_mla_tp_prefill_parity(tiny_hf_v3):
    """Head-sharded q/kv_b/o with a REPLICATED latent path reproduces the
    unsharded prefill (K, V, and the latent rows) on a 4-way TP mesh —
    the MLA twin of `test_shard_llama_params_tp_mesh`."""
    import jax
    from jax.sharding import Mesh

    from nerf_attention_tpu.models.mla_jax import shard_mla_params

    d, _ = tiny_hf_v3
    config, params = load_mla_params(d)
    ids = jnp.asarray(IDS)
    k_ref, v_ref, lat_ref = mla_prefill_kv(config, params, ids, return_latent=True)

    mesh = Mesh(np.array(jax.devices()[:4]), ("tp",))
    sharded = shard_mla_params(params, mesh)
    k_tp, v_tp, lat_tp = mla_prefill_kv(config, sharded, ids, return_latent=True)
    np.testing.assert_allclose(np.asarray(k_tp), np.asarray(k_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_tp), np.asarray(v_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lat_tp), np.asarray(lat_ref), atol=1e-4)


def test_mla_tp_absorbed_decode_parity(tiny_hf_v3):
    """The absorbed serving step under TP: per-head latent contractions run
    rank-local against the replicated latent cache, one all-reduce at the
    o-projection — output, new latent row, and per-head entropies match
    the unsharded step."""
    import jax
    from jax.sharding import Mesh

    from nerf_attention_tpu.models.mla_jax import shard_mla_params

    d, _ = tiny_hf_v3
    config, params = load_mla_params(d)
    ids = jnp.asarray(IDS)
    _, _, latents = mla_prefill_kv(config, params, ids, return_latent=True)
    s = 6
    h_ref, lat_ref, ent_ref = mla_decode_step_absorbed(
        config, params, ids[s], s, latents[:, :s, :]
    )

    mesh = Mesh(np.array(jax.devices()[:4]), ("tp",))
    sharded = shard_mla_params(params, mesh)
    h_tp, lat_tp, ent_tp = mla_decode_step_absorbed(
        config, sharded, ids[s], s, latents[:, :s, :]
    )
    np.testing.assert_allclose(
        np.asarray(h_tp), np.asarray(h_ref), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(np.asarray(lat_tp), np.asarray(lat_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ent_tp), np.asarray(ent_ref), atol=1e-4)

    # The fused cache kernel composes with TP sharding (GSPMD lowers the
    # pallas_call against head-sharded q / replicated cache).
    h_tpp, lat_tpp, ent_tpp = mla_decode_step_absorbed(
        config, sharded, ids[s], s, latents[:, :s, :], attn_impl="pallas"
    )
    np.testing.assert_allclose(
        np.asarray(h_tpp), np.asarray(h_ref), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(np.asarray(ent_tpp), np.asarray(ent_ref), atol=1e-4)


def test_mla_tp_ep_2d_mesh_parity(tiny_hf_v3):
    """2-D (ep, tp) mesh: attention tensor-parallel x routed experts
    expert-parallel in one program — prefill and the absorbed rollout
    both match single-device."""
    import jax
    from jax.sharding import Mesh

    from nerf_attention_tpu.models.mla_jax import shard_mla_params

    d, _ = tiny_hf_v3
    config, params = load_mla_params(d)
    ids = jnp.asarray(IDS)
    k_ref, v_ref, lat_ref = mla_prefill_kv(config, params, ids, return_latent=True)

    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("ep", "tp"))
    sharded = shard_mla_params(params, mesh, axis="tp", expert_axis="ep")
    k_2d, v_2d, _ = mla_prefill_kv(config, sharded, ids, return_latent=True)
    np.testing.assert_allclose(np.asarray(k_2d), np.asarray(k_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_2d), np.asarray(v_ref), atol=1e-4)

    start = 5
    buf = jnp.zeros((3, len(IDS), config.latent_dim))
    buf = buf.at[:, :start, :].set(lat_ref[:, :start, :])
    hs_ref, _, _, _ = mla_decode_rollout(config, params, ids[start:], start, buf)
    hs_2d, _, _, _ = mla_decode_rollout(config, sharded, ids[start:], start, buf)
    np.testing.assert_allclose(
        np.asarray(hs_2d), np.asarray(hs_ref), atol=1e-4, rtol=1e-4
    )


def test_latent_cache_is_smaller_than_materialized(tiny_hf_v3):
    """The architecture's own compression: latent bytes per token vs the
    materialized cache's H * (qk + v) — the ratio the latent study trades
    against fit quality."""
    d, _ = tiny_hf_v3
    config, _ = load_mla_params(d)
    materialized = config.num_attention_heads * (
        config.qk_head_dim + config.v_head_dim
    )
    assert config.latent_dim < materialized
    # real DeepSeek-V3 geometry: (512+64) vs 128*(192+128) = 71x
    real = MLAConfig(
        model_type="deepseek_v3", vocab_size=1, hidden_size=7168,
        intermediate_size=18432, num_hidden_layers=61,
        num_attention_heads=128, kv_lora_rank=512, qk_nope_head_dim=128,
        qk_rope_head_dim=64, v_head_dim=128,
    )
    ratio = 128 * (192 + 128) / real.latent_dim
    assert ratio == pytest.approx(71.1, abs=0.1)


def test_from_hf_dict_rejections():
    base = dict(
        model_type="deepseek_v3", vocab_size=8, hidden_size=8,
        intermediate_size=8, num_hidden_layers=1, num_attention_heads=1,
    )
    with pytest.raises(NotImplementedError, match="not an MLA family"):
        MLAConfig.from_hf_dict({**base, "model_type": "llama"})
    with pytest.raises(NotImplementedError, match="attention_bias"):
        MLAConfig.from_hf_dict({**base, "attention_bias": True})
    with pytest.raises(NotImplementedError, match="rope_scaling"):
        MLAConfig.from_hf_dict(
            {**base, "rope_scaling": {"rope_type": "dynamic", "factor": 2.0}}
        )
    with pytest.raises(NotImplementedError, match="topk_method"):
        MLAConfig.from_hf_dict(
            {
                **base, "model_type": "deepseek_v2",
                "topk_method": "noaux_tc", "n_routed_experts": 4,
                "num_experts_per_tok": 2,
            }
        )
    with pytest.raises(ValueError, match="num_experts_per_tok"):
        MLAConfig.from_hf_dict(
            {**base, "n_routed_experts": 4, "first_k_dense_replace": 0}
        )


def test_extract_cli_dispatch_and_fit_guard(tiny_hf_v3, tmp_path):
    """`extract --backend jax` on a deepseek dir routes to the MLA path:
    standard per-layer layout + latents.npy + v_head_dim metadata; the
    sweep driver refuses the asymmetric cache with a pointer to the
    latent tools; analyze runs on it unchanged."""
    d, _ = tiny_hf_v3
    kv_dir = tmp_path / "kv"

    from nerf_attention_tpu.extract import extract_kv_cache_jax
    from nerf_attention_tpu.io import kvstore

    class _FakeTok:
        """Tiny model dirs ship no tokenizer; the extraction contract only
        needs input_ids, so a pre-primed state dict stands in for it."""

        def __call__(self, text, truncation=True, max_length=None):
            return {"input_ids": list(range(2, 2 + min(max_length, 16)))}

    import nerf_attention_tpu.models.mla_jax as mla

    config, params = load_mla_params(d)
    state = {
        "model_dir": (str(d), str(jnp.bfloat16)),
        "config": config,
        "params": params,
        "tokenizer": _FakeTok(),
    }
    meta = mla.extract_kv_with_jax_mla(
        d, seq_len=12, output_dir=kv_dir, text="x " * 40, state=state
    )
    assert meta.v_head_dim == config.v_head_dim
    assert meta.head_dim == config.qk_head_dim
    assert meta.num_kv_heads == config.num_attention_heads
    keys, values = kvstore.load_layer(kv_dir, 0)
    assert keys.shape[-1] == config.qk_head_dim
    assert values.shape[-1] == config.v_head_dim
    lat = np.load(kv_dir / "latents.npy")
    assert lat.shape == (3, 12, config.latent_dim)
    # metadata round-trips the optional field; plain caches omit it
    assert kvstore.load_metadata(kv_dir).v_head_dim == config.v_head_dim

    from nerf_attention_tpu.fit import fit_kv_cache

    with pytest.raises(NotImplementedError, match="asymmetric K/V head dims"):
        fit_kv_cache(kv_dir, tmp_path / "fits", epochs=1, quick=True)

    from nerf_attention_tpu.analyze import analyze_kv_cache

    analysis = analyze_kv_cache(kv_dir, tmp_path / "analysis")
    assert len(analysis.layer_summaries) == 3

    # the dispatch itself: extract_kv_cache_jax peeks model_type and
    # rejects mesh modes for MLA
    from jax.sharding import Mesh
    import jax as _jax

    with pytest.raises(NotImplementedError, match="mesh-sharded extraction"):
        extract_kv_cache_jax(
            str(d), 12, tmp_path / "kv2",
            mesh=Mesh(np.array(_jax.devices()[:1]), ("tp",)),
        )


def test_init_random_mla_dense_only_roundtrip():
    """All-dense config (first_k >= L): single scan, no moe leaves; the
    decode step and latent path still line up."""
    cfg = MLAConfig(
        model_type="deepseek_v2", vocab_size=64, hidden_size=16,
        intermediate_size=32, num_hidden_layers=2, num_attention_heads=2,
        kv_lora_rank=8, qk_nope_head_dim=4, qk_rope_head_dim=4, v_head_dim=4,
    )
    params = init_random_mla(cfg, seed=1)
    assert "moe_layers" not in params
    ids = jnp.arange(7, dtype=jnp.int32)
    keys, values, latents = mla_prefill_kv(cfg, params, ids[:6], return_latent=True)
    h1, _, _ = mla_decode_step(cfg, params, ids[6], 6, keys, values)
    h2, _, _ = mla_decode_step_latent(cfg, params, ids[6], 6, latents)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
