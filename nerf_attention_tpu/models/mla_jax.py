"""DeepSeek-V2/V3 Multi-head Latent Attention (MLA) extraction backend.

Extends the KV-capture surface the reference builds with torch hooks
(`/root/reference/nerf_attention/extract.py:95-179`) to the one
architecture family whose cache is ITSELF a learned compression: MLA
down-projects every token to a small latent (kv_lora_rank + a shared
RoPE stub) and re-expands per-head K/V from it at attention time. Two
cache surfaces are exposed:

* the MATERIALIZED per-head cache — keys (L, H, S, qk_head_dim)
  post-RoPE and values (L, H, S, v_head_dim), exactly what HF's
  DynamicCache holds for deepseek_v2/deepseek_v3 — so the study's fit /
  analyze / serving pipeline runs on MLA models unchanged;
* the LATENT cache — (L, S, kv_lora_rank + qk_rope_head_dim) per token,
  stored POST kv_a_layernorm (compressed part) and POST-RoPE (rope
  stub), so re-materialization is one matmul against ``kv_b`` and a
  broadcast: the architecture's own compressed representation, the
  natural target for the latent-vs-materialized compression study
  (`tools/mla_latent_study.py`).

Numerics mirror the installed transformers (4.57) deepseek_v2 /
deepseek_v3 modeling exactly: V2 applies RoPE to the rope stub in the
complex/interleaved convention, V3 either de-interleaves then
rotate-halves (``rope_interleave``, its default) or uses plain
rotate-half; V2 routes with an fp32 softmax (greedy or
group-limited-greedy top-k, group score = max), V3 with sigmoid scores
plus a correction bias (group score = sum of the top-2 per group),
weights gathered from the RAW scores, optionally renormalized, always
scaled by ``routed_scaling_factor``; both add always-on shared experts
and keep the first ``first_k_dense_replace`` layers dense. YaRN rope
scaling (the convention real DeepSeek checkpoints ship) reproduces HF's
``_compute_yarn_parameters`` — ramped interpolation/extrapolation mix
plus the attention-factor on cos/sin, and V3's mscale² on the logit
scale when ``mscale_all_dim`` is set.

TPU-native formulation: layers are stacked and scanned (two scans — the
dense prefix and the MoE tail — so compile time stays O(1) in depth
with no dead weights), routing is computed DENSELY like the Mixtral
path (`llama_jax._ffn`): every expert runs as one (E, S, inter) einsum
and per-token combine weights (zero off the top-k) do the selection —
static shapes, no gather/scatter, the MXU-friendly trade at
extraction scale.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from nerf_attention_tpu.models.llama_jax import (
    _apply_rope,
    _causal_attention,
    _mlp_act,
    _open_hf_weights,
    _rms_norm,
)


def _yarn_mscale(scale: float, mscale: float = 1.0) -> float:
    if scale <= 1:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


@dataclass(frozen=True)
class MLAConfig:
    model_type: str  # "deepseek_v2" | "deepseek_v3"
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_hidden_layers: int
    num_attention_heads: int
    kv_lora_rank: int
    qk_nope_head_dim: int
    qk_rope_head_dim: int
    v_head_dim: int
    q_lora_rank: int | None = None  # None -> full q_proj
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-6
    hidden_act: str = "silu"
    rope_interleave: bool = True  # V3 flag; V2 always uses the complex form
    # MoE (layers >= first_k_dense_replace are sparse; >= L -> all dense)
    first_k_dense_replace: int = 0
    moe_intermediate_size: int | None = None
    n_routed_experts: int | None = None
    num_experts_per_tok: int | None = None
    n_group: int = 1
    topk_group: int = 1
    n_shared_experts: int | None = None
    routed_scaling_factor: float = 1.0
    norm_topk_prob: bool = False
    topk_method: str = "greedy"  # V2: greedy | group_limited_greedy
    # YaRN rope scaling (None factor = plain RoPE)
    yarn_factor: float | None = None
    yarn_beta_fast: float = 32.0
    yarn_beta_slow: float = 1.0
    yarn_mscale: float | None = None
    yarn_mscale_all_dim: float | None = None
    yarn_original_max_position: int = 4096
    yarn_attention_factor: float | None = None
    yarn_truncate: bool = True

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim

    @property
    def latent_dim(self) -> int:
        return self.kv_lora_rank + self.qk_rope_head_dim

    @property
    def num_moe_layers(self) -> int:
        if self.n_routed_experts is None:
            return 0
        return max(0, self.num_hidden_layers - self.first_k_dense_replace)

    @property
    def num_dense_layers(self) -> int:
        return self.num_hidden_layers - self.num_moe_layers

    @property
    def attn_scale(self) -> float:
        """Logit scale: qk_head_dim**-0.5, times V3's yarn mscale²."""
        scale = self.qk_head_dim**-0.5
        if (
            self.model_type == "deepseek_v3"
            and self.yarn_factor is not None
            and self.yarn_mscale_all_dim
        ):
            m = _yarn_mscale(self.yarn_factor, self.yarn_mscale_all_dim)
            scale = scale * m * m
        return scale

    @property
    def attention_scaling(self) -> float:
        """YaRN post-factor on cos/sin (HF rope_init attention_factor)."""
        if self.yarn_factor is None:
            return 1.0
        if self.yarn_attention_factor is not None:
            return self.yarn_attention_factor
        if self.yarn_mscale and self.yarn_mscale_all_dim:
            return float(
                _yarn_mscale(self.yarn_factor, self.yarn_mscale)
                / _yarn_mscale(self.yarn_factor, self.yarn_mscale_all_dim)
            )
        return _yarn_mscale(self.yarn_factor)

    @classmethod
    def from_hf_dict(cls, d: dict) -> "MLAConfig":
        model_type = d.get("model_type")
        if model_type not in ("deepseek_v2", "deepseek_v3"):
            raise NotImplementedError(
                f"model_type {model_type!r} is not an MLA family "
                "(deepseek_v2, deepseek_v3)"
            )
        if d.get("attention_bias", False) or d.get("mlp_bias", False):
            raise NotImplementedError(
                "attention_bias / mlp_bias are not supported (no published "
                "DeepSeek checkpoint uses them)"
            )
        scaling = d.get("rope_scaling") or {}
        rope_type = scaling.get("rope_type", scaling.get("type"))
        if scaling and rope_type not in ("yarn", "default", None):
            raise NotImplementedError(
                f"rope_scaling type {rope_type!r} is not supported for MLA "
                "(plain RoPE and yarn are)"
            )
        is_yarn = rope_type == "yarn"
        n_layers = d["num_hidden_layers"]
        first_k = d.get("first_k_dense_replace", 0)
        has_moe = (
            d.get("n_routed_experts") is not None and first_k < n_layers
        )
        if has_moe and not d.get("num_experts_per_tok"):
            raise ValueError(
                "MoE layers present but num_experts_per_tok is unset"
            )
        topk_method = d.get("topk_method", "greedy")
        if model_type == "deepseek_v2" and topk_method not in (
            "greedy", "group_limited_greedy",
        ):
            raise NotImplementedError(
                f"deepseek_v2 topk_method {topk_method!r} is not supported"
            )
        return cls(
            model_type=model_type,
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_hidden_layers=n_layers,
            num_attention_heads=d["num_attention_heads"],
            kv_lora_rank=d.get("kv_lora_rank", 512),
            qk_nope_head_dim=d.get("qk_nope_head_dim", 128),
            qk_rope_head_dim=d.get("qk_rope_head_dim", 64),
            v_head_dim=d.get("v_head_dim", 128),
            q_lora_rank=d.get("q_lora_rank"),
            rope_theta=d.get("rope_theta", 10000.0),
            rms_norm_eps=d.get("rms_norm_eps", 1e-6),
            hidden_act=d.get("hidden_act", "silu"),
            # V2's complex rope IS the interleaved pairing; V3 reads the
            # config flag (its default is True).
            rope_interleave=(
                True
                if model_type == "deepseek_v2"
                else d.get("rope_interleave", True)
            ),
            first_k_dense_replace=first_k if has_moe else n_layers,
            moe_intermediate_size=d.get("moe_intermediate_size"),
            n_routed_experts=d.get("n_routed_experts") if has_moe else None,
            num_experts_per_tok=d.get("num_experts_per_tok"),
            n_group=d.get("n_group") or 1,
            topk_group=d.get("topk_group") or 1,
            n_shared_experts=d.get("n_shared_experts"),
            routed_scaling_factor=d.get("routed_scaling_factor", 1.0),
            norm_topk_prob=d.get("norm_topk_prob", False),
            topk_method=topk_method,
            yarn_factor=scaling.get("factor") if is_yarn else None,
            yarn_beta_fast=scaling.get("beta_fast") or 32.0,
            yarn_beta_slow=scaling.get("beta_slow") or 1.0,
            yarn_mscale=scaling.get("mscale"),
            yarn_mscale_all_dim=scaling.get("mscale_all_dim"),
            yarn_original_max_position=(
                scaling.get("original_max_position_embeddings")
                or d.get("max_position_embeddings", 4096)
            ),
            yarn_attention_factor=scaling.get("attention_factor"),
            yarn_truncate=scaling.get("truncate", True),
        )


def mla_rope_frequencies(config: MLAConfig) -> np.ndarray:
    """Inverse frequencies over the rope stub, with YaRN rescaling if set.

    Mirrors HF ``_compute_yarn_parameters``: interpolated (freq/factor)
    below the beta_slow correction bound, extrapolated (plain) above
    beta_fast, linearly ramped between.
    """
    dim = config.qk_rope_head_dim
    base = config.rope_theta
    pos_freqs = base ** (np.arange(0, dim, 2, dtype=np.float64) / dim)
    inv_freq = 1.0 / pos_freqs
    if config.yarn_factor is None:
        return inv_freq.astype(np.float32)

    factor = config.yarn_factor
    orig = config.yarn_original_max_position

    def correction_dim(num_rotations: float) -> float:
        return (
            dim
            * math.log(orig / (num_rotations * 2 * math.pi))
            / (2 * math.log(base))
        )

    low = correction_dim(config.yarn_beta_fast)
    high = correction_dim(config.yarn_beta_slow)
    if config.yarn_truncate:
        low, high = math.floor(low), math.ceil(high)
    low, high = max(low, 0), min(high, dim - 1)
    if low == high:
        high += 0.001  # HF's singularity guard
    ramp = np.clip(
        (np.arange(dim // 2, dtype=np.float64) - low) / (high - low), 0, 1
    )
    extrapolation_factor = 1.0 - ramp
    scaled = (inv_freq / factor) * (1 - extrapolation_factor) + (
        inv_freq * extrapolation_factor
    )
    return scaled.astype(np.float32)


def _rope_tables(config: MLAConfig, positions: jax.Array, dtype):
    """(len(positions), rope_dim) cos/sin in cat(freqs, freqs) layout,
    pre-multiplied by the YaRN attention factor."""
    inv_freq = jnp.asarray(mla_rope_frequencies(config))
    angles = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    angles = jnp.concatenate([angles, angles], axis=-1)
    scale = jnp.float32(config.attention_scaling)
    return (
        (jnp.cos(angles) * scale).astype(dtype),
        (jnp.sin(angles) * scale).astype(dtype),
    )


def _apply_rope_mla(config: MLAConfig, x: jax.Array, cos, sin) -> jax.Array:
    """RoPE on the rope stub in the family's exact convention.

    x: (heads, S, rope_dim). V2 rotates interleaved pairs in place (HF's
    complex ``apply_rotary_emb``); V3 with ``rope_interleave``
    de-interleaves (evens then odds) and rotate-halves, LEAVING the
    de-interleaved layout (HF ``apply_rotary_pos_emb_interleave``);
    otherwise plain rotate-half. The layouts differ — cached keys must
    match HF element-for-element per family.
    """
    d = x.shape[-1]
    if config.model_type == "deepseek_v2":
        c, s = cos[None, :, : d // 2], sin[None, :, : d // 2]
        even, odd = x[..., 0::2], x[..., 1::2]
        out_even = even * c - odd * s
        out_odd = even * s + odd * c
        return jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape)
    if config.rope_interleave:
        h, s_len, _ = x.shape
        x = x.reshape(h, s_len, d // 2, 2).swapaxes(-1, -2).reshape(x.shape)
    return _apply_rope(x, cos, sin)


def _moe_combine_weights(config: MLAConfig, x: jax.Array, lp: dict):
    """(S, E) renormalized routed-expert combine weights, fp32.

    Replays the HF gate exactly: V2 softmaxes the fp32 logits and picks
    top-k (greedy) or group-limited top-k with group score = max; V3
    sigmoids, adds the e_score_correction_bias for CHOICE only (group
    score = sum of each group's top-2), gathers weights from the RAW
    scores, renormalizes if norm_topk_prob. Both scale by
    routed_scaling_factor.
    """
    s = x.shape[0]
    e = config.n_routed_experts
    top_k = config.num_experts_per_tok
    logits = x.astype(jnp.float32) @ lp["router"].astype(jnp.float32)
    v3 = config.model_type == "deepseek_v3"
    if v3:
        scores = jax.nn.sigmoid(logits)
        choice = scores + lp["router_bias"].astype(jnp.float32)[None, :]
    else:
        scores = jax.nn.softmax(logits, axis=-1)
        choice = scores

    grouped = v3 or config.topk_method == "group_limited_greedy"
    if grouped and config.n_group > 1:
        g = config.n_group
        cg = choice.reshape(s, g, e // g)
        if v3:
            group_scores = jnp.sum(jax.lax.top_k(cg, 2)[0], axis=-1)
        else:
            group_scores = jnp.max(cg, axis=-1)
        _, g_idx = jax.lax.top_k(group_scores, config.topk_group)
        g_mask = (
            jnp.zeros((s, g), jnp.bool_)
            .at[jnp.arange(s)[:, None], g_idx]
            .set(True)
        )
        mask = jnp.repeat(g_mask, e // g, axis=1)
        choice = jnp.where(mask, choice, 0.0)

    _, top_idx = jax.lax.top_k(choice, top_k)
    top_w = jnp.take_along_axis(scores, top_idx, axis=-1)
    if v3 and config.norm_topk_prob:
        top_w = top_w / (jnp.sum(top_w, axis=-1, keepdims=True) + 1e-20)
    top_w = top_w * jnp.float32(config.routed_scaling_factor)
    return (
        jnp.zeros((s, e), jnp.float32)
        .at[jnp.arange(s)[:, None], top_idx]
        .set(top_w)
    )


def _moe_ffn(config: MLAConfig, x: jax.Array, lp: dict, act) -> jax.Array:
    """Routed experts (dense einsum formulation) + shared experts."""
    weights = _moe_combine_weights(config, x, lp).astype(x.dtype)
    gated = act(jnp.einsum("sh,ehi->esi", x, lp["w1"])) * jnp.einsum(
        "sh,ehi->esi", x, lp["w3"]
    )
    expert_out = jnp.einsum("esi,eih->esh", gated, lp["w2"])
    out = jnp.einsum("se,esh->sh", weights, expert_out)
    if "shared_gate" in lp:
        out = out + (
            act(x @ lp["shared_gate"]) * (x @ lp["shared_up"])
        ) @ lp["shared_down"]
    return out


def _q_and_latent(config: MLAConfig, x: jax.Array, lp: dict, cos, sin):
    """Per-token queries (split) and latent rows for S tokens.

    Returns (q_nope (H, S, nope), q_pe (H, S, rope) post-RoPE,
    latent (S, kv_lora_rank + rope_dim)). The latent stores the NORMED
    compressed part and the POST-RoPE rope stub, so
    ``materialize_from_latent`` is one matmul + broadcast. Shared by the
    materializing path (`_mla_qkv`) and the absorbed decode, which never
    expands the latent at all.
    """
    s = x.shape[0]
    n_q = config.num_attention_heads
    nope, rope = config.qk_nope_head_dim, config.qk_rope_head_dim

    if config.q_lora_rank is None:
        q = x @ lp["q"]
    else:
        q = _rms_norm(x @ lp["q_a"], lp["q_a_norm"], config.rms_norm_eps) @ lp["q_b"]
    q = q.reshape(s, n_q, nope + rope).transpose(1, 0, 2)
    q_nope, q_pe = q[..., :nope], q[..., nope:]

    ckv = x @ lp["kv_a"]  # (S, kv_lora_rank + rope)
    c = _rms_norm(
        ckv[:, : config.kv_lora_rank], lp["kv_a_norm"], config.rms_norm_eps
    )
    k_pe = ckv[None, :, config.kv_lora_rank :]  # (1, S, rope) — MQA stub
    q_pe = _apply_rope_mla(config, q_pe, cos, sin)
    k_pe = _apply_rope_mla(config, k_pe, cos, sin)
    latent = jnp.concatenate([c, k_pe[0]], axis=-1)
    return q_nope, q_pe, latent


def _mla_qkv(config: MLAConfig, x: jax.Array, lp: dict, cos, sin):
    """Queries, materialized K/V, and the latent rows for S tokens.

    Returns (q (H, S, qk_head_dim), k (H, S, qk_head_dim),
    v (H, S, v_head_dim), latent (S, kv_lora_rank + rope_dim)).
    """
    s = x.shape[0]
    n_q = config.num_attention_heads
    rope = config.qk_rope_head_dim
    q_nope, q_pe, latent = _q_and_latent(config, x, lp, cos, sin)
    c, k_pe = latent[:, : config.kv_lora_rank], latent[None, :, config.kv_lora_rank :]
    k_nope, v = _expand_latent(config, c, lp["kv_b"])
    q = jnp.concatenate([q_nope, q_pe], axis=-1)
    k = jnp.concatenate(
        [k_nope, jnp.broadcast_to(k_pe, (n_q, s, rope))], axis=-1
    )
    return q, k, v, latent


def _expand_latent(config: MLAConfig, c: jax.Array, kv_b: jax.Array):
    """Up-project normed latents: (S, r) -> k_nope (H, S, nope), v (H, S, dv)."""
    s = c.shape[0]
    n_q, nope, dv = (
        config.num_attention_heads, config.qk_nope_head_dim, config.v_head_dim,
    )
    kv = (c @ kv_b).reshape(s, n_q, nope + dv).transpose(1, 0, 2)
    return kv[..., :nope], kv[..., nope:]


def materialize_from_latent(
    config: MLAConfig, latent: jax.Array, kv_b: jax.Array
):
    """Latent rows -> the materialized (k, v) attention reads.

    latent: (S, kv_lora_rank + rope_dim) as stored by the prefill (normed
    compressed part, post-RoPE stub); kv_b: (kv_lora_rank, H*(nope+dv)).
    Returns (k (H, S, qk_head_dim), v (H, S, v_head_dim)). Exactly linear:
    a SIREN or quantizer that reconstructs the latent reconstructs the
    cache through this single matmul — the MLA-native serving surface.
    """
    r = config.kv_lora_rank
    k_nope, v = _expand_latent(config, latent[:, :r], kv_b)
    k_pe = latent[None, :, r:]
    k = jnp.concatenate(
        [k_nope, jnp.broadcast_to(k_pe, k_nope.shape[:2] + (latent.shape[1] - r,))],
        axis=-1,
    )
    return k, v


def _ffn_tail(config: MLAConfig, h, attn_flat, lp, moe: bool):
    """Residual attention-output projection + (dense | MoE) FFN block."""
    h = h + attn_flat @ lp["o"]
    x = _rms_norm(h, lp["post_norm"], config.rms_norm_eps)
    act = _mlp_act(config.hidden_act)
    if moe:
        return h + _moe_ffn(config, x, lp, act)
    return h + (act(x @ lp["gate"]) * (x @ lp["up"])) @ lp["down"]


def _mla_layer_forward(config: MLAConfig, h, lp, cos, sin, moe: bool):
    """One decoder layer over S tokens. Returns (h, (k, v, latent))."""
    s = h.shape[0]
    x = _rms_norm(h, lp["input_norm"], config.rms_norm_eps)
    q, k, v, latent = _mla_qkv(config, x, lp, cos, sin)
    attn = _causal_attention(q, k, v, scale=config.attn_scale)
    attn = attn.transpose(1, 0, 2).reshape(
        s, config.num_attention_heads * config.v_head_dim
    )
    h = _ffn_tail(config, h, attn, lp, moe)
    return h, (k, v, latent)


@partial(jax.jit, static_argnames=("config", "return_latent"))
def mla_prefill_kv(
    config: MLAConfig,
    params: dict,
    input_ids: jax.Array,
    return_latent: bool = False,
):
    """One prefill pass -> per-layer post-RoPE materialized KV.

    Returns (keys (L, H, S, qk_head_dim), values (L, H, S, v_head_dim)) —
    K and V head dims DIFFER under MLA — plus, with ``return_latent``,
    the latent cache (L, S, kv_lora_rank + rope_dim). Two scans (dense
    prefix, MoE tail) keep compile time O(1) in depth.
    """
    s = input_ids.shape[0]
    h = params["embed"][input_ids]
    cos, sin = _rope_tables(config, jnp.arange(s), h.dtype)

    def run(layers, moe: bool, h):
        def scan_layer(h, lp):
            return _mla_layer_forward(config, h, lp, cos, sin, moe)

        return jax.lax.scan(scan_layer, h, layers)

    keys, values, latents = [], [], []
    if "dense_layers" in params:
        h, (k, v, lat) = run(params["dense_layers"], False, h)
        keys.append(k), values.append(v), latents.append(lat)
    if "moe_layers" in params:
        h, (k, v, lat) = run(params["moe_layers"], True, h)
        keys.append(k), values.append(v), latents.append(lat)
    keys = jnp.concatenate(keys, axis=0) if len(keys) > 1 else keys[0]
    values = jnp.concatenate(values, axis=0) if len(values) > 1 else values[0]
    if not return_latent:
        return keys, values
    latents = (
        jnp.concatenate(latents, axis=0) if len(latents) > 1 else latents[0]
    )
    return keys, values, latents


def _mla_layer_decode(config: MLAConfig, h, lp, cache_k, cache_v, position,
                      cos, sin, moe: bool):
    """One layer, one query at ``position`` over [cache; new].

    Same mask semantics as `llama_jax._layer_decode`: cache rows strictly
    BEFORE position are visible, self rides the concatenated last column
    (correct over pre-allocated buffers). Returns
    (h, (k_new, v_new, entropy, latent_new)).
    """
    n_q = config.num_attention_heads
    x = _rms_norm(h, lp["input_norm"], config.rms_norm_eps)
    q, k, v, latent = _mla_qkv(config, x, lp, cos, sin)

    k_full = jnp.concatenate([cache_k, k], axis=1)  # (H, S+1, dk)
    v_full = jnp.concatenate([cache_v, v], axis=1)
    logits = (
        jnp.einsum("hqd,hkd->hqk", q, k_full, preferred_element_type=jnp.float32)
        * jnp.float32(config.attn_scale)
    )
    cols = jnp.arange(k_full.shape[1])
    keep = (cols < position) | (cols == k_full.shape[1] - 1)
    logits = jnp.where(keep[None, None, :], logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(v_full.dtype)
    p32 = probs.astype(jnp.float32)
    entropy = -jnp.sum(
        jnp.where(p32 > 0, p32 * jnp.log(p32), 0.0), axis=(-2, -1)
    )  # (H,)
    attn = jnp.einsum("hqk,hkd->hqd", probs, v_full)
    attn = attn.transpose(1, 0, 2).reshape(1, n_q * config.v_head_dim)
    h = _ffn_tail(config, h, attn, lp, moe)
    return h, (k, v, entropy, latent)


@partial(jax.jit, static_argnames=("config",))
def mla_decode_step(
    config: MLAConfig,
    params: dict,
    token_id: jax.Array,
    position: jax.Array,
    cache_keys: jax.Array,
    cache_values: jax.Array,
):
    """One decode step over the MATERIALIZED cache — the same cache-swap
    serving surface as `llama_decode_step`: cache_keys (L, H, S,
    qk_head_dim) / cache_values (L, H, S, v_head_dim) may be the true
    cache or any reconstruction. Returns (h_last (hidden,), (k_new,
    v_new) each (L, H, 1, ·), entropy (L, H))."""
    h = params["embed"][token_id][None, :]
    position = jnp.asarray(position, jnp.int32)
    cos, sin = _rope_tables(config, position[None], h.dtype)

    n_dense = config.num_dense_layers
    outs = []

    def run(layers, moe: bool, h, ck, cv):
        def scan_layer(h, xs):
            lp, k_c, v_c = xs
            return _mla_layer_decode(
                config, h, lp, k_c, v_c, position, cos, sin, moe
            )

        return jax.lax.scan(scan_layer, h, (layers, ck, cv))

    if "dense_layers" in params:
        h, out = run(
            params["dense_layers"], False, h,
            cache_keys[:n_dense], cache_values[:n_dense],
        )
        outs.append(out)
    if "moe_layers" in params:
        h, out = run(
            params["moe_layers"], True, h,
            cache_keys[n_dense:], cache_values[n_dense:],
        )
        outs.append(out)
    k_new, v_new, entropy, _ = (
        tuple(jnp.concatenate(parts, axis=0) for parts in zip(*outs))
        if len(outs) > 1
        else outs[0]
    )
    return h[0], (k_new, v_new), entropy


@partial(jax.jit, static_argnames=("config",))
def mla_decode_step_latent(
    config: MLAConfig,
    params: dict,
    token_id: jax.Array,
    position: jax.Array,
    cache_latent: jax.Array,
):
    """One decode step served from the LATENT cache — MLA's native path.

    ``cache_latent`` (L, S, kv_lora_rank + rope_dim) holds what the
    prefill's ``return_latent`` emits (or any reconstruction of it);
    each layer re-materializes K/V with one ``kv_b`` matmul before
    attending, so the only stored state is the compressed
    representation. Returns (h_last, latent_new (L, 1, latent_dim),
    entropy (L, H))."""
    h = params["embed"][token_id][None, :]
    position = jnp.asarray(position, jnp.int32)
    cos, sin = _rope_tables(config, position[None], h.dtype)
    n_dense = config.num_dense_layers
    outs = []

    def run(layers, moe: bool, h, lat):
        def scan_layer(h, xs):
            lp, lat_c = xs
            k_c, v_c = materialize_from_latent(config, lat_c, lp["kv_b"])
            h, (_, _, ent, lat_new) = _mla_layer_decode(
                config, h, lp, k_c, v_c, position, cos, sin, moe
            )
            return h, (lat_new, ent)

        return jax.lax.scan(scan_layer, h, (layers, lat))

    if "dense_layers" in params:
        h, out = run(params["dense_layers"], False, h, cache_latent[:n_dense])
        outs.append(out)
    if "moe_layers" in params:
        h, out = run(params["moe_layers"], True, h, cache_latent[n_dense:])
        outs.append(out)
    lat_new, entropy = (
        tuple(jnp.concatenate(parts, axis=0) for parts in zip(*outs))
        if len(outs) > 1
        else outs[0]
    )
    return h[0], lat_new[:, None, :] if lat_new.ndim == 2 else lat_new, entropy


def _mla_layer_decode_absorbed(config: MLAConfig, h, lp, cache_lat, position,
                               cos, sin, moe: bool, attn_impl: str = "xla"):
    """One layer, one query, attention computed IN latent space.

    DeepSeek's weight-absorption serving identity: since
    k_nope = c @ W_uk and v = c @ W_uv are linear in the latent,

        q_nope · k_nope = (q_nope @ W_uk^T) · c        (absorb W_uk into q)
        probs @ v       = (probs @ c) @ W_uv           (absorb W_uv into out)

    so the S-length work is two (S, kv_lora_rank) contractions against
    the SHARED latent plus the MQA rope-stub scores — per-head K/V are
    never formed. Per step per layer that replaces the latent path's
    S·r·H·(nope+dv) rematerialization FLOPs with ~2·S·H·r and reads
    latent_dim bytes/token instead of H·(qk+v) (8× at DeepSeek-V2-Lite
    geometry, 71× at V3). Same mask/entropy semantics as
    `_mla_layer_decode`. Returns (h, (latent_new, entropy)).

    ``attn_impl='pallas'`` routes the S-length work through the fused
    one-pass kernel (`ops/mla_absorbed_pallas.py`): one cache stream
    instead of XLA's two, no (H, S) logit round-trip; the S-independent
    absorb/combine matmuls stay here either way."""
    n_q = config.num_attention_heads
    r, nope, dv = config.kv_lora_rank, config.qk_nope_head_dim, config.v_head_dim
    x = _rms_norm(h, lp["input_norm"], config.rms_norm_eps)
    q_nope, q_pe, latent_new = _q_and_latent(config, x, lp, cos, sin)

    if attn_impl == "pallas":
        from nerf_attention_tpu.ops.mla_absorbed_pallas import (
            mla_absorbed_attention,
        )

        kv_b = lp["kv_b"].reshape(r, n_q, nope + dv)
        w_uk, w_uv = kv_b[..., :nope], kv_b[..., nope:]
        q_lat = jnp.einsum("hqn,rhn->hqr", q_nope, w_uk)  # (H, 1, r)
        q_cat = jnp.concatenate([q_lat[:, 0], q_pe[:, 0]], axis=-1)
        o_lat, entropy = mla_absorbed_attention(
            q_cat, cache_lat, latent_new, position,
            kv_lora_rank=r, scale=config.attn_scale,
        )
        attn = jnp.einsum(
            "hr,rhd->hd", o_lat.astype(w_uv.dtype), w_uv
        ).reshape(1, n_q * dv)
        h = _ffn_tail(config, h, attn, lp, moe)
        return h, (latent_new, entropy)

    lat_full = jnp.concatenate([cache_lat, latent_new], axis=0)  # (S+1, r+rope)
    c_full, pe_full = lat_full[:, :r], lat_full[:, r:]
    kv_b = lp["kv_b"].reshape(r, n_q, nope + dv)
    w_uk, w_uv = kv_b[..., :nope], kv_b[..., nope:]
    q_lat = jnp.einsum("hqn,rhn->hqr", q_nope, w_uk)  # (H, 1, r)
    logits = (
        jnp.einsum(
            "hqr,kr->hqk", q_lat, c_full, preferred_element_type=jnp.float32
        )
        + jnp.einsum(
            "hqp,kp->hqk", q_pe, pe_full, preferred_element_type=jnp.float32
        )
    ) * jnp.float32(config.attn_scale)
    cols = jnp.arange(lat_full.shape[0])
    keep = (cols < position) | (cols == lat_full.shape[0] - 1)
    logits = jnp.where(keep[None, None, :], logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(lat_full.dtype)
    p32 = probs.astype(jnp.float32)
    entropy = -jnp.sum(
        jnp.where(p32 > 0, p32 * jnp.log(p32), 0.0), axis=(-2, -1)
    )  # (H,)
    o_lat = jnp.einsum("hqk,kr->hqr", probs, c_full)  # (H, 1, r)
    attn = jnp.einsum("hqr,rhd->hqd", o_lat, w_uv)  # (H, 1, dv)
    attn = attn.transpose(1, 0, 2).reshape(1, n_q * dv)
    h = _ffn_tail(config, h, attn, lp, moe)
    return h, (latent_new, entropy)


@partial(jax.jit, static_argnames=("config", "attn_impl"))
def mla_decode_step_absorbed(
    config: MLAConfig,
    params: dict,
    token_id: jax.Array,
    position: jax.Array,
    cache_latent: jax.Array,
    attn_impl: str = "xla",
):
    """One decode step over the latent cache WITHOUT rematerialization —
    the weight-absorbed MLA serving path (`_mla_layer_decode_absorbed`).

    Same signature and return contract as `mla_decode_step_latent`
    (h_last (hidden,), latent_new (L, 1, latent_dim), entropy (L, H));
    numerically equal up to matmul re-association (parity-tested). This
    is the step a production MLA server runs: per-token state is
    latent_dim wide, per-head K/V never exist. ``attn_impl='pallas'``
    serves each layer's attention from the fused one-pass cache kernel."""
    h = params["embed"][token_id][None, :]
    position = jnp.asarray(position, jnp.int32)
    cos, sin = _rope_tables(config, position[None], h.dtype)
    n_dense = config.num_dense_layers
    outs = []

    def run(layers, moe: bool, h, lat):
        def scan_layer(h, xs):
            lp, lat_c = xs
            return _mla_layer_decode_absorbed(
                config, h, lp, lat_c, position, cos, sin, moe, attn_impl
            )

        return jax.lax.scan(scan_layer, h, (layers, lat))

    if "dense_layers" in params:
        h, out = run(params["dense_layers"], False, h, cache_latent[:n_dense])
        outs.append(out)
    if "moe_layers" in params:
        h, out = run(params["moe_layers"], True, h, cache_latent[n_dense:])
        outs.append(out)
    lat_new, entropy = (
        tuple(jnp.concatenate(parts, axis=0) for parts in zip(*outs))
        if len(outs) > 1
        else outs[0]
    )
    return h[0], lat_new, entropy


def pack_mla_latent_stack(
    latents, scheme: str, tile: int | None = None
) -> tuple[tuple, tuple]:
    """Pack an (L, S, latent_dim) latent cache into quant-RESIDENT operands.

    Per-layer `ops/mla_quant_pallas.pack_resident_latent` (the ladder's
    exact `quantize_array(axis=1)` grid — each layer its own scales, the
    unit an operator stores and evicts independently), stacked along a
    leading layer axis so the packed payload rides `lax.scan` like the
    fp32 cache it replaces. Returns ``(stacked_ops, layout)`` for
    `mla_decode_step_absorbed_quant`.
    """
    from nerf_attention_tpu.ops.mla_quant_pallas import (
        DEFAULT_TILE,
        pack_resident_latent,
    )

    lat = np.asarray(latents, np.float32)
    if tile is None:
        tile = min(DEFAULT_TILE, max(64, lat.shape[1]))
    per_layer = [pack_resident_latent(l, scheme, tile=tile) for l in lat]
    layout = per_layer[0][1]
    stacked = tuple(
        jnp.stack([ops[i] for ops, _ in per_layer])
        for i in range(len(per_layer[0][0]))
    )
    return stacked, layout


@partial(jax.jit, static_argnames=("config", "layout"))
def mla_decode_step_absorbed_quant(
    config: MLAConfig,
    params: dict,
    token_id: jax.Array,
    position: jax.Array,
    packed_ops: tuple,
    layout: tuple,
):
    """Absorbed decode step over a QUANT-RESIDENT latent cache.

    The round-5 closure of the MLA serving story: the quantized-latent
    ladder won the storage frontier (int4_g64 30.1× at 0.99904,
    `benchmarks/r4/mla_latent/`), and with this step the packed codes are
    the DEVICE cache too — `ops/mla_quant_pallas.py` dequantizes each
    latent tile in VMEM inside the absorbed attention, so fp32 latent
    rows never exist in HBM. Same return contract as
    `mla_decode_step_absorbed`; parity vs that step over the
    host-dequantized latent is fp32 op-order noise
    (`tests/test_mla_quant_pallas.py`). ``packed_ops``/``layout`` come
    from `pack_mla_latent_stack`. The new token's latent row is returned
    exact (fp32) — appending to the stored cache re-quantizes at the
    operator's cadence, the incremental-absolute maintenance story.
    """
    from nerf_attention_tpu.ops.mla_quant_pallas import (
        mla_absorbed_attention_quant,
    )

    n_q = config.num_attention_heads
    r, nope, dv = (
        config.kv_lora_rank,
        config.qk_nope_head_dim,
        config.v_head_dim,
    )
    h = params["embed"][token_id][None, :]
    position = jnp.asarray(position, jnp.int32)
    cos, sin = _rope_tables(config, position[None], h.dtype)
    n_dense = config.num_dense_layers

    def layer(h, lp, lat_ops, moe):
        x = _rms_norm(h, lp["input_norm"], config.rms_norm_eps)
        q_nope, q_pe, latent_new = _q_and_latent(config, x, lp, cos, sin)
        kv_b = lp["kv_b"].reshape(r, n_q, nope + dv)
        w_uk, w_uv = kv_b[..., :nope], kv_b[..., nope:]
        q_lat = jnp.einsum("hqn,rhn->hqr", q_nope, w_uk)
        q_cat = jnp.concatenate([q_lat[:, 0], q_pe[:, 0]], axis=-1)
        o_lat, entropy = mla_absorbed_attention_quant(
            q_cat, (list(lat_ops), layout), latent_new, position,
            kv_lora_rank=r, scale=config.attn_scale,
        )
        attn = jnp.einsum(
            "hr,rhd->hd", o_lat.astype(w_uv.dtype), w_uv
        ).reshape(1, n_q * dv)
        h = _ffn_tail(config, h, attn, lp, moe)
        return h, (latent_new, entropy)

    outs = []

    def run(layers, moe, h, ops_slice):
        def scan_layer(h, xs):
            lp = xs[0]
            lat_ops = xs[1:]
            return layer(h, lp, lat_ops, moe)

        return jax.lax.scan(scan_layer, h, (layers, *ops_slice))

    if "dense_layers" in params:
        h, out = run(
            params["dense_layers"], False, h,
            tuple(o[:n_dense] for o in packed_ops),
        )
        outs.append(out)
    if "moe_layers" in params:
        h, out = run(
            params["moe_layers"], True, h,
            tuple(o[n_dense:] for o in packed_ops),
        )
        outs.append(out)
    lat_new, entropy = (
        tuple(jnp.concatenate(parts, axis=0) for parts in zip(*outs))
        if len(outs) > 1
        else outs[0]
    )
    return h[0], lat_new, entropy


@partial(jax.jit, static_argnames=("config", "attn_impl"))
def mla_decode_rollout(
    config: MLAConfig,
    params: dict,
    token_ids: jax.Array,
    start_position: jax.Array,
    cache_latent: jax.Array,
    attn_impl: str = "xla",
):
    """T absorbed decode steps in ONE jitted scan — the MLA serving loop.

    The latent twin of `llama_jax.llama_decode_rollout`: ``cache_latent``
    (L, S_buf, latent_dim) is a PRE-ALLOCATED buffer whose rows
    [0, start_position) hold the filled prefix (true latents or any
    reconstruction); token t decodes at ``start_position + t`` via the
    absorbed step and appends its own latent row, so later tokens attend
    earlier generated ones. Per-token carried state is latent_dim wide —
    the whole rollout's cache traffic is the compressed representation.
    Returns (h (T, hidden), filled latent buffer,
    lat_new (T, L, 1, latent_dim), entropy (T, L, H))."""
    t_steps = token_ids.shape[0]
    positions = jnp.asarray(start_position, jnp.int32) + jnp.arange(
        t_steps, dtype=jnp.int32
    )

    def step(lat_buf, xs):
        tok, pos = xs
        h, lat_new, ent = mla_decode_step_absorbed(
            config, params, tok, pos, lat_buf, attn_impl
        )
        lat_buf = jax.lax.dynamic_update_slice(
            lat_buf, lat_new, (0, pos, 0)
        )
        return lat_buf, (h, lat_new, ent)

    lat_buf, (hs, lat_new, ents) = jax.lax.scan(
        step, cache_latent, (token_ids, positions)
    )
    return hs, lat_buf, lat_new, ents


def extract_kv_with_jax_mla(
    model_dir,
    seq_len: int,
    output_dir: Path,
    text: str,
    dtype=jnp.bfloat16,
    state: dict | None = None,
    save_latent: bool = True,
):
    """Native MLA extraction: tokenize, prefill, persist BOTH cache surfaces.

    The materialized per-head K/V go into the standard per-layer layout
    (`io/kvstore.py`) with ``metadata.v_head_dim`` recording the MLA
    asymmetry (K rows are qk_head_dim wide, V rows v_head_dim); the
    latent cache (L, S, kv_lora_rank + rope_dim) lands beside them as
    ``latents.npy`` — the surface `tools/mla_latent_study.py` fits and
    `mla_decode_step_latent` serves. Same ``state`` reuse contract as
    `llama_jax.extract_kv_with_jax_llama`.
    """
    from transformers import AutoTokenizer

    from nerf_attention_tpu.io import kvstore
    from nerf_attention_tpu.types import KVMetadata

    state = state if state is not None else {}
    if state.get("model_dir") != (str(model_dir), str(dtype)):
        print(f"Loading {model_dir} into JAX (MLA)...")
        config, params = load_mla_params(Path(model_dir), dtype=dtype)
        state.update(
            model_dir=(str(model_dir), str(dtype)),
            config=config,
            params=params,
            tokenizer=AutoTokenizer.from_pretrained(model_dir),
        )
    config, params = state["config"], state["params"]
    ids = np.asarray(
        state["tokenizer"](text, truncation=True, max_length=seq_len)[
            "input_ids"
        ]
    )
    print(f"Sequence length: {len(ids)} tokens")

    print("Running MLA prefill...")
    keys, values, latents = mla_prefill_kv(
        config, params, jnp.asarray(ids, jnp.int32), return_latent=True
    )
    keys = np.asarray(keys, dtype=np.float32)
    values = np.asarray(values, dtype=np.float32)

    output_dir = Path(output_dir)
    for i in range(config.num_hidden_layers):
        kvstore.save_layer(output_dir, i, keys[i], values[i])
    if save_latent:
        np.save(
            output_dir / "latents.npy", np.asarray(latents, dtype=np.float32)
        )
    metadata = KVMetadata(
        model_name=str(model_dir),
        num_layers=config.num_hidden_layers,
        num_kv_heads=config.num_attention_heads,
        seq_len=int(len(ids)),
        head_dim=config.qk_head_dim,
        actual_tokens=int(len(ids)),
        v_head_dim=config.v_head_dim,
    )
    kvstore.save_metadata(output_dir, metadata)
    print(
        f"Saved {config.num_hidden_layers} layers"
        + (" + latents.npy" if save_latent else "")
        + f" to {output_dir}/"
    )
    return metadata


# ---------------------------------------------------------------------------
# Weight loading and random init
# ---------------------------------------------------------------------------


def load_mla_params(model_dir: Path, dtype=jnp.float32):
    """Load a deepseek_v2/v3 checkpoint directory into (config, params).

    Linear weights transpose to (in, out) like the Llama loader; the HF
    gate (router) weight (E, hidden) becomes (hidden, E); V3's
    e_score_correction_bias buffer loads as ``router_bias``.
    """
    model_dir = Path(model_dir)
    with open(model_dir / "config.json") as f:
        config = MLAConfig.from_hf_dict(json.load(f))
    get, names = _open_hf_weights(model_dir)
    if "model.embed_tokens.weight" not in names:
        raise KeyError("model.embed_tokens.weight missing from checkpoint")

    def w(name):
        return np.asarray(get(name), dtype=np.float32).T

    def attn_leaves(i: int) -> dict:
        prefix = f"model.layers.{i}"
        lp = {
            "kv_a": w(f"{prefix}.self_attn.kv_a_proj_with_mqa.weight"),
            "kv_a_norm": np.asarray(
                get(f"{prefix}.self_attn.kv_a_layernorm.weight"), np.float32
            ),
            "kv_b": w(f"{prefix}.self_attn.kv_b_proj.weight"),
            "o": w(f"{prefix}.self_attn.o_proj.weight"),
            "input_norm": np.asarray(
                get(f"{prefix}.input_layernorm.weight"), np.float32
            ),
            "post_norm": np.asarray(
                get(f"{prefix}.post_attention_layernorm.weight"), np.float32
            ),
        }
        if config.q_lora_rank is None:
            lp["q"] = w(f"{prefix}.self_attn.q_proj.weight")
        else:
            lp["q_a"] = w(f"{prefix}.self_attn.q_a_proj.weight")
            lp["q_a_norm"] = np.asarray(
                get(f"{prefix}.self_attn.q_a_layernorm.weight"), np.float32
            )
            lp["q_b"] = w(f"{prefix}.self_attn.q_b_proj.weight")
        return lp

    dense, moe = {}, {}
    for i in range(config.num_hidden_layers):
        prefix = f"model.layers.{i}"
        lp = attn_leaves(i)
        if i < config.num_dense_layers:
            for name, hf in (
                ("gate", "gate_proj"), ("up", "up_proj"), ("down", "down_proj"),
            ):
                lp[name] = w(f"{prefix}.mlp.{hf}.weight")
            tgt = dense
        else:
            lp["router"] = w(f"{prefix}.mlp.gate.weight")
            if config.model_type == "deepseek_v3":
                lp["router_bias"] = np.asarray(
                    get(f"{prefix}.mlp.gate.e_score_correction_bias"),
                    np.float32,
                )
            for name, hf in (("w1", "gate_proj"), ("w3", "up_proj"), ("w2", "down_proj")):
                lp[name] = np.stack(
                    [
                        w(f"{prefix}.mlp.experts.{j}.{hf}.weight")
                        for j in range(config.n_routed_experts)
                    ]
                )
            if config.n_shared_experts:
                for name, hf in (
                    ("shared_gate", "gate_proj"),
                    ("shared_up", "up_proj"),
                    ("shared_down", "down_proj"),
                ):
                    lp[name] = w(f"{prefix}.mlp.shared_experts.{hf}.weight")
            tgt = moe
        for k_name, v_arr in lp.items():
            tgt.setdefault(k_name, []).append(v_arr)

    params = {
        "embed": jnp.asarray(
            np.asarray(get("model.embed_tokens.weight"), np.float32),
            dtype=dtype,
        )
    }
    if dense:
        params["dense_layers"] = {
            k: jnp.asarray(np.stack(v), dtype=dtype) for k, v in dense.items()
        }
    if moe:
        params["moe_layers"] = {
            k: jnp.asarray(np.stack(v), dtype=dtype) for k, v in moe.items()
        }
    return config, params


def shard_mla_params(
    params: dict, mesh, axis: str | None = "tp", expert_axis: str | None = None
) -> dict:
    """Tensor-/expert-shard the MLA weight pytree over a mesh.

    The MLA twin of `llama_jax.shard_llama_params` — same GSPMD recipe
    (device_put with NamedSharding, run the unmodified forward under
    jit), but the TP layout reflects what MLA actually shares:

      * The LATENT path replicates. ``kv_a`` projects every token to one
        shared (r + rope) row — there is no head dimension to split, and
        the whole point of the architecture is that this state is small.
        Every TP rank holds the full latent cache (MQA-style), so decode
        needs NO collective on the cache itself.
      * Heads split Megatron-style. ``q``/``q_b`` and ``kv_b`` shard
        their head-major flattened output dim, ``o`` its input dim — the
        per-head absorbed contractions (`_mla_layer_decode_absorbed`)
        then run rank-local and the block's single all-reduce is the
        o-projection's.
      * ``q_a`` (the query LoRA down-projection) replicates: its output
        is the shared q_lora_rank vector, normed before ``q_b``.
      * MoE: the router (and V3's e_score_correction_bias) replicates —
        every rank reproduces the same top-k choice; ``expert_axis``
        shards the EXPERT dim of w1/w3/w2 (EP: the combine einsum
        contracts experts in one all-reduce); otherwise experts shard
        their intermediate dim over ``axis`` like the dense MLP. Shared
        experts are a dense MLP — always Megatron over ``axis``.

    ``axis=None`` replicates attention/dense weights (pure EP serving).
    A 2-D ``Mesh(devs.reshape(ep, tp), ("ep", "tp"))`` composes both.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    def attn_specs(lp: dict) -> dict:
        specs = {
            "kv_a": P(None, None, None),
            "kv_a_norm": P(None, None),
            "kv_b": P(None, None, axis),
            "o": P(None, axis, None),
            "input_norm": P(None, None),
            "post_norm": P(None, None),
        }
        if "q" in lp:
            specs["q"] = P(None, None, axis)
        else:
            specs["q_a"] = P(None, None, None)
            specs["q_a_norm"] = P(None, None)
            specs["q_b"] = P(None, None, axis)
        return specs

    out = {"embed": put(params["embed"], P(None, None))}
    if "dense_layers" in params:
        lp = params["dense_layers"]
        specs = attn_specs(lp)
        specs.update(
            gate=P(None, None, axis), up=P(None, None, axis),
            down=P(None, axis, None),
        )
        out["dense_layers"] = {k: put(v, specs[k]) for k, v in lp.items()}
    if "moe_layers" in params:
        lp = params["moe_layers"]
        if expert_axis is not None and "router" not in lp:
            raise ValueError("expert_axis given but no MoE leaves present")
        specs = attn_specs(lp)
        specs["router"] = P(None, None, None)
        specs["router_bias"] = P(None, None)
        if expert_axis is not None:
            e_spec = P(None, expert_axis, None, None)
            specs.update(w1=e_spec, w3=e_spec, w2=e_spec)
        else:
            specs.update(
                w1=P(None, None, None, axis), w3=P(None, None, None, axis),
                w2=P(None, None, axis, None),
            )
        specs.update(
            shared_gate=P(None, None, axis), shared_up=P(None, None, axis),
            shared_down=P(None, axis, None),
        )
        out["moe_layers"] = {k: put(v, specs[k]) for k, v in lp.items()}
    return out


def init_random_mla(config: MLAConfig, seed: int = 0, dtype=jnp.float32) -> dict:
    """Random small-scale init (tests / hermetic studies without weights)."""
    rng = np.random.RandomState(seed)
    h = config.hidden_size
    n_q = config.num_attention_heads
    r, rope = config.kv_lora_rank, config.qk_rope_head_dim
    nope, dv = config.qk_nope_head_dim, config.v_head_dim

    def w(*shape):
        return jnp.asarray(rng.randn(*shape) * 0.05, dtype=dtype)

    def attn(n_l):
        lp = {
            "kv_a": w(n_l, h, r + rope),
            "kv_a_norm": jnp.ones((n_l, r), dtype=dtype),
            "kv_b": w(n_l, r, n_q * (nope + dv)),
            "o": w(n_l, n_q * dv, h),
            "input_norm": jnp.ones((n_l, h), dtype=dtype),
            "post_norm": jnp.ones((n_l, h), dtype=dtype),
        }
        if config.q_lora_rank is None:
            lp["q"] = w(n_l, h, n_q * (nope + rope))
        else:
            lp["q_a"] = w(n_l, h, config.q_lora_rank)
            lp["q_a_norm"] = jnp.ones((n_l, config.q_lora_rank), dtype=dtype)
            lp["q_b"] = w(n_l, config.q_lora_rank, n_q * (nope + rope))
        return lp

    params = {"embed": w(config.vocab_size, h)}
    n_dense, n_moe = config.num_dense_layers, config.num_moe_layers
    if n_dense:
        lp = attn(n_dense)
        i_sz = config.intermediate_size
        lp.update(
            gate=w(n_dense, h, i_sz), up=w(n_dense, h, i_sz),
            down=w(n_dense, i_sz, h),
        )
        params["dense_layers"] = lp
    if n_moe:
        lp = attn(n_moe)
        e, mi = config.n_routed_experts, config.moe_intermediate_size
        lp.update(
            router=w(n_moe, h, e),
            w1=w(n_moe, e, h, mi), w3=w(n_moe, e, h, mi), w2=w(n_moe, e, mi, h),
        )
        if config.model_type == "deepseek_v3":
            lp["router_bias"] = w(n_moe, e)
        if config.n_shared_experts:
            si = mi * config.n_shared_experts
            lp.update(
                shared_gate=w(n_moe, h, si), shared_up=w(n_moe, h, si),
                shared_down=w(n_moe, si, h),
            )
        params["moe_layers"] = lp
    return params
