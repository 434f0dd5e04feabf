"""Minimal JAX Llama decoder with per-layer post-RoPE K/V capture.

The native extraction path: instead of the reference's torch/bitsandbytes
pipeline (`/root/reference/nerf_attention/extract.py:95-179`), a Llama-family
checkpoint is loaded straight from safetensors into a JAX pytree and one
prefill forward runs on the TPU (optionally tensor-sharded over a mesh),
emitting each layer's (num_kv_heads, S, head_dim) keys/values — the same
tensors HF's DynamicCache would hold (keys post-RoPE), so downstream analysis
and fitting are backend-agnostic.

Only what extraction needs is implemented: prefill, batch 1, no generation,
no lm_head (logits are never used). Layers are stacked and scanned, so
compile time is O(1) in depth.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from nerf_attention_tpu.io import kvstore
from nerf_attention_tpu.types import KVMetadata


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_hidden_layers: int
    num_attention_heads: int
    num_key_value_heads: int
    head_dim: int
    rope_theta: float = 10000.0  # HF LlamaConfig default (Llama-2 era)
    rms_norm_eps: float = 1e-6  # HF LlamaConfig default
    sliding_window: int | None = None  # Mistral-style windowed attention
    hidden_act: str = "silu"  # MLP activation (Gemma: gelu_pytorch_tanh)
    norm_offset: bool = False  # Gemma RMSNorm scales by (1 + w), not w
    scale_embeddings: bool = False  # Gemma multiplies embeddings by sqrt(h)
    # Granite scalar multipliers ("main diff with Llama" — HF
    # GraniteModel/GraniteDecoderLayer): embeddings scaled by a config
    # constant, and every sublayer output scaled before its residual add.
    # attention_multiplier rides the existing attn_scale field.
    embedding_multiplier: float | None = None
    residual_multiplier: float = 1.0
    qk_norm: bool = False  # Qwen3: per-head RMSNorm on Q/K before RoPE
    # OLMo-2: RMSNorm on the FLAT q/k projections (the whole
    # heads*head_dim vector, before the head reshape and RoPE) — a
    # different operator than the per-head qk_norm above.
    qk_norm_full: bool = False
    # OLMo-2 layer wiring: NO pre-norms anywhere; RMSNorm runs on each
    # sublayer's OUTPUT before its residual add
    # (h += norm(attn(h)); h += norm(mlp(h)) — Olmo2DecoderLayer).
    norm_after_only: bool = False
    # Cohere family: classic mean-centered LayerNorm (fp32, no bias —
    # CohereLayerNorm) replaces RMSNorm everywhere a norm appears,
    # including the per-head QK-norm, whose weights are PER-HEAD
    # (num_heads, head_dim) rather than one shared head_dim vector.
    layernorm: bool = False
    # Cohere block wiring: attention and MLP both read ONE input norm and
    # their outputs sum into the residual together
    # (h = h + attn(norm(h)) + mlp(norm(h)) — CohereDecoderLayer); no
    # post-attention norm leaf exists at all.
    parallel_residual: bool = False
    # Cohere rope convention: angle pairs (2i, 2i+1) share a frequency
    # (repeat_interleave) and rotate-half swaps EVEN/ODD lanes, vs
    # Llama's concatenated halves (CohereRotaryEmbedding's "diff from
    # Llama: we interleave() instead of cat()").
    rope_interleaved: bool = False
    # Cohere2 NoPE: full-attention layers get NO positional encoding at
    # all — Cohere2Attention applies rope only when the layer has a
    # sliding window; full layers are position-blind.
    rope_skip_full_layers: bool = False
    # Partial rotary (GLM/GLM-4 partial_rotary_factor 0.5, Phi-3 small
    # variants): rope rotates only the FIRST rotary_dim lanes of each
    # head; the rest pass through untouched. None = full head_dim. The
    # rotated block pairs lanes per rope_interleaved (GLM interleaves,
    # Phi-3 concatenates halves).
    rotary_dim: int | None = None
    # Gemma2 extensions
    attn_scale: float | None = None  # None -> rsqrt(head_dim); Gemma2 uses
    #                                  query_pre_attn_scalar ** -0.5
    attn_logit_softcap: float | None = None  # logits -> cap * tanh(logits/cap)
    sandwich_norms: bool = False  # Gemma2 post-attn + pre/post-ffn norm wiring
    # Per-layer sliding windows (None entry = full attention). Set from HF
    # layer_types (Gemma2 alternates, Qwen2/3 window only layers >=
    # max_window_layers); mutually exclusive with uniform sliding_window.
    layer_windows: tuple | None = None
    # Gemma3 extensions
    rope_local_theta: float | None = None  # sliding layers' rope base
    #                                        (rope_local_base_freq); full
    #                                        layers keep rope_theta
    rope_linear_factor: float | None = None  # 'linear' rope_scaling: all
    #                                          inv_freqs divided by factor
    # Mixtral sparse-MoE FFN (None = dense gate/up/down MLP)
    num_local_experts: int | None = None
    num_experts_per_tok: int = 2
    # MoE flavor: "mixtral" (softmax-over-all-experts then top-k,
    # bias-free SwiGLU experts), "qwen3_moe" (same forward, HF
    # Qwen3MoeSparseMoeBlock's "only diff with mixtral" being the
    # norm_topk_prob gate below plus different checkpoint key names),
    # "qwen2_moe" (qwen3_moe layout plus the sigmoid-gated shared
    # expert), or
    # "gpt_oss" (top-k of raw logits then softmax over the k, biased
    # router, interleaved gate_up experts with clamped swiglu — HF
    # GptOssTopKRouter/GptOssExperts).
    moe_style: str = "mixtral"
    # Mixtral always renormalizes the top-k probabilities; Qwen3-MoE only
    # when the checkpoint's norm_topk_prob is true (HF config default is
    # false, published Qwen3-30B-A3B ships true).
    moe_renormalize: bool = True
    # Qwen2-MoE: a SHARED SwiGLU expert (its own intermediate size) runs
    # on every token alongside the routed experts, gated by
    # sigmoid(shared_expert_gate(x)) — HF Qwen2MoeSparseMoeBlock.
    shared_expert_intermediate_size: int | None = None
    # GPT-OSS extensions
    attn_sinks: bool = False  # per-head learnable sink logit: softmax runs
    #                           over [scores, sink] and the sink column is
    #                           dropped after normalization (HF
    #                           eager_attention_forward, s_aux). The o_proj
    #                           bias gpt_oss also carries needs no flag: the
    #                           o_bias leaf is always present (zeros for
    #                           families whose checkpoints don't ship it).
    # Llama-3.1-style rope scaling (None = plain RoPE)
    rope_scaling_factor: float | None = None
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_original_max_position: int = 8192
    # YaRN rope scaling (None = not yarn; mirrors HF
    # _compute_yarn_parameters — gpt_oss ships yarn by default)
    yarn_factor: float | None = None
    yarn_beta_fast: float = 32.0
    yarn_beta_slow: float = 1.0
    yarn_original_max_position: int = 4096
    yarn_truncate: bool = True
    yarn_attention_factor: float | None = None

    def __post_init__(self):
        if self.qk_norm and self.qk_norm_full:
            raise ValueError(
                "qk_norm (per-head) and qk_norm_full (flat projection) are "
                "mutually exclusive — no family uses both, and the forward "
                "would apply two incompatible norm shapes"
            )

    @property
    def attention_scaling(self) -> float:
        """YaRN's post-factor on cos/sin (1.0 for every non-yarn family)."""
        if self.yarn_factor is None:
            return 1.0
        if self.yarn_attention_factor is not None:
            return self.yarn_attention_factor
        if self.yarn_factor <= 1:
            return 1.0
        import math

        return 0.1 * math.log(self.yarn_factor) + 1.0

    @staticmethod
    def _resolve_sliding_window(d: dict) -> int | None:
        """Windowed-attention config across families.

        Mistral: ``sliding_window`` (null = full attention; v0.2+ ship
        null; an ABSENT key means HF's MistralConfig default 4096, not
        full attention). Qwen2: carries a ``sliding_window`` value but it
        is inert unless ``use_sliding_window`` is true, and then applies
        only to layers >= max_window_layers (HF default 28) — a per-layer
        mix this prefill doesn't implement, so it's rejected rather than
        silently wrong.
        """
        if "use_sliding_window" in d or d.get("model_type") in ("qwen2", "qwen3"):
            # Qwen2-family config shape. The window is inert unless
            # use_sliding_window is explicitly true (Qwen2Config defaults it
            # False even when a sliding_window value is present), so a config
            # that merely OMITS the key must not fall through to the generic
            # branch and enable a window HF would ignore. A true
            # use_sliding_window with max_window_layers > 0 is a per-layer
            # mix, resolved via layer windows in from_hf_dict, not here.
            if not d.get("use_sliding_window", False):
                return None
            return d.get("sliding_window", 4096)
        if d.get("model_type") == "mistral":
            return d.get("sliding_window", 4096)  # HF MistralConfig default
        return d.get("sliding_window")

    @classmethod
    def _resolve_windows(cls, d: dict) -> tuple["int | None", "tuple | None"]:
        """(uniform sliding_window, per-layer windows) for a HF config dict.

        Precedence: an explicit ``layer_types`` list (Gemma2 always, Qwen2/3
        when serialized) maps each layer to its window; a uniform result
        collapses back to ``sliding_window``. Qwen-family configs without
        layer_types derive the HF rule directly: sliding only for layers
        >= max_window_layers.
        """
        n_layers = d["num_hidden_layers"]
        layer_types = d.get("layer_types")
        if layer_types is None and d.get("model_type") in (
            "gemma2", "gemma3_text", "gpt_oss", "cohere2",
        ):
            # Hub configs serialized before transformers added layer_types
            # (i.e. the actual published gemma-2/3 checkpoints) omit the
            # field; derive it exactly as their HF configs do — sliding
            # unless (i+1) is a multiple of the period (gemma2: 2;
            # gemma3: sliding_window_pattern, default 6; gpt_oss: 2 —
            # GptOssConfig derives alternating sliding/full; cohere2:
            # sliding_window_pattern, default 4 — Cohere2Config).
            period = (
                d.get("sliding_window_pattern", 6)
                if d["model_type"] == "gemma3_text"
                else d.get("sliding_window_pattern", 4)
                if d["model_type"] == "cohere2"
                else 2
            )
            layer_types = [
                "sliding_attention" if (i + 1) % period else "full_attention"
                for i in range(n_layers)
            ]
        if layer_types:
            # Cohere2Config defaults sliding_window to 4096 — an absent key
            # must not read as "no window" for its sliding layers.
            sw = (
                d.get("sliding_window", 4096)
                if d.get("model_type") == "cohere2"
                else d.get("sliding_window")
            )
            windows = tuple(
                sw if t == "sliding_attention" else None for t in layer_types
            )
        elif d.get("use_sliding_window", False):
            sw = d.get("sliding_window", 4096)
            first_full = d.get("max_window_layers", 28)
            windows = tuple(
                None if i < first_full else sw for i in range(n_layers)
            )
        else:
            return cls._resolve_sliding_window(d), None
        if all(w is None for w in windows):
            return None, None
        if all(w == windows[0] for w in windows):
            return windows[0], None
        return None, windows

    # Families this forward implements faithfully. Anything else must fail
    # loudly: e.g. multimodal gemma3 nests its text config, qwen2_moe adds
    # shared experts this FFN doesn't have — silently extracting with the
    # wrong architecture would produce plausible-looking but wrong KV.
    _SUPPORTED_MODEL_TYPES = {
        None, "llama", "mistral", "qwen2", "qwen2_moe", "qwen3",
        "qwen3_moe", "gemma", "gemma2", "gemma3_text", "phi3", "mixtral",
        "gpt_oss", "olmo2", "granite", "cohere", "cohere2", "glm", "glm4",
    }

    @classmethod
    def from_hf_dict(cls, d: dict) -> "LlamaConfig":
        model_type = d.get("model_type")
        if model_type not in cls._SUPPORTED_MODEL_TYPES:
            raise NotImplementedError(
                f"model_type {model_type!r} is not supported (have: "
                f"llama, mistral, mixtral, qwen2, qwen2_moe, qwen3, "
                f"qwen3_moe, gemma, gemma2, gemma3_text, phi3, gpt_oss, "
                f"olmo2, granite, cohere, cohere2, glm, glm4)"
            )
        if model_type in ("qwen3_moe", "qwen2_moe") and (
            d.get("mlp_only_layers") or d.get("decoder_sparse_step", 1) != 1
        ):
            # A mixed dense/sparse layer stack cannot share one scanned
            # per-layer pytree; no published Qwen MoE checkpoint uses it.
            raise NotImplementedError(
                f"{model_type} with mlp_only_layers or decoder_sparse_step "
                f"!= 1 (mixed dense/MoE layers) is not supported"
            )
        if model_type == "gemma3_text" and d.get("use_bidirectional_attention"):
            raise NotImplementedError(
                "gemma3 bidirectional attention (embedding variants) is not "
                "supported"
            )
        scaling = d.get("rope_scaling") or {}
        rope_type = scaling.get("rope_type", scaling.get("type"))
        is_llama3 = rope_type == "llama3"
        is_linear = rope_type == "linear"
        is_yarn = rope_type == "yarn"
        if scaling and rope_type not in (
            "llama3", "linear", "yarn", "default", None,
        ):
            # dynamic scaling changes the position mapping; silently
            # falling back to plain RoPE would extract wrong KV tensors.
            raise NotImplementedError(
                f"rope_scaling type {rope_type!r} is not supported "
                "(plain RoPE, llama3 rescaling, linear, and yarn are)"
            )
        num_heads = d["num_attention_heads"]
        sliding_window, layer_windows = cls._resolve_windows(d)
        gemma_like = model_type in ("gemma", "gemma2", "gemma3_text")
        cohere_like = model_type in ("cohere", "cohere2")
        glm_like = model_type in ("glm", "glm4")
        head_dim = d.get("head_dim") or d["hidden_size"] // num_heads
        # Partial rotary: GLM-family configs default the factor to 0.5
        # (GlmConfig/Glm4Config); Phi-3 small variants ship < 1.0. A
        # factor of 1.0 is plain full-dim rope.
        partial = d.get("partial_rotary_factor", 0.5 if glm_like else 1.0)
        rotary_dim = int(head_dim * partial) if partial != 1.0 else None
        if model_type in ("gemma2", "gemma3_text"):
            # Gemma2/3 MLP reads hidden_activation (their config default).
            hidden_act = d.get("hidden_activation", "gelu_pytorch_tanh")
            attn_scale = d.get("query_pre_attn_scalar", 256) ** -0.5
        else:
            # Parity contract is the installed transformers: GemmaMLP reads
            # config.hidden_act and IGNORES the hidden_activation field some
            # Gemma hub configs also carry — follow HF exactly, or real
            # checkpoints would extract KV with a different activation.
            hidden_act = d.get("hidden_act", "silu")
            attn_scale = (
                d.get("attention_multiplier", 1.0)
                if model_type == "granite"
                else None
            )
        return cls(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            # Qwen3-MoE experts are sized by moe_intermediate_size (the
            # dense intermediate_size is unused when every layer is MoE).
            intermediate_size=(
                d.get(
                    "moe_intermediate_size",
                    768 if model_type == "qwen3_moe" else 1408,
                )
                if model_type in ("qwen3_moe", "qwen2_moe")
                else d["intermediate_size"]
            ),
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=num_heads,
            num_key_value_heads=d.get("num_key_value_heads", num_heads),
            head_dim=head_dim,
            rotary_dim=rotary_dim,
            # Defaults mirror HF LlamaConfig: a config.json that omits these
            # (Llama-2-era checkpoints) must get HF's values, not Llama-3's.
            rope_theta=d.get("rope_theta", 10000.0),
            # Cohere's norms read layer_norm_eps (CohereLayerNorm default
            # 1e-5); the field rides the one eps slot every norm shares.
            rms_norm_eps=(
                d.get("layer_norm_eps", 1e-5)
                if cohere_like
                else d.get("rms_norm_eps", 1e-6)
            ),
            sliding_window=sliding_window,
            layer_windows=layer_windows,
            hidden_act=hidden_act,
            norm_offset=gemma_like,
            scale_embeddings=gemma_like,
            qk_norm=(
                model_type in ("qwen3", "qwen3_moe", "gemma3_text")
                # Cohere v1's optional per-head LayerNorm QK-norm
                # (command-r-plus ships true; cohere2 dropped it).
                or (model_type == "cohere" and d.get("use_qk_norm", False))
            ),
            qk_norm_full=model_type == "olmo2",
            norm_after_only=model_type == "olmo2",
            layernorm=cohere_like,
            parallel_residual=cohere_like,
            # GLM's rotate-half pairs even/odd lanes like Cohere's (HF
            # modeling_glm rotate_half: x[..., 0::2] / x[..., 1::2]).
            rope_interleaved=cohere_like or glm_like,
            rope_skip_full_layers=model_type == "cohere2",
            embedding_multiplier=(
                d.get("embedding_multiplier", 1.0)
                if model_type == "granite"
                else None
            ),
            residual_multiplier=(
                d.get("residual_multiplier", 1.0)
                if model_type == "granite"
                else 1.0
            ),
            attn_scale=attn_scale,
            attn_logit_softcap=(
                d.get("attn_logit_softcapping", 50.0)
                if model_type == "gemma2"
                else None
            ),
            # GLM-4 wires gemma2's sandwich: extra norms on the attention
            # and MLP OUTPUTS before their residual adds
            # (Glm4DecoderLayer.post_self_attn/post_mlp_layernorm).
            sandwich_norms=model_type in ("gemma2", "gemma3_text", "glm4"),
            rope_local_theta=(
                d.get("rope_local_base_freq", 10000.0)
                if model_type == "gemma3_text"
                else None
            ),
            rope_linear_factor=scaling.get("factor") if is_linear else None,
            rope_scaling_factor=scaling.get("factor") if is_llama3 else None,
            rope_low_freq_factor=scaling.get("low_freq_factor", 1.0),
            rope_high_freq_factor=scaling.get("high_freq_factor", 4.0),
            rope_original_max_position=scaling.get(
                "original_max_position_embeddings", 8192
            ),
            # HF MixtralConfig defaults (8 experts, top-2 routing);
            # GptOssConfig defaults (128 experts, top-4).
            num_local_experts=(
                d.get("num_local_experts", 8)
                if model_type == "mixtral"
                else d.get("num_local_experts", 128)
                if model_type == "gpt_oss"
                else d.get(
                    # HF Qwen3MoeConfig / Qwen2MoeConfig defaults
                    "num_experts", 128 if model_type == "qwen3_moe" else 60
                )
                if model_type in ("qwen3_moe", "qwen2_moe")
                else None
            ),
            num_experts_per_tok=d.get(
                "num_experts_per_tok",
                {"gpt_oss": 4, "qwen3_moe": 8, "qwen2_moe": 4}.get(
                    model_type, 2
                ),
            ),
            moe_style=(
                model_type
                if model_type in ("gpt_oss", "qwen3_moe", "qwen2_moe")
                else "mixtral"
            ),
            moe_renormalize=(
                d.get("norm_topk_prob", False)
                if model_type in ("qwen3_moe", "qwen2_moe")
                else True
            ),
            shared_expert_intermediate_size=(
                d.get("shared_expert_intermediate_size", 5632)
                if model_type == "qwen2_moe"
                else None
            ),
            attn_sinks=model_type == "gpt_oss",
            yarn_factor=scaling.get("factor") if is_yarn else None,
            yarn_beta_fast=scaling.get("beta_fast") or 32.0,
            yarn_beta_slow=scaling.get("beta_slow") or 1.0,
            yarn_original_max_position=(
                scaling.get("original_max_position_embeddings")
                or d.get("max_position_embeddings", 4096)
            ),
            yarn_truncate=scaling.get("truncate", True),
            yarn_attention_factor=scaling.get("attention_factor"),
        )


def _rope_frequencies(
    config: LlamaConfig, theta: float | None = None
) -> np.ndarray:
    """Inverse frequencies, with Llama-3.1 long-context rescaling if set.

    ``theta`` overrides the base (Gemma3's local-attention table); the
    'linear' rope_scaling divides every frequency by its factor (applied to
    the GLOBAL table only, matching HF: Gemma3's rotary_emb_local is built
    from a config copy with rope_scaling stripped).
    """
    # Partial rotary (GLM, Phi-3 small): frequencies span only the
    # rotated block — HF's ROPE_INIT computes dim = head_dim *
    # partial_rotary_factor, so the table is (S, rotary_dim) and
    # _apply_rope passes the remaining lanes through.
    d = config.rotary_dim or config.head_dim
    base = config.rope_theta if theta is None else theta
    inv_freq = 1.0 / (base ** (np.arange(0, d, 2, dtype=np.float64) / d))
    if theta is None and config.rope_linear_factor is not None:
        inv_freq = inv_freq / config.rope_linear_factor
    if theta is None and config.yarn_factor is not None:
        # YaRN (gpt_oss default rope): interpolated (freq/factor) below the
        # beta_slow correction bound, extrapolated (plain) above beta_fast,
        # linearly ramped between — HF _compute_yarn_parameters exactly
        # (the cos/sin attention factor is config.attention_scaling,
        # applied by the rope-table builders).
        import math

        factor = config.yarn_factor
        orig = config.yarn_original_max_position

        def correction_dim(num_rotations: float) -> float:
            return (
                d
                * math.log(orig / (num_rotations * 2 * math.pi))
                / (2 * math.log(base))
            )

        low = correction_dim(config.yarn_beta_fast)
        high = correction_dim(config.yarn_beta_slow)
        if config.yarn_truncate:
            low, high = math.floor(low), math.ceil(high)
        low, high = max(low, 0), min(high, d - 1)
        if low == high:
            high += 0.001  # HF's singularity guard
        ramp = np.clip(
            (np.arange(d // 2, dtype=np.float64) - low) / (high - low), 0, 1
        )
        extrapolation = 1.0 - ramp
        inv_freq = (inv_freq / factor) * (1 - extrapolation) + (
            inv_freq * extrapolation
        )
        return inv_freq.astype(np.float32)
    if config.rope_scaling_factor is None:
        return inv_freq.astype(np.float32)

    # Llama-3.1 "llama3" rope: low-frequency bands divided by `factor`,
    # high-frequency bands kept, smooth interpolation between.
    factor = config.rope_scaling_factor
    low = config.rope_low_freq_factor
    high = config.rope_high_freq_factor
    orig = config.rope_original_max_position

    wavelen = 2 * np.pi / inv_freq
    low_wavelen = orig / low
    high_wavelen = orig / high
    scaled = np.where(wavelen > low_wavelen, inv_freq / factor, inv_freq)
    smooth = (orig / wavelen - low) / (high - low)
    interp = (1 - smooth) / factor * inv_freq + smooth * inv_freq
    is_medium = (wavelen <= low_wavelen) & (wavelen >= high_wavelen)
    return np.where(is_medium, interp, scaled).astype(np.float32)


def _apply_rope(
    x: jax.Array, cos: jax.Array, sin: jax.Array, interleaved: bool = False
) -> jax.Array:
    """HF-style rotate-half RoPE. x: (heads, S, D); cos/sin: (S, D).

    ``interleaved`` is the Cohere/GLM convention: lanes pair as
    (2i, 2i+1) instead of (i, i + D/2), so rotate-half swaps even/odd
    lanes (and the cos/sin tables repeat each angle twice —
    ``_duplicate_angles``).

    Partial rotary (GLM, Phi-3 small): when the tables are narrower than
    the head, only the FIRST cos.shape[-1] lanes rotate; the tail passes
    through unchanged (HF apply_rotary_pos_emb's q_rot/q_pass split).
    """
    rd = cos.shape[-1]
    xr = x if rd == x.shape[-1] else x[..., :rd]
    if interleaved:
        x1, x2 = xr[..., 0::2], xr[..., 1::2]
        rotated = jnp.stack([-x2, x1], axis=-1).reshape(xr.shape)
    else:
        d2 = rd // 2
        x1, x2 = xr[..., :d2], xr[..., d2:]
        rotated = jnp.concatenate([-x2, x1], axis=-1)
    out = xr * cos[None, :, :] + rotated * sin[None, :, :]
    if rd == x.shape[-1]:
        return out
    return jnp.concatenate([out, x[..., rd:]], axis=-1)


def _duplicate_angles(config: LlamaConfig, angles: jax.Array) -> jax.Array:
    """(…, D/2) rope angles -> (…, D), matching the family's rotate-half:
    interleaved pairs for Cohere (repeat_interleave), concatenated halves
    for everyone else."""
    if config.rope_interleaved:
        return jnp.repeat(angles, 2, axis=-1)
    return jnp.concatenate([angles, angles], axis=-1)


def _rms_norm(
    x: jax.Array, weight: jax.Array, eps: float, offset: bool = False
) -> jax.Array:
    xf = x.astype(jnp.float32)
    norm = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    w = weight.astype(jnp.float32)
    if offset:
        w = 1.0 + w  # Gemma stores zero-centered norm weights
    return (norm * w).astype(x.dtype)


def _layer_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """Cohere's mean-centered LayerNorm: fp32, weight multiply, no bias
    (CohereLayerNorm.forward)."""
    xf = x.astype(jnp.float32)
    xc = xf - jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    out = xc * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    return out.astype(x.dtype)


def _norm(config: LlamaConfig, x: jax.Array, weight: jax.Array) -> jax.Array:
    """The family's norm operator: mean-centered LayerNorm for Cohere,
    RMSNorm (with Gemma's 1+w offset where set) for everyone else."""
    if config.layernorm:
        return _layer_norm(x, weight, config.rms_norm_eps)
    return _rms_norm(x, weight, config.rms_norm_eps, config.norm_offset)


def _mlp_act(name: str):
    if name == "silu":
        return jax.nn.silu
    if name == "gelu_pytorch_tanh":
        return partial(jax.nn.gelu, approximate=True)
    if name == "gelu":
        return partial(jax.nn.gelu, approximate=False)
    raise NotImplementedError(f"hidden_act {name!r} is not supported")


def _ffn(config: LlamaConfig, x: jax.Array, lp: dict, act) -> jax.Array:
    """Feed-forward block: dense SwiGLU, or Mixtral's sparse-MoE combine.

    MoE follows HF MixtralSparseMoeBlock exactly (eval path, no jitter):
    router softmax over ALL experts in fp32, top-k selection, renormalize
    over the selected experts, cast back to the compute dtype, then the
    weighted sum of the selected experts' SwiGLU outputs. Computed
    DENSELY: every expert runs on every token as one (E, S, inter) einsum
    and the per-token combine weights (zero off the top-k) do the
    selection — static shapes, no token gather/scatter, which is the
    XLA/MXU-friendly formulation at extraction scale (batch-1 prefill;
    the E/k FLOP overcompute buys compile-time-known shapes). Under
    expert-parallel sharding (``shard_llama_params(expert_axis=...)``)
    each device computes only its E/ep experts and the final combine
    contracts the expert axis in one all-reduce.
    """
    if not config.num_local_experts:
        return act(x @ lp["gate"]) * (x @ lp["up"]) @ lp["down"]
    if config.moe_style == "gpt_oss":
        return _ffn_gpt_oss(config, x, lp)
    logits = x.astype(jnp.float32) @ lp["router"].astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)  # (S, E) fp32, like HF
    top_vals, top_idx = jax.lax.top_k(probs, config.num_experts_per_tok)
    if config.moe_renormalize:
        top_vals = top_vals / jnp.sum(top_vals, axis=-1, keepdims=True)
    weights = (
        jnp.zeros_like(probs)
        .at[jnp.arange(x.shape[0])[:, None], top_idx]
        .set(top_vals)
        .astype(x.dtype)
    )
    gated = act(jnp.einsum("sh,ehi->esi", x, lp["w1"])) * jnp.einsum(
        "sh,ehi->esi", x, lp["w3"]
    )
    expert_out = jnp.einsum("esi,eih->esh", gated, lp["w2"])
    out = jnp.einsum("se,esh->sh", weights, expert_out)
    if "sh_gate" in lp:
        # Qwen2-MoE shared expert: a full SwiGLU on EVERY token, scaled
        # by a scalar sigmoid gate (hidden -> 1 linear), added to the
        # routed combine (HF Qwen2MoeSparseMoeBlock.forward tail).
        shared = act(x @ lp["sh_w1"]) * (x @ lp["sh_w3"]) @ lp["sh_w2"]
        out = out + jax.nn.sigmoid(x @ lp["sh_gate"]) * shared
    return out


def _ffn_gpt_oss(config: LlamaConfig, x: jax.Array, lp: dict) -> jax.Array:
    """GPT-OSS sparse-MoE FFN (HF GptOssTopKRouter + GptOssExperts).

    Routing differs from Mixtral in ORDER: top-k runs on the raw router
    LOGITS (biased linear, model dtype — HF does not upcast), then softmax
    normalizes over just the k selected logits. Experts store gate/up
    INTERLEAVED in one (E, hidden, 2*inter) tensor (gate = even columns),
    clamp gate to (-inf, limit] and up to [-limit, limit], and compute
    ``(up + 1) * gate * sigmoid(alpha * gate)`` (clamped swiglu,
    alpha=1.702) with biases on both projections — each expert's down
    bias is weighted by its routing weight in the combine, matching HF's
    batched-bmm inference path. Dense formulation like the Mixtral branch:
    every expert runs on every token, combine weights do the selection.
    """
    logits = x @ lp["router"] + lp["router_bias"]  # (S, E), model dtype
    top_vals, top_idx = jax.lax.top_k(logits, config.num_experts_per_tok)
    top_vals = jax.nn.softmax(top_vals, axis=-1)
    weights = (
        jnp.zeros_like(logits)
        .at[jnp.arange(x.shape[0])[:, None], top_idx]
        .set(top_vals)
    )  # (S, E)
    gate_up = (
        jnp.einsum("sh,ehi->esi", x, lp["gate_up"])
        + lp["gate_up_bias"][:, None, :]
    )  # (E, S, 2*inter)
    gate, up = gate_up[..., ::2], gate_up[..., 1::2]
    limit = 7.0
    gate = jnp.minimum(gate, limit)
    up = jnp.clip(up, -limit, limit)
    glu = gate * jax.nn.sigmoid(gate * 1.702)
    expert_out = (
        jnp.einsum("esi,eih->esh", (up + 1.0) * glu, lp["moe_down"])
        + lp["moe_down_bias"][:, None, :]
    )  # (E, S, hidden)
    return jnp.einsum("se,esh->sh", weights, expert_out)


ATTN_BLOCK = 512  # query-chunk rows; bounds logits memory to (H, BLOCK, S)


def _causal_attention(
    q: jax.Array, k_full: jax.Array, v_full: jax.Array,
    window=None,
    softcap: float | None = None,
    scale: float | None = None,
    row_offset=0,
    sinks: jax.Array | None = None,
):
    """Causal softmax attention, query-chunked.

    q/k_full/v_full: (H, S, D). The full (H, S, S) fp32 logits tensor of a
    single-shot attention is ~8.6 GB per layer at S=8192 for 32 heads —
    chunking queries into ATTN_BLOCK rows bounds the live logits to
    (H, BLOCK, S) (~0.5 GB at 8192) so long-context extraction fits a
    single chip. Math is identical: each query row still softmaxes over
    its full causal prefix.

    ``window``: sliding window — row r attends to cols in (r - window, r],
    matching HF's mask diagonal. May be a static int (Mistral-uniform) or a
    TRACED int32 scalar (per-layer windows scanned over layers; <= 0 means
    full attention). ``softcap``: Gemma2 logit soft-capping, applied before
    the mask like HF's eager path. ``scale``: logit scale override
    (Gemma2's query_pre_attn_scalar ** -0.5); default rsqrt(head_dim).
    ``row_offset``: global index of q's first row when q holds only a
    sequence-parallel slice of the queries while k/v are the gathered full
    sequence (static 0 on the single-device path, a traced axis-index
    multiple under shard_map) — masks are built in GLOBAL coordinates.
    ``sinks``: per-head learnable sink logits (H,) — gpt_oss attention:
    the softmax runs over [scores, sink] and the sink column is dropped
    after normalization (it absorbs probability mass; HF
    eager_attention_forward's s_aux), so rows no longer sum to 1.
    """
    h_heads, s, d = q.shape
    scale = jax.lax.rsqrt(jnp.float32(d)) if scale is None else jnp.float32(scale)
    neg_inf = jnp.finfo(jnp.float32).min
    cols = jnp.arange(k_full.shape[1])

    block = min(ATTN_BLOCK, s)
    n_blocks = -(-s // block)
    pad = n_blocks * block - s
    q_pad = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    q_blocks = q_pad.reshape(h_heads, n_blocks, block, d).transpose(1, 0, 2, 3)

    def one_block(row0, qb):
        logits = (
            jnp.einsum("hqd,hkd->hqk", qb, k_full, preferred_element_type=jnp.float32)
            * scale
        )
        if softcap is not None:
            logits = softcap * jnp.tanh(logits / softcap)
        rows = row_offset + row0 + jnp.arange(block)
        keep = cols[None, None, :] <= rows[None, :, None]
        if isinstance(window, jax.Array):
            keep &= (window <= 0) | (
                cols[None, None, :] > rows[None, :, None] - window
            )
        elif window is not None:
            keep &= cols[None, None, :] > rows[None, :, None] - window
        logits = jnp.where(keep, logits, neg_inf)
        if sinks is not None:
            sink_col = jnp.broadcast_to(
                sinks.astype(jnp.float32)[:, None, None],
                (h_heads, block, 1),
            )
            combined = jnp.concatenate([logits, sink_col], axis=-1)
            probs = jax.nn.softmax(combined, axis=-1)[..., :-1].astype(
                v_full.dtype
            )
        else:
            probs = jax.nn.softmax(logits, axis=-1).astype(v_full.dtype)
        return jnp.einsum("hqk,hkd->hqd", probs, v_full)

    row0s = jnp.arange(n_blocks) * block
    attn = jax.lax.map(lambda args: one_block(*args), (row0s, q_blocks))
    # Output rows carry the VALUE head dim, which differs from q/k's under
    # MLA (DeepSeek qk_head_dim 192 vs v_head_dim 128 — models/mla_jax.py).
    d_v = v_full.shape[-1]
    attn = attn.transpose(1, 0, 2, 3).reshape(h_heads, n_blocks * block, d_v)
    return attn[:, :s]


def _layer_forward(
    config: LlamaConfig, h: jax.Array, lp: dict, cos, sin,
    cos_local=None, sin_local=None, kv_join=None, row_offset=0,
):
    """One decoder layer. h: (S, hidden). Returns (h, (keys, values)).

    ``kv_join``: optional hook mapping this slice's post-RoPE (k, v) —
    each (n_kv, s_local, d) — to the (k, v) attention actually reads. The
    sequence-parallel prefill passes an all-gather over the mesh axis (one
    collective per layer, on the smallest tensor in the block under GQA);
    the pipeline-parallel prefill passes a cache insert-and-return (queries
    of chunk c attend over all rows filled so far). ``row_offset`` is the
    slice's global row origin, threaded into the causal/window mask, which
    is built in GLOBAL coordinates. Returned keys/values stay LOCAL (this
    slice's rows) so the stacked cache shards over the mesh.
    """
    n_q, n_kv, d = (
        config.num_attention_heads,
        config.num_key_value_heads,
        config.head_dim,
    )
    s = h.shape[0]

    if "rope_local" in lp:
        # Gemma3: sliding layers rotate with the local-base table, full
        # layers with the global one (scanned per-layer flag).
        use_local = lp["rope_local"] > 0
        cos = jnp.where(use_local, cos_local, cos)
        sin = jnp.where(use_local, sin_local, sin)
    if "rope_skip" in lp:
        # Cohere2 NoPE: full-attention layers are position-blind — rope
        # with cos=1 / sin=0 is the identity, so the skip rides the scan
        # as data like every other per-layer flag.
        skip = lp["rope_skip"] > 0
        cos = jnp.where(skip, jnp.ones_like(cos), cos)
        sin = jnp.where(skip, jnp.zeros_like(sin), sin)

    # OLMo-2 runs attention on the RAW residual stream (its only norms
    # sit on sublayer outputs); everyone else pre-norms.
    x = h if config.norm_after_only else _norm(config, h, lp["input_norm"])
    # QKV biases: zeros for Llama/Mistral, loaded for Qwen2-family
    # checkpoints (their attention projections carry biases).
    q_flat = x @ lp["q"] + lp["q_bias"]
    k_flat = x @ lp["k"] + lp["k_bias"]
    if config.qk_norm_full:
        # OLMo-2: RMSNorm over the whole flat projection, pre-reshape
        # (q_norm(q_proj(x)) — Olmo2Attention.forward).
        q_flat = _norm(config, q_flat, lp["q_norm"])
        k_flat = _norm(config, k_flat, lp["k_norm"])
    q = q_flat.reshape(s, n_q, d).transpose(1, 0, 2)
    k = k_flat.reshape(s, n_kv, d).transpose(1, 0, 2)
    v = (x @ lp["v"] + lp["v_bias"]).reshape(s, n_kv, d).transpose(1, 0, 2)

    if config.qk_norm:
        # Qwen3/Gemma3: per-head RMSNorm over head_dim on Q and K, BEFORE
        # RoPE (q_norm(q_proj(x).view(...))). Gemma-family norms carry the
        # (1 + w) offset. Cohere's QK-norm is a per-head LayerNorm with
        # PER-HEAD weights (heads, head_dim) — align them with the
        # (heads, S, head_dim) layout.
        qw, kw = lp["q_norm"], lp["k_norm"]
        if qw.ndim == 2:
            qw, kw = qw[:, None, :], kw[:, None, :]
        q = _norm(config, q, qw)
        k = _norm(config, k, kw)

    q = _apply_rope(q, cos, sin, config.rope_interleaved)
    # cache holds post-RoPE keys, like HF
    k = _apply_rope(k, cos, sin, config.rope_interleaved)

    k_att, v_att = (k, v) if kv_join is None else kv_join(k, v)

    # GQA: repeat kv heads up to the query head count.
    group = n_q // n_kv
    k_full = jnp.repeat(k_att, group, axis=0)
    v_full = jnp.repeat(v_att, group, axis=0)

    # Per-layer windows arrive as a scanned traced scalar in lp["window"];
    # uniform windows stay the static config value.
    window = lp["window"] if "window" in lp else config.sliding_window
    attn = _causal_attention(
        q, k_full, v_full, window=window,
        softcap=config.attn_logit_softcap, scale=config.attn_scale,
        row_offset=row_offset,
        sinks=lp["sinks"] if config.attn_sinks else None,
    )
    attn = attn.transpose(1, 0, 2).reshape(s, n_q * d)
    attn_out = attn @ lp["o"] + lp["o_bias"]

    act = _mlp_act(config.hidden_act)
    if config.parallel_residual:
        # Cohere wiring: the MLP reads the SAME input-norm output the
        # attention did, and both sublayers sum into the residual together
        # (CohereDecoderLayer — no post-attention norm exists).
        h = h + attn_out + _ffn(config, x, lp, act)
    elif config.sandwich_norms or config.norm_after_only:
        # Gemma2 wiring: post-attention norm on the attention OUTPUT, then
        # pre/post-feedforward norms around the MLP (Gemma2DecoderLayer).
        # OLMo-2 is the same minus the pre-FFN norm (the MLP reads the
        # raw residual stream — Olmo2DecoderLayer).
        h = h + _norm(config, attn_out, lp["post_norm"])
        x = (
            h
            if config.norm_after_only
            else _norm(config, h, lp["pre_ffn_norm"])
        )
        h = h + _norm(config, _ffn(config, x, lp, act), lp["post_ffn_norm"])
    else:
        rm = config.residual_multiplier
        h = h + (attn_out if rm == 1.0 else attn_out * rm)
        x = _norm(config, h, lp["post_norm"])
        ffn_out = _ffn(config, x, lp, act)
        h = h + (ffn_out if rm == 1.0 else ffn_out * rm)
    return h, (k, v)


def _scanned_layers(config: LlamaConfig, params: dict) -> dict:
    """Layer leaves + per-layer flag leaves for the decoder scan.

    Per-layer sliding windows ride the scan as one more leaf (<= 0 means
    full attention for that layer); Gemma3's sliding layers additionally
    carry a flag selecting the local-base rope table.
    """
    layers = params["layers"]
    if config.layer_windows is not None:
        layers = dict(layers)
        layers["window"] = jnp.asarray(
            [w if w else 0 for w in config.layer_windows], dtype=jnp.int32
        )
    if config.rope_local_theta is not None:
        if config.layer_windows is not None:
            local_flags = [1 if w else 0 for w in config.layer_windows]
        else:
            # Uniform-window (or windowless) config: every layer shares one
            # attention type, so one flag serves all.
            local_flags = [
                1 if config.sliding_window is not None else 0
            ] * config.num_hidden_layers
        layers = dict(layers)
        layers["rope_local"] = jnp.asarray(local_flags, dtype=jnp.int32)
    if config.rope_skip_full_layers:
        # Cohere2 NoPE: rope applies only on sliding-window layers; full
        # layers skip it (flag > 0 = skip). A uniform stack (layer_windows
        # None) either ropes everywhere (uniform window) or nowhere.
        if config.layer_windows is not None:
            skip_flags = [0 if w else 1 for w in config.layer_windows]
        else:
            skip_flags = [
                0 if config.sliding_window is not None else 1
            ] * config.num_hidden_layers
        layers = dict(layers)
        layers["rope_skip"] = jnp.asarray(skip_flags, dtype=jnp.int32)
    return layers


@partial(jax.jit, static_argnames=("config",))
def llama_prefill_kv(config: LlamaConfig, params: dict, input_ids: jax.Array):
    """One prefill pass -> per-layer post-RoPE KV.

    Returns (keys, values), each (num_layers, num_kv_heads, S, head_dim).
    """
    s = input_ids.shape[0]
    h = params["embed"][input_ids]
    if config.scale_embeddings:
        # Gemma scales embeddings by sqrt(hidden), cast to the compute dtype
        # BEFORE the multiply (HF casts the normalizer tensor to dtype).
        h = h * jnp.asarray(config.hidden_size**0.5, dtype=h.dtype)
    if config.embedding_multiplier is not None:
        h = h * jnp.asarray(config.embedding_multiplier, dtype=h.dtype)

    def rope_table(theta=None):
        inv_freq = jnp.asarray(_rope_frequencies(config, theta))
        pos = jnp.arange(s, dtype=jnp.float32)
        angles = pos[:, None] * inv_freq[None, :]  # (S, D/2)
        angles = _duplicate_angles(config, angles)  # (S, D)
        # YaRN's attention factor rides the cos/sin tables (HF convention);
        # 1.0 for every non-yarn family. Local-theta tables (Gemma3) are
        # built from an unscaled config, so the factor applies only here.
        sc = jnp.float32(config.attention_scaling if theta is None else 1.0)
        return (
            (jnp.cos(angles) * sc).astype(h.dtype),
            (jnp.sin(angles) * sc).astype(h.dtype),
        )

    cos, sin = rope_table()
    cos_local = sin_local = None

    layers = _scanned_layers(config, params)
    if config.rope_local_theta is not None:
        # Gemma3: sliding layers use the local-base rope table.
        cos_local, sin_local = rope_table(config.rope_local_theta)

    def scan_layer(h, lp):
        h, kv = _layer_forward(
            config, h, lp, cos, sin, cos_local=cos_local, sin_local=sin_local
        )
        return h, kv

    _, (keys, values) = jax.lax.scan(scan_layer, h, layers)
    return keys, values


def llama_prefill_kv_sp(
    config: LlamaConfig,
    params: dict,
    input_ids: jax.Array,
    mesh,
    axis: str = "sp",
):
    """Sequence-parallel prefill: the token axis sharded over a mesh.

    The reference's extraction is single-device and hits its memory wall at
    S=8192 on 8 GB (`/root/reference/nerf_attention/experiments/scaling.py:111-116`
    catches the OOM and stops the ladder). The TPU-native answer is to shard
    the SEQUENCE over the mesh: each chip embeds and runs every layer on its
    S/n-row slice (activations, attention logits, and MLP all shrink by n),
    with one all-gather of the (n_kv, S/n, d) K/V per layer — the smallest
    tensor in the block under GQA — so attention still sees the full causal
    prefix, masked in global coordinates. Weights are replicated (this is
    context/sequence parallelism, composable in principle with the Megatron
    TP layout of ``shard_llama_params``, which shards them instead).

    Returns (keys, values) like ``llama_prefill_kv``, each
    (num_layers, num_kv_heads, S, head_dim), row-sharded over the mesh.
    S must be divisible by the mesh size.
    """
    from jax.sharding import PartitionSpec as P

    from nerf_attention_tpu.parallel.mesh import shard_map_compat

    n = int(np.prod(mesh.devices.shape))
    s = int(input_ids.shape[0])
    if s % n:
        raise ValueError(f"seq_len {s} not divisible by mesh size {n}")
    local_s = s // n

    def per_shard(ids_local, params):
        row0 = jax.lax.axis_index(axis) * local_s
        h = params["embed"][ids_local]
        if config.scale_embeddings:
            h = h * jnp.asarray(config.hidden_size**0.5, dtype=h.dtype)
        if config.embedding_multiplier is not None:
            h = h * jnp.asarray(config.embedding_multiplier, dtype=h.dtype)

        def rope_table(theta=None):
            # Same table as the single-device path, built at this shard's
            # GLOBAL positions (row0 is traced; shapes stay static).
            inv_freq = jnp.asarray(_rope_frequencies(config, theta))
            pos = (row0 + jnp.arange(local_s)).astype(jnp.float32)
            angles = pos[:, None] * inv_freq[None, :]
            angles = _duplicate_angles(config, angles)
            sc = jnp.float32(
                config.attention_scaling if theta is None else 1.0
            )
            return (
                (jnp.cos(angles) * sc).astype(h.dtype),
                (jnp.sin(angles) * sc).astype(h.dtype),
            )

        cos, sin = rope_table()
        cos_local = sin_local = None
        layers = _scanned_layers(config, params)
        if config.rope_local_theta is not None:
            cos_local, sin_local = rope_table(config.rope_local_theta)

        def gather_kv(k, v):
            # Gather the full-sequence K/V (pre-repeat — n_kv heads, the
            # cheapest tensor to move). Shards are laid out in axis-index
            # order, so tiled concatenation along the row axis reconstructs
            # global order.
            return (
                jax.lax.all_gather(k, axis, axis=1, tiled=True),
                jax.lax.all_gather(v, axis, axis=1, tiled=True),
            )

        def scan_layer(h, lp):
            h, kv = _layer_forward(
                config, h, lp, cos, sin,
                cos_local=cos_local, sin_local=sin_local,
                kv_join=gather_kv, row_offset=row0,
            )
            return h, kv

        _, (keys, values) = jax.lax.scan(scan_layer, h, layers)
        return keys, values

    kv_spec = P(None, None, axis, None)
    fn = shard_map_compat(
        per_shard, mesh=mesh,
        in_specs=(P(axis), P()), out_specs=(kv_spec, kv_spec),
    )
    return jax.jit(fn)(jnp.asarray(input_ids, dtype=jnp.int32), params)


def llama_prefill_kv_pp(
    config: LlamaConfig,
    params: dict,
    input_ids: jax.Array,
    mesh,
    axis: str = "pp",
    n_chunks: int | None = None,
):
    """Pipeline-parallel prefill: the LAYER axis sharded over a mesh.

    The third greenfield parallel mode (after TP ``shard_llama_params`` and
    SP ``llama_prefill_kv_sp``): stage i owns layers [i*L/n, (i+1)*L/n) plus
    a full-sequence KV cache for just those layers — the layout that fits a
    model whose weights+cache overflow one chip even at S the SP path could
    handle. The sequence is cut into ``n_chunks`` chunks that flow through
    the stages chunked-prefill style: one ``lax.scan`` over
    ``n_chunks + n - 1`` ticks, where at tick t stage s runs chunk t-s
    through its layers (queries of chunk c attend over every cache row
    filled so far, masks in GLOBAL coordinates via ``row_offset``) and
    ``ppermute``s its activations to stage s+1 — the point-to-point
    neighbor hop that rides ICI. Pipeline-bubble ratio is the classic
    (n-1)/(n_chunks+n-1); inactive ticks compute on a clamped chunk and
    their cache writes are masked out.

    Chunk attention reads the full-S cache buffer (stale rows masked), so
    attention FLOPs are ~2x the causal minimum — the correctness-first
    trade; a production kernel would tile to the filled prefix.

    Returns (keys, values), each (num_layers, num_kv_heads, S, head_dim),
    LAYER-sharded over the mesh. Requires L % n == 0 and S % n_chunks == 0
    (default n_chunks: 2n when divisible, else n).
    """
    from jax.sharding import PartitionSpec as P

    from nerf_attention_tpu.parallel.mesh import shard_map_compat

    n = int(np.prod(mesh.devices.shape))
    s = int(input_ids.shape[0])
    n_l = config.num_hidden_layers
    if n_l % n:
        raise ValueError(f"num_hidden_layers {n_l} not divisible by mesh size {n}")
    if n_chunks is None:
        n_chunks = 2 * n if s % (2 * n) == 0 else n
    if s % n_chunks:
        raise ValueError(f"seq_len {s} not divisible by n_chunks {n_chunks}")
    chunk = s // n_chunks
    l_loc = n_l // n
    n_kv, d = config.num_key_value_heads, config.head_dim

    def per_stage(embed, layers, ids):
        stage = jax.lax.axis_index(axis)
        dtype = embed.dtype
        cache_k = jnp.zeros((l_loc, n_kv, s, d), dtype=dtype)
        cache_v = jnp.zeros((l_loc, n_kv, s, d), dtype=dtype)
        h0 = jnp.zeros((chunk, config.hidden_size), dtype=dtype)

        def rope_chunk(row0, theta=None):
            inv_freq = jnp.asarray(_rope_frequencies(config, theta))
            pos = (row0 + jnp.arange(chunk)).astype(jnp.float32)
            angles = pos[:, None] * inv_freq[None, :]
            angles = _duplicate_angles(config, angles)
            sc = jnp.float32(
                config.attention_scaling if theta is None else 1.0
            )
            return (
                (jnp.cos(angles) * sc).astype(dtype),
                (jnp.sin(angles) * sc).astype(dtype),
            )

        def tick(carry, t):
            cache_k, cache_v, h_in = carry
            c = t - stage
            active = (c >= 0) & (c < n_chunks)
            row0 = jnp.clip(c, 0, n_chunks - 1) * chunk
            ids_c = jax.lax.dynamic_slice(ids, (row0,), (chunk,))
            h_embed = embed[ids_c]
            if config.scale_embeddings:
                h_embed = h_embed * jnp.asarray(config.hidden_size**0.5, dtype)
            if config.embedding_multiplier is not None:
                h_embed = h_embed * jnp.asarray(
                    config.embedding_multiplier, dtype
                )
            h = jnp.where(stage == 0, h_embed, h_in)
            cos, sin = rope_chunk(row0)
            cos_local = sin_local = None
            if config.rope_local_theta is not None:
                cos_local, sin_local = rope_chunk(row0, config.rope_local_theta)

            def layer_step(carry2, xs):
                h, ck_all, cv_all = carry2
                l, lp = xs
                sizes = (1, n_kv, s, d)
                ck = jax.lax.dynamic_slice(ck_all, (l, 0, 0, 0), sizes)[0]
                cv = jax.lax.dynamic_slice(cv_all, (l, 0, 0, 0), sizes)[0]

                def cache_join(k_c, v_c):
                    # Insert this chunk's rows, attend over the whole
                    # buffer; rows past the global query row are masked.
                    return (
                        jax.lax.dynamic_update_slice(ck, k_c, (0, row0, 0)),
                        jax.lax.dynamic_update_slice(cv, v_c, (0, row0, 0)),
                    )

                h2, (k_c, v_c) = _layer_forward(
                    config, h, lp, cos, sin,
                    cos_local=cos_local, sin_local=sin_local,
                    kv_join=cache_join, row_offset=row0,
                )
                # Same insert as cache_join (CSE'd), persisted to the carry.
                ck_all = jax.lax.dynamic_update_slice(
                    ck_all,
                    jax.lax.dynamic_update_slice(ck, k_c, (0, row0, 0))[None],
                    (l, 0, 0, 0),
                )
                cv_all = jax.lax.dynamic_update_slice(
                    cv_all,
                    jax.lax.dynamic_update_slice(cv, v_c, (0, row0, 0))[None],
                    (l, 0, 0, 0),
                )
                return (h2, ck_all, cv_all), None

            (h_out, ck2, cv2), _ = jax.lax.scan(
                layer_step, (h, cache_k, cache_v),
                (jnp.arange(l_loc), layers),
            )
            cache_k = jnp.where(active, ck2, cache_k)
            cache_v = jnp.where(active, cv2, cache_v)
            # Neighbor hop; stage 0 receives nothing (it embeds), the
            # garbage an out-of-range tick emits is masked at the consumer.
            h_next = jax.lax.ppermute(
                h_out, axis, [(i, i + 1) for i in range(n - 1)]
            )
            return (cache_k, cache_v, h_next), None

        (cache_k, cache_v, _), _ = jax.lax.scan(
            tick, (cache_k, cache_v, h0), jnp.arange(n_chunks + n - 1)
        )
        return cache_k, cache_v

    layers = _scanned_layers(config, params)
    kv_spec = P(axis, None, None, None)
    fn = shard_map_compat(
        per_stage, mesh=mesh,
        in_specs=(P(), P(axis), P()), out_specs=(kv_spec, kv_spec),
    )
    return jax.jit(fn)(
        params["embed"], layers, jnp.asarray(input_ids, dtype=jnp.int32)
    )


def _layer_decode(
    config: LlamaConfig, h: jax.Array, lp: dict, cache_k, cache_v,
    position, cos, sin, cos_local=None, sin_local=None,
):
    """One decoder layer for a single token over an S-token KV cache.

    h: (1, hidden). cache_k/cache_v: (n_kv, S, D) post-RoPE — the layout
    `llama_prefill_kv` emits per layer. Mirrors `_layer_forward` exactly,
    except attention runs the one query at ``position`` over the
    concatenated [cache; new] keys/values.
    Returns (h, (k_new, v_new, entropy, ffn_x)), k_new/v_new (n_kv, 1, D);
    ffn_x is the normed FFN input (1, hidden) — the tensor a sparse-MoE
    router reads, captured so routing-sensitivity diagnostics (the
    head_policy MoE leg's flip rate) can recompute expert selections
    outside the forward.
    """
    n_q, n_kv, d = (
        config.num_attention_heads,
        config.num_key_value_heads,
        config.head_dim,
    )

    if "rope_local" in lp:
        use_local = lp["rope_local"] > 0
        cos = jnp.where(use_local, cos_local, cos)
        sin = jnp.where(use_local, sin_local, sin)
    if "rope_skip" in lp:
        # Cohere2 NoPE: full-attention layers skip rope (identity tables).
        skip = lp["rope_skip"] > 0
        cos = jnp.where(skip, jnp.ones_like(cos), cos)
        sin = jnp.where(skip, jnp.zeros_like(sin), sin)

    x = h if config.norm_after_only else _norm(config, h, lp["input_norm"])
    q_flat = x @ lp["q"] + lp["q_bias"]
    k_flat = x @ lp["k"] + lp["k_bias"]
    if config.qk_norm_full:
        q_flat = _norm(config, q_flat, lp["q_norm"])
        k_flat = _norm(config, k_flat, lp["k_norm"])
    q = q_flat.reshape(1, n_q, d).transpose(1, 0, 2)
    k = k_flat.reshape(1, n_kv, d).transpose(1, 0, 2)
    v = (x @ lp["v"] + lp["v_bias"]).reshape(1, n_kv, d).transpose(1, 0, 2)

    if config.qk_norm:
        qw, kw = lp["q_norm"], lp["k_norm"]
        if qw.ndim == 2:  # Cohere per-head weights (heads, head_dim)
            qw, kw = qw[:, None, :], kw[:, None, :]
        q = _norm(config, q, qw)
        k = _norm(config, k, kw)

    q = _apply_rope(q, cos, sin, config.rope_interleaved)
    k = _apply_rope(k, cos, sin, config.rope_interleaved)

    k_full = jnp.concatenate([cache_k, k], axis=1)  # (n_kv, S+1, D)
    v_full = jnp.concatenate([cache_v, v], axis=1)
    group = n_q // n_kv
    kf = jnp.repeat(k_full, group, axis=0)
    vf = jnp.repeat(v_full, group, axis=0)

    scale = (
        jax.lax.rsqrt(jnp.float32(d))
        if config.attn_scale is None
        else jnp.float32(config.attn_scale)
    )
    logits = (
        jnp.einsum("hqd,hkd->hqk", q, kf, preferred_element_type=jnp.float32)
        * scale
    )  # (n_q, 1, S+1)
    if config.attn_logit_softcap is not None:
        cap = config.attn_logit_softcap
        logits = cap * jnp.tanh(logits / cap)
    cols = jnp.arange(k_full.shape[1])
    # Cache rows are the tokens BEFORE ``position``; the new token's own key
    # is the concatenated last column, always visible (also past any sliding
    # window's reach — a token is always within the window of itself). Row
    # ``position`` itself is the current token's (unfilled) slot: masking it
    # avoids double-counting self when the cache is a full-S buffer the
    # query sits inside (the end-metric protocols), and makes decoding
    # correct over a PRE-ALLOCATED buffer longer than the filled prefix —
    # the static-cache serving pattern the rollout-drift study scans over.
    keep = cols < position
    window = lp["window"] if "window" in lp else config.sliding_window
    if isinstance(window, jax.Array):
        keep &= (window <= 0) | (cols > position - window)
    elif window is not None:
        keep &= cols > position - window
    keep |= cols == k_full.shape[1] - 1
    logits = jnp.where(keep[None, None, :], logits, jnp.finfo(jnp.float32).min)
    if config.attn_sinks:
        # gpt_oss: the softmax runs over [scores, sink] and the sink
        # column is dropped from the value combine (it absorbs mass).
        sink_col = lp["sinks"].astype(jnp.float32)[:, None, None]
        logits = jnp.concatenate(
            [logits, jnp.broadcast_to(sink_col, (n_q, 1, 1))], axis=-1
        )
    probs_full = jax.nn.softmax(logits, axis=-1)
    # Per-head attention entropy (nats) of the new token — the sharpness
    # observable the end-metric studies condition on (experiment 8).
    # With sinks this is the entropy of the FULL distribution including
    # the sink outcome: that is the real softmax the head computes, and
    # the sink's mass is exactly the part no cache row influences.
    p32 = probs_full.astype(jnp.float32)
    entropy = -jnp.sum(
        jnp.where(p32 > 0, p32 * jnp.log(p32), 0.0), axis=(-2, -1)
    )  # (n_q,)
    if config.attn_sinks:
        probs = probs_full[..., :-1].astype(vf.dtype)
        # Per-head sink mass — the probability the head assigns to the
        # sink outcome, i.e. exactly the fraction of its softmax that NO
        # cache row (true or reconstructed) can influence. The serving
        # studies condition on it: a sink-dominated head is cheap to
        # serve from parameters regardless of how sharp its full
        # distribution looks (head_policy's sink leg).
        sink_mass = p32[..., -1].reshape(n_q)
    else:
        probs = probs_full.astype(vf.dtype)
        sink_mass = jnp.zeros((n_q,), jnp.float32)
    attn = jnp.einsum("hqk,hkd->hqd", probs, vf)  # (n_q, 1, D)
    attn = attn.transpose(1, 0, 2).reshape(1, n_q * d)
    attn_out = attn @ lp["o"] + lp["o_bias"]

    act = _mlp_act(config.hidden_act)
    if config.parallel_residual:
        # Cohere: MLP reads the same input-norm output attention did; the
        # FFN-input capture (x) is exactly that tensor.
        h = h + attn_out + _ffn(config, x, lp, act)
    elif config.sandwich_norms or config.norm_after_only:
        h = h + _norm(config, attn_out, lp["post_norm"])
        x = (
            h
            if config.norm_after_only
            else _norm(config, h, lp["pre_ffn_norm"])
        )
        h = h + _norm(config, _ffn(config, x, lp, act), lp["post_ffn_norm"])
    else:
        rm = config.residual_multiplier
        h = h + (attn_out if rm == 1.0 else attn_out * rm)
        x = _norm(config, h, lp["post_norm"])
        ffn_out = _ffn(config, x, lp, act)
        h = h + (ffn_out if rm == 1.0 else ffn_out * rm)
    return h, (k, v, entropy, sink_mass, x)


@partial(
    jax.jit,
    static_argnames=("config", "capture_ffn_input", "capture_sink_mass"),
)
def llama_decode_step(
    config: LlamaConfig,
    params: dict,
    token_id: jax.Array,
    position: jax.Array,
    cache_keys: jax.Array,
    cache_values: jax.Array,
    capture_ffn_input: bool = False,
    capture_sink_mass: bool = False,
):
    """One autoregressive decode step over a per-layer KV cache.

    The cache-swap serving surface of the study: ``cache_keys`` /
    ``cache_values`` are (num_layers, num_kv_heads, S, head_dim) post-RoPE
    tensors in `llama_prefill_kv`'s layout — the true cache, or ANY
    reconstruction of it (SIREN decodes, dequantized payloads), making
    end-to-end "serve from compressed cache" runnable: the swap changes
    nothing else about the forward. ``token_id``/``position`` are scalars
    (position is the new token's absolute position, normally S).

    Returns (h_last (hidden,), (k_new, v_new) each (num_layers,
    num_kv_heads, 1, head_dim), attn_entropy (num_layers,
    num_attention_heads) — the new token's per-head attention entropy in
    nats, the sharpness observable the end-metric studies condition on).
    The model's weight set stops at the KV / hidden-state surface
    (extraction contract — no lm_head is loaded; see module docstring), so
    the decode step returns the final hidden state before any output
    norm/readout.

    ``capture_ffn_input=True`` (static) appends an output: the tensor
    each layer's FFN actually reads (num_layers, 1, hidden) — the normed
    pre-FFN hidden state, or the raw residual stream for
    ``norm_after_only`` (OLMo-2) families — i.e. exactly what a
    sparse-MoE router would consume, so routing-sensitivity diagnostics
    can recompute expert selections outside the forward (head_policy's
    MoE flip-rate leg). ``capture_sink_mass=True`` (static) appends, last,
    the per-head sink mass (num_layers, num_attention_heads) — the
    probability each head assigns to its attention sink (zeros for
    families without ``attn_sinks``), the fraction of the softmax no
    cache row can influence (head_policy's sink leg).
    """
    h = params["embed"][token_id][None, :]
    if config.scale_embeddings:
        h = h * jnp.asarray(config.hidden_size**0.5, dtype=h.dtype)
    if config.embedding_multiplier is not None:
        h = h * jnp.asarray(config.embedding_multiplier, dtype=h.dtype)
    position = jnp.asarray(position, jnp.int32)

    def rope_row(theta=None):
        inv_freq = jnp.asarray(_rope_frequencies(config, theta))
        angles = position.astype(jnp.float32) * inv_freq  # (D/2,)
        angles = _duplicate_angles(config, angles)[None, :]  # (1, D)
        sc = jnp.float32(config.attention_scaling if theta is None else 1.0)
        return (
            (jnp.cos(angles) * sc).astype(h.dtype),
            (jnp.sin(angles) * sc).astype(h.dtype),
        )

    cos, sin = rope_row()
    cos_local = sin_local = None
    if config.rope_local_theta is not None:
        cos_local, sin_local = rope_row(config.rope_local_theta)

    def scan_layer(h, xs):
        lp, ck, cv = xs
        h, kv = _layer_decode(
            config, h, lp, ck, cv, position, cos, sin,
            cos_local=cos_local, sin_local=sin_local,
        )
        return h, kv

    layers = _scanned_layers(config, params)
    h, (k_new, v_new, entropy, sink_mass, ffn_x) = jax.lax.scan(
        scan_layer, h, (layers, cache_keys, cache_values)
    )
    out = [h[0], (k_new, v_new), entropy]
    if capture_ffn_input:
        out.append(ffn_x)
    if capture_sink_mass:
        out.append(sink_mass)
    return tuple(out)


@partial(jax.jit, static_argnames=("config",))
def llama_decode_rollout(
    config: LlamaConfig,
    params: dict,
    token_ids: jax.Array,
    start_position: jax.Array,
    cache_keys: jax.Array,
    cache_values: jax.Array,
    forced_keys: jax.Array | None = None,
    forced_values: jax.Array | None = None,
):
    """T autoregressive decode steps in ONE jitted scan — the serving loop.

    Token t decodes at position ``start_position + t`` and APPENDS its
    per-layer K/V into the cache at that position, so later tokens attend
    earlier generated ones: multi-token decode in one dispatch instead of
    T (the per-step alternative pays the dispatch/tunnel round trip T
    times). ``cache_keys``/``cache_values`` are (num_layers, num_kv_heads,
    S_buf, head_dim) PRE-ALLOCATED buffers: rows [0, start_position) hold
    the filled prefix (true cache or any reconstruction — the same swap
    surface as `llama_decode_step`), rows at and past a step's position
    are invisible to it (`_layer_decode`'s mask), and S_buf must be >=
    start_position + T so every append has a slot.

    ``forced_keys``/``forced_values`` (T, num_layers, num_kv_heads, 1,
    head_dim), if given, are written instead of each step's own K/V —
    the rollout-drift study's contamination-control arm
    (`tools/rollout_drift_study.py`; measured: self-appends are
    indistinguishable from exact ones, `FINDINGS_TPU.md` "Rollout
    drift").

    Returns (h (T, hidden) final hidden states, (keys, values) the
    filled buffers, (k_new, v_new) (T, num_layers, num_kv_heads, 1,
    head_dim) each step's own computed rows, entropy (T, num_layers,
    num_attention_heads)).
    """
    t_steps = token_ids.shape[0]
    positions = jnp.asarray(start_position, jnp.int32) + jnp.arange(
        t_steps, dtype=jnp.int32
    )

    def step(carry, xs):
        kb, vb = carry
        if forced_keys is None:
            tok, pos = xs
            ak = av = None
        else:
            tok, pos, ak, av = xs
        h, (kn, vn), ent = llama_decode_step(config, params, tok, pos, kb, vb)
        if ak is None:
            ak, av = kn, vn
        kb = jax.lax.dynamic_update_slice(kb, ak, (0, 0, pos, 0))
        vb = jax.lax.dynamic_update_slice(vb, av, (0, 0, pos, 0))
        return (kb, vb), (h, kn, vn, ent)

    xs = (
        (token_ids, positions)
        if forced_keys is None
        else (token_ids, positions, forced_keys, forced_values)
    )
    (k_buf, v_buf), (hs, k_new, v_new, ents) = jax.lax.scan(
        step, (cache_keys, cache_values), xs
    )
    return hs, (k_buf, v_buf), (k_new, v_new), ents


# ---------------------------------------------------------------------------
# Weight loading (safetensors / torch .bin) and random init
# ---------------------------------------------------------------------------

_LAYER_MAP = {
    "q": "self_attn.q_proj",
    "k": "self_attn.k_proj",
    "v": "self_attn.v_proj",
    "o": "self_attn.o_proj",
    "gate": "mlp.gate_proj",
    "up": "mlp.up_proj",
    "down": "mlp.down_proj",
}


def _open_hf_weights(model_dir: Path):
    """Return get(name) -> np.ndarray over all checkpoint shards."""
    model_dir = Path(model_dir)
    st_files = sorted(model_dir.glob("*.safetensors"))
    if st_files:
        from safetensors import safe_open

        handles = [safe_open(str(f), framework="np") for f in st_files]
        index = {}
        for h in handles:
            for name in h.keys():
                index[name] = h

        def get(name: str) -> np.ndarray:
            return index[name].get_tensor(name)

        return get, set(index)

    bin_files = sorted(model_dir.glob("pytorch_model*.bin"))
    if bin_files:
        import torch

        state: dict = {}
        for f in bin_files:
            state.update(torch.load(f, map_location="cpu", weights_only=True))

        def get(name: str) -> np.ndarray:
            t = state[name]
            return t.float().numpy() if t.dtype == torch.bfloat16 else t.numpy()

        return get, set(state)

    raise FileNotFoundError(f"no safetensors/bin weights under {model_dir}")


def load_llama_params(
    model_dir: Path, dtype=jnp.bfloat16
) -> tuple[LlamaConfig, dict]:
    """Load a HF Llama checkpoint directory into (config, params pytree).

    Layer weights are stacked along a leading layer axis for lax.scan; HF's
    (out, in) projection layout is transposed to (in, out) matmul layout.
    Leaves stay HOST-side numpy: an 8B bf16 pytree must not be committed to
    one device before shard_llama_params can place it — the mesh path exists
    precisely for models bigger than a single chip's HBM. jit (or an
    explicit device_put) transfers replicated leaves on first use.
    """
    model_dir = Path(model_dir)
    with open(model_dir / "config.json") as f:
        config = LlamaConfig.from_hf_dict(json.load(f))
    get, names = _open_hf_weights(model_dir)

    np_dtype = jnp.dtype(dtype)  # numpy dtype object (ml_dtypes for bf16)

    def arr(name: str, transpose: bool = False) -> np.ndarray:
        x = np.asarray(get(name))
        if x.dtype == np.dtype("V2"):  # raw bf16 from safetensors numpy
            import ml_dtypes

            x = x.view(ml_dtypes.bfloat16)
        if transpose:
            x = x.T
        return np.ascontiguousarray(x.astype(np_dtype))

    bias_keys = ("q_bias", "k_bias", "v_bias", "o_bias")
    moe = bool(config.num_local_experts)
    layer_map = {
        k: v
        for k, v in _LAYER_MAP.items()
        if not (moe and k in ("gate", "up", "down"))
    }
    layers: dict[str, list] = {
        k: []
        for k in (
            *layer_map,
            *bias_keys,
            # norm_after_only (OLMo-2) has no input norm at all — omit the
            # leaf (the forward's if/else never reads it), same lazy
            # pattern as pre_ffn_norm. parallel_residual (Cohere) has no
            # post-attention norm — its block has exactly one norm.
            *(() if config.norm_after_only else ("input_norm",)),
            *(() if config.parallel_residual else ("post_norm",)),
        )
    }
    if moe:
        moe_keys = (
            (
                "router", "router_bias", "gate_up", "gate_up_bias",
                "moe_down", "moe_down_bias",
            )
            if config.moe_style == "gpt_oss"
            else (
                "router", "w1", "w2", "w3",
                "sh_gate", "sh_w1", "sh_w2", "sh_w3",
            )
            if config.shared_expert_intermediate_size
            else ("router", "w1", "w2", "w3")
        )
        for k in moe_keys:
            layers[k] = []
    if config.attn_sinks:
        layers["sinks"] = []
    bias_dims = {
        "q_bias": config.num_attention_heads * config.head_dim,
        "k_bias": config.num_key_value_heads * config.head_dim,
        "v_bias": config.num_key_value_heads * config.head_dim,
        "o_bias": config.hidden_size,
    }
    n_q_cols = config.num_attention_heads * config.head_dim
    n_kv_cols = config.num_key_value_heads * config.head_dim
    for i in range(config.num_hidden_layers):
        prefix = f"model.layers.{i}"
        fused_qkv = f"{prefix}.self_attn.qkv_proj.weight"
        fused_gate_up = f"{prefix}.mlp.gate_up_proj.weight"
        split_cols: dict[str, np.ndarray] = {}
        if fused_qkv in names:
            # Phi-3 fused attention projection: qkv_proj columns are q|k|v
            # (HF Phi3Attention).
            qkv = arr(fused_qkv, transpose=True)
            split_cols["q"] = qkv[:, :n_q_cols]
            split_cols["k"] = qkv[:, n_q_cols : n_q_cols + n_kv_cols]
            split_cols["v"] = qkv[:, n_q_cols + n_kv_cols :]
        if fused_gate_up in names and not moe:
            # Fused MLP projection, columns gate|up — Phi-3 AND the GLM
            # family (GlmMLP/Glm4MLP chunk(2): first half gates).
            gate_up = arr(fused_gate_up, transpose=True)
            split_cols["gate"] = gate_up[:, : config.intermediate_size]
            split_cols["up"] = gate_up[:, config.intermediate_size :]
        for short, hf in layer_map.items():
            if short in split_cols:
                layers[short].append(np.ascontiguousarray(split_cols[short]))
            else:
                layers[short].append(arr(f"{prefix}.{hf}.weight", transpose=True))
        if moe and config.moe_style == "gpt_oss":
            # GPT-OSS MoE block: router is a biased (E, hidden) linear ->
            # our (hidden, E); experts ship PRE-STACKED with matmul-ready
            # layouts — gate_up_proj (E, hidden, 2*inter) interleaved,
            # down_proj (E, inter, hidden) — no transposes needed.
            layers["router"].append(
                arr(f"{prefix}.mlp.router.weight", transpose=True)
            )
            layers["router_bias"].append(arr(f"{prefix}.mlp.router.bias"))
            layers["gate_up"].append(arr(f"{prefix}.mlp.experts.gate_up_proj"))
            layers["gate_up_bias"].append(
                arr(f"{prefix}.mlp.experts.gate_up_proj_bias")
            )
            layers["moe_down"].append(arr(f"{prefix}.mlp.experts.down_proj"))
            layers["moe_down_bias"].append(
                arr(f"{prefix}.mlp.experts.down_proj_bias")
            )
        elif moe:
            # Mixtral sparse-MoE block: gate (router) is (E, hidden) -> our
            # (hidden, E); each expert's w1/w3 are (ffn, hidden) -> (hidden,
            # ffn) and w2 is (hidden, ffn) -> (ffn, hidden), stacked (E, ...).
            # Qwen3-MoE ships the same tensors under SwiGLU names
            # (mlp.gate / mlp.experts.{j}.{gate,down,up}_proj); the forward
            # is shared, so the loader just maps names.
            if config.moe_style in ("qwen3_moe", "qwen2_moe"):
                block, names_map = "mlp", {
                    "w1": "gate_proj", "w2": "down_proj", "w3": "up_proj",
                }
            else:
                block, names_map = "block_sparse_moe", {
                    "w1": "w1", "w2": "w2", "w3": "w3",
                }
            layers["router"].append(
                arr(f"{prefix}.{block}.gate.weight", transpose=True)
            )
            for wn in ("w1", "w2", "w3"):
                layers[wn].append(
                    np.stack(
                        [
                            arr(
                                f"{prefix}.{block}.experts.{j}."
                                f"{names_map[wn]}.weight",
                                transpose=True,
                            )
                            for j in range(config.num_local_experts)
                        ]
                    )
                )
            if config.shared_expert_intermediate_size:
                # Qwen2-MoE shared expert + its scalar sigmoid gate
                # (hidden -> 1 linear, transposed like every projection).
                for ours, hf in (
                    ("sh_w1", "shared_expert.gate_proj"),
                    ("sh_w3", "shared_expert.up_proj"),
                    ("sh_w2", "shared_expert.down_proj"),
                ):
                    layers[ours].append(
                        arr(f"{prefix}.mlp.{hf}.weight", transpose=True)
                    )
                layers["sh_gate"].append(
                    arr(f"{prefix}.mlp.shared_expert_gate.weight",
                        transpose=True)
                )
        if config.attn_sinks:
            layers["sinks"].append(arr(f"{prefix}.self_attn.sinks"))
        for bk in bias_keys:
            # Qwen2-family attention projections carry biases; Llama/Mistral
            # checkpoints don't ship the tensor — use zeros.
            name = f"{prefix}.{_LAYER_MAP[bk[0]]}.bias"
            layers[bk].append(
                arr(name)
                if name in names
                else np.zeros(bias_dims[bk], dtype=np_dtype)
            )
        if not config.norm_after_only:
            layers["input_norm"].append(
                arr(f"{prefix}.input_layernorm.weight")
            )
        # GLM-4 serializes gemma2's sandwich under different names:
        # post_self_attn_layernorm is the attention-output norm (our
        # post_norm role), post_attention_layernorm the pre-FFN norm, and
        # post_mlp_layernorm the FFN-output norm — presence-keyed so
        # gemma2 checkpoints (pre/post_feedforward_layernorm) read theirs.
        glm4_post = f"{prefix}.post_self_attn_layernorm.weight"
        if not config.parallel_residual:
            layers["post_norm"].append(
                arr(glm4_post)
                if glm4_post in names
                else arr(f"{prefix}.post_attention_layernorm.weight")
            )
        if config.qk_norm or config.qk_norm_full:
            layers.setdefault("q_norm", []).append(
                arr(f"{prefix}.self_attn.q_norm.weight")
            )
            layers.setdefault("k_norm", []).append(
                arr(f"{prefix}.self_attn.k_norm.weight")
            )
        if config.sandwich_norms:
            layers.setdefault("pre_ffn_norm", []).append(
                arr(f"{prefix}.post_attention_layernorm.weight")
                if glm4_post in names
                else arr(f"{prefix}.pre_feedforward_layernorm.weight")
            )
        if config.sandwich_norms or config.norm_after_only:
            layers.setdefault("post_ffn_norm", []).append(
                arr(f"{prefix}.post_mlp_layernorm.weight")
                if glm4_post in names
                else arr(f"{prefix}.post_feedforward_layernorm.weight")
            )

    params = {
        "embed": arr("model.embed_tokens.weight"),
        "layers": {k: np.stack(v) for k, v in layers.items()},
    }
    return config, params


def init_random_llama(
    config: LlamaConfig, seed: int = 0, dtype=jnp.float32
) -> dict:
    """Random small-scale init (tests / dry runs without weights)."""
    rng = np.random.RandomState(seed)
    h, i_sz, d = config.hidden_size, config.intermediate_size, config.head_dim
    n_q, n_kv, n_l = (
        config.num_attention_heads,
        config.num_key_value_heads,
        config.num_hidden_layers,
    )

    def w(*shape):
        scale = 0.02
        return jnp.asarray(rng.randn(*shape) * scale, dtype=dtype)

    layers = {
        "q": w(n_l, h, n_q * d),
        "k": w(n_l, h, n_kv * d),
        "v": w(n_l, h, n_kv * d),
        "q_bias": jnp.zeros((n_l, n_q * d), dtype=dtype),
        "k_bias": jnp.zeros((n_l, n_kv * d), dtype=dtype),
        "v_bias": jnp.zeros((n_l, n_kv * d), dtype=dtype),
        "o": w(n_l, n_q * d, h),
        "o_bias": jnp.zeros((n_l, h), dtype=dtype),
        "gate": w(n_l, h, i_sz),
        "up": w(n_l, h, i_sz),
        "down": w(n_l, i_sz, h),
        "input_norm": jnp.ones((n_l, h), dtype=dtype),
        "post_norm": jnp.ones((n_l, h), dtype=dtype),
    }
    if config.num_local_experts:
        e = config.num_local_experts
        layers["router"] = w(n_l, h, e)
        if config.moe_style == "gpt_oss":
            layers["router_bias"] = w(n_l, e)
            layers["gate_up"] = w(n_l, e, h, 2 * i_sz)
            layers["gate_up_bias"] = w(n_l, e, 2 * i_sz)
            layers["moe_down"] = w(n_l, e, i_sz, h)
            layers["moe_down_bias"] = w(n_l, e, h)
        else:
            layers["w1"] = w(n_l, e, h, i_sz)
            layers["w3"] = w(n_l, e, h, i_sz)
            layers["w2"] = w(n_l, e, i_sz, h)
            if config.shared_expert_intermediate_size:
                shi = config.shared_expert_intermediate_size
                layers["sh_w1"] = w(n_l, h, shi)
                layers["sh_w3"] = w(n_l, h, shi)
                layers["sh_w2"] = w(n_l, shi, h)
                layers["sh_gate"] = w(n_l, h, 1)
        for k in ("gate", "up", "down"):
            del layers[k]
    if config.attn_sinks:
        layers["sinks"] = w(n_l, n_q)
        # gpt_oss attention projections all carry biases — random so tests
        # exercise the bias paths.
        for bk, dim in (
            ("q_bias", n_q * d), ("k_bias", n_kv * d),
            ("v_bias", n_kv * d), ("o_bias", h),
        ):
            layers[bk] = w(n_l, dim)
    if config.qk_norm:
        if config.layernorm:
            # Cohere's QK-norm weights are PER-HEAD (heads, head_dim) —
            # random-ish so a transposed/misbroadcast mapping can't hide.
            layers["q_norm"] = jnp.asarray(
                1.0 + rng.randn(n_l, n_q, d) * 0.05, dtype=dtype
            )
            layers["k_norm"] = jnp.asarray(
                1.0 + rng.randn(n_l, n_kv, d) * 0.05, dtype=dtype
            )
        else:
            layers["q_norm"] = jnp.ones((n_l, d), dtype=dtype)
            layers["k_norm"] = jnp.ones((n_l, d), dtype=dtype)
    if config.qk_norm_full:
        layers["q_norm"] = jnp.ones((n_l, n_q * d), dtype=dtype)
        layers["k_norm"] = jnp.ones((n_l, n_kv * d), dtype=dtype)
    if config.norm_after_only:
        del layers["input_norm"]  # no input norm exists; forward skips it
    if config.parallel_residual:
        del layers["post_norm"]  # Cohere blocks have ONE norm; forward skips
    if config.sandwich_norms:
        layers["pre_ffn_norm"] = jnp.ones((n_l, h), dtype=dtype)
    if config.sandwich_norms or config.norm_after_only:
        layers["post_ffn_norm"] = jnp.ones((n_l, h), dtype=dtype)
    return {"embed": w(config.vocab_size, h), "layers": layers}


def shard_llama_params(
    params: dict, mesh, axis: str | None = "tp", expert_axis: str | None = None
) -> dict:
    """Tensor-/expert-shard the weight pytree over a mesh.

    ``axis`` (TP): q/k/v and gate/up shard their output dim; o and down
    shard their input dim — the Megatron layout, so XLA inserts exactly one
    all-reduce per block. ``axis=None`` replicates the attention/dense
    weights (pure expert-parallel serving). Norms and embeddings replicate.

    MoE leaves (Mixtral): with ``expert_axis`` the EXPERT dim of w1/w2/w3
    shards over that mesh axis (EP — each device holds E/ep experts, the
    router replicates, and `_ffn`'s combine einsum contracts the expert
    axis in one all-reduce); otherwise the expert FFNs shard their
    intermediate dim over ``axis``, the same Megatron split as the dense
    MLP. A 2-D mesh composes both: ``Mesh(devs.reshape(ep, tp), ("ep",
    "tp"))`` with ``axis="tp", expert_axis="ep"`` runs attention
    tensor-parallel and the FFN expert-parallel in one program.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    lp = params["layers"]
    specs = {
        "q": P(None, None, axis),
        "k": P(None, None, axis),
        "v": P(None, None, axis),
        # Biases follow their projection's output dim (Megatron column split).
        "q_bias": P(None, axis),
        "k_bias": P(None, axis),
        "v_bias": P(None, axis),
        "o": P(None, axis, None),
        # The o bias adds AFTER the row-parallel matmul's all-reduce —
        # replicate it (splitting it would add it once per shard).
        "o_bias": P(None, None),
        # Per-head sink logits follow the head split (HF tp_plan:
        # local_rowwise).
        "sinks": P(None, axis),
        "input_norm": P(None, None),
        "post_norm": P(None, None),
    }
    if expert_axis is not None and "router" not in lp:
        raise ValueError(
            "expert_axis given but the checkpoint has no MoE leaves "
            "(dense MLP — use axis='tp' tensor parallelism instead)"
        )
    if "gate" in lp:
        specs["gate"] = P(None, None, axis)
        specs["up"] = P(None, None, axis)
        specs["down"] = P(None, axis, None)
    if "router" in lp:
        # The router's (hidden, E) output feeds a full-expert softmax on
        # every device — replicate it (it is tiny) rather than gather logits.
        specs["router"] = P(None, None, None)
        if "gate_up" in lp:
            # GPT-OSS experts: shard the EXPERT axis when asked (each
            # device computes E/ep experts; the combine contracts the
            # expert axis in one all-reduce). Under plain TP the expert
            # tensors replicate: the interleaved gate/up columns cannot be
            # Megatron-split without separating (gate, up) pairs.
            specs["router_bias"] = P(None, None)
            e_ax = expert_axis  # None -> replicate
            specs["gate_up"] = P(None, e_ax, None, None)
            specs["gate_up_bias"] = P(None, e_ax, None)
            specs["moe_down"] = P(None, e_ax, None, None)
            specs["moe_down_bias"] = P(None, e_ax, None)
        elif expert_axis is not None:
            specs["w1"] = P(None, expert_axis, None, None)
            specs["w3"] = P(None, expert_axis, None, None)
            specs["w2"] = P(None, expert_axis, None, None)
        else:
            specs["w1"] = P(None, None, None, axis)
            specs["w3"] = P(None, None, None, axis)
            specs["w2"] = P(None, None, axis, None)
        if "sh_gate" in lp:
            # Qwen2-MoE shared expert: Megatron-split like a dense MLP
            # (it runs on every token on every device); its scalar gate
            # is a (hidden, 1) column — replicate.
            specs["sh_w1"] = P(None, None, axis)
            specs["sh_w3"] = P(None, None, axis)
            specs["sh_w2"] = P(None, axis, None)
            specs["sh_gate"] = P(None, None, None)
    # Qwen3 per-head Q/K norms are a single head_dim vector shared by every
    # head (head sharding doesn't split head_dim), and Gemma2's extra
    # hidden-size norms are norms — all replicate. OLMo-2's FLAT q/k norms
    # also land here replicated even though their feature dim is
    # head-split: the flat RMSNorm's mean-of-squares spans every shard, so
    # GSPMD inserts the cross-shard reduction (TP parity asserted by
    # test_olmo2_tp_prefill_parity); a shard_map rewrite must keep that
    # collective.
    # Cohere's per-head QK-norm weights (L, heads, head_dim) are the one
    # exception: each head normalizes within its own head_dim with its own
    # weight row, so the weight splits cleanly along the same head axis as
    # its projection — no cross-shard reduction exists to preserve.
    # A NamedSharding requires the head count to divide the mesh axis size;
    # when it doesn't (tp > n_kv_heads, or non-divisor), fall back to
    # replication — the norm is tiny and GSPMD still computes it correctly
    # against the head-sharded activations.
    ax_size = int(mesh.shape[axis]) if axis is not None else 1
    for extra in ("q_norm", "k_norm", "pre_ffn_norm", "post_ffn_norm"):
        if extra in lp:
            if getattr(lp[extra], "ndim", 2) == 3:
                heads = int(lp[extra].shape[1])
                specs[extra] = (
                    P(None, axis, None) if heads % ax_size == 0 else P(None, None, None)
                )
            else:
                specs[extra] = P(None, None)
    sharded = {k: put(v, specs[k]) for k, v in lp.items()}
    return {"embed": put(params["embed"], P(None, None)), "layers": sharded}


def prefill_and_save_kv(
    config: LlamaConfig,
    params: dict,
    input_ids: np.ndarray,
    output_dir: Path,
    model_name: str,
    seq_mesh=None,
    pipe_mesh=None,
) -> KVMetadata:
    """Run one prefill and persist per-layer KV in the standard layout.

    ``seq_mesh``: run the prefill sequence-parallel over this mesh
    (``llama_prefill_kv_sp``); ``pipe_mesh``: pipeline-parallel instead
    (``llama_prefill_kv_pp``). Tokenized text has arbitrary length, so ids
    are END-padded up to a mesh multiple (2n for PP's default chunking) and
    the cache sliced back — exact, because under a causal mask trailing pad
    rows cannot influence any earlier row's K/V.
    """
    if seq_mesh is not None and pipe_mesh is not None:
        raise ValueError("seq_mesh (SP) and pipe_mesh (PP) are mutually exclusive")
    actual = int(len(input_ids))
    ids = jnp.asarray(input_ids, dtype=jnp.int32)
    mesh = seq_mesh if seq_mesh is not None else pipe_mesh
    if mesh is not None:
        n = int(np.prod(mesh.devices.shape)) * (2 if pipe_mesh is not None else 1)
        padded = ((actual + n - 1) // n) * n
        prefill = llama_prefill_kv_sp if seq_mesh is not None else llama_prefill_kv_pp
        keys, values = prefill(
            config, params, jnp.pad(ids, (0, padded - actual)), mesh
        )
        keys, values = keys[:, :, :actual], values[:, :, :actual]
    else:
        keys, values = llama_prefill_kv(config, params, ids)
    keys = np.asarray(keys, dtype=np.float32)
    values = np.asarray(values, dtype=np.float32)

    output_dir = Path(output_dir)
    for layer_idx in range(config.num_hidden_layers):
        kvstore.save_layer(output_dir, layer_idx, keys[layer_idx], values[layer_idx])

    actual_tokens = int(len(input_ids))
    metadata = KVMetadata(
        model_name=str(model_name),
        num_layers=config.num_hidden_layers,
        num_kv_heads=config.num_key_value_heads,
        seq_len=actual_tokens,
        head_dim=config.head_dim,
        actual_tokens=actual_tokens,
    )
    kvstore.save_metadata(output_dir, metadata)
    return metadata


def extract_kv_with_jax_llama(
    model_dir: str,
    seq_len: int,
    output_dir: Path,
    text: str,
    mesh=None,
    dtype=jnp.bfloat16,
    state: dict | None = None,
    seq_mesh=None,
    pipe_mesh=None,
    expert_mesh=None,
) -> KVMetadata:
    """Native extraction: tokenize, prefill on the TPU, persist per-layer KV.

    ``state``: pass the same dict across calls to load the checkpoint and
    tokenizer once (the scaling/multi-prompt ladders extract at several
    lengths/prompts from one model — same contract as extract_with_hf).

    ``mesh`` shards the WEIGHTS (Megatron TP, ``shard_llama_params``);
    ``seq_mesh`` shards the TOKEN axis instead (``llama_prefill_kv_sp`` —
    the long-context answer to the reference's single-device OOM at 8192,
    `/root/reference/nerf_attention/experiments/scaling.py:111-116`);
    ``pipe_mesh`` shards the LAYER axis (``llama_prefill_kv_pp`` — for
    models whose weights+cache overflow one chip); ``expert_mesh`` shards
    a sparse-MoE checkpoint's EXPERT axis (Mixtral — attention replicates,
    each device computes its E/ep experts). Mutually exclusive for now:
    each mode replicates what it doesn't shard.
    """
    if sum(m is not None for m in (mesh, seq_mesh, pipe_mesh, expert_mesh)) > 1:
        raise ValueError(
            "mesh (TP), seq_mesh (SP), pipe_mesh (PP), expert_mesh (EP) "
            "are mutually exclusive"
        )
    from transformers import AutoTokenizer

    state = state if state is not None else {}
    # Cache key holds the mesh OBJECT (compared with `is`), not id(mesh): a
    # dead mesh's address can be reused by a new mesh, which would silently
    # serve params sharded for the old one.
    weight_mesh = mesh if mesh is not None else expert_mesh
    if state.get("model_dir") != (str(model_dir), str(dtype)) or (
        state.get("mesh") is not weight_mesh
    ):
        print(f"Loading {model_dir} into JAX...")
        config, params = load_llama_params(Path(model_dir), dtype=dtype)
        if mesh is not None:
            params = shard_llama_params(params, mesh)
        elif expert_mesh is not None:
            params = shard_llama_params(
                params, expert_mesh, axis=None, expert_axis="ep"
            )
        state.update(
            model_dir=(str(model_dir), str(dtype)),
            mesh=weight_mesh,
            config=config,
            params=params,
            tokenizer=AutoTokenizer.from_pretrained(model_dir),
        )
    config, params = state["config"], state["params"]
    tokenizer = state["tokenizer"]
    ids = np.asarray(
        tokenizer(text, truncation=True, max_length=seq_len)["input_ids"]
    )
    print(f"Sequence length: {len(ids)} tokens")

    print("Running prefill...")
    metadata = prefill_and_save_kv(
        config, params, ids, output_dir, model_dir,
        seq_mesh=seq_mesh, pipe_mesh=pipe_mesh,
    )
    print(f"Saved {config.num_hidden_layers} layers to {output_dir}/")
    return metadata
