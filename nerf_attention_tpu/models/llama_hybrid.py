"""Hybrid llama decode step: planned units attend straight from parameters.

Round-5 completion of the serving-engine composition: `serve-plan` names
the (layer, kv-head) units to serve from SIREN parameters, and until this
module the only executable form was reconstruct-into-buffer — the served
unit's K/V still occupied (S, d) fp32 rows of device HBM during the step
(`tools/plan_rollout_study.py`). Here the served units are attended by
the stats-returning attention-from-parameters kernel
(`ops/siren_quant_pallas.siren_attention_decode_quant(return_stats=True)`)
and merged EXACTLY with the step's own self column via the online
softmax's (m, l) sufficient statistics, so:

  * the step's operands contain ZERO cache bytes for served units — only
    the bit-packed parameter payload (int4/int6/int8/fp32 tiers);
  * unserved units keep the standard masked cache attention of
    `llama_jax._layer_decode`, bit-for-bit the same math;
  * the result equals `llama_decode_step` over a reconstruction-swapped
    buffer up to fp reassociation (parity-tested), because both compute
    softmax over [reconstructed rows, self] — they differ only in WHERE
    K-hat/V-hat materialize (VMEM tiles vs an HBM buffer).

`make_hybrid_rollout` extends the step to the multi-token serving loop:
one `lax.scan` over T teacher-forced tokens where served units carry
only a (T, d) tail buffer of post-fit rows (exact three-segment merge:
params kernel / tail / self) and unserved units a pre-allocated (S+T)
buffer — the between-refits serving architecture, parity-tested against
`llama_decode_rollout` over a reconstruction-swapped buffer.

Scope: the vanilla dense llama attention family (no sinks / windows /
softcap / qk-norm / MoE / parallel residual — those families' serving
behavior is studied through the buffer-swap surface). The layer loop is
unrolled python (compiled once per served-pattern), sized for serving
models, not pretraining graphs.

Reference equivalent: none — the reference has no serving loop; its
decode story is the per-layer latency profile
(`/root/reference/nerf_attention/evaluate.py:173-242`).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nerf_attention_tpu.models.llama_jax import (
    LlamaConfig,
    _apply_rope,
    _duplicate_angles,
    _ffn,
    _mlp_act,
    _norm,
    _rope_frequencies,
)
from nerf_attention_tpu.ops.siren_quant_pallas import (
    pack_resident_params,
    resident_param_bytes,
    siren_attention_decode_quant,
)


def _require_vanilla(config: LlamaConfig) -> None:
    bad = []
    if config.attn_sinks:
        bad.append("attn_sinks")
    if config.sliding_window is not None or config.layer_windows is not None:
        bad.append("sliding windows")
    if config.attn_logit_softcap is not None:
        bad.append("attn_logit_softcap")
    if config.qk_norm or config.qk_norm_full:
        bad.append("qk_norm")
    if config.num_local_experts is not None:
        bad.append("MoE")
    if config.parallel_residual or config.sandwich_norms or config.norm_after_only:
        bad.append("non-standard residual wiring")
    if config.rope_skip_full_layers or config.rotary_dim is not None:
        bad.append("partial/NoPE rope")
    if config.attn_scale is not None or config.residual_multiplier != 1.0:
        bad.append("attention/residual scaling")
    if bad:
        raise ValueError(
            f"hybrid decode step supports the vanilla dense llama attention "
            f"family; config has: {', '.join(bad)} — serve those families "
            f"through the buffer-swap surface (llama_decode_step)"
        )


def _select_rows(units, rows):
    return [(np.asarray(w)[rows], np.asarray(b)[rows]) for w, b in units]


def _build_layer_assets(
    served, k_units, v_units, km, ks, vm, vs, scheme, n_kv, d
):
    """Per-layer served/unserved split + packed payloads (load-time work).

    Returns (layer_assets, resident_bytes): each asset dict has the
    served/unserved index arrays and, for served rows, the bit-packed
    parameter payloads plus their denormalization stats.
    """
    km = np.asarray(km, np.float32).reshape(-1, 1, d)
    ks = np.asarray(ks, np.float32).reshape(-1, 1, d)
    vm = np.asarray(vm, np.float32).reshape(-1, 1, d)
    vs = np.asarray(vs, np.float32).reshape(-1, 1, d)
    layer_assets = []
    resident = 0
    for l in range(served.shape[0]):
        srv = np.where(served[l])[0]
        uns = np.where(~served[l])[0]
        rows = l * n_kv + srv
        assets = {"srv": srv, "uns": uns}
        if srv.size:
            assets["k_packed"] = pack_resident_params(
                _select_rows(k_units, rows), scheme
            )
            assets["v_packed"] = pack_resident_params(
                _select_rows(v_units, rows), scheme
            )
            resident += resident_param_bytes(assets["k_packed"][0])
            resident += resident_param_bytes(assets["v_packed"][0])
            assets["km"] = jnp.asarray(km[rows])
            assets["ks"] = jnp.asarray(ks[rows])
            assets["vm"] = jnp.asarray(vm[rows])
            assets["vs"] = jnp.asarray(vs[rows])
        layer_assets.append(assets)
    return layer_assets, resident


def make_hybrid_decode_step(
    config: LlamaConfig,
    params: dict,
    served,
    k_units,
    v_units,
    k_mean,
    k_std,
    v_mean,
    v_std,
    omega: float,
    *,
    scheme: str = "fp32",
    fm_mult: float | None = None,
    sin_impl: str = "fast",
    interpret: bool | None = None,
    tile: int = 512,
):
    """Build the jitted hybrid step for a fixed served-unit pattern.

    ``served``: (num_layers, num_kv_heads) bool — the serve-plan's cut.
    ``k_units`` / ``v_units``: [(W, b), ...] SIREN parameter lists with a
    leading unit axis in ``u = layer * n_kv + kv_head`` order (the fit-row
    order of `experiments/head_policy.py`); ``*_mean`` / ``*_std``
    (n_units, 1, d) are the fits' denormalization stats. The served
    units' payloads are packed once here under ``scheme`` and become the
    step's only per-unit operands.

    Returns ``(step, info)``: ``step(token_id, cache_k_uns, cache_v_uns)
    -> h`` where the caches are per-layer tuples holding ONLY the
    unserved heads' (n_unserved_l, S, d) rows, and the token decodes at
    position S over the full window (the serving step; every cache row
    visible plus the token's own k/v). ``info`` has the operand byte
    accounting: ``cache_bytes`` (what the step actually carries),
    ``cache_bytes_full`` (what a buffer-swap step carries),
    ``resident_param_bytes`` (the packed payloads).
    """
    _require_vanilla(config)
    served = np.asarray(served, bool)
    n_l, n_kv = served.shape
    n_q, d = config.num_attention_heads, config.head_dim
    group = n_q // n_kv
    if n_l != config.num_hidden_layers or n_kv != config.num_key_value_heads:
        raise ValueError(
            f"served mask {served.shape} does not match the config "
            f"({config.num_hidden_layers}, {config.num_key_value_heads})"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    layer_assets, resident = _build_layer_assets(
        served, k_units, v_units, k_mean, k_std, v_mean, v_std, scheme,
        n_kv, d,
    )

    act = _mlp_act(config.hidden_act)
    scale = 1.0 / math.sqrt(d)

    def step(token_id, cache_k_uns, cache_v_uns):
        s = None
        for ck in cache_k_uns:
            if ck.shape[0]:
                s = ck.shape[1]
        if s is None:
            raise ValueError("every unit served: pass seq_len via any cache")
        h = params["embed"][token_id][None, :]
        if config.scale_embeddings:
            h = h * jnp.asarray(config.hidden_size**0.5, dtype=h.dtype)
        position = jnp.int32(s)
        inv_freq = jnp.asarray(_rope_frequencies(config))
        angles = position.astype(jnp.float32) * inv_freq
        angles = _duplicate_angles(config, angles)[None, :]
        sc = jnp.float32(config.attention_scaling)
        cos = (jnp.cos(angles) * sc).astype(h.dtype)
        sin = (jnp.sin(angles) * sc).astype(h.dtype)

        lp_all = params["layers"]
        for l in range(n_l):
            lp = {key: leaf[l] for key, leaf in lp_all.items()}
            a = layer_assets[l]
            x = _norm(config, h, lp["input_norm"])
            q = (x @ lp["q"] + lp["q_bias"]).reshape(1, n_q, d).transpose(1, 0, 2)
            k = (x @ lp["k"] + lp["k_bias"]).reshape(1, n_kv, d).transpose(1, 0, 2)
            v = (x @ lp["v"] + lp["v_bias"]).reshape(1, n_kv, d).transpose(1, 0, 2)
            q = _apply_rope(q, cos, sin)
            k = _apply_rope(k, cos, sin)
            qg = q.reshape(n_kv, group, d)  # query groups per kv head
            k_self = k[:, 0, :]  # (n_kv, d)
            v_self = v[:, 0, :]
            s_self = (
                jnp.einsum("ngd,nd->ng", qg, k_self, preferred_element_type=jnp.float32)
                * scale
            )  # (n_kv, group)

            attn = jnp.zeros((n_kv, group, d), jnp.float32)
            if a["uns"].size:
                uns = tuple(int(i) for i in a["uns"])
                ck, cv = cache_k_uns[l], cache_v_uns[l]
                logits = (
                    jnp.einsum(
                        "ugd,ukd->ugk", qg[uns, :, :], ck,
                        preferred_element_type=jnp.float32,
                    )
                    * scale
                )  # (n_uns, group, S)
                full = jnp.concatenate(
                    [logits, s_self[uns, :][:, :, None]], axis=-1
                )
                p = jax.nn.softmax(full, axis=-1)
                o_uns = jnp.einsum(
                    "ugk,ukd->ugd", p[..., :-1], cv,
                    preferred_element_type=jnp.float32,
                ) + p[..., -1:][..., 0][..., None] * v_self[uns, :][:, None, :]
                attn = attn.at[uns, :, :].set(o_uns)
            if a["srv"].size:
                srv = tuple(int(i) for i in a["srv"])
                o, m, lden = siren_attention_decode_quant(
                    None, None, a["km"], a["ks"], a["vm"], a["vs"],
                    qg[srv, :, :], scheme, omega, s, tile=tile,
                    interpret=interpret, sin_impl=sin_impl, fm_mult=fm_mult,
                    causal=False, packed=(a["k_packed"], a["v_packed"]),
                    return_stats=True,
                )  # o (n_srv, group, d), m/l (n_srv, group)
                s_slf = s_self[srv, :]
                big = jnp.maximum(m, s_slf)
                w_cache = lden * jnp.exp(m - big)
                w_self = jnp.exp(s_slf - big)
                merged = (
                    w_cache[..., None] * o
                    + w_self[..., None] * v_self[srv, :][:, None, :]
                ) / (w_cache + w_self)[..., None]
                attn = attn.at[srv, :, :].set(merged)

            attn_flat = attn.reshape(1, n_q * d).astype(h.dtype)
            h = h + attn_flat @ lp["o"] + lp["o_bias"]
            x2 = _norm(config, h, lp["post_norm"])
            h = h + _ffn(config, x2, lp, act)
        return h[0]

    n_served = int(served.sum())
    info = {
        "n_served": n_served,
        "n_units": n_l * n_kv,
        "resident_param_bytes": int(resident),
        "cache_bytes_per_unit_per_token": 2 * d * 4,
        "scheme": scheme,
    }
    return jax.jit(step), info


def make_hybrid_rollout(
    config: LlamaConfig,
    params: dict,
    served,
    k_units,
    v_units,
    k_mean,
    k_std,
    v_mean,
    v_std,
    omega: float,
    *,
    seq_len: int,
    rollout_tokens: int,
    scheme: str = "fp32",
    fm_mult: float | None = None,
    sin_impl: str = "fast",
    interpret: bool | None = None,
    tile: int = 512,
):
    """T-token serving loop with served units holding ZERO prefix cache.

    The hybrid decode step generalized to the multi-token regime — the
    realistic serving architecture between refits: the fitted prefix
    (positions [0, seq_len)) of a served unit lives ONLY as its packed
    SIREN payload; tokens generated after the fit accumulate in a small
    (T, d) HBM *tail* buffer until the next refit folds them in
    (FINDINGS' incremental-absolute maintenance path). Per step the
    served attention is the exact three-segment online softmax:

      params segment  — quant kernel over the fitted S rows, (m, l) stats;
      tail segment    — generated rows [0, t), masked HBM attention;
      self column     — the step's own k/v.

    Unserved units keep a standard pre-allocated (S+T) cache buffer with
    the decode mask (rows < position visible), bit-for-bit the math of
    `llama_decode_rollout` over a swapped buffer. The whole T-token loop
    is ONE jitted `lax.scan` — one dispatch, same as the all-HBM rollout.

    Teacher-forced like `llama_decode_rollout` (no lm_head in the weight
    contract): token t of ``token_ids`` decodes at position seq_len + t
    and appends its own K/V.

    Returns ``(rollout, info)``: ``rollout(token_ids (T,), cache_k_uns,
    cache_v_uns) -> (hs (T, hidden), (tail_k, tail_v))`` where the caches
    are per-layer (n_unserved_l, seq_len, d) prefix rows and the returned
    tails are per-layer (n_served_l, T, d). ``info`` adds the HBM
    accounting: ``hbm_bytes_hybrid`` (unserved prefix+tail buffers +
    served tails + packed payloads) vs ``hbm_bytes_full`` (the all-HBM
    rollout's (S+T) buffer for every unit).
    """
    _require_vanilla(config)
    served = np.asarray(served, bool)
    n_l, n_kv = served.shape
    n_q, d = config.num_attention_heads, config.head_dim
    group = n_q // n_kv
    if n_l != config.num_hidden_layers or n_kv != config.num_key_value_heads:
        raise ValueError(
            f"served mask {served.shape} does not match the config "
            f"({config.num_hidden_layers}, {config.num_key_value_heads})"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    layer_assets, resident = _build_layer_assets(
        served, k_units, v_units, k_mean, k_std, v_mean, v_std, scheme,
        n_kv, d,
    )
    act = _mlp_act(config.hidden_act)
    scale = 1.0 / math.sqrt(d)
    s, t_steps = int(seq_len), int(rollout_tokens)
    neg = jnp.float32(-1e30)

    def rollout(token_ids, cache_k_uns, cache_v_uns):
        lp_all = params["layers"]
        inv_freq = jnp.asarray(_rope_frequencies(config))
        rope_sc = jnp.float32(config.attention_scaling)

        # pre-allocate: unserved (n_uns, S+T, d) buffers, served (n_srv, T, d) tails
        uns_k, uns_v, tail_k, tail_v = [], [], [], []
        for l in range(n_l):
            a = layer_assets[l]
            n_uns, n_srv = a["uns"].size, a["srv"].size
            pad = jnp.zeros((n_uns, t_steps, d), jnp.float32)
            uns_k.append(jnp.concatenate([cache_k_uns[l], pad], axis=1))
            uns_v.append(jnp.concatenate([cache_v_uns[l], pad], axis=1))
            tail_k.append(jnp.zeros((n_srv, t_steps, d), jnp.float32))
            tail_v.append(jnp.zeros((n_srv, t_steps, d), jnp.float32))

        def step(carry, xs):
            uns_k, uns_v, tail_k, tail_v = carry
            tok, t = xs
            position = jnp.int32(s) + t
            h = params["embed"][tok][None, :]
            if config.scale_embeddings:
                h = h * jnp.asarray(config.hidden_size**0.5, dtype=h.dtype)
            angles = position.astype(jnp.float32) * inv_freq
            angles = _duplicate_angles(config, angles)[None, :]
            cos = (jnp.cos(angles) * rope_sc).astype(h.dtype)
            sin = (jnp.sin(angles) * rope_sc).astype(h.dtype)
            uns_col = jnp.arange(s + t_steps)[None, None, :] < position
            tail_col = jnp.arange(t_steps)[None, None, :] < t

            new_uk, new_uv, new_tk, new_tv = [], [], [], []
            for l in range(n_l):
                lp = {key: leaf[l] for key, leaf in lp_all.items()}
                a = layer_assets[l]
                x = _norm(config, h, lp["input_norm"])
                q = (x @ lp["q"] + lp["q_bias"]).reshape(1, n_q, d)
                q = q.transpose(1, 0, 2)
                k = (x @ lp["k"] + lp["k_bias"]).reshape(1, n_kv, d)
                k = k.transpose(1, 0, 2)
                v = (x @ lp["v"] + lp["v_bias"]).reshape(1, n_kv, d)
                v = v.transpose(1, 0, 2)
                q = _apply_rope(q, cos, sin)
                k = _apply_rope(k, cos, sin)
                qg = q.reshape(n_kv, group, d)
                k_self, v_self = k[:, 0, :], v[:, 0, :]
                s_self = (
                    jnp.einsum(
                        "ngd,nd->ng", qg, k_self,
                        preferred_element_type=jnp.float32,
                    )
                    * scale
                )

                attn = jnp.zeros((n_kv, group, d), jnp.float32)
                if a["uns"].size:
                    uns = tuple(int(i) for i in a["uns"])
                    ck, cv = uns_k[l], uns_v[l]
                    logits = (
                        jnp.einsum(
                            "ugd,ukd->ugk", qg[uns, :, :], ck,
                            preferred_element_type=jnp.float32,
                        )
                        * scale
                    )
                    logits = jnp.where(uns_col, logits, neg)
                    full = jnp.concatenate(
                        [logits, s_self[uns, :][:, :, None]], axis=-1
                    )
                    p = jax.nn.softmax(full, axis=-1)
                    o_uns = jnp.einsum(
                        "ugk,ukd->ugd", p[..., :-1], cv,
                        preferred_element_type=jnp.float32,
                    ) + p[..., -1][..., None] * v_self[uns, :][:, None, :]
                    attn = attn.at[uns, :, :].set(o_uns)
                    new_uk.append(
                        jax.lax.dynamic_update_slice(
                            ck,
                            k_self[uns, :][:, None, :],
                            (0, position, 0),
                        )
                    )
                    new_uv.append(
                        jax.lax.dynamic_update_slice(
                            cv,
                            v_self[uns, :][:, None, :],
                            (0, position, 0),
                        )
                    )
                else:
                    new_uk.append(uns_k[l])
                    new_uv.append(uns_v[l])
                if a["srv"].size:
                    srv = tuple(int(i) for i in a["srv"])
                    o_k, m_k, l_k = siren_attention_decode_quant(
                        None, None, a["km"], a["ks"], a["vm"], a["vs"],
                        qg[srv, :, :], scheme, omega, s, tile=tile,
                        interpret=interpret, sin_impl=sin_impl,
                        fm_mult=fm_mult, causal=False,
                        packed=(a["k_packed"], a["v_packed"]),
                        return_stats=True,
                    )
                    tk, tv = tail_k[l], tail_v[l]
                    t_logits = (
                        jnp.einsum(
                            "ugd,ukd->ugk", qg[srv, :, :], tk,
                            preferred_element_type=jnp.float32,
                        )
                        * scale
                    )
                    t_logits = jnp.where(tail_col, t_logits, neg)
                    local = jnp.concatenate(
                        [t_logits, s_self[srv, :][:, :, None]], axis=-1
                    )  # (n_srv, group, T+1)
                    m_loc = jnp.max(local, axis=-1)
                    big = jnp.maximum(m_k, m_loc)
                    p_loc = jnp.exp(local - big[..., None])
                    w_loc = jnp.sum(p_loc, axis=-1)
                    o_loc = jnp.einsum(
                        "ugk,ukd->ugd", p_loc[..., :-1], tv,
                        preferred_element_type=jnp.float32,
                    ) + p_loc[..., -1][..., None] * v_self[srv, :][:, None, :]
                    w_k = l_k * jnp.exp(m_k - big)
                    merged = (w_k[..., None] * o_k + o_loc) / (
                        w_k + w_loc
                    )[..., None]
                    attn = attn.at[srv, :, :].set(merged)
                    new_tk.append(
                        jax.lax.dynamic_update_slice(
                            tk, k_self[srv, :][:, None, :], (0, t, 0)
                        )
                    )
                    new_tv.append(
                        jax.lax.dynamic_update_slice(
                            tv, v_self[srv, :][:, None, :], (0, t, 0)
                        )
                    )
                else:
                    new_tk.append(tail_k[l])
                    new_tv.append(tail_v[l])

                attn_flat = attn.reshape(1, n_q * d).astype(h.dtype)
                h = h + attn_flat @ lp["o"] + lp["o_bias"]
                x2 = _norm(config, h, lp["post_norm"])
                h = h + _ffn(config, x2, lp, act)

            carry = (
                tuple(new_uk), tuple(new_uv), tuple(new_tk), tuple(new_tv)
            )
            return carry, h[0]

        init = (tuple(uns_k), tuple(uns_v), tuple(tail_k), tuple(tail_v))
        ts = jnp.arange(t_steps, dtype=jnp.int32)
        (_, _, tail_k, tail_v), hs = jax.lax.scan(
            step, init, (token_ids, ts)
        )
        return hs, (tail_k, tail_v)

    n_served = int(served.sum())
    n_units = n_l * n_kv
    n_uns_total = n_units - n_served
    row = d * 4  # one fp32 (d,) cache row
    info = {
        "n_served": n_served,
        "n_units": n_units,
        "scheme": scheme,
        "resident_param_bytes": int(resident),
        "hbm_bytes_hybrid": int(
            resident
            + 2 * n_uns_total * (s + t_steps) * row
            + 2 * n_served * t_steps * row
        ),
        "hbm_bytes_full": int(2 * n_units * (s + t_steps) * row),
    }
    return jax.jit(rollout), info


def pack_llama_kv_cache(keys, values, scheme: str, tile: int = 512):
    """Pack an (L, n_kv, S, d) llama KV cache into quant-RESIDENT operands.

    Per-(layer, kv-head) `ops/kv_quant_pallas.pack_kv_unit_stack`
    (`quantize_array(axis=1)` grid — every unit its own scale rows, the
    slice an operator stores/evicts independently), with the leading unit
    axis reshaped to (L, n_kv, ...) so the packed payload rides
    `lax.scan` over layers exactly like the fp32 buffers it replaces.
    Returns ``(packed_k_ops, packed_v_ops, layout)``.
    """
    from nerf_attention_tpu.ops.kv_quant_pallas import pack_kv_unit_stack

    keys = np.asarray(keys, np.float32)
    n_l, n_kv, s, d = keys.shape
    k_ops, layout = pack_kv_unit_stack(
        keys.reshape(n_l * n_kv, s, d), scheme, tile=tile
    )
    v_ops, layout_v = pack_kv_unit_stack(
        np.asarray(values, np.float32).reshape(n_l * n_kv, s, d),
        scheme, tile=tile,
    )
    assert layout_v == layout
    k_ops = tuple(o.reshape(n_l, n_kv, *o.shape[1:]) for o in k_ops)
    v_ops = tuple(o.reshape(n_l, n_kv, *o.shape[1:]) for o in v_ops)
    return k_ops, v_ops, layout


@partial(jax.jit, static_argnames=("config", "layout"))
def llama_decode_step_quantcache(
    config: LlamaConfig,
    params: dict,
    token_id,
    position,
    packed_k: tuple,
    packed_v: tuple,
    layout: tuple,
):
    """One decode step over a fully QUANT-RESIDENT KV cache.

    The GQA twin of `mla_jax.mla_decode_step_absorbed_quant`: the step's
    cache operands are the bit-packed codes from `pack_llama_kv_cache` —
    fp32 K/V rows never exist in HBM. Per layer the cache segment runs
    through `ops/kv_quant_pallas.kv_cache_attention_quant` (streamed
    VMEM dequant, decode mask rows < position, (m, l) stats) and merges
    EXACTLY with the self column — the same online-softmax algebra as
    the hybrid step, so parity vs `llama_decode_step` over the
    host-dequantized buffer is fp32 op-order noise
    (`tests/test_kv_quant_pallas.py`). Vanilla dense llama family (the
    `make_hybrid_decode_step` scope); other families serve through the
    fp32 buffer surface. Returns (h (hidden,), (k_new, v_new) each
    (L, n_kv, 1, d)) — the appended rows, exact fp32 (re-quantized into
    the stored cache at the operator's cadence).
    """
    from nerf_attention_tpu.ops.kv_quant_pallas import (
        kv_cache_attention_quant,
    )

    _require_vanilla(config)
    n_l = config.num_hidden_layers
    n_kv, n_q, d = (
        config.num_key_value_heads,
        config.num_attention_heads,
        config.head_dim,
    )
    group = n_q // n_kv
    act = _mlp_act(config.hidden_act)
    scale = 1.0 / math.sqrt(d)

    h = params["embed"][token_id][None, :]
    if config.scale_embeddings:
        h = h * jnp.asarray(config.hidden_size**0.5, dtype=h.dtype)
    position = jnp.asarray(position, jnp.int32)
    inv_freq = jnp.asarray(_rope_frequencies(config))
    angles = position.astype(jnp.float32) * inv_freq
    angles = _duplicate_angles(config, angles)[None, :]
    sc = jnp.float32(config.attention_scaling)
    cos = (jnp.cos(angles) * sc).astype(h.dtype)
    sin = (jnp.sin(angles) * sc).astype(h.dtype)
    n_k = len(packed_k)

    def scan_layer(h, xs):
        lp = xs[0]
        k_ops_l = tuple(xs[1 : 1 + n_k])
        v_ops_l = tuple(xs[1 + n_k :])
        x = _norm(config, h, lp["input_norm"])
        q = (x @ lp["q"] + lp["q_bias"]).reshape(1, n_q, d).transpose(1, 0, 2)
        k = (x @ lp["k"] + lp["k_bias"]).reshape(1, n_kv, d).transpose(1, 0, 2)
        v = (x @ lp["v"] + lp["v_bias"]).reshape(1, n_kv, d).transpose(1, 0, 2)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        qg = q.reshape(n_kv, group, d)
        k_self, v_self = k[:, 0, :], v[:, 0, :]
        s_self = (
            jnp.einsum(
                "ngd,nd->ng", qg, k_self, preferred_element_type=jnp.float32
            )
            * scale
        )
        o, m, lden = kv_cache_attention_quant(
            qg, (k_ops_l, layout), (v_ops_l, layout), position,
            scale=scale, return_stats=True,
        )
        big = jnp.maximum(m, s_self)
        w_cache = lden * jnp.exp(m - big)
        w_self = jnp.exp(s_self - big)
        merged = (
            w_cache[..., None] * o
            + w_self[..., None] * v_self[:, None, :]
        ) / (w_cache + w_self)[..., None]
        attn_flat = merged.reshape(1, n_q * d).astype(h.dtype)
        h = h + attn_flat @ lp["o"] + lp["o_bias"]
        x2 = _norm(config, h, lp["post_norm"])
        h = h + _ffn(config, x2, lp, act)
        return h, (k[:, None, 0, :], v[:, None, 0, :])

    layers = {key: leaf for key, leaf in params["layers"].items()}
    h, (k_new, v_new) = jax.lax.scan(
        scan_layer, h, (layers, *packed_k, *packed_v)
    )
    return h[0], (k_new, v_new)
