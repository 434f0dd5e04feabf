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
    km = np.asarray(k_mean, np.float32).reshape(-1, 1, d)
    ks = np.asarray(k_std, np.float32).reshape(-1, 1, d)
    vm = np.asarray(v_mean, np.float32).reshape(-1, 1, d)
    vs = np.asarray(v_std, np.float32).reshape(-1, 1, d)

    layer_assets = []
    resident = 0
    for l in range(n_l):
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
