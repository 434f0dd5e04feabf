"""Quant-resident KV-cache attention vs host-dequant oracle.

`ops/kv_quant_pallas.py` streams bit-packed K/V tiles and dequantizes
in VMEM on the `quantize_array(axis=1)` grid; softmax over the
host-dequantized rows is the oracle — agreement to fp32 op-order noise.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_attention_tpu.ops.kv_quant_pallas import (
    kv_cache_attention_quant,
    pack_kv_unit_stack,
    resident_kv_bytes,
)
from nerf_attention_tpu.ops.quantize import quantize_array

N, T, D = 3, 4, 32


def _fixture(s, seed=0):
    rng = np.random.RandomState(seed)
    ck = rng.randn(N, s, D).astype(np.float32)
    cv = rng.randn(N, s, D).astype(np.float32)
    q = jnp.asarray(rng.randn(N, T, D).astype(np.float32) * 0.4)
    return ck, cv, q


def _oracle(q, ck_dq, cv_dq, pos, scale):
    """Masked softmax attention over dequantized rows (cache only)."""
    out = np.empty((N, T, D), np.float32)
    m = np.empty((N, T), np.float32)
    l = np.empty((N, T), np.float32)
    for n in range(N):
        logits = np.asarray(q)[n] @ ck_dq[n].T * scale  # (T, S)
        logits[:, pos:] = -np.inf
        mm = logits.max(axis=1)
        p = np.exp(logits - mm[:, None])
        ll = p.sum(axis=1)
        out[n] = (p / ll[:, None]) @ cv_dq[n]
        m[n], l[n] = mm, ll
    return out, m, l


@pytest.mark.parametrize("scheme", ["int8_g32", "int6_g64", "int4_g64"])
@pytest.mark.parametrize("s,tile", [(200, 64), (512, 128)])
def test_kv_quant_attention_matches_host_dequant(scheme, s, tile):
    ck, cv, q = _fixture(s)
    scale = 1.0 / math.sqrt(D)
    pk = pack_kv_unit_stack(ck, scheme, tile=tile)
    pv = pack_kv_unit_stack(cv, scheme, tile=tile)
    ck_dq = np.stack([quantize_array(c, scheme, axis=1)[1] for c in ck])
    cv_dq = np.stack([quantize_array(c, scheme, axis=1)[1] for c in cv])

    for pos in [s, s - 37, 1]:
        want, m_w, l_w = _oracle(q, ck_dq, cv_dq, pos, scale)
        got, m_g, l_g = kv_cache_attention_quant(
            q, pk, pv, pos, scale=scale, interpret=True, return_stats=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), want, atol=2e-5, rtol=1e-4
        )
        # stats are shift-invariant sufficient statistics: compare the
        # reconstructed normalizer log l + m (the log-partition), which is
        # what external merging actually consumes.
        np.testing.assert_allclose(
            np.asarray(m_g) + np.log(np.asarray(l_g)),
            m_w + np.log(l_w),
            atol=1e-4,
        )


def test_kv_quant_stats_merge_self_column():
    """(m, l) must merge an external self column exactly — the hybrid
    decode step's algebra over a quantized unserved cache."""
    s, tile, pos = 160, 64, 160
    ck, cv, q = _fixture(s, seed=4)
    scale = 1.0 / math.sqrt(D)
    pk = pack_kv_unit_stack(ck, "int8_g32", tile=tile)
    pv = pack_kv_unit_stack(cv, "int8_g32", tile=tile)
    ck_dq = np.stack([quantize_array(c, "int8_g32", axis=1)[1] for c in ck])
    cv_dq = np.stack([quantize_array(c, "int8_g32", axis=1)[1] for c in cv])

    o, m, l = kv_cache_attention_quant(
        q, pk, pv, pos, scale=scale, interpret=True, return_stats=True
    )
    o, m, l = np.asarray(o), np.asarray(m), np.asarray(l)
    rng = np.random.RandomState(9)
    k_self = rng.randn(N, D).astype(np.float32) * 0.5
    v_self = rng.randn(N, D).astype(np.float32) * 0.5
    s_self = np.einsum("ntd,nd->nt", np.asarray(q), k_self) * scale
    big = np.maximum(m, s_self)
    w_c = l * np.exp(m - big)
    w_s = np.exp(s_self - big)
    merged = (
        w_c[..., None] * o + w_s[..., None] * v_self[:, None, :]
    ) / (w_c + w_s)[..., None]

    for n in range(N):
        logits = np.concatenate(
            [np.asarray(q)[n] @ ck_dq[n].T * scale, s_self[n][:, None]],
            axis=1,
        )
        p = np.exp(logits - logits.max(axis=1, keepdims=True))
        p /= p.sum(axis=1, keepdims=True)
        want = p[:, :-1] @ cv_dq[n] + p[:, -1:] * v_self[n]
        np.testing.assert_allclose(merged[n], want, atol=5e-5, rtol=1e-4)


def test_kv_quant_resident_bytes_and_guards():
    ck, cv, q = _fixture(128)
    pk = pack_kv_unit_stack(ck, "int4_g64", tile=64)
    pv = pack_kv_unit_stack(cv, "int4_g64", tile=64)
    # int4: 0.5 B codes + scale rows sublane-padded to 8 per tile
    # (tile=64, g=1→8: 8/64·4 = 0.5 B/elem of scales here; production
    # tiles amortize to ~0.07 B)
    assert resident_kv_bytes(pk[0]) < 0.27 * ck.nbytes
    pv8 = pack_kv_unit_stack(cv, "int8_g32", tile=64)
    with pytest.raises(ValueError, match="layouts differ"):
        kv_cache_attention_quant(
            q, pk, pv8, 128, scale=0.1, interpret=True
        )
    with pytest.raises(ValueError, match="unit count"):
        kv_cache_attention_quant(
            q[:2], pk, pv, 128, scale=0.1, interpret=True
        )


def test_llama_decode_step_quantcache_matches_buffer():
    """`llama_decode_step_quantcache` over packed codes must equal
    `llama_decode_step` over the host-dequantized buffer — same softmax
    rows (cache segment via stats merge + exact self column)."""
    from nerf_attention_tpu.models.llama_hybrid import (
        llama_decode_step_quantcache,
        pack_llama_kv_cache,
    )
    from nerf_attention_tpu.models.llama_jax import (
        LlamaConfig,
        init_random_llama,
        llama_decode_step,
        llama_prefill_kv,
    )

    config = LlamaConfig(
        vocab_size=64,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=32,
    )
    params = init_random_llama(config, seed=0)
    rng = np.random.RandomState(0)
    s = 100
    ids = jnp.asarray(rng.randint(0, 64, s + 1), jnp.int32)
    keys, values = llama_prefill_kv(config, params, ids[:s])

    for scheme in ["int8_g32", "int4_g64"]:
        ck_dq = np.stack(
            [
                np.stack(
                    [
                        quantize_array(np.asarray(keys)[l, h], scheme, axis=1)[1]
                        for h in range(2)
                    ]
                )
                for l in range(3)
            ]
        )
        cv_dq = np.stack(
            [
                np.stack(
                    [
                        quantize_array(
                            np.asarray(values)[l, h], scheme, axis=1
                        )[1]
                        for h in range(2)
                    ]
                )
                for l in range(3)
            ]
        )
        h_ref, (kn_ref, vn_ref), _ = llama_decode_step(
            config, params, ids[s], jnp.int32(s),
            jnp.asarray(ck_dq), jnp.asarray(cv_dq),
        )
        pk, pv, layout = pack_llama_kv_cache(keys, values, scheme, tile=64)
        h_q, (kn_q, vn_q) = llama_decode_step_quantcache(
            config, params, ids[s], jnp.int32(s), pk, pv, layout
        )
        np.testing.assert_allclose(
            np.asarray(h_q), np.asarray(h_ref), atol=2e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(kn_q), np.asarray(kn_ref), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(vn_q), np.asarray(vn_ref), atol=1e-5
        )
