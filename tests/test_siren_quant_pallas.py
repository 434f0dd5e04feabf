"""Quantized-resident fused kernels vs the host-dequant plain kernels.

The quant kernels (`ops/siren_quant_pallas.py`) ship bit-packed int codes
as the HBM operands and dequantize in VMEM with the exact
`ops/quantize.py` grid (fp16-valued fp32 scales), so against the plain
kernels running on host-dequantized params the outputs must agree to fp32
op-order noise — the dequantized weight matrices are bit-identical.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_attention_tpu.models.siren import init_siren
from nerf_attention_tpu.ops.quantize import param_bytes, quantize_params
from nerf_attention_tpu.ops.siren_pallas import siren_decode_batch
from nerf_attention_tpu.ops.siren_quant_pallas import (
    pack_resident_params,
    resident_param_bytes,
    siren_attention_decode_quant,
    siren_decode_batch_quant,
)
from nerf_attention_tpu.types import SIRENConfig

SCHEMES = ["int8_g32", "int6_g64", "int4_g128", "int4_g32", "int8_g32_l0fp32"]


def _batched_params(n, config, out_features, seed=3):
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    return jax.vmap(lambda k: init_siren(k, config, out_features))(keys)


def _host_dequant(params, scheme):
    """Per-network quantize_params dequant, restacked — the at-rest oracle."""
    n = params[0][0].shape[0]
    dq_nets = [
        quantize_params(
            [(np.asarray(w)[i], np.asarray(b)[i]) for w, b in params], scheme
        )[1]
        for i in range(n)
    ]
    return [
        (
            jnp.stack([dq_nets[i][li][0] for i in range(n)]),
            jnp.stack([dq_nets[i][li][1] for i in range(n)]),
        )
        for li in range(len(params))
    ]


@pytest.mark.parametrize("scheme", SCHEMES)
def test_quant_decode_matches_host_dequant(scheme):
    config = SIRENConfig(128, 2, 30.0, "small")
    params = _batched_params(3, config, 64)
    want = np.asarray(
        siren_decode_batch(_host_dequant(params, scheme), 30.0, 300, interpret=True)
    )
    got = np.asarray(
        siren_decode_batch_quant(params, scheme, 30.0, 300, interpret=True)
    )
    assert got.shape == want.shape == (3, 300, 64)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_quant_decode_fm_l0fp32():
    """The shipped FM storage scheme (int8_g32_l0fp32): FM multipliers in
    the kernel, first layer fp32 master by construction."""
    config = SIRENConfig(64, 2, 30.0, "t64")
    params = _batched_params(2, config, 32, seed=9)
    scheme = "int8_g32_l0fp32"
    want = np.asarray(
        siren_decode_batch(
            _host_dequant(params, scheme), 30.0, 256, interpret=True, fm_mult=32.0
        )
    )
    got = np.asarray(
        siren_decode_batch_quant(
            params, scheme, 30.0, 256, interpret=True, fm_mult=32.0
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    # l0fp32 really keeps the fp32 master on layer 0
    ops, layout = pack_resident_params(params, scheme)
    assert layout[0][0] == "dense"
    np.testing.assert_array_equal(np.asarray(ops[0]), np.asarray(params[0][0]))


def test_resident_bytes_shrink_with_bits():
    """Resident HBM bytes follow the bit width; int4 beats fp32 ~6-8x on
    the weight-dominated layers and the codes byte count is exact."""
    config = SIRENConfig(256, 3, 30.0, "medium")
    params = _batched_params(2, config, 128)
    fp32_bytes = sum(
        int(np.prod(w.shape)) * 4 + int(np.prod(b.shape)) * 4 for w, b in params
    )
    sizes = {}
    for scheme in ("int8_g32", "int6_g64", "int4_g128"):
        ops, layout = pack_resident_params(params, scheme)
        sizes[scheme] = resident_param_bytes(ops)
        # at-rest vs resident: resident adds only the fp32-vs-fp16 scale
        # and bias width (and fp32 layer 0), never more than 2x the stored
        # accounting and far under fp32.
        stored = sum(
            param_bytes(
                [(np.asarray(w)[i], np.asarray(b)[i]) for w, b in params], scheme
            )
            for i in range(2)
        )
        assert sizes[scheme] < 2 * stored
    assert sizes["int4_g128"] < sizes["int6_g64"] < sizes["int8_g32"]
    assert sizes["int4_g128"] * 6 < fp32_bytes
    assert sizes["int8_g32"] * 3 < fp32_bytes

    # Packed code planes really carry bits/8 bytes per weight element.
    ops4, layout4 = pack_resident_params(params, "int4_g128")
    hidden_codes = ops4[2]  # layer 1: first op is the packed plane
    assert layout4[1][0] == "int4"
    assert hidden_codes.dtype == jnp.int8
    assert hidden_codes.shape == (2, 128, 256)  # 256 rows -> 128 packed


def test_quant_attention_matches_host_dequant():
    from nerf_attention_tpu.ops.siren_attention_pallas import (
        siren_attention_decode_fused,
    )

    config = SIRENConfig(64, 2, 30.0, "t64")
    n, d, t, s = 2, 32, 8, 300
    keys = jax.random.split(jax.random.PRNGKey(21), 6)
    k_params = _batched_params(n, config, d, seed=4)
    v_params = _batched_params(n, config, d, seed=5)
    k_mean = jax.random.normal(keys[0], (n, 1, d)) * 0.3
    v_mean = jax.random.normal(keys[1], (n, 1, d)) * 0.3
    k_std = jnp.abs(k_mean) + 0.7
    v_std = jnp.abs(v_mean) + 0.5
    q = jax.random.normal(keys[2], (n, t, d)) * 0.8

    scheme = "int6_g64"
    want = np.asarray(
        siren_attention_decode_fused(
            _host_dequant(k_params, scheme), _host_dequant(v_params, scheme),
            k_mean, k_std, v_mean, v_std, q, 30.0, s,
            tile=128, interpret=True, sin_impl="fast",
        )
    )
    got = np.asarray(
        siren_attention_decode_quant(
            k_params, v_params, k_mean, k_std, v_mean, v_std, q,
            scheme, 30.0, s, tile=128, interpret=True, sin_impl="fast",
        )
    )
    assert got.shape == want.shape == (n, t, d)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_quant_decode_reuses_prepacked_payload():
    """`packed=` short-circuits packing — serving keeps payloads packed
    across steps; result identical to packing in-call."""
    config = SIRENConfig(64, 1, 30.0, "tiny")
    params = _batched_params(2, config, 16)
    packed = pack_resident_params(params, "int4_g32")
    a = np.asarray(
        siren_decode_batch_quant(
            params, "int4_g32", 30.0, 128, interpret=True, packed=packed
        )
    )
    b = np.asarray(
        siren_decode_batch_quant(params, "int4_g32", 30.0, 128, interpret=True)
    )
    np.testing.assert_array_equal(a, b)


def test_sharded_quant_decode_matches_local():
    """shard_map over the network axis: each device holds only its shard's
    PACKED bytes; zero collectives, so outputs match the local kernel
    exactly."""
    import jax
    from jax.sharding import Mesh

    from nerf_attention_tpu.ops.siren_quant_pallas import (
        siren_decode_batch_quant_sharded,
    )

    config = SIRENConfig(64, 1, 30.0, "tiny")
    n = 4
    params = _batched_params(n, config, 16, seed=11)
    mesh = Mesh(np.array(jax.devices()[:2]), ("fit",))
    local = np.asarray(
        siren_decode_batch_quant(params, "int4_g32", 30.0, 128, interpret=True)
    )
    sharded = np.asarray(
        siren_decode_batch_quant_sharded(
            params, "int4_g32", 30.0, 128, mesh, interpret=True
        )
    )
    np.testing.assert_allclose(sharded, local, atol=1e-6)

    with pytest.raises(ValueError):
        siren_decode_batch_quant_sharded(
            [(w[:3], b[:3]) for w, b in params], "int4_g32", 30.0, 128,
            mesh, interpret=True,
        )


@pytest.mark.parametrize("scheme", ["int6_g64", "int4_g32"])
def test_quant_decode_odd_row_counts(scheme):
    """Plane packing pads row counts that don't divide the plane factor
    (2 for nibbles, 4 for 2-bit fields); the unpack slice must recover
    exactly the real rows."""
    config = SIRENConfig(72, 1, 30.0, "odd")  # 72 rows: /2 ok, /4 ok
    params = _batched_params(2, config, 20, seed=13)
    want = np.asarray(
        siren_decode_batch(_host_dequant(params, scheme), 30.0, 100, interpret=True)
    )
    got = np.asarray(
        siren_decode_batch_quant(params, scheme, 30.0, 100, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_attention_stats_enable_exact_segment_merge():
    """return_stats=True: (m, l) are the online softmax's sufficient
    statistics — merging the kernel's segment with an extra self column
    computed OUTSIDE the kernel must equal softmax over the concatenated
    logits directly."""
    import math

    config = SIRENConfig(64, 1, 30.0, "t64")
    n, d, t, s = 2, 32, 4, 200
    k_params = _batched_params(n, config, d, seed=6)
    v_params = _batched_params(n, config, d, seed=7)
    km = jnp.zeros((n, 1, d)); ks = jnp.ones((n, 1, d))
    q = jax.random.normal(jax.random.PRNGKey(8), (n, t, d)) * 0.8
    scheme = "int8_g32"

    o, m, l = siren_attention_decode_quant(
        k_params, v_params, km, ks, km, ks, q, scheme, 30.0, s,
        tile=128, interpret=True, sin_impl="fast", causal=False,
        return_stats=True,
    )
    o, m, l = np.asarray(o), np.asarray(m), np.asarray(l)
    assert o.shape == (n, t, d) and m.shape == l.shape == (n, t)

    # self column: an extra (key, value) pair per head
    k_self = np.asarray(jax.random.normal(jax.random.PRNGKey(9), (n, d))) * 0.5
    v_self = np.asarray(jax.random.normal(jax.random.PRNGKey(10), (n, d))) * 0.5
    s_self = np.einsum("ntd,nd->nt", np.asarray(q), k_self) / math.sqrt(d)
    big = np.maximum(m, s_self)
    w_cache = l * np.exp(m - big)
    w_self = np.exp(s_self - big)
    merged = (
        w_cache[..., None] * o + w_self[..., None] * v_self[:, None, :]
    ) / (w_cache + w_self)[..., None]

    # oracle: softmax over [reconstructed rows, self] directly
    from nerf_attention_tpu.models.siren import positions, siren_apply
    dq = _host_dequant(k_params, scheme)
    dqv = _host_dequant(v_params, scheme)
    from nerf_attention_tpu.ops.fastmath import fast_sin
    for ni in range(n):
        kp = [(np.asarray(w)[ni], np.asarray(b)[ni]) for w, b in dq]
        vp = [(np.asarray(w)[ni], np.asarray(b)[ni]) for w, b in dqv]
        k_hat = np.asarray(siren_apply(kp, 30.0, positions(s), sin=fast_sin))
        v_hat = np.asarray(siren_apply(vp, 30.0, positions(s), sin=fast_sin))
        logits = np.concatenate(
            [np.asarray(q)[ni] @ k_hat.T / math.sqrt(d),
             s_self[ni][:, None]], axis=1,
        )
        p = np.exp(logits - logits.max(axis=1, keepdims=True))
        p /= p.sum(axis=1, keepdims=True)
        want = p[:, :-1] @ v_hat + p[:, -1:][..., None][:, 0] * v_self[ni]
        np.testing.assert_allclose(merged[ni], want, atol=5e-5, rtol=1e-4)


def test_sharded_quant_attention_matches_local_with_stats():
    """Sharded quant attention-from-parameters: packed payload per shard,
    zero collectives — output AND (m, l) stats must match the local
    kernel exactly, so a TP hybrid step can merge shard-locally."""
    import jax
    from jax.sharding import Mesh

    from nerf_attention_tpu.ops.siren_quant_pallas import (
        siren_attention_decode_quant_sharded,
    )

    config = SIRENConfig(64, 1, 30.0, "t64")
    n, d, t, s = 4, 32, 4, 160
    k_params = _batched_params(n, config, d, seed=21)
    v_params = _batched_params(n, config, d, seed=22)
    km = jnp.zeros((n, 1, d)); ks = jnp.ones((n, 1, d))
    q = jax.random.normal(jax.random.PRNGKey(23), (n, t, d)) * 0.8
    mesh = Mesh(np.array(jax.devices()[:2]), ("fit",))

    o_l, m_l, l_l = siren_attention_decode_quant(
        k_params, v_params, km, ks, km, ks, q, "int8_g32", 30.0, s,
        tile=64, interpret=True, causal=False, return_stats=True,
    )
    o_s, m_s, l_s = siren_attention_decode_quant_sharded(
        k_params, v_params, km, ks, km, ks, q, "int8_g32", 30.0, s,
        mesh, tile=64, interpret=True, causal=False, return_stats=True,
    )
    np.testing.assert_allclose(np.asarray(o_s), np.asarray(o_l), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_l), atol=1e-6)
    np.testing.assert_allclose(np.asarray(l_s), np.asarray(l_l), atol=1e-6)

    # plain (no-stats) path too
    o_s2 = siren_attention_decode_quant_sharded(
        k_params, v_params, km, ks, km, ks, q, "int8_g32", 30.0, s,
        mesh, tile=64, interpret=True, causal=False,
    )
    np.testing.assert_allclose(np.asarray(o_s2), np.asarray(o_l), atol=1e-6)

    with pytest.raises(ValueError):
        siren_attention_decode_quant_sharded(
            [(w[:3], b[:3]) for w, b in k_params],
            [(w[:3], b[:3]) for w, b in v_params],
            km[:3], ks[:3], km[:3], ks[:3], q[:3], "int8_g32", 30.0, s,
            mesh, tile=64, interpret=True, causal=False,
        )
