"""Hybrid decode step vs the buffer-swap surface.

`models/llama_hybrid.py` serves planned units by attending straight from
SIREN parameters (quant attention kernel, stats merge with the self
column) while unserved units keep masked cache attention. Both compute
softmax over [reconstructed rows, self]; they differ only in WHERE
K-hat/V-hat materialize (VMEM tiles vs an HBM buffer), so against
`llama_decode_step` over a reconstruction-swapped buffer the hidden
state must agree to fp32 op-order noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_attention_tpu.models.llama_hybrid import make_hybrid_decode_step
from nerf_attention_tpu.models.llama_jax import (
    LlamaConfig,
    init_random_llama,
    llama_decode_step,
    llama_prefill_kv,
)
from nerf_attention_tpu.models.siren import init_siren, positions, siren_apply
from nerf_attention_tpu.ops.fastmath import fast_sin
from nerf_attention_tpu.types import SIRENConfig

N_L, N_Q, N_KV, D, S = 3, 4, 2, 32, 100
OMEGA = 30.0


def _fixture(seed=0):
    config = LlamaConfig(
        vocab_size=64,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=N_L,
        num_attention_heads=N_Q,
        num_key_value_heads=N_KV,
        head_dim=D,
    )
    params = init_random_llama(config, seed=seed)
    rng = np.random.RandomState(seed)
    ids = jnp.asarray(rng.randint(0, config.vocab_size, S), jnp.int32)
    keys, values = llama_prefill_kv(config, params, ids)

    n_units = N_L * N_KV
    scfg = SIRENConfig(64, 1, OMEGA, "t64")
    kseed, vseed = jax.random.split(jax.random.PRNGKey(seed + 11))
    k_units = jax.vmap(lambda k: init_siren(k, scfg, D))(
        jax.random.split(kseed, n_units)
    )
    v_units = jax.vmap(lambda k: init_siren(k, scfg, D))(
        jax.random.split(vseed, n_units)
    )
    km = rng.randn(n_units, 1, D).astype(np.float32) * 0.1
    ks = rng.uniform(0.5, 1.5, (n_units, 1, D)).astype(np.float32)
    vm = rng.randn(n_units, 1, D).astype(np.float32) * 0.1
    vs = rng.uniform(0.5, 1.5, (n_units, 1, D)).astype(np.float32)
    return config, params, ids, keys, values, k_units, v_units, km, ks, vm, vs


def _reconstruct(units, mean, std, u):
    p = [(np.asarray(w)[u], np.asarray(b)[u]) for w, b in units]
    net = np.asarray(siren_apply(p, OMEGA, positions(S), sin=fast_sin))
    return net * std[u] + mean[u]  # (S, D)


def _swapped_buffers(keys, values, served, k_units, v_units, km, ks, vm, vs):
    ck = np.asarray(keys).copy()
    cv = np.asarray(values).copy()
    for l in range(N_L):
        for h in range(N_KV):
            if served[l, h]:
                u = l * N_KV + h
                ck[l, h] = _reconstruct(k_units, km, ks, u)
                cv[l, h] = _reconstruct(v_units, vm, vs, u)
    return jnp.asarray(ck), jnp.asarray(cv)


@pytest.mark.parametrize(
    "served_rows",
    [
        # mixed: one full layer served, one untouched, one split
        [[True, True], [False, False], [True, False]],
        # single unit served
        [[False, False], [False, True], [False, False]],
    ],
)
def test_hybrid_matches_buffer_swap(served_rows):
    config, params, ids, keys, values, k_units, v_units, km, ks, vm, vs = (
        _fixture()
    )
    served = np.asarray(served_rows, bool)
    tok = jnp.int32(7)

    ck_swap, cv_swap = _swapped_buffers(
        keys, values, served, k_units, v_units, km, ks, vm, vs
    )
    h_ref, _, _ = llama_decode_step(
        config, params, tok, jnp.int32(S), ck_swap, cv_swap
    )

    step, info = make_hybrid_decode_step(
        config, params, served, k_units, v_units, km, ks, vm, vs, OMEGA,
        scheme="fp32", sin_impl="fast", interpret=True, tile=64,
    )
    cache_k_uns = tuple(
        jnp.asarray(np.asarray(keys)[l][~served[l]]) for l in range(N_L)
    )
    cache_v_uns = tuple(
        jnp.asarray(np.asarray(values)[l][~served[l]]) for l in range(N_L)
    )
    h = step(tok, cache_k_uns, cache_v_uns)

    np.testing.assert_allclose(
        np.asarray(h), np.asarray(h_ref), atol=2e-4, rtol=1e-4
    )
    assert info["n_served"] == int(served.sum())
    assert info["resident_param_bytes"] > 0


def test_hybrid_quant_scheme_tracks_dequant_buffer_swap():
    """int8_g32-served units must equal a buffer swapped with the
    host-DEQUANTIZED reconstruction (the kernel's in-VMEM dequant is
    bit-exact vs quantize_params)."""
    from nerf_attention_tpu.ops.quantize import quantize_params

    config, params, ids, keys, values, k_units, v_units, km, ks, vm, vs = (
        _fixture(seed=1)
    )
    served = np.asarray([[True, False], [False, False], [False, True]], bool)

    def dq(units):
        n = units[0][0].shape[0]
        per = [
            quantize_params(
                [(np.asarray(w)[i], np.asarray(b)[i]) for w, b in units],
                "int8_g32",
            )[1]
            for i in range(n)
        ]
        return [
            (
                jnp.stack([per[i][li][0] for i in range(n)]),
                jnp.stack([per[i][li][1] for i in range(n)]),
            )
            for li in range(len(units))
        ]

    ck_swap, cv_swap = _swapped_buffers(
        keys, values, served, dq(k_units), dq(v_units), km, ks, vm, vs
    )
    h_ref, _, _ = llama_decode_step(
        config, params, jnp.int32(3), jnp.int32(S), ck_swap, cv_swap
    )

    step, info = make_hybrid_decode_step(
        config, params, served, k_units, v_units, km, ks, vm, vs, OMEGA,
        scheme="int8_g32", sin_impl="fast", interpret=True, tile=64,
    )
    cache_k_uns = tuple(
        jnp.asarray(np.asarray(keys)[l][~served[l]]) for l in range(N_L)
    )
    cache_v_uns = tuple(
        jnp.asarray(np.asarray(values)[l][~served[l]]) for l in range(N_L)
    )
    h = step(jnp.int32(3), cache_k_uns, cache_v_uns)
    np.testing.assert_allclose(
        np.asarray(h), np.asarray(h_ref), atol=2e-4, rtol=1e-4
    )
    assert info["scheme"] == "int8_g32"


def test_hybrid_rollout_matches_buffer_swap_rollout():
    """T-token hybrid rollout (served units: params + tail only) must
    equal `llama_decode_rollout` over a reconstruction-swapped (S+T)
    buffer — same softmax rows per step, different residency."""
    from nerf_attention_tpu.models.llama_hybrid import make_hybrid_rollout
    from nerf_attention_tpu.models.llama_jax import llama_decode_rollout

    config, params, ids, keys, values, k_units, v_units, km, ks, vm, vs = (
        _fixture(seed=2)
    )
    served = np.asarray([[True, False], [True, True], [False, False]], bool)
    t_steps = 6
    rng = np.random.RandomState(5)
    gen_ids = jnp.asarray(rng.randint(0, 64, t_steps), jnp.int32)

    ck_swap, cv_swap = _swapped_buffers(
        keys, values, served, k_units, v_units, km, ks, vm, vs
    )
    pad = jnp.zeros((N_L, N_KV, t_steps, D), jnp.float32)
    kbuf = jnp.concatenate([ck_swap, pad], axis=2)
    vbuf = jnp.concatenate([cv_swap, pad], axis=2)
    hs_ref, _, (k_new, v_new), _ = llama_decode_rollout(
        config, params, gen_ids, jnp.int32(S), kbuf, vbuf
    )

    rollout, info = make_hybrid_rollout(
        config, params, served, k_units, v_units, km, ks, vm, vs, OMEGA,
        seq_len=S, rollout_tokens=t_steps, scheme="fp32", sin_impl="fast",
        interpret=True, tile=64,
    )
    cache_k_uns = tuple(
        jnp.asarray(np.asarray(keys)[l][~served[l]]) for l in range(N_L)
    )
    cache_v_uns = tuple(
        jnp.asarray(np.asarray(values)[l][~served[l]]) for l in range(N_L)
    )
    hs, (tail_k, tail_v) = rollout(gen_ids, cache_k_uns, cache_v_uns)

    np.testing.assert_allclose(
        np.asarray(hs), np.asarray(hs_ref), atol=5e-4, rtol=1e-4
    )
    # served tails must hold exactly the appended per-step K/V rows
    kn = np.asarray(k_new)[:, :, :, 0, :]  # (T, L, n_kv, d)
    for l in range(N_L):
        srv = np.where(served[l])[0]
        if srv.size:
            np.testing.assert_allclose(
                np.asarray(tail_k[l]),
                kn[:, l, srv, :].transpose(1, 0, 2),
                atol=5e-4, rtol=1e-4,
            )
    # accounting identity (the HBM *win* needs serving-scale S and an int
    # scheme — at this tiny S the fp32-packed net outweighs 100 cache rows)
    row = D * 4
    n_srv = int(served.sum())
    n_uns = N_L * N_KV - n_srv
    assert info["hbm_bytes_full"] == 2 * N_L * N_KV * (S + t_steps) * row
    assert info["hbm_bytes_hybrid"] == (
        info["resident_param_bytes"]
        + 2 * n_uns * (S + t_steps) * row
        + 2 * n_srv * t_steps * row
    )


def test_hybrid_rejects_non_vanilla():
    config, params, *_ = _fixture()
    bad = LlamaConfig(
        vocab_size=64,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=N_L,
        num_attention_heads=N_Q,
        num_key_value_heads=N_KV,
        head_dim=D,
        attn_logit_softcap=50.0,
    )
    _, _, _, _, _, k_units, v_units, km, ks, vm, vs = _fixture()
    served = np.zeros((N_L, N_KV), bool)
    served[0, 0] = True
    with pytest.raises(ValueError, match="softcap"):
        make_hybrid_decode_step(
            bad, params, served, k_units, v_units, km, ks, vm, vs, OMEGA
        )
