"""Quantized-resident absorbed MLA attention vs the host-dequant path.

`ops/mla_quant_pallas.py` ships the latent cache as bit-packed code
planes (the `quantize_array(axis=1)` ladder grid) and dequantizes per
tile in VMEM; against `mla_absorbed_attention` over the host-dequantized
latent the outputs must agree to fp32 op-order noise — the dequantized
rows are bit-identical, only WHERE they materialize differs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_attention_tpu.ops.mla_absorbed_pallas import mla_absorbed_attention
from nerf_attention_tpu.ops.mla_quant_pallas import (
    mla_absorbed_attention_quant,
    pack_resident_latent,
    resident_latent_bytes,
)
from nerf_attention_tpu.ops.quantize import quantize_array

H, R, ROPE = 6, 64, 16
LAT = R + ROPE


def _fixture(s, seed=0):
    rng = np.random.RandomState(seed)
    latent = rng.randn(s, LAT).astype(np.float32)
    q = jnp.asarray(rng.randn(H, LAT).astype(np.float32) * 0.3)
    new = jnp.asarray(rng.randn(1, LAT).astype(np.float32))
    return latent, q, new


@pytest.mark.parametrize("scheme", ["int8_g32", "int6_g64", "int4_g64"])
@pytest.mark.parametrize("s,tile", [(200, 64), (512, 128)])
def test_quant_absorbed_matches_host_dequant(scheme, s, tile):
    latent, q, new = _fixture(s)
    _, dq = quantize_array(latent, scheme, axis=1)
    packed = pack_resident_latent(latent, scheme, tile=tile)

    for pos in [s, s // 2, 1]:
        o_ref, ent_ref = mla_absorbed_attention(
            q, jnp.asarray(dq), new, pos,
            kv_lora_rank=R, scale=0.13, tile=tile, interpret=True,
        )
        o_q, ent_q = mla_absorbed_attention_quant(
            q, packed, new, pos, kv_lora_rank=R, scale=0.13, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(o_q), np.asarray(o_ref), atol=1e-5, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ent_q), np.asarray(ent_ref), atol=1e-5, rtol=1e-5
        )


def test_quant_absorbed_close_to_exact_and_smaller():
    s, tile = 512, 128
    latent, q, new = _fixture(s, seed=3)
    o_exact, _ = mla_absorbed_attention(
        q, jnp.asarray(latent), new, s,
        kv_lora_rank=R, scale=0.13, tile=tile, interpret=True,
    )
    # code bytes + fp32-stored (fp16-valued) scale rows, with per-tile
    # sublane padding of the scale rows to a multiple of 8 (Mosaic block
    # constraint): at this small tile=128 the padding inflates scales —
    # int8_g32 g=4→8: (1 + 8/128·4)/4 = 0.3125; int4_g64 g=2→8:
    # (0.5 + 8/128·4)/4 = 0.1875. Production tiles (512+) sit near the
    # unpadded 0.281 / 0.141.
    # cosine bars are for RANDOM gaussian latents (no structure — the
    # hardest case; the ladder's 0.99904 int4 figure is on model latents)
    for scheme, max_ratio, cos_bar in [
        ("int8_g32", 0.33, 0.9995),
        ("int4_g64", 0.20, 0.99),
    ]:
        packed = pack_resident_latent(latent, scheme, tile=tile)
        o_q, _ = mla_absorbed_attention_quant(
            q, packed, new, s, kv_lora_rank=R, scale=0.13, interpret=True,
        )
        cos = float(
            np.sum(np.asarray(o_q) * np.asarray(o_exact))
            / (
                np.linalg.norm(np.asarray(o_q))
                * np.linalg.norm(np.asarray(o_exact))
            )
        )
        assert cos > cos_bar, (scheme, cos)
        # resident bytes beat the fp32 cache by ~the scheme's bit ratio
        assert resident_latent_bytes(packed[0]) < max_ratio * latent.nbytes, (
            scheme,
            resident_latent_bytes(packed[0]) / latent.nbytes,
        )


def test_pack_rejects_bad_schemes_and_tiles():
    latent, _, _ = _fixture(64)
    with pytest.raises(ValueError, match="group-wise int"):
        pack_resident_latent(latent, "fp16")
    with pytest.raises(ValueError, match="multiple of group"):
        pack_resident_latent(latent, "int8_g32", tile=48)


def test_quant_absorbed_step_matches_dequant_cache(tmp_path):
    """`mla_decode_step_absorbed_quant` over packed codes must equal the
    plain absorbed step over the host-dequantized latent stack — the
    in-VMEM dequant replays the ladder grid exactly; only WHERE the fp32
    rows exist differs."""
    import jax

    from nerf_attention_tpu.models.mla_jax import (
        MLAConfig,
        init_random_mla,
        mla_decode_step_absorbed,
        mla_decode_step_absorbed_quant,
        mla_prefill_kv,
        pack_mla_latent_stack,
    )

    cfg = MLAConfig(
        model_type="deepseek_v2",
        vocab_size=64,
        hidden_size=48,
        intermediate_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        kv_lora_rank=32,
        qk_nope_head_dim=16,
        qk_rope_head_dim=8,
        v_head_dim=16,
    )
    params = init_random_mla(cfg, seed=0)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, 64, 40), jnp.int32)
    _, _, latents = mla_prefill_kv(cfg, params, ids, return_latent=True)
    s = 32
    lat_pfx = np.asarray(latents[:, :s, :])

    for scheme in ["int8_g32", "int4_g32"]:
        from nerf_attention_tpu.ops.quantize import quantize_array

        dq = jnp.asarray(
            np.stack([quantize_array(l, scheme, axis=1)[1] for l in lat_pfx])
        )
        h_ref, lat_ref, ent_ref = mla_decode_step_absorbed(
            cfg, params, ids[s], s, dq
        )
        ops, layout = pack_mla_latent_stack(lat_pfx, scheme, tile=64)
        h_q, lat_q, ent_q = mla_decode_step_absorbed_quant(
            cfg, params, ids[s], s, ops, layout
        )
        np.testing.assert_allclose(
            np.asarray(h_q), np.asarray(h_ref), atol=1e-5, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ent_q), np.asarray(ent_ref), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(lat_q), np.asarray(lat_ref), atol=1e-5
        )
