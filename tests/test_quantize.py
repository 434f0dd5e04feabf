"""Quantized parameter storage: ops round-trips and the experiment driver."""

import json

import jax
import numpy as np
import pytest

from nerf_attention_tpu.models.siren import init_siren
from nerf_attention_tpu.ops.quantize import (
    SCHEMES,
    param_bytes,
    quantize_array,
    quantize_params,
)
from nerf_attention_tpu.types import SIRENConfig

CONFIG = SIRENConfig(32, 1, 30.0, "t32")


def _params():
    return [
        (np.asarray(w), np.asarray(b))
        for w, b in init_siren(jax.random.PRNGKey(0), CONFIG, out_features=8)
    ]


def test_fp32_scheme_is_identity():
    params = _params()
    _, dq = quantize_params(params, "fp32")
    for (w, b), (wq, bq) in zip(params, dq):
        np.testing.assert_array_equal(w, wq)
        np.testing.assert_array_equal(b, bq)


def test_bf16_matches_jax_bfloat16_rounding():
    """The numpy bf16 round-to-nearest-even must equal jax's cast."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(4096) * 10 ** rng.uniform(-6, 6, 4096)).astype(
        np.float32
    )
    _, dq = quantize_array(x, "bf16")
    want = np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32))
    np.testing.assert_array_equal(dq, want)


def test_bf16_propagates_nonfinite():
    """Max-exponent inputs must not wrap in the integer rounding: NaN/Inf
    pass through, and near-max finite values overflow to inf exactly as a
    real bf16 cast does."""
    import jax.numpy as jnp

    x = np.array([np.nan, np.inf, -np.inf, 3.4e38, -3.4e38], np.float32)
    _, dq = quantize_array(x, "bf16")
    assert np.isnan(dq[0])
    want = np.asarray(jnp.asarray(x[1:]).astype(jnp.bfloat16).astype(jnp.float32))
    np.testing.assert_array_equal(dq[1:], want)


def test_int8_roundtrip_error_bounded():
    """Per-channel int8: error bounded by scale/2 per element."""
    rng = np.random.default_rng(1)
    w = rng.standard_normal((64, 16)).astype(np.float32)
    payload, dq = quantize_array(w, "int8", axis=1)
    assert payload["data"].dtype == np.int8
    assert payload["scale"].shape == (16,)
    err = np.abs(dq - w)
    assert (err <= payload["scale"][None, :] * 0.5 + 1e-9).all()


def test_param_bytes_accounting():
    params = _params()
    n = sum(w.size + b.size for w, b in params)
    assert param_bytes(params, "fp32") == n * 4
    assert param_bytes(params, "bf16") == n * 2
    assert param_bytes(params, "fp16") == n * 2
    scales = sum(w.shape[-1] * 4 + 4 for w, _ in params)
    assert param_bytes(params, "int8") == n + scales
    from nerf_attention_tpu.ops.quantize import INT4_GROUP, groupwise_scale_count

    int4 = sum(
        -(-w.size // 2)
        + groupwise_scale_count(w.shape, w.ndim - 1, INT4_GROUP) * 2
        + b.size * 2
        for w, b in params
    )
    assert param_bytes(params, "int4") == int4
    assert param_bytes(params, "int4_g32") == int4  # alias of plain int4
    # Larger groups store fewer scales; fewer bits pack denser (a 128-row
    # weight so the group sizes actually differ in scale count).
    tall = [(np.zeros((128, 16), np.float32), np.zeros(16, np.float32))]
    assert param_bytes(tall, "int4_g64") < param_bytes(tall, "int4_g32")
    assert param_bytes(tall, "int3_g32") < param_bytes(tall, "int4_g32")
    int3 = sum(
        -(-(w.size * 3) // 8)
        + groupwise_scale_count(w.shape, w.ndim - 1, 64) * 2
        + b.size * 2
        for w, b in tall
    )
    assert param_bytes(tall, "int3_g64") == int3
    with pytest.raises(ValueError, match="scheme"):
        param_bytes(params, "int3")
    with pytest.raises(ValueError, match="scheme"):
        param_bytes(params, "int9_g32")


def test_tensor_bytes_accounting():
    """tensor_bytes prices a raw tensor on the same grids param_bytes
    prices SIREN lists — the accounting quantized cache surfaces (MLA
    latents) use."""
    from nerf_attention_tpu.ops.quantize import (
        groupwise_scale_count,
        tensor_bytes,
    )

    shape = (512, 40)
    size = 512 * 40
    assert tensor_bytes(shape, "fp32") == size * 4
    assert tensor_bytes(shape, "fp16") == size * 2
    # per-channel int8: 1 byte/elem + fp32 scale per channel
    assert tensor_bytes(shape, "int8", axis=1) == size + 40 * 4
    assert tensor_bytes(shape, "int8") == size + 4  # per-tensor scale
    # group-wise: dense bit packing + fp16 scales
    assert tensor_bytes(shape, "int4_g32", axis=1) == (
        -(-(size * 4) // 8) + groupwise_scale_count(shape, 1, 32) * 2
    )
    assert tensor_bytes(shape, "int3_g64", axis=1) < tensor_bytes(
        shape, "int4_g32", axis=1
    )
    with pytest.raises(ValueError, match="modifier"):
        tensor_bytes(shape, "int8_l0fp32", axis=1)


def test_int4_roundtrip_error_bounded():
    """Group-wise int4: error bounded by half a group scale; padding rows
    (in-dim not a multiple of the group) must not corrupt the dequant."""
    rng = np.random.default_rng(2)
    w = rng.standard_normal((50, 16)).astype(np.float32)  # 50 = 32 + pad 14
    payload, dq = quantize_array(w, "int4", axis=1)
    assert payload["data"].dtype == np.int8
    assert np.abs(payload["data"]).max() <= 7
    assert payload["scale"].dtype == np.float16
    assert payload["scale"].shape == (2, 16)  # ceil(50/32) groups x channels
    scale = payload["scale"].astype(np.float32)
    per_elem = np.repeat(scale, 32, axis=0)[:50]
    assert (np.abs(dq - w) <= per_elem * 0.5 + 1e-9).all()


def test_parameterized_groupwise_schemes():
    """int<B>_g<N>: qmax honors the bit width, scales honor the group size,
    and the round-trip error stays within half a scale step."""
    rng = np.random.default_rng(7)
    w = rng.standard_normal((130, 16)).astype(np.float32)
    for scheme, qmax, group in (
        ("int3_g64", 3, 64), ("int8_g32", 127, 32), ("int4_g128", 7, 128)
    ):
        payload, dq = quantize_array(w, scheme, axis=1)
        assert payload["data"].dtype == np.int8
        assert np.abs(payload["data"]).max() <= qmax
        assert payload["scale"].shape == (-(-130 // group), 16)
        scale = payload["scale"].astype(np.float32)
        per_elem = np.repeat(scale, group, axis=0)[:130]
        assert (np.abs(dq - w) <= per_elem * 0.5 + 1e-9).all()
    # int4_g32 is literally the named int4 scheme.
    _, dq_named = quantize_array(w, "int4", axis=1)
    _, dq_param = quantize_array(w, "int4_g32", axis=1)
    np.testing.assert_array_equal(dq_named, dq_param)


def test_l0fp32_modifier_keeps_first_layer_exact():
    """_l0fp32: layer 0 stores fp32 (the FM phase-sensitivity fix), every
    other layer matches the base grid, and the accounting charges 4 B/param
    for layer 0."""
    from nerf_attention_tpu.ops.quantize import (
        param_bytes,
        parse_scheme,
        quantize_params,
        split_scheme,
    )

    rng = np.random.default_rng(11)
    params = [
        (rng.standard_normal((1, 32)).astype(np.float32),
         rng.standard_normal(32).astype(np.float32)),
        (rng.standard_normal((32, 32)).astype(np.float32),
         rng.standard_normal(32).astype(np.float32)),
        (rng.standard_normal((32, 8)).astype(np.float32),
         rng.standard_normal(8).astype(np.float32)),
    ]
    assert split_scheme("int8_g32_l0fp32") == ("int8_g32", True)
    assert split_scheme("int8_g32") == ("int8_g32", False)
    assert parse_scheme("int8_g32_l0fp32") == parse_scheme("int8_g32")
    with pytest.raises(ValueError):
        parse_scheme("bogus_l0fp32")

    _, dq_mod = quantize_params(params, "int8_g32_l0fp32")
    _, dq_base = quantize_params(params, "int8_g32")
    np.testing.assert_array_equal(dq_mod[0][0], params[0][0])
    np.testing.assert_array_equal(dq_mod[0][1], params[0][1])
    assert not np.array_equal(dq_base[0][0], params[0][0])
    for l in range(1, len(params)):
        np.testing.assert_array_equal(dq_mod[l][0], dq_base[l][0])
        np.testing.assert_array_equal(dq_mod[l][1], dq_base[l][1])

    w0, b0 = params[0]
    delta = (w0.size + b0.size) * 4 - param_bytes([params[0]], "int8_g32")
    assert param_bytes(params, "int8_g32_l0fp32") == (
        param_bytes(params, "int8_g32") + delta
    )


def test_qat_skip_first_respects_l0fp32_grid():
    """A _l0fp32 base scheme must leave layer 0 off the straight-through
    grid: with every OTHER layer already on-grid, the skip_first loss at
    init is exactly the fp32 loss (no projection error from layer 0)."""
    import jax.numpy as jnp

    from nerf_attention_tpu.ops.qat import fake_quant_groupwise, qat_finetune_batch

    rng = np.random.default_rng(5)
    n, s, d = 2, 24, 4
    w0 = rng.standard_normal((n, 1, 16)).astype(np.float32)
    b0 = rng.standard_normal((n, 16)).astype(np.float32)
    # Layers 1..: pre-project onto the int8_g32 grid so STE is a no-op there.
    w1 = np.asarray(fake_quant_groupwise(
        jnp.asarray(rng.standard_normal((n, 16, d)).astype(np.float32)),
        group=32, bits=8,
    ))
    b1 = rng.standard_normal((n, d)).astype(np.float32)
    targets = rng.standard_normal((n, s, d)).astype(np.float32)
    _, losses_skip = qat_finetune_batch(
        [(w0, b0), (w1, b1)], targets, omega=30.0, fm_mult=64.0,
        epochs=1, group=32, bits=8, skip_first=True,
    )
    # Reference loss: plain fp32 forward on the same params.
    from nerf_attention_tpu.models.siren import positions, siren_apply_maybe_fm
    from nerf_attention_tpu.parallel.sweep import _resolve_sin

    pos = positions(s)
    sin = _resolve_sin("fast")
    pred = np.asarray(
        jax.vmap(
            lambda p0w, p0b, p1w, p1b: siren_apply_maybe_fm(
                [(p0w, p0b), (p1w, p1b)], 30.0, 64.0, pos, sin=sin
            )
        )(jnp.asarray(w0), jnp.asarray(b0), jnp.asarray(w1), jnp.asarray(b1))
    )
    want = float(np.mean((pred - targets) ** 2))
    # fp32 accumulation-order noise only (measured ~3e-5 on this batch).
    assert abs(float(losses_skip[0]) - want) < 1e-3
    # Without skip_first the same batch carries layer-0 projection error.
    _, losses_full = qat_finetune_batch(
        [(w0, b0), (w1, b1)], targets, omega=30.0, fm_mult=64.0,
        epochs=1, group=32, bits=8, skip_first=False,
    )
    assert abs(float(losses_full[0]) - want) > 1e-2


def test_parameterized_fake_quant_matches_numpy_grid():
    """The jax QAT projection must share the numpy storage grid for every
    (bits, group), not just the int4 default."""
    import jax.numpy as jnp

    from nerf_attention_tpu.ops.qat import fake_quant_groupwise

    rng = np.random.default_rng(8)
    w = rng.standard_normal((70, 16)).astype(np.float32)
    for scheme, bits, group in (("int3_g64", 3, 64), ("int8_g32", 8, 32)):
        _, dq_np = quantize_array(w, scheme, axis=1)
        dq_jax = np.asarray(fake_quant_groupwise(jnp.asarray(w), group, bits))
        np.testing.assert_allclose(dq_jax, dq_np, atol=1e-7)


def test_dead_groups_quantize_finite():
    """An all-zero (or sub-fp16-subnormal) weight group must not round its
    fp16 scale to zero: the numpy dequant would divide by zero and the jax
    QAT twin would NaN-poison the whole batched fine-tune through the
    shared mean loss. Both grids clamp at fp16's smallest normal — and
    stay bit-identical to each other."""
    import warnings

    import jax.numpy as jnp

    from nerf_attention_tpu.ops.qat import fake_quant_groupwise

    w = np.zeros((64, 8), np.float32)
    w[0, 0] = 1e-9  # one sub-representable straggler in a dead group
    w[40, 3] = 2.0  # one live group for contrast
    for scheme, bits, group in (("int4", 4, 32), ("int8_g32", 8, 32)):
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # any divide/invalid warns -> fail
            payload, dq_np = quantize_array(w, scheme, axis=1)
        assert np.isfinite(dq_np).all()
        assert np.isfinite(payload["scale"].astype(np.float32)).all()
        assert (payload["scale"].astype(np.float32) > 0).all()
        dq_jax = np.asarray(fake_quant_groupwise(jnp.asarray(w), group, bits))
        assert np.isfinite(dq_jax).all()
        np.testing.assert_array_equal(dq_jax, dq_np)


def test_qat_checkpoint_batch_rejects_mixed_forwards():
    """qat_finetune_checkpoints must refuse a batch that mixes FM and
    shared-omega nets — stacking them would fine-tune every net after the
    first with the wrong forward, silently."""
    from nerf_attention_tpu.ops.qat import qat_finetune_checkpoints

    def entry(fm):
        return {
            "ckpt": {
                "params": _params(),
                "config": CONFIG,
                "fm_mult": fm,
                "target_mean": np.zeros((1, 8), np.float32),
                "target_std": np.ones((1, 8), np.float32),
            },
            "original": np.zeros((4, 8), np.float32),
        }

    with pytest.raises(ValueError, match="mixes forwards"):
        qat_finetune_checkpoints([entry(None), entry(64.0)], "int4", 1)


def test_int4_fake_quant_matches_numpy_grid():
    """The jax QAT projection and the numpy storage path must share one
    grid — otherwise QAT optimizes against a grid that is never stored."""
    import jax.numpy as jnp

    from nerf_attention_tpu.ops.qat import fake_quant_int4
    from nerf_attention_tpu.ops.quantize import quantize_array

    rng = np.random.default_rng(3)
    for shape in ((1, 8), (50, 16), (64, 32)):
        w = rng.standard_normal(shape).astype(np.float32)
        _, dq_np = quantize_array(w, "int4", axis=w.ndim - 1)
        dq_jax = np.asarray(fake_quant_int4(jnp.asarray(w)))
        np.testing.assert_allclose(dq_jax, dq_np, atol=1e-7)
    # Batched leaves quantize per-network identically.
    wb = rng.standard_normal((3, 50, 16)).astype(np.float32)
    batched = np.asarray(fake_quant_int4(jnp.asarray(wb)))
    for i in range(3):
        _, dq_np = quantize_array(wb[i], "int4", axis=1)
        np.testing.assert_allclose(batched[i], dq_np, atol=1e-7)


def test_qat_repairs_int4_quality():
    """A short straight-through fine-tune must recover reconstruction lost
    to plain post-training int4 rounding."""
    import jax.numpy as jnp

    from nerf_attention_tpu.ops.qat import qat_finetune_batch
    from nerf_attention_tpu.parallel.sweep import (
        cosine_similarity,
        fit_batch,
        normalize_targets,
    )

    rng = np.random.default_rng(4)
    t = np.linspace(0, 1, 128, dtype=np.float32)[:, None]
    targets = np.stack(
        [
            (np.sin(2 * np.pi * (3 + i) * t) * np.ones((1, 8))
             + 0.1 * rng.standard_normal((128, 8))).astype(np.float32)
            for i in range(2)
        ]
    )
    batch = fit_batch(targets, CONFIG, epochs=400, seed=0)

    tn = np.stack([
        np.asarray(normalize_targets(jnp.asarray(x))[0]) for x in targets
    ])

    def int4_cos(params_batched):
        from nerf_attention_tpu.models.siren import positions, siren_apply

        cos = []
        for i in range(2):
            per_net = [(np.asarray(w)[i], np.asarray(b)[i]) for w, b in params_batched]
            _, dq = quantize_params(per_net, "int4")
            jp = [(jnp.asarray(w), jnp.asarray(b)) for w, b in dq]
            pred = siren_apply(jp, CONFIG.omega_0, positions(128))
            cos.append(float(np.mean(np.asarray(
                cosine_similarity(pred, jnp.asarray(tn[i]))
            ))))
        return np.mean(cos)

    before = int4_cos(batch.params)
    tuned, losses = qat_finetune_batch(
        batch.params, tn, omega=CONFIG.omega_0, epochs=150
    )
    after = int4_cos(tuned)
    assert np.isfinite(np.asarray(losses)).all()
    assert after > before + 0.002, (before, after)


def test_quantization_experiment(tmp_path, figqa):
    """End-to-end on a tiny fit: fp32 matches checkpoint quality, lossy
    schemes stay close and report higher compression."""
    from nerf_attention_tpu.experiments.quantized_params import (
        plot_quantized_pareto,
        run_quantization_experiment,
    )
    from nerf_attention_tpu.fit import fit_kv_cache
    from nerf_attention_tpu.synthetic import generate_synthetic_kv

    kv_dir = tmp_path / "kv"
    fits = tmp_path / "fits"
    generate_synthetic_kv(
        seq_len=64, num_layers=3, num_kv_heads=1, head_dim=16,
        output_dir=kv_dir, verbose=False,
    )
    fit_kv_cache(kv_dir, fits, epochs=200, quick=True, verbose=False)

    results = run_quantization_experiment(
        fits, kv_dir, tmp_path / "out", verbose=False
    )
    by_scheme = {
        s: [r for r in results if r["scheme"] == s] for s in SCHEMES
    }
    n_ckpts = len(by_scheme["fp32"])
    assert n_ckpts > 0 and all(len(v) == n_ckpts for v in by_scheme.values())

    for fp32_rec in by_scheme["fp32"]:
        peers = {
            r["scheme"]: r for r in results if r["name"] == fp32_rec["name"]
        }
        # Storage ordering is exact: int8 < bf16 == fp16 < fp32 bytes.
        assert peers["int8"]["stored_bytes"] < peers["bf16"]["stored_bytes"]
        assert peers["bf16"]["stored_bytes"] == peers["fp16"]["stored_bytes"]
        assert peers["bf16"]["stored_bytes"] < peers["fp32"]["stored_bytes"]
        assert peers["bf16"]["compression_ratio"] == pytest.approx(
            2 * fp32_rec["compression_ratio"]
        )
        # Lossy rounding must not collapse the reconstruction.
        for scheme in ("bf16", "fp16", "int8"):
            assert (
                abs(peers[scheme]["final_cosine_mean"] - fp32_rec["final_cosine_mean"])
                < 0.05
            )
        # int4 is the frontier point: best compression of any scheme, and
        # the QAT pass (same payload size) must not be WORSE than plain
        # post-training rounding.
        assert peers["int4"]["stored_bytes"] < peers["int8"]["stored_bytes"]
        assert peers["int4_qat"]["stored_bytes"] == peers["int4"]["stored_bytes"]
        assert (
            peers["int4_qat"]["final_cosine_mean"]
            >= peers["int4"]["final_cosine_mean"] - 0.005
        )
        assert peers["int4_qat"]["qat_epochs"] == 300

    data = json.loads((tmp_path / "out" / "quantization_results.json").read_text())
    assert len(data) == len(results)

    # Parameterized frontier schemes run through the same driver: a custom
    # scheme list with a non-default QAT grid prices denser than int4 and
    # fine-tunes against its own grid.
    frontier = run_quantization_experiment(
        fits, kv_dir, tmp_path / "out2",
        schemes=(
            "fp32", "int4", "int3_g64", "int3_g64_qat",
            "int4_l0fp32", "int4_l0fp32_qat",
        ),
        qat_epochs=50, verbose=False,
    )
    by = {s: [r for r in frontier if r["scheme"] == s] for s in
          ("fp32", "int4", "int3_g64", "int3_g64_qat",
           "int4_l0fp32", "int4_l0fp32_qat")}
    assert all(len(v) == n_ckpts for v in by.values())
    assert by["int3_g64"][0]["stored_bytes"] < by["int4"][0]["stored_bytes"]
    # _l0fp32 flows through the experiment + its QAT pass: slightly larger
    # payload than the base grid, quality not meaningfully worse (exact
    # layer 0 can differ from rounded by luck on a tiny shared-omega fit).
    assert by["int4_l0fp32"][0]["stored_bytes"] > by["int4"][0]["stored_bytes"]
    assert (
        by["int4_l0fp32"][0]["final_cosine_mean"]
        >= by["int4"][0]["final_cosine_mean"] - 0.01
    )
    assert (
        by["int4_l0fp32_qat"][0]["stored_bytes"]
        == by["int4_l0fp32"][0]["stored_bytes"]
    )
    assert (
        by["int3_g64_qat"][0]["stored_bytes"] == by["int3_g64"][0]["stored_bytes"]
    )
    import numpy as _np
    assert _np.mean(
        [r["final_cosine_mean"] for r in by["int3_g64_qat"]]
    ) >= _np.mean([r["final_cosine_mean"] for r in by["int3_g64"]]) - 0.005

    with pytest.raises(ValueError, match="QAT"):
        run_quantization_experiment(
            fits, kv_dir, tmp_path / "out3", schemes=("fp16_qat",), verbose=False
        )
    plot_quantized_pareto(frontier, tmp_path / "figs2")
    figqa(tmp_path / "figs2" / "quantized_pareto.png")

    plot_quantized_pareto(results, tmp_path / "figs")
    figqa(tmp_path / "figs" / "quantized_pareto.png")
