"""Bit-packed quantized checkpoint storage: io/quantized.py + compress CLI.

The contract under test: what `save_quantized_siren_checkpoint` persists
dequantizes BIT-IDENTICALLY to the in-memory `quantize_params(..)[1]` view
(the exact grid the quantization experiment priced), the stored array bytes
equal `param_bytes`'s accounting, and the file loads through the standard
`load_siren_checkpoint` dispatch so every downstream consumer works
unmodified.
"""

import json

import jax
import numpy as np
import pytest

from nerf_attention_tpu.io.checkpoint import (
    checkpoint_glob,
    load_siren_checkpoint,
)
from nerf_attention_tpu.io.quantized import (
    pack_codes,
    save_quantized_siren_checkpoint,
    unpack_codes,
)
from nerf_attention_tpu.models.siren import init_siren
from nerf_attention_tpu.ops.quantize import param_bytes, quantize_params
from nerf_attention_tpu.types import SIRENConfig

CONFIG = SIRENConfig(48, 2, 30.0, "t48")

# Every storage family: float schemes, per-channel int8, group-wise grids
# (including a group that does not divide the 48-row reduction axis).
SCHEMES = ("fp32", "bf16", "fp16", "int8", "int8_g32", "int4", "int4_g128",
           "int3_g64", "int2_g32", "int8_g32_l0fp32", "fp16_l0fp32")


def _params(seed: int = 0):
    return [
        (np.asarray(w), np.asarray(b))
        for w, b in init_siren(jax.random.PRNGKey(seed), CONFIG, out_features=8)
    ]


@pytest.mark.parametrize("bits", [2, 3, 4, 5, 8])
def test_pack_unpack_roundtrip(bits):
    qmax = (1 << (bits - 1)) - 1
    rng = np.random.default_rng(bits)
    codes = rng.integers(-qmax, qmax + 1, size=999).astype(np.int8)
    packed = pack_codes(codes, bits)
    assert packed.dtype == np.uint8
    assert packed.size == -(-codes.size * bits // 8)  # dense: ceil(n*B/8)
    np.testing.assert_array_equal(unpack_codes(packed, bits, codes.size), codes)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_saved_checkpoint_dequantizes_bit_identically(tmp_path, scheme):
    params = _params()
    _, dq_want = quantize_params(params, scheme)
    path = save_quantized_siren_checkpoint(
        tmp_path / "L0_H0_key_t48_model.npz", params, scheme, CONFIG,
        out_features=8, target_mean=np.zeros(8, np.float32),
        target_std=np.ones(8, np.float32), metrics={"name": "t"},
    )
    ckpt = load_siren_checkpoint(path)
    assert ckpt["scheme"] == scheme
    for (w_want, b_want), (w_got, b_got) in zip(dq_want, ckpt["params"]):
        np.testing.assert_array_equal(np.asarray(w_want), np.asarray(w_got))
        np.testing.assert_array_equal(np.asarray(b_want), np.asarray(b_got))


@pytest.mark.parametrize(
    "scheme", ["int4_g128", "int3_g64", "int8", "fp16", "int8_g32_l0fp32"]
)
def test_stored_array_bytes_match_param_bytes_accounting(tmp_path, scheme):
    """The npz's parameter arrays must cost exactly what param_bytes
    charges — the on-disk artifact IS the claimed compression."""
    params = _params()
    path = save_quantized_siren_checkpoint(
        tmp_path / "m.npz", params, scheme, CONFIG, out_features=8,
        target_mean=np.zeros(8, np.float32), target_std=np.ones(8, np.float32),
        metrics={},
    )
    with np.load(path) as data:
        stored = sum(
            data[k].nbytes
            for k in data.files
            if k not in ("__meta__", "target_mean", "target_std")
        )
    assert stored == param_bytes(params, scheme)


def test_fm_mult_and_metrics_survive_roundtrip(tmp_path):
    params = _params()
    metrics = {"name": "L3_H1_value_t48", "layer": 3, "head": 1,
               "kv_type": "value", "final_cosine_mean": 0.91}
    path = save_quantized_siren_checkpoint(
        tmp_path / "L3_H1_value_t48_model.npz", params, "int4_g128", CONFIG,
        out_features=8, target_mean=np.full(8, 0.5, np.float32),
        target_std=np.full(8, 2.0, np.float32), metrics=metrics, fm_mult=64.0,
    )
    ckpt = load_siren_checkpoint(path)
    assert ckpt["fm_mult"] == 64.0
    assert ckpt["metrics"] == metrics
    assert ckpt["config"].hidden_features == CONFIG.hidden_features
    np.testing.assert_array_equal(ckpt["target_mean"], np.full(8, 0.5, np.float32))
    # Quantized files share the *_model stem convention, so the standard
    # glob (and hence evaluate/aggregate-decode) discovers them.
    assert checkpoint_glob(tmp_path) == [path]


def test_bf16_storage_is_two_bytes_and_matches_rounding(tmp_path):
    params = _params()
    _, dq_want = quantize_params(params, "bf16")
    path = save_quantized_siren_checkpoint(
        tmp_path / "m.npz", params, "bf16", CONFIG, out_features=8,
        target_mean=np.zeros(8, np.float32), target_std=np.ones(8, np.float32),
        metrics={},
    )
    with np.load(path) as data:
        assert data["w_0"].dtype == np.uint16
    ckpt = load_siren_checkpoint(path)
    np.testing.assert_array_equal(
        np.asarray(dq_want[0][0]), np.asarray(ckpt["params"][0][0])
    )


def test_compress_cli_end_to_end(tmp_path):
    """fits dir -> compress --qat -> quantized dir verified by reload."""
    from nerf_attention_tpu.compress import main as compress_main
    from nerf_attention_tpu.io.checkpoint import save_siren_checkpoint
    from nerf_attention_tpu.io import kvstore

    rng = np.random.default_rng(0)
    seq_len, d_head, heads, layers = 64, 8, 2, 1
    kv_dir = tmp_path / "kv"
    keys = rng.standard_normal((layers, heads, seq_len, d_head)).astype(np.float32)
    values = rng.standard_normal((layers, heads, seq_len, d_head)).astype(np.float32)
    kvstore.save_layer(kv_dir, 0, keys[0], values[0])

    fits = tmp_path / "fits"
    from nerf_attention_tpu.parallel.sweep import fit_batch

    targets = keys[0]  # (heads, seq, d)
    result = fit_batch(targets, CONFIG, epochs=20, lr=1e-4, seed=0)
    for h in range(heads):
        params = [(np.asarray(w[h]), np.asarray(b[h])) for w, b in result.params]
        save_siren_checkpoint(
            fits / f"L0_H{h}_key_t48_model.npz", params, CONFIG, d_head,
            result.target_mean[h], result.target_std[h],
            {"name": f"L0_H{h}_key_t48", "layer": 0, "head": h,
             "kv_type": "key"},
        )

    # Sweep sidecar: two stored records + one non-checkpointed config the
    # quantized dir must NOT claim to contain.
    sweep_records = [
        {"name": f"L0_H{h}_key_t48", "layer": 0, "head": h, "kv_type": "key",
         "config_name": "t48", "final_cosine_mean": 0.99, "final_mse": 0.01,
         "final_cosine_min": 0.9, "final_cosine_std": 0.01,
         "raw_size_bytes": seq_len * d_head * 2, "siren_size_bytes": 99999,
         "compression_ratio": 0.01, "seq_len": seq_len, "d_head": d_head}
        for h in range(heads)
    ] + [{"name": "L0_H0_key_tiny", "config_name": "tiny",
          "raw_size_bytes": 1, "siren_size_bytes": 1}]
    (fits / "fit_results.json").write_text(json.dumps(sweep_records))

    out = tmp_path / "fits_q"
    compress_main([
        "--siren_dir", str(fits), "--out_dir", str(out),
        "--scheme", "int4_g32", "--qat", "--qat_epochs", "5",
        "--kv_dir", str(kv_dir),
    ])
    manifest = json.loads((out / "compress_manifest.json").read_text())
    assert manifest["scheme"] == "int4_g32"
    assert len(manifest["checkpoints"]) == heads
    assert manifest["param_compression_vs_fp32"] > 4.0
    assert "verified_cosine_mean" in manifest
    # Drop-in: the quantized dir globs and loads like the original.
    files = checkpoint_glob(out)
    assert len(files) == heads
    ckpt = load_siren_checkpoint(files[0])
    assert ckpt["scheme"] == "int4_g32"
    assert ckpt["params"][0][0].dtype == np.float32
    # The carried-over fit_results.json is filtered to stored checkpoints
    # and re-priced: sizes/ratios reflect the quantized payload, quality
    # fields the verified reloaded reconstruction (not the fp32 sweep's).
    sidecar = json.loads((out / "fit_results.json").read_text())
    assert {r["name"] for r in sidecar} == {
        f"L0_H{h}_key_t48" for h in range(heads)
    }
    for rec, man in zip(
        sorted(sidecar, key=lambda r: r["name"]),
        sorted(manifest["checkpoints"], key=lambda r: r["name"]),
    ):
        assert rec["storage_scheme"] == "int4_g32" and rec["qat"] is True
        assert rec["siren_size_bytes"] == man["stored_param_bytes"]
        assert rec["final_cosine_mean"] == man["verified_cosine_mean"]
        assert rec["final_mse"] == man["verified_mse"]
        assert rec["compression_ratio"] == pytest.approx(
            rec["raw_size_bytes"] / man["stored_param_bytes"]
        )


def test_compress_preserves_fm_through_qat(tmp_path):
    """The FM deployment point (FINDINGS: FM ships at int8-g32) must keep
    fm_mult through the QAT repair and the stored file — an FM net decoded
    shared-omega is a different network."""
    from nerf_attention_tpu.compress import main as compress_main
    from nerf_attention_tpu.io.checkpoint import save_siren_checkpoint
    from nerf_attention_tpu.io import kvstore

    rng = np.random.default_rng(1)
    seq_len, d_head = 64, 8
    kv_dir = tmp_path / "kv"
    keys = rng.standard_normal((1, seq_len, d_head)).astype(np.float32)
    values = rng.standard_normal((1, seq_len, d_head)).astype(np.float32)
    kvstore.save_layer(kv_dir, 0, keys, values)

    fits = tmp_path / "fits"
    save_siren_checkpoint(
        fits / "L0_H0_key_t48_model.npz", _params(), CONFIG, d_head,
        np.zeros(d_head, np.float32), np.ones(d_head, np.float32),
        {"name": "L0_H0_key_t48", "layer": 0, "head": 0, "kv_type": "key"},
        fm_mult=16.0,
    )
    out = tmp_path / "fits_q"
    compress_main([
        "--siren_dir", str(fits), "--out_dir", str(out),
        "--scheme", "int8_g32", "--qat", "--qat_epochs", "3",
        "--kv_dir", str(kv_dir),
    ])
    ckpt = load_siren_checkpoint(out / "L0_H0_key_t48_model.npz")
    assert ckpt["fm_mult"] == 16.0
    assert ckpt["scheme"] == "int8_g32"


def test_qat_requires_groupwise_int_scheme(tmp_path):
    from nerf_attention_tpu.compress import main as compress_main

    with pytest.raises(SystemExit):
        compress_main([
            "--siren_dir", str(tmp_path), "--out_dir", str(tmp_path / "o"),
            "--scheme", "fp16", "--qat", "--kv_dir", str(tmp_path),
        ])
