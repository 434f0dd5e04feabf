"""Synthetic KV generator: determinism, shapes, and bit-parity with the
reference recipe (a direct per-element oracle of extract.py:202-234)."""

import numpy as np

from nerf_attention_tpu.io import kvstore
from nerf_attention_tpu.synthetic import generate_synthetic_kv


def _reference_recipe_oracle(seq_len, num_layers, num_kv_heads, head_dim):
    """Straight-line transcription of the reference's draw/accumulate order,
    used as an independent oracle for the vectorized implementation."""
    t = np.linspace(0, 1, seq_len)
    out = {}
    for layer_idx in range(num_layers):
        layer_sharpness = 1.0 + 2.0 * (layer_idx / max(num_layers - 1, 1))
        keys = np.zeros((num_kv_heads, seq_len, head_dim), dtype=np.float32)
        values = np.zeros((num_kv_heads, seq_len, head_dim), dtype=np.float32)
        for head_idx in range(num_kv_heads):
            rng = np.random.RandomState(layer_idx * num_kv_heads + head_idx)
            for d in range(head_dim):
                freq1, freq2 = rng.uniform(1, 5), rng.uniform(3, 10)
                base = 0.5 * np.sin(2 * np.pi * freq1 * t) + 0.3 * np.cos(
                    2 * np.pi * freq2 * t
                )
                freq_mid = rng.uniform(10, 30)
                mid = 0.2 * np.sin(2 * np.pi * freq_mid * t + rng.uniform(0, 2 * np.pi))
                spikes = np.zeros(seq_len)
                for _ in range(int(3 * layer_sharpness)):
                    pos = rng.randint(0, seq_len)
                    width = rng.randint(1, max(2, int(5 / layer_sharpness)))
                    amp = rng.uniform(0.5, 2.0)
                    for offset in range(-width, width + 1):
                        if 0 <= pos + offset < seq_len:
                            spikes[pos + offset] += amp * np.exp(
                                -0.5 * (offset / max(1, width / 2)) ** 2
                            )
                noise = rng.randn(seq_len) * 0.1
                keys[head_idx, :, d] = (base + mid + spikes + noise).astype(np.float32)
                v_base = 0.6 * np.sin(2 * np.pi * rng.uniform(1, 8) * t)
                values[head_idx, :, d] = (v_base + rng.randn(seq_len) * 0.15).astype(
                    np.float32
                )
        out[layer_idx] = (keys, values)
    return out


def test_bit_parity_with_reference_recipe(tmp_path):
    kv_dir = tmp_path / "kv"
    generate_synthetic_kv(
        seq_len=64, num_layers=3, num_kv_heads=2, head_dim=5,
        output_dir=kv_dir, verbose=False,
    )
    oracle = _reference_recipe_oracle(64, 3, 2, 5)
    for layer_idx in range(3):
        keys, values = kvstore.load_layer(kv_dir, layer_idx)
        ok, ov = oracle[layer_idx]
        np.testing.assert_array_equal(keys, ok)
        np.testing.assert_array_equal(values, ov)


def test_determinism(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    for d in (a, b):
        generate_synthetic_kv(
            seq_len=32, num_layers=2, num_kv_heads=2, head_dim=4,
            output_dir=d, verbose=False,
        )
    ka, _ = kvstore.load_layer(a, 1)
    kb, _ = kvstore.load_layer(b, 1)
    np.testing.assert_array_equal(ka, kb)


def test_metadata_and_shapes(tiny_kv_dir):
    metadata = kvstore.load_metadata(tiny_kv_dir)
    assert metadata.model_name == "synthetic"
    assert (metadata.num_layers, metadata.num_kv_heads) == (4, 2)
    assert (metadata.seq_len, metadata.head_dim) == (128, 16)
    keys, values = kvstore.load_layer(tiny_kv_dir, 0)
    assert keys.shape == values.shape == (2, 128, 16)
    assert keys.dtype == np.float32


def test_values_smoother_than_keys(tiny_kv_dir):
    """Values are a single smooth sine + noise; keys add spikes + mid-freq.
    Lag-1 autocorrelation should reflect that (the recipe's design goal) —
    clearest at the last layer, where key spikes are sharpest/densest."""
    keys, values = kvstore.load_layer(tiny_kv_dir, 3)

    def lag1(sig):
        s = sig - sig.mean()
        return float((s[:-1] * s[1:]).sum() / (s**2).sum())

    k_ac = np.mean([lag1(keys[0, :, d]) for d in range(16)])
    v_ac = np.mean([lag1(values[0, :, d]) for d in range(16)])
    assert v_ac > k_ac


def test_hard_values_keep_keys_bit_identical(tmp_path):
    ref_dir, hard_dir = tmp_path / "ref", tmp_path / "hard"
    for d, mode in ((ref_dir, "reference"), (hard_dir, "hard")):
        generate_synthetic_kv(
            seq_len=64, num_layers=2, num_kv_heads=2, head_dim=4,
            output_dir=d, verbose=False, values_mode=mode,
        )
    for layer_idx in range(2):
        k_ref, v_ref = kvstore.load_layer(ref_dir, layer_idx)
        k_hard, v_hard = kvstore.load_layer(hard_dir, layer_idx)
        np.testing.assert_array_equal(k_ref, k_hard)
        assert not np.array_equal(v_ref, v_hard)
    assert kvstore.load_metadata(hard_dir).model_name == "synthetic_hard_v2"


def test_hard_values_deterministic(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    for d in (a, b):
        generate_synthetic_kv(
            seq_len=32, num_layers=2, num_kv_heads=1, head_dim=4,
            output_dir=d, verbose=False, values_mode="hard",
        )
    _, va = kvstore.load_layer(a, 1)
    _, vb = kvstore.load_layer(b, 1)
    np.testing.assert_array_equal(va, vb)


def test_invalid_values_mode_raises(tmp_path):
    import pytest

    with pytest.raises(ValueError, match="values_mode"):
        generate_synthetic_kv(
            seq_len=16, num_layers=1, num_kv_heads=1, head_dim=2,
            output_dir=tmp_path / "x", verbose=False, values_mode="spicy",
        )


def test_hard_values_reproduce_kv_gap(tmp_path):
    """The study's central structural finding — keys fit much better than
    values (reference FINDINGS.md:216-217) — appears on hard-mode synthetic
    caches: medium-SIREN keys beat values by a wide margin, and hard values
    have much lower lag-1 autocorrelation than keys."""
    from nerf_attention_tpu.parallel.sweep import fit_batch
    from nerf_attention_tpu.types import CONFIGS_BY_NAME

    kv_dir = tmp_path / "kv"
    generate_synthetic_kv(
        seq_len=512, num_layers=4, num_kv_heads=1, head_dim=32,
        output_dir=kv_dir, verbose=False, values_mode="hard",
    )
    keys, values = kvstore.load_layer(kv_dir, 2)

    def lag1(sig):
        s = sig - sig.mean()
        return float((s[:-1] * s[1:]).sum() / (s**2).sum())

    k_ac = np.mean([lag1(keys[0, :, d]) for d in range(32)])
    v_ac = np.mean([lag1(values[0, :, d]) for d in range(32)])
    assert v_ac < k_ac - 0.2, (k_ac, v_ac)

    batch = fit_batch(
        np.stack([keys[0], values[0]]),
        CONFIGS_BY_NAME["medium"], epochs=500, seed=0,
    )
    key_cos, value_cos = np.asarray(batch.cosine_mean)
    assert key_cos - value_cos >= 0.08, (key_cos, value_cos)


def test_ensure_synthetic_cache_policy(tmp_path):
    """Reuse-or-regenerate policy: same-recipe reuse, other-recipe
    regenerate, real-model caches NEVER clobbered."""
    from nerf_attention_tpu.synthetic import ensure_synthetic_cache
    from nerf_attention_tpu.types import KVMetadata

    kw = dict(seq_len=32, num_layers=2, num_kv_heads=1, head_dim=8, verbose=False)
    kv_dir = tmp_path / "kv"

    meta = ensure_synthetic_cache(kv_dir, values_mode="reference", **kw)
    assert meta.model_name == "synthetic"
    keys_before, _ = kvstore.load_layer(kv_dir, 0)
    marker = (kv_dir / "layer_00.npz").stat().st_mtime_ns

    # Same recipe: reused, not regenerated.
    meta = ensure_synthetic_cache(kv_dir, values_mode="reference", **kw)
    assert (kv_dir / "layer_00.npz").stat().st_mtime_ns == marker

    # Other recipe: regenerated (values change, keys stay parity-exact).
    meta = ensure_synthetic_cache(kv_dir, values_mode="hard", **kw)
    assert meta.model_name == "synthetic_hard_v2"
    keys_after, _ = kvstore.load_layer(kv_dir, 0)
    np.testing.assert_array_equal(keys_before, keys_after)

    # Real-model cache: reused untouched, never overwritten.
    real_dir = tmp_path / "real"
    generate_synthetic_kv(output_dir=real_dir, **kw)
    real_meta = KVMetadata(
        model_name="unsloth/Llama-3.1-8B", num_layers=2, num_kv_heads=1,
        seq_len=32, head_dim=8, actual_tokens=32,
    )
    kvstore.save_metadata(real_dir, real_meta)
    real_marker = (real_dir / "layer_00.npz").stat().st_mtime_ns
    meta = ensure_synthetic_cache(real_dir, values_mode="hard", **kw)
    assert meta.model_name == "unsloth/Llama-3.1-8B"
    assert (real_dir / "layer_00.npz").stat().st_mtime_ns == real_marker


def test_mxu_bf16_requires_pallas_impl():
    """mxu='bf16' on a resolved-XLA path must error, not silently run fp32."""
    import pytest

    from nerf_attention_tpu.parallel.sweep import fit_batch
    from nerf_attention_tpu.types import SIRENConfig

    targets = np.random.default_rng(0).standard_normal((2, 32, 8)).astype(np.float32)
    with pytest.raises(ValueError, match="pallas"):
        fit_batch(targets, SIRENConfig(16, 1, 30.0, "t"), epochs=2,
                  impl="xla", mxu="bf16")


def test_prompt_signal_profile_anchors():
    """Ordinary prose lands near unit scales; a degenerate prompt shifts
    both axes (more repetition -> more carrier, less entropy -> less
    noise). Empty text is the neutral profile."""
    from nerf_attention_tpu.synthetic import prompt_signal_profile

    prose = (
        "The lighthouse keeper watched the storm roll in from the west, "
        "counting the seconds between flashes while the gulls wheeled "
        "overhead and the radio crackled with warnings for small craft."
    )
    pc, pn = prompt_signal_profile(prose)
    assert 0.85 <= pc <= 1.15, pc
    assert 0.85 <= pn <= 1.15, pn

    dc, dn = prompt_signal_profile("aaa " * 400)
    assert dc > pc + 0.1, (dc, pc)
    assert dn < pn - 0.3, (dn, pn)

    assert prompt_signal_profile("") == (1.0, 1.0)


def test_content_scales_shift_fit_quality(tmp_path):
    """The experiment can FAIL now: a degenerate prompt's scales (strong
    carrier, weak noise) produce a measurably easier value signal than
    ordinary prose's — fit CosSim moves with content, keys stay
    bit-identical."""
    from nerf_attention_tpu.parallel.sweep import fit_batch
    from nerf_attention_tpu.synthetic import prompt_signal_profile
    from nerf_attention_tpu.types import CONFIGS_BY_NAME

    dc, dn = prompt_signal_profile("aaa " * 400)  # degenerate: ~ (1.3, 0.57)
    kw = dict(seq_len=512, num_layers=1, num_kv_heads=1, head_dim=16,
              verbose=False, values_mode="hard")
    generate_synthetic_kv(output_dir=tmp_path / "prose", **kw)
    generate_synthetic_kv(
        output_dir=tmp_path / "degen", carrier_scale=dc, noise_scale=dn, **kw
    )

    k_p, v_p = kvstore.load_layer(tmp_path / "prose", 0)
    k_d, v_d = kvstore.load_layer(tmp_path / "degen", 0)
    np.testing.assert_array_equal(k_p, k_d)  # keys: content-independent
    assert not np.array_equal(v_p, v_d)

    meta = kvstore.load_metadata(tmp_path / "degen")
    assert meta.model_name == f"synthetic_hard_v2_c{dc:.4f}_n{dn:.4f}"

    batch = fit_batch(
        np.stack([v_p[0], v_d[0]]),
        CONFIGS_BY_NAME["medium"], epochs=500, seed=0,
    )
    prose_cos, degen_cos = np.asarray(batch.cosine_mean)
    assert degen_cos > prose_cos + 0.05, (prose_cos, degen_cos)


def test_content_scales_rejected_in_reference_mode(tmp_path):
    import pytest

    with pytest.raises(ValueError, match="bit-parity"):
        generate_synthetic_kv(
            seq_len=16, num_layers=1, num_kv_heads=1, head_dim=2,
            output_dir=tmp_path / "x", verbose=False,
            values_mode="reference", noise_scale=0.5,
        )
