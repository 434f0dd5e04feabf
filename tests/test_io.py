"""kvstore + checkpoint round-trips, including reference .pt interop."""

import numpy as np
import pytest

from nerf_attention_tpu.io import checkpoint, kvstore
from nerf_attention_tpu.types import KVMetadata, SIRENConfig


def test_kvstore_roundtrip(tmp_path, rng):
    keys = rng.standard_normal((2, 16, 4)).astype(np.float32)
    values = rng.standard_normal((2, 16, 4)).astype(np.float32)
    kvstore.save_layer(tmp_path, 3, keys, values)
    k, v = kvstore.load_layer(tmp_path, 3)
    np.testing.assert_array_equal(k, keys)
    np.testing.assert_array_equal(v, values)
    assert kvstore.has_layer(tmp_path, 3)
    assert not kvstore.has_layer(tmp_path, 4)


def test_kvstore_reads_reference_pt_format(tmp_path, rng):
    """A cache extracted by the reference (torch.save) loads transparently."""
    torch = pytest.importorskip("torch")
    keys = rng.standard_normal((2, 8, 4)).astype(np.float32)
    values = rng.standard_normal((2, 8, 4)).astype(np.float32)
    torch.save(
        {"keys": torch.from_numpy(keys), "values": torch.from_numpy(values)},
        tmp_path / "layer_00.pt",
    )
    k, v = kvstore.load_layer(tmp_path, 0)
    np.testing.assert_array_equal(k, keys)
    np.testing.assert_array_equal(v, values)


def test_metadata_roundtrip(tmp_path):
    md = KVMetadata("m", 4, 2, 128, 16, 100)
    kvstore.save_metadata(tmp_path, md)
    loaded = kvstore.load_metadata(tmp_path)
    assert loaded == md
    # from_dict tolerates extra keys (forward compat, reference types.py:61-63)
    assert KVMetadata.from_dict({**md.to_dict(), "extra": 1}) == md


def test_checkpoint_roundtrip(tmp_path, rng):
    config = SIRENConfig(8, 1, 25.0, "t")
    params = [
        (rng.standard_normal((1, 8)).astype(np.float32), rng.standard_normal(8).astype(np.float32)),
        (rng.standard_normal((8, 8)).astype(np.float32), rng.standard_normal(8).astype(np.float32)),
        (rng.standard_normal((8, 4)).astype(np.float32), rng.standard_normal(4).astype(np.float32)),
    ]
    mean = rng.standard_normal((1, 4)).astype(np.float32)
    std = np.abs(rng.standard_normal((1, 4))).astype(np.float32)
    metrics = {"name": "x", "layer": 0, "final_cosine_mean": 0.9}

    path = checkpoint.save_siren_checkpoint(
        tmp_path / "x_model.npz", params, config, 4, mean, std, metrics
    )
    ckpt = checkpoint.load_siren_checkpoint(path)
    assert ckpt["config"] == config
    assert ckpt["out_features"] == 4
    assert ckpt["metrics"] == metrics
    np.testing.assert_array_equal(ckpt["target_mean"], mean)
    np.testing.assert_array_equal(ckpt["target_std"], std)
    for (w, b), (w2, b2) in zip(params, ckpt["params"]):
        np.testing.assert_array_equal(w, w2)
        np.testing.assert_array_equal(b, b2)

    assert checkpoint.checkpoint_glob(tmp_path) == [path]
