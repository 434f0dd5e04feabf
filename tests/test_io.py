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


def _reference_format_checkpoint(tmp_path, rng, torch):
    """A *_model.pt exactly as the reference's _save_model writes it
    (reference fit.py:121-137): torch state_dict with network.{i}.linear.*
    sine layers and a final plain network.{n}.* Linear, (out, in) weights."""
    config = SIRENConfig(8, 1, 30.0, "medium")
    d_out = 4
    state = {}
    # SIREN-scale weights (first layer U(+-1/in), later U(+-sqrt(6/in)/w0))
    # keep sine arguments moderate; float32 sin(x) for |x| >> 100 differs
    # between torch and XLA by ULP-of-argument effects, which real
    # checkpoints never hit.
    hidden_bound = np.sqrt(6.0 / 8) / 30.0
    torch_layers = [(1, 8, 1.0), (8, 8, hidden_bound)]
    for i, (d_in, width, bound) in enumerate(torch_layers):
        state[f"network.{i}.linear.weight"] = torch.from_numpy(
            rng.uniform(-bound, bound, (width, d_in)).astype(np.float32)
        )
        state[f"network.{i}.linear.bias"] = torch.from_numpy(
            rng.uniform(-bound, bound, width).astype(np.float32)
        )
    state["network.2.weight"] = torch.from_numpy(
        rng.uniform(-hidden_bound, hidden_bound, (d_out, 8)).astype(np.float32)
    )
    state["network.2.bias"] = torch.from_numpy(
        rng.uniform(-hidden_bound, hidden_bound, d_out).astype(np.float32)
    )
    payload = {
        "model_state": state,
        "config": {
            "hidden_features": config.hidden_features,
            "hidden_layers": config.hidden_layers,
            "omega_0": config.omega_0,
            "name": config.name,
            "out_features": d_out,
        },
        "target_mean": torch.from_numpy(
            rng.standard_normal((1, d_out)).astype(np.float32)
        ),
        "target_std": torch.from_numpy(
            np.abs(rng.standard_normal((1, d_out))).astype(np.float32) + 0.1
        ),
        "metrics": {"name": "L0_H0_key_medium", "layer": 0},
    }
    path = tmp_path / "L0_H0_key_medium_model.pt"
    torch.save(payload, path)
    return path, state, config


def test_checkpoint_reads_reference_pt_format(tmp_path, rng):
    """Reference torch checkpoints load and forward-match a torch replay."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from nerf_attention_tpu.models.siren import siren_apply

    path, state, config = _reference_format_checkpoint(tmp_path, rng, torch)
    ckpt = checkpoint.load_siren_checkpoint(path)
    assert ckpt["config"] == config
    assert ckpt["out_features"] == 4
    assert ckpt["metrics"]["name"] == "L0_H0_key_medium"
    assert [w.shape for w, _ in ckpt["params"]] == [(1, 8), (8, 8), (8, 4)]

    # Forward equivalence: JAX apply on the loaded params vs an explicit
    # torch replay of the reference forward (sin(w0 * linear) ... linear).
    pos = np.linspace(0, 1, 16, dtype=np.float32)[:, None]
    ours = np.asarray(siren_apply(ckpt["params"], config.omega_0, jnp.asarray(pos)))
    h = torch.from_numpy(pos)
    for i in range(2):
        h = torch.sin(
            config.omega_0
            * (h @ state[f"network.{i}.linear.weight"].T + state[f"network.{i}.linear.bias"])
        )
    theirs = (h @ state["network.2.weight"].T + state["network.2.bias"]).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_save_torch_checkpoint_reference_format(tmp_path, rng):
    """The .pt writer emits the reference's exact payload: it loads back
    through OUR reference-format reader, and its state_dict loads into a
    faithfully reconstructed torch SIREN (the reference's own
    load_state_dict path) with a matching forward."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from nerf_attention_tpu.models.siren import init_siren, siren_apply

    config = SIRENConfig(8, 1, 30.0, "medium")
    import jax

    params = [
        (np.asarray(w), np.asarray(b))
        for w, b in init_siren(jax.random.PRNGKey(3), config, out_features=4)
    ]
    mean = rng.standard_normal((1, 4)).astype(np.float32)
    std = (np.abs(rng.standard_normal((1, 4))) + 0.1).astype(np.float32)
    metrics = {"name": "L0_H0_key_medium", "layer": 0, "head": 0, "kv_type": "key"}

    path = checkpoint.save_torch_siren_checkpoint(
        tmp_path / "L0_H0_key_medium_model.pt", params, config, 4, mean, std, metrics
    )
    assert path is not None

    # Round trip through our reference-format reader.
    ckpt = checkpoint.load_siren_checkpoint(path)
    assert ckpt["config"] == config and ckpt["out_features"] == 4
    for (w, b), (w2, b2) in zip(params, ckpt["params"]):
        np.testing.assert_array_equal(w, w2)
        np.testing.assert_array_equal(b, b2)

    # The reference's loader contract: weights_only load + strict
    # load_state_dict into an nn.Sequential shaped like reference siren.py.
    payload = torch.load(path, map_location="cpu", weights_only=True)
    assert set(payload) == {"model_state", "config", "target_mean", "target_std", "metrics"}
    assert payload["target_mean"].shape == (1, 4)

    class _Sine(torch.nn.Module):
        def __init__(self, d_in, d_out):
            super().__init__()
            self.linear = torch.nn.Linear(d_in, d_out)

        def forward(self, x):
            return torch.sin(config.omega_0 * self.linear(x))

    model = torch.nn.Sequential(_Sine(1, 8), _Sine(8, 8), torch.nn.Linear(8, 4))
    # Strict by default: any key/shape mismatch with the reference module
    # structure would raise here.
    incompat = model.load_state_dict(
        {k.replace("network.", ""): v for k, v in payload["model_state"].items()}
    )
    assert not incompat.missing_keys and not incompat.unexpected_keys

    pos = np.linspace(0, 1, 16, dtype=np.float32)[:, None]
    with torch.no_grad():
        theirs = model(torch.from_numpy(pos)).numpy()
    ours = np.asarray(siren_apply(ckpt["params"], config.omega_0, jnp.asarray(pos)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_export_layer_torch_reference_format(tmp_path, rng):
    """Exported layer_NN.pt matches the reference extraction payload."""
    torch = pytest.importorskip("torch")
    keys = rng.standard_normal((2, 16, 4)).astype(np.float32)
    values = rng.standard_normal((2, 16, 4)).astype(np.float32)
    kvstore.save_layer(tmp_path, 3, keys, values)
    path = kvstore.export_layer_torch(tmp_path, 3)
    assert path.name == "layer_03.pt"
    data = torch.load(path, map_location="cpu", weights_only=True)
    assert set(data) == {"keys", "values"}
    np.testing.assert_array_equal(data["keys"].numpy(), keys)
    np.testing.assert_array_equal(data["values"].numpy(), values)


def test_checkpoint_glob_mixes_npz_and_pt(tmp_path, rng):
    torch = pytest.importorskip("torch")
    pt_path, _, config = _reference_format_checkpoint(tmp_path, rng, torch)
    npz_path = checkpoint.save_siren_checkpoint(
        tmp_path / "L1_H0_key_medium_model.npz",
        [(np.ones((1, 8), np.float32), np.zeros(8, np.float32))],
        config, 8, np.zeros((1, 8), np.float32), np.ones((1, 8), np.float32),
        {"name": "n"},
    )
    found = checkpoint.checkpoint_glob(tmp_path)
    assert set(found) == {pt_path, npz_path}
    assert checkpoint.checkpoint_glob(tmp_path, "*medium_model") == found
    # Suffixed patterns keep their exact meaning.
    assert checkpoint.checkpoint_glob(tmp_path, "*_model.pt") == [pt_path]
