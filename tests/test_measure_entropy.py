"""measure-entropy: the --entropy_json producer for serve-plan --fits."""

import json

import numpy as np
import pytest

from nerf_attention_tpu.measure_entropy import main, measure_model_entropy
from nerf_attention_tpu.models.llama_jax import LlamaConfig, init_random_llama


def _tiny():
    config = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
    )
    return config, init_random_llama(config, seed=0)


def test_measure_model_entropy_shape_range_determinism():
    config, params = _tiny()
    ids = np.random.RandomState(0).randint(0, config.vocab_size, 48)
    ent = measure_model_entropy(config, params, ids, n_queries=4)
    assert ent.shape == (2, 2)
    # attention entropy over <= 48 rows is bounded by ln(48)
    assert np.all(ent > 0.0) and np.all(ent <= np.log(48) + 1e-6)
    again = measure_model_entropy(config, params, ids, n_queries=4)
    np.testing.assert_allclose(ent, again, rtol=0, atol=0)
    with pytest.raises(ValueError, match="n_queries"):
        measure_model_entropy(config, params, ids, n_queries=0)


def test_cli_random_init_writes_serve_plan_compatible_json(tmp_path):
    out = tmp_path / "entropy.json"
    main(
        [
            "--random_init", "--seq_len", "48", "--queries", "4",
            "--layers", "2", "--heads", "4", "--kv_heads", "2",
            "--head_dim", "16", "--hidden", "64", "--intermediate", "128",
            "--vocab", "128",
            "--out", str(out),
        ]
    )
    data = json.loads(out.read_text())
    arr = np.asarray(data["entropy_nats"])
    assert arr.shape == (2, 2)
    assert data["uniform_entropy_nats"] == pytest.approx(np.log(48))
    assert data["layer_windows"] == [0, 0]  # windowless hermetic model

    # the dense layout feeds straight into serve_plan's loader
    from nerf_attention_tpu.serve_plan import load_entropy_json

    ent = load_entropy_json(out)
    assert set(ent) == {(0, 0), (0, 1), (1, 0), (1, 1)}
    assert ent[(1, 0)] == arr[1, 0]


def test_cli_rejects_ambiguous_source():
    with pytest.raises(SystemExit):
        main(["--out", "x.json"])  # neither --model nor --random_init
    with pytest.raises(SystemExit):
        main(["--model", "m", "--random_init", "--out", "x.json"])


def test_cli_rejects_cross_mode_flags():
    # geometry flags belong to --random_init; --text belongs to --model
    with pytest.raises(SystemExit):
        main(["--model", "m", "--layers", "4", "--out", "x.json"])
    with pytest.raises(SystemExit):
        main(["--model", "m", "--seed", "1", "--out", "x.json"])
    with pytest.raises(SystemExit):
        main(["--random_init", "--text", "t.txt", "--out", "x.json"])
    with pytest.raises(SystemExit):  # queries must fit the prefix
        main(["--random_init", "--seq_len", "8", "--queries", "9",
              "--out", "x.json"])


def test_measure_model_entropy_sink_stats():
    """Sink models: the triple return carries cache-conditional stats
    consistent with the entropy identity; a sink-boosted head's cache
    mass must drop without moving other heads' stats."""
    config = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, attn_sinks=True,
    )
    params = init_random_llama(config, seed=0)
    ids = np.random.RandomState(0).randint(0, config.vocab_size, 48)
    ent, cache_ent, cache_mass = measure_model_entropy(
        config, params, ids, n_queries=4, sink_stats=True
    )
    for a in (ent, cache_ent, cache_mass):
        assert a.shape == (2, 2)
    assert np.all((cache_mass >= 0.0) & (cache_mass <= 1.0))
    assert np.all(cache_ent >= 0.0)
    # 2-tuple contract unchanged without the flag
    ent_only = measure_model_entropy(config, params, ids, n_queries=4)
    np.testing.assert_allclose(ent_only, ent)

    import jax.numpy as jnp

    boosted = {**params, "layers": dict(params["layers"])}
    sinks = np.asarray(boosted["layers"]["sinks"]).copy()
    sinks[1, 2:] += 30.0  # kv head 1 of layer 1 (GQA group = heads 2,3)
    boosted["layers"]["sinks"] = jnp.asarray(sinks)
    _, _, cm2 = measure_model_entropy(
        config, boosted, ids, n_queries=4, sink_stats=True
    )
    assert cm2[1, 1] < 0.01
    np.testing.assert_allclose(cm2[0], cache_mass[0], atol=1e-5)
    np.testing.assert_allclose(cm2[1, 0], cache_mass[1, 0], atol=1e-5)


def test_cli_sinks_writes_cache_fields_and_serve_plan_consumes(tmp_path):
    out = tmp_path / "entropy.json"
    main(
        [
            "--random_init", "--sinks", "--seq_len", "48", "--queries", "4",
            "--layers", "2", "--heads", "4", "--kv_heads", "2",
            "--head_dim", "16", "--hidden", "64", "--intermediate", "128",
            "--vocab", "128",
            "--out", str(out),
        ]
    )
    data = json.loads(out.read_text())
    assert data["attn_sinks"] is True
    for field in ("cache_entropy_nats", "cache_mass", "sink_mass"):
        assert np.asarray(data[field]).shape == (2, 2)
    np.testing.assert_allclose(
        np.asarray(data["cache_mass"]) + np.asarray(data["sink_mass"]), 1.0
    )

    from nerf_attention_tpu.serve_plan import load_entropy_json

    cm = load_entropy_json(out, field="cache_mass")
    assert set(cm) == {(0, 0), (0, 1), (1, 0), (1, 1)}

    # --sinks is a random_init knob; checkpoints carry their own config
    with pytest.raises(SystemExit):
        main(["--model", "/nonexistent", "--sinks"])


def test_cli_mla_random_init_per_layer_units(tmp_path):
    """MLA path (round 5): one entropy column per LAYER (the latent is
    shared by every head), latent-dim byte context included, and the
    output loads through serve_plan's entropy reader."""
    out = tmp_path / "mla_entropy.json"
    main(
        [
            "--mla_random_init", "--seq_len", "48", "--queries", "4",
            "--layers", "3", "--heads", "4", "--hidden", "64",
            "--intermediate", "128", "--vocab", "128", "--head_dim", "16",
            "--out", str(out),
        ]
    )
    data = json.loads(out.read_text())
    assert data["mla_latent"] is True
    assert np.asarray(data["entropy_nats"]).shape == (3, 1)
    assert data["latent_dim"] > 0
    assert data["raw_latent_fp16_bytes_per_layer"] == 48 * data["latent_dim"] * 2
    assert all(0 < e[0] <= np.log(48) + 1e-6 for e in data["entropy_nats"])

    from nerf_attention_tpu.serve_plan import load_entropy_json

    ent = load_entropy_json(out)
    assert set(ent) == {(0, 0), (1, 0), (2, 0)}

    # cross-mode flags rejected
    with pytest.raises(SystemExit):
        main(["--mla_random_init", "--sinks"])
    with pytest.raises(SystemExit):
        main(["--mla_random_init", "--random_init"])
