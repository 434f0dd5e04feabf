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
