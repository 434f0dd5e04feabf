"""Quantized warm-restart study tool: end-to-end CLI on tiny shapes.

Guards `tools/quantized_sustain_study.py` — the bridge between the storage
frontier (compress/QAT, reference analogue `/root/reference/nerf_attention/
experiments/` quantization extras) and the incremental-refit experiment:
can a server warm-restart a growing cache from the DEQUANTIZED stored
payload, or does it need the fp32 master?
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from nerf_attention_tpu.io import kvstore
from nerf_attention_tpu.types import KVMetadata

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture
def grown_cache(tmp_path):
    """A 1-layer cache at the FINAL length; prefixes are earlier states."""
    rng = np.random.default_rng(3)
    final_len, d_head, heads = 96, 8, 1
    kv_dir = tmp_path / "kv"
    t = np.linspace(0, 1, final_len)[:, None]
    keys = (
        np.sin(2 * np.pi * 3 * t) + 0.1 * rng.standard_normal((final_len, d_head))
    )[None].repeat(heads, 0).astype(np.float32)
    values = rng.standard_normal((heads, final_len, d_head)).astype(np.float32)
    kvstore.save_layer(kv_dir, 0, keys, values)
    kvstore.save_metadata(
        kv_dir,
        KVMetadata(
            model_name="test",
            num_layers=1,
            num_kv_heads=heads,
            seq_len=final_len,
            head_dim=d_head,
            actual_tokens=final_len,
        ),
    )
    return kv_dir


def test_sustain_study_cli(tmp_path, grown_cache):
    out = tmp_path / "sustain.json"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}".rstrip(":")
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "tools" / "quantized_sustain_study.py"),
            "--kv_dir", str(grown_cache),
            "--out", str(out),
            "--layer", "0", "--max_heads", "1",
            "--start_len", "64", "--chunk", "16",
            "--epochs_full", "50", "--warm_epochs", "40", "--qat_epochs", "5",
            "--scheme", "int4_g32",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=570,
    )
    assert proc.returncode == 0, (
        f"sustain study failed\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    results = json.loads(out.read_text())
    assert results["scheme"] == "int4_g32"
    assert results["start_len"] == 64 and results["grown_len"] == 80
    assert set(results["starts"]) == {"master", "stored", "stored_qat"}
    for name, rec in results["starts"].items():
        # Every start is a valid CosSim and training never ends below a
        # freshly-initialized net's typical opening point.
        assert -1.0 <= rec["start_cosine"] <= 1.0, name
        assert -1.0 <= rec["final_cosine"] <= 1.0, name
        assert rec["final_cosine"] >= rec["start_cosine"] - 0.05, name
        if rec["epochs_to_parity"] is not None:
            assert 0 <= rec["epochs_to_parity"] < 40
    # The dequantized starts must come out of the SAME basin as the master:
    # at int4 group-wise the stored view opens within rounding error of it.
    master0 = results["starts"]["master"]["start_cosine"]
    assert abs(results["starts"]["stored"]["start_cosine"] - master0) < 0.1
