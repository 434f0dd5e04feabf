"""Shared-basis study tool (`tools/shared_basis_study.py`).

One tiny end-to-end CLI run: independent baselines and both shared-trunk
regimes fit, byte accounting is coherent (frozen trunk strictly cheaper
per unit than trained at the same width; trained cheaper than a plain
net of the same width would be at U>1), and the artifact/figure land.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_shared_basis_study_cli(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}".rstrip(":")
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "tools" / "shared_basis_study.py"),
            "--output_dir", str(tmp_path),
            "--seq_len", "64", "--layers", "4", "--heads", "4",
            "--head_dim", "16", "--layer", "2", "--cross_layer", "1",
            "--epochs", "20", "--widths", "32", "--configs", "tiny",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=570,
    )
    assert proc.returncode == 0, (
        f"study failed\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    res = json.loads((tmp_path / "shared_basis_study.json").read_text())
    assert (tmp_path / "shared_basis_study.png").exists()

    # both kv sides, every leg present
    assert {r["kv"] for r in res["independent"]} == {"keys", "values"}
    assert {r["group"] for r in res["shared"]} == {"L2", "L2+L1"}

    by_key = {
        (r["kv"], r["group"], r["trunk_width"], r["trainable_trunk"]): r
        for r in res["shared"]
    }
    trained = by_key[("keys", "L2", 32, True)]
    frozen = by_key[("keys", "L2", 32, False)]
    # frozen trunk stores only the head; trained amortizes trunk over U
    assert frozen["bytes_per_unit"] < trained["bytes_per_unit"]
    assert frozen["head_params_per_unit"] * 2.0 == frozen["bytes_per_unit"]
    assert trained["bytes_per_unit"] == (
        frozen["bytes_per_unit"] + trained["trunk_params"] * 2.0 / 4
    )
    # cross-layer group doubles U, so the trained trunk amortizes further
    cross = by_key[("keys", "L2+L1", 32, True)]
    assert cross["n_units"] == 8 and trained["n_units"] == 4
    assert cross["bytes_per_unit"] < trained["bytes_per_unit"]
    for r in res["independent"] + res["shared"]:
        assert -1.0 <= r["cosine_mean"] <= 1.0
