"""MLA latent-vs-materialized study tool (`tools/mla_latent_study.py`).

One tiny end-to-end CLI run: both SIREN strategies fit and decode, the
no-fit latent baselines price the architecture's own compression, and
the latent-fp16 baseline must sit at ~perfect output cosine (the latent
is a lossless surface; fp16 rounding is the only error).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_mla_latent_study_cli(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}".rstrip(":")
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "tools" / "mla_latent_study.py"),
            "--output_dir", str(tmp_path),
            "--seq_len", "64", "--epochs", "20",
            "--layers", "2", "--heads", "4",
            "--configs", "tiny",
            "--latent_schemes", "fp16,int8,int4_g32",
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
    res = json.loads((tmp_path / "mla_latent_study.json").read_text())
    assert (tmp_path / "mla_latent_study.png").exists()

    # geometry accounting: latent is smaller than materialized per token
    m = res["model"]
    assert m["latent_dim"] < m["materialized_per_token"]
    assert res["raw_latent_fp16_bytes_per_layer"] < (
        res["raw_materialized_fp16_bytes_per_layer"]
    )

    # the lossless surface: fp16 latent decodes at ~1.0
    assert res["baselines"]["latent_fp16"]["output_cosine"] > 0.999
    assert res["baselines"]["latent_int8"]["output_cosine"] > 0.99
    # the quantized-latent ladder: compression strictly grows down it
    comps = [
        res["baselines"][f"latent_{s}"]["compression_vs_raw_fp16"]
        for s in ("fp16", "int8", "int4_g32")
    ]
    assert comps == sorted(comps) and comps[0] < comps[-1]
    # byte accounting matches the shared serializer helper
    from nerf_attention_tpu.ops.quantize import tensor_bytes

    m = res["model"]
    assert res["baselines"]["latent_int4_g32"]["stored_bytes_per_layer"] == (
        tensor_bytes((m["seq_len"], m["latent_dim"]), "int4_g32", axis=1)
    )

    for name in ("materialized", "latent"):
        rows = res["strategies"][name]
        assert [r["config"] for r in rows] == ["tiny"]
        for r in rows:
            assert -1.0 <= r["output_cosine"] <= 1.0
            assert r["stored_bytes_per_layer"] > 0
    # per layer: 2*H materialized nets vs ONE latent net (wider output
    # head, so not exactly 2*H*bytes, but far smaller)
    mat = res["strategies"]["materialized"][0]["stored_bytes_per_layer"]
    lat = res["strategies"]["latent"][0]["stored_bytes_per_layer"]
    assert mat > 3 * lat

    # --- round-5 planner surface: per-layer latent units + executed plan ---
    units = res["latent_units"]
    assert len(units) == 2  # --layers 2
    for u in units:
        assert u["raw_bytes"] == res["raw_latent_fp16_bytes_per_layer"]
        assert {o["scheme"] for o in u["options"]} == {
            "fp16", "int8", "int4_g32"
        }
        for o in u["options"]:
            assert o["cost"] >= 0 and o["stored_bytes"] > 0
            assert -1.0 <= o["latent_cosine"] <= 1.0
    assert len(res["layer_entropy_nats"]) == 2
    for v in res["tiered_plan_validation_latent"]:
        assert v["measured_cost"] >= 0
        # executed composed plan stays within an order of magnitude of the
        # solo-cost sum whenever anything was served
        if v["n_served"] and v["predicted_cost"] > 1e-5:
            assert 0.05 <= v["measured_over_predicted"] <= 20.0

    # the units artifact round-trips through serve-plan --latent_json
    units_path = tmp_path / "mla_latent_units.json"
    assert units_path.exists()
    from nerf_attention_tpu.serve_plan import main as serve_plan_main

    plan_path = tmp_path / "latent_plan.json"
    serve_plan_main(
        [
            "--latent_json", str(units_path),
            "--cost_target", "0.05", "--out", str(plan_path),
        ]
    )
    plan = json.loads(plan_path.read_text())
    assert plan["mla_latent"] is True
    assert plan["n_units"] == 2
