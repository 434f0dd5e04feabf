"""Hermetic end-to-end run of the plan-rollout study (tiny shapes, CPU).

The study composes serve_plan.build_tiered_plan + llama_decode_rollout +
the quantized-resident decode kernel; this test asserts the artifact
contract and the physics-level sanity (costs non-negative, more budget
serves more units, measured rollout cost within an order of magnitude of
the per-step prediction at a non-trivial cut).
"""

import json

from tools.plan_rollout_study import main


def test_plan_rollout_study_tiny(tmp_path):
    out = tmp_path / "plan_rollout.json"
    main(
        [
            "--out", str(out),
            "--seq_len", "64",
            "--rollout_tokens", "6",
            "--budgets", "0.02", "0.2",
            "--seeds", "0",
            "--epochs", "60",
            "--config", "tiny",
            "--timing_reps", "1",
        ]
    )
    data = json.loads(out.read_text())
    assert data["study"] == "plan_rollout"
    (seed,) = data["seeds"]
    assert set(seed["solo_costs"]) == {"master", "int8_g32", "int4_g128"}
    assert all(c >= 0 for c in seed["solo_costs"]["master"])

    rows = seed["budgets"]
    assert [r["cost_target"] for r in rows] == [0.02, 0.2]
    assert rows[0]["n_served"] <= rows[1]["n_served"]
    for r in rows:
        assert 0.0 <= r["rollout_mean_cost"] <= 2.0
        assert len(r["per_step_cosine"]) == 6
        assert r["tokens_per_s"] > 0
        if r["n_served"]:
            # multi-token drift stays the per-step algebra's order of
            # magnitude (measured band on-chip: ~0.9-1.2x)
            assert 0.1 <= r["measured_over_predicted"] <= 10.0
    assert seed["full_swap_mean_cost"] >= rows[0]["rollout_mean_cost"] - 1e-6
    for leg in seed["recon_legs"]:
        assert leg["resident_bytes"] > 0
        assert leg["recon_ms"] >= 0


def test_plan_rollout_study_hybrid_leg(tmp_path):
    """--hybrid: the served set of the top-budget plan runs as a zero-
    prefix-cache hybrid rollout; parity vs the buffer-swap twin must be
    ~exact (same softmax rows), and the HBM accounting must favor the
    hybrid only through its tail/resident terms."""
    out = tmp_path / "plan_rollout_hybrid.json"
    main(
        [
            "--out", str(out),
            "--seq_len", "64",
            "--rollout_tokens", "4",
            "--budgets", "0.2",
            "--seeds", "0",
            "--epochs", "60",
            "--config", "tiny",
            "--timing_reps", "1",
            "--schemes", "master", "int8_g32",
            "--hybrid",
        ]
    )
    data = json.loads(out.read_text())
    (seed,) = data["seeds"]
    legs = seed["hybrid_legs"]
    assert [leg["scheme"] for leg in legs] == ["fp32", "int8_g32"]
    for leg in legs:
        assert leg["n_served"] > 0
        assert leg["parity_cos_vs_buffer_swap_min"] > 0.9999
        assert leg["tokens_per_s"] > 0
        assert leg["hbm_bytes_full"] > 0
        # HBM accounting identity (s=64, T=4, d=32 fp32 rows; the byte
        # formula itself is unit-tested in test_llama_hybrid)
        n_units = 8 * 4
        row = 32 * 4
        n_uns = n_units - leg["n_served"]
        assert leg["hbm_bytes_full"] == 2 * n_units * (64 + 4) * row
        assert leg["hbm_bytes_hybrid"] == (
            leg["resident_param_bytes"]
            + 2 * n_uns * (64 + 4) * row
            + 2 * leg["n_served"] * 4 * row
        )
