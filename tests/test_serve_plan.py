"""serve_plan: the greedy head-serving planner (SERVING.md section 4).

Hermetic — synthetic policy artifacts and fit records only; the planner's
math is checked against the two-factor law formula and the exact
``param_bytes`` storage accounting.
"""

import json

import numpy as np
import pytest

from nerf_attention_tpu.serve_plan import (
    DEFAULT_LAW,
    build_plan,
    build_tiered_plan,
    law_cost,
    load_entropy_json,
    main,
    tiered_units_from_policy_json,
    units_from_fits,
    units_from_policy_json,
)


def _unit(layer, head, cost, raw=1000, stored=100):
    return {
        "layer": layer,
        "kv_head": head,
        "entropy_nats": 5.0,
        "proxy": 0.9,
        "cost": cost,
        "cost_source": "measured_solo",
        "raw_bytes": raw,
        "stored_bytes": stored,
    }


def test_build_plan_orders_by_cost_and_cuts_at_target():
    units = [
        _unit(0, 0, 0.004),
        _unit(0, 1, 0.001),
        _unit(1, 0, 0.1),
        _unit(1, 1, 0.002),
    ]
    plan = build_plan(units, cost_target=0.01)
    got = [(r["layer"], r["kv_head"]) for r in plan["plan"]]
    assert got == [(0, 1), (1, 1), (0, 0), (1, 0)]
    # 0.001 + 0.002 + 0.004 = 0.007 <= 0.01; adding 0.1 crosses
    assert plan["n_served"] == 3
    assert plan["predicted_cost_at_cut"] == pytest.approx(0.007)
    assert plan["predicted_output_cosine_at_cut"] == pytest.approx(0.993)
    assert plan["raw_bytes_served"] == 3000
    assert plan["stored_bytes_served"] == 300
    assert plan["net_bytes_saved"] == 2700
    cums = [r["cumulative_cost"] for r in plan["plan"]]
    assert cums == sorted(cums)
    assert [r["serve"] for r in plan["plan"]] == [True, True, True, False]


def test_build_plan_safety_tightens_the_cut():
    units = [_unit(0, 0, 0.004), _unit(0, 1, 0.004), _unit(0, 2, 0.004)]
    assert build_plan(units, cost_target=0.01)["n_served"] == 2
    assert build_plan(units, cost_target=0.01, safety=2.0)["n_served"] == 1


def test_law_cost_matches_formula_and_clamps():
    h, proxy = 4.0, 0.8
    expect = np.exp(
        DEFAULT_LAW["intercept"]
        + DEFAULT_LAW["entropy_slope"] * h
        + DEFAULT_LAW["log1mproxy_slope"] * np.log(1 - proxy)
    )
    assert law_cost(h, proxy, DEFAULT_LAW) == pytest.approx(expect)
    # extreme inputs clamp to the cosine-distance ceiling, never explode
    assert law_cost(0.0, 0.0, DEFAULT_LAW) <= 2.0
    assert law_cost(20.0, 1.0, DEFAULT_LAW) == pytest.approx(0.0, abs=1e-12)


def _fit_records():
    recs = []
    for layer, head, kc, vc in [(0, 0, 0.95, 0.70), (8, 1, 0.90, 0.60)]:
        for kv, cos in (("key", kc), ("value", vc)):
            recs.append(
                {
                    "name": f"L{layer}_H{head}_{kv}_medium",
                    "layer": layer,
                    "head": head,
                    "kv_type": kv,
                    "config_name": "medium",
                    "hidden_features": 256,
                    "hidden_layers": 2,
                    "omega_0": 30.0,
                    "final_cosine_mean": cos,
                    "raw_size_bytes": 2048 * 128 * 2,
                    "d_head": 128,
                }
            )
    # a decoy config the planner must ignore
    recs.append({**recs[0], "name": "L0_H0_key_tiny", "config_name": "tiny",
                 "hidden_features": 64, "hidden_layers": 1})
    return recs


def test_units_from_fits_prices_by_the_law():
    entropy = {(0, 0): 6.0, (8, 1): 2.0}
    units = units_from_fits(_fit_records(), entropy)
    assert len(units) == 2
    by = {(u["layer"], u["kv_head"]): u for u in units}
    u0 = by[(0, 0)]
    assert u0["proxy"] == pytest.approx(0.825)
    assert u0["cost"] == pytest.approx(
        float(law_cost(6.0, 0.825, DEFAULT_LAW))
    )
    assert u0["cost_source"] == "law_predicted"
    assert u0["raw_bytes"] == 2 * 2048 * 128 * 2
    # fp32 storage = (1*256+256 + 2*(256*256+256) + 256*128+128) * 4 * 2 nets
    n_params = (256 + 256) + 2 * (256 * 256 + 256) + (256 * 128 + 128)
    assert u0["stored_bytes"] == 2 * n_params * 4
    # the sharp low-proxy unit must be priced strictly more expensive
    assert by[(8, 1)]["cost"] > u0["cost"]


def test_units_from_fits_rejects_missing_inputs():
    with pytest.raises(ValueError, match="lacks measured entropies"):
        units_from_fits(_fit_records(), {(0, 0): 6.0})
    half = [r for r in _fit_records() if r["kv_type"] == "key"]
    with pytest.raises(ValueError, match="missing a key or value"):
        units_from_fits(half, {(0, 0): 6.0, (8, 1): 2.0})
    with pytest.raises(ValueError, match="no fit records"):
        units_from_fits(_fit_records(), {}, config_name="deep")


def _policy_artifact():
    units = []
    rng = np.random.RandomState(0)
    for layer in range(2):
        for head in range(2):
            units.append(
                {
                    "layer": layer,
                    "kv_head": head,
                    "entropy_nats": float(rng.uniform(2, 8)),
                    "key_fit_cosine": 0.9,
                    "value_fit_cosine": 0.7,
                    "solo_cost": float(rng.uniform(0, 0.02)),
                    "solo_output_cosine": 1.0,
                }
            )
    return {
        "units": units,
        "payloads": {
            "master": {
                "stored_bytes_per_unit": 500,
                "raw_bytes_per_unit": 4000,
            },
            "int8_g32": {
                "stored_bytes_per_unit": 150,
                "raw_bytes_per_unit": 4000,
            },
        },
    }


def test_units_from_policy_json_reads_measured_costs_and_schemes():
    art = _policy_artifact()
    units = units_from_policy_json(art)
    assert [u["cost"] for u in units] == [
        max(u["solo_cost"], 0.0) for u in art["units"]
    ]
    assert units[0]["stored_bytes"] == 500
    q = units_from_policy_json(art, scheme="int8_g32")
    assert q[0]["stored_bytes"] == 150
    with pytest.raises(ValueError, match="not in the policy artifact"):
        units_from_policy_json(art, scheme="int4_g128")


def _tiered_artifact():
    """4 units; int8 tier costs 10x the master tier's solo cost."""
    art = _policy_artifact()
    master_costs = [0.0005, 0.001, 0.002, 0.1]
    for u, c in zip(art["units"], master_costs):
        u["solo_cost"] = c
    art["payloads"]["master"]["solo_cost"] = master_costs
    art["payloads"]["int8_g32"]["solo_cost"] = [10 * c for c in master_costs]
    return art


def test_tiered_units_need_per_scheme_solo_costs():
    art = _policy_artifact()  # no per-scheme solo_cost arrays
    with pytest.raises(ValueError, match="lack per-scheme solo costs"):
        tiered_units_from_policy_json(art)
    with pytest.raises(ValueError, match="not in the policy artifact"):
        tiered_units_from_policy_json(_tiered_artifact(), schemes=["int4"])
    with pytest.raises(ValueError, match="no storage schemes selected"):
        tiered_units_from_policy_json(_tiered_artifact(), schemes=[])
    units = tiered_units_from_policy_json(_tiered_artifact())
    assert len(units) == 4
    assert {o["scheme"] for o in units[0]["options"]} == {"master", "int8_g32"}
    assert units[0]["options"][1]["cost"] == pytest.approx(0.005)


def test_build_tiered_plan_degrades_tier_before_dropping():
    units = tiered_units_from_policy_json(_tiered_artifact())
    # target 0.02: int8 fits units 0+1 (0.005+0.01=0.015); unit 2's int8
    # (0.02) would cross, but its master tier (0.002) fits; unit 3 (0.1)
    # stays raw even at master.
    plan = build_tiered_plan(units, cost_target=0.02)
    assert plan["tiered"] is True
    schemes = [r["scheme"] for r in plan["plan"]]
    assert schemes == ["int8_g32", "int8_g32", "master", None]
    assert plan["n_served"] == 3
    assert plan["predicted_cost_at_cut"] == pytest.approx(0.017)
    assert plan["raw_bytes_served"] == 3 * 4000
    assert plan["stored_bytes_served"] == 150 + 150 + 500
    # vs the flat MASTER plan at the same target: same units served, but
    # tiered ships two of them compressed — strictly more bytes saved
    flat_master = build_plan(
        units_from_policy_json(_tiered_artifact(), scheme="master"),
        cost_target=0.02,
    )
    assert flat_master["n_served"] == plan["n_served"] == 3
    assert plan["net_bytes_saved"] > flat_master["net_bytes_saved"]
    # the flat int8 plan UNDERPRICES its payload (flat mode reuses the
    # master-measured solo costs): it also serves 3, but the true int8
    # cost of that prefix (0.035) exceeds the target — the measured
    # per-scheme costs in tiered mode are what catch this, and the flat
    # plan must at least carry the warning
    flat_int8 = build_plan(
        units_from_policy_json(_tiered_artifact(), scheme="int8_g32"),
        cost_target=0.02,
    )
    true_int8_cost = sum(
        10 * r["cost"] for r in flat_int8["plan"] if r["serve"]
    )
    assert flat_int8["n_served"] == 3 and true_int8_cost > 0.02
    assert any("MASTER-measured" in c for c in flat_int8["caveats"])
    assert not any("MASTER-measured" in c for c in flat_master["caveats"])


def test_build_tiered_plan_serves_before_compressing():
    """A smallest-bytes-first greedy would spend the budget on unit A's
    compressed tier (0.009) and strand unit B raw; serve-first must take
    both at their cheap tiers instead (more raw bytes freed)."""
    units = [
        {
            "layer": 0, "kv_head": 0, "entropy_nats": 5.0, "proxy": 0.9,
            "raw_bytes": 4000,
            "options": [
                {"scheme": "int8", "cost": 0.009, "stored_bytes": 150},
                {"scheme": "master", "cost": 0.001, "stored_bytes": 500},
            ],
        },
        {
            "layer": 0, "kv_head": 1, "entropy_nats": 5.0, "proxy": 0.9,
            "raw_bytes": 4000,
            "options": [
                {"scheme": "master", "cost": 0.002, "stored_bytes": 500},
            ],
        },
    ]
    plan = build_tiered_plan(units, cost_target=0.01)
    assert plan["n_served"] == 2
    assert [r["scheme"] for r in plan["plan"]] == ["master", "master"]
    assert plan["net_bytes_saved"] == 2 * 4000 - 2 * 500
    # with head-room the upgrade phase compresses unit A after serving both
    roomy = build_tiered_plan(units, cost_target=0.02)
    assert [r["scheme"] for r in roomy["plan"]] == ["int8", "master"]
    assert roomy["predicted_cost_at_cut"] == pytest.approx(0.011)


def test_cli_tiered_mode(tmp_path):
    policy = tmp_path / "head_policy_results.json"
    policy.write_text(json.dumps(_tiered_artifact()))
    out = tmp_path / "plan.json"
    main(
        [
            "--policy_json", str(policy), "--tiered",
            "--cost_target", "0.02", "--out", str(out),
        ]
    )
    plan = json.loads(out.read_text())
    assert plan["tiered"] is True
    assert plan["n_served"] == 3
    # --scheme subsets the tiers in tiered mode
    main(
        [
            "--policy_json", str(policy), "--tiered", "--scheme", "master",
            "--cost_target", "0.02", "--out", str(out),
        ]
    )
    only_master = json.loads(out.read_text())
    assert {r["scheme"] for r in only_master["plan"] if r["serve"]} == {
        "master"
    }
    with pytest.raises(SystemExit):  # tiered needs measured costs
        main(["--fits", "x.json", "--entropy_json", "y.json", "--tiered"])


def test_load_entropy_json_both_layouts(tmp_path):
    dense = tmp_path / "dense.json"
    dense.write_text(json.dumps({"entropy_nats": [[1.0, 2.0], [3.0, 4.0]]}))
    sparse = tmp_path / "sparse.json"
    sparse.write_text(
        json.dumps({"units": [{"layer": 5, "kv_head": 1, "entropy_nats": 6.5}]})
    )
    assert load_entropy_json(dense)[(1, 0)] == 3.0
    assert load_entropy_json(sparse)[(5, 1)] == 6.5
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"entropy_nats": [1.0, 2.0]}))
    with pytest.raises(ValueError, match="n_layers, n_kv_heads"):
        load_entropy_json(bad)


def test_cli_policy_mode_writes_plan(tmp_path, capsys):
    policy = tmp_path / "head_policy_results.json"
    policy.write_text(json.dumps(_policy_artifact()))
    out = tmp_path / "plan.json"
    main(
        [
            "--policy_json", str(policy),
            "--cost_target", "0.02",
            "--out", str(out),
        ]
    )
    plan = json.loads(out.read_text())
    assert plan["n_units"] == 4
    assert 0 <= plan["n_served"] <= 4
    assert len(plan["plan"]) == 4
    assert plan["plan"][0]["cost"] <= plan["plan"][-1]["cost"]
    assert "Serve" in capsys.readouterr().out


def test_cli_fits_mode_uses_law_json(tmp_path):
    fits = tmp_path / "fit_results.json"
    fits.write_text(json.dumps(_fit_records()))
    ent = tmp_path / "entropy.json"
    ent.write_text(
        json.dumps(
            {
                "units": [
                    {"layer": 0, "kv_head": 0, "entropy_nats": 6.0},
                    {"layer": 8, "kv_head": 1, "entropy_nats": 2.0},
                ]
            }
        )
    )
    law = tmp_path / "law.json"
    law.write_text(
        json.dumps(
            {
                "entropy_law_solo_2factor": {
                    "intercept": 1.0,
                    "entropy_slope": -1.0,
                    "log1mproxy_slope": 2.0,
                }
            }
        )
    )
    out = tmp_path / "plan.json"
    main(
        [
            "--fits", str(fits),
            "--entropy_json", str(ent),
            "--law_json", str(law),
            "--scheme", "int8_g32",
            "--out", str(out),
        ]
    )
    plan = json.loads(out.read_text())
    assert plan["law"]["intercept"] == 1.0
    u0 = next(
        r for r in plan["plan"] if (r["layer"], r["kv_head"]) == (0, 0)
    )
    assert u0["cost"] == pytest.approx(
        float(np.exp(1.0 - 1.0 * 6.0 + 2.0 * np.log(1 - 0.825)))
    )
    assert any("law-predicted" in c for c in plan["caveats"])


def test_cli_rejects_ambiguous_sources(tmp_path):
    with pytest.raises(SystemExit):
        main([])
    with pytest.raises(SystemExit):
        main(["--fits", "x.json"])  # no --entropy_json
    # fits-mode-only flags are an error with --policy_json, not ignored
    with pytest.raises(SystemExit):
        main(["--policy_json", "p.json", "--law_json", "l.json"])
    with pytest.raises(SystemExit):
        main(["--policy_json", "p.json", "--entropy_json", "e.json"])


def test_cli_rejects_null_law_fit(tmp_path):
    fits = tmp_path / "fit_results.json"
    fits.write_text(json.dumps(_fit_records()))
    ent = tmp_path / "entropy.json"
    ent.write_text(
        json.dumps(
            {
                "units": [
                    {"layer": 0, "kv_head": 0, "entropy_nats": 6.0},
                    {"layer": 8, "kv_head": 1, "entropy_nats": 2.0},
                ]
            }
        )
    )
    law = tmp_path / "law.json"
    law.write_text(json.dumps({"entropy_law_solo_2factor": None}))
    with pytest.raises(SystemExit):  # targeted error, not a schema complaint
        main(
            ["--fits", str(fits), "--entropy_json", str(ent),
             "--law_json", str(law)]
        )


# --- re-pricing a stale plan across context growth ------------------------

from nerf_attention_tpu.serve_plan import (  # noqa: E402
    MIN_MEASURABLE_COST,
    apply_reprice,
    fit_reprice,
    load_probes,
    recommend_probes,
    reprice_units,
)


def test_fit_reprice_recovers_exact_rescale():
    stale = np.array([1e-4, 3e-4, 1e-3, 4e-3, 2e-2, 8e-2])
    fresh = np.exp(0.4) * stale**1.3
    model = fit_reprice(stale, fresh)
    assert model["n_probes"] == 6
    assert model["log_scale"] == pytest.approx(0.4, abs=1e-9)
    assert model["exponent"] == pytest.approx(1.3, abs=1e-9)
    assert model["rms_log_residual"] == pytest.approx(0.0, abs=1e-9)
    np.testing.assert_allclose(apply_reprice(stale, model), fresh, rtol=1e-9)


def test_fit_reprice_tiny_k_pins_exponent_to_one():
    model = fit_reprice([1e-3, 1e-2], [2e-3, 2.4e-2])
    assert model["exponent"] == 1.0
    # a = mean log ratio
    assert model["log_scale"] == pytest.approx(
        np.mean([np.log(2.0), np.log(2.4)])
    )


def test_fit_reprice_skips_unmeasurable_pairs_and_zeros_stay_zero():
    model = fit_reprice([0.0, 1e-9, 1e-3, 1e-2], [1e-3, 1e-3, 2e-3, 2e-2])
    assert model["n_probes"] == 2
    out = apply_reprice([0.0, 5e-3], model)
    assert out[0] == 0.0
    assert out[1] > 0
    with pytest.raises(ValueError, match="at least 2"):
        fit_reprice([0.0, 0.0], [1e-3, 1e-3])


def test_recommend_probes_spans_the_ranking():
    units = [_unit(0, h, cost) for h, cost in enumerate(
        [0.0, 1e-5, 1e-4, 1e-3, 1e-2, 1e-1]
    )]
    picks = recommend_probes(units, 3)
    costs = [u["cost"] for u in picks]
    # cheapest and most expensive measurable units are always included
    assert min(costs) == 1e-5 and max(costs) == 1e-1
    assert all(c >= MIN_MEASURABLE_COST for c in costs)
    with pytest.raises(ValueError, match="at least 2"):
        recommend_probes([_unit(0, 0, 0.0), _unit(0, 1, 0.0)], 4)


def test_reprice_units_keeps_probes_verbatim_and_remaps_the_rest():
    units = [
        _unit(0, 0, 1e-4), _unit(0, 1, 1e-3),
        _unit(1, 0, 1e-2), _unit(1, 1, 1e-1),
    ]
    # fresh = 2x stale; probe two units
    probes = {(0, 0): 2e-4, (1, 1): 2e-1}
    model = reprice_units(units, probes)
    assert model["exponent"] == 1.0
    by = {(u["layer"], u["kv_head"]): u for u in units}
    assert by[(0, 0)]["cost"] == 2e-4
    assert by[(0, 0)]["cost_source"] == "fresh_probe"
    assert by[(0, 1)]["cost"] == pytest.approx(2e-3)
    assert by[(0, 1)]["cost_source"] == "repriced_stale"
    with pytest.raises(ValueError, match="not in the stale plan"):
        reprice_units(units, {(9, 9): 1e-3})


def test_cli_reprice_flow(tmp_path, capsys):
    policy = tmp_path / "head_policy_results.json"
    policy.write_text(json.dumps(_policy_artifact()))
    # step 1: recommend probes
    main(["--policy_json", str(policy), "--recommend_probes", "2"])
    out1 = capsys.readouterr().out
    assert "Re-measure these 2 units" in out1
    # step 2: operator measures; here fresh = 3x stale for every unit
    art = _policy_artifact()
    probe_units = [
        {"layer": u["layer"], "kv_head": u["kv_head"],
         "solo_cost": 3.0 * u["solo_cost"]}
        for u in art["units"][:2]
    ]
    probes = tmp_path / "probes.json"
    probes.write_text(json.dumps({"units": probe_units}))
    plan_out = tmp_path / "plan.json"
    main([
        "--policy_json", str(policy), "--reprice_probes", str(probes),
        "--cost_target", "0.02", "--out", str(plan_out),
    ])
    out2 = capsys.readouterr().out
    assert "Re-priced" in out2
    plan = json.loads(plan_out.read_text())
    srcs = {r["cost_source"] for r in plan["plan"]}
    assert srcs == {"fresh_probe", "repriced_stale"}
    assert any("re-priced" in c for c in plan["caveats"])
    # repriced costs are ~3x the artifact's stale costs
    stale = {(u["layer"], u["kv_head"]): u["solo_cost"] for u in art["units"]}
    for r in plan["plan"]:
        s = stale[(r["layer"], r["kv_head"])]
        if s >= MIN_MEASURABLE_COST:
            assert r["cost"] == pytest.approx(3.0 * s, rel=0.05)


def test_cli_reprice_rejects_tiered_and_fits_mode(tmp_path):
    policy = tmp_path / "p.json"
    policy.write_text(json.dumps(_policy_artifact()))
    with pytest.raises(SystemExit):
        main(["--policy_json", str(policy), "--tiered",
              "--reprice_probes", "x.json"])
    with pytest.raises(SystemExit):
        main(["--fits", "f.json", "--entropy_json", "e.json",
              "--recommend_probes", "4"])


def test_cli_rejects_unusable_probe_counts(tmp_path):
    """K=0 must not silently fall through the falsy-or guard, and K=1
    must be rejected up front — fit_reprice needs >= 2 probe pairs, so a
    smaller recommendation would send the operator to measure a decode
    whose result is guaranteed rejected. Regression: r4 self-review."""
    policy = tmp_path / "p.json"
    policy.write_text(json.dumps(_policy_artifact()))
    for k in ("0", "1"):
        with pytest.raises(SystemExit):
            main(["--policy_json", str(policy), "--recommend_probes", k])
    # K=0 in tiered mode must hit the mode guard, not be ignored
    with pytest.raises(SystemExit):
        main(["--policy_json", str(policy), "--tiered",
              "--recommend_probes", "0"])
    with pytest.raises(ValueError, match="at least 2 probe"):
        recommend_probes([_unit(0, 0, 1e-3), _unit(0, 1, 1e-2)], 1)


def test_load_probes_accepts_full_artifact(tmp_path):
    p = tmp_path / "full.json"
    p.write_text(json.dumps(_policy_artifact()))
    probes = load_probes(p)
    assert len(probes) == 4
    assert all(v >= 0 for v in probes.values())


def test_cli_reprice_warns_when_probes_break_the_rescale(tmp_path, capsys):
    """Probes inconsistent with a rescale (the cross-model signature) must
    surface the ranking-suspect warning in stdout AND the plan caveats."""
    policy = tmp_path / "p.json"
    policy.write_text(json.dumps(_policy_artifact()))
    art = _policy_artifact()
    # Scrambled fresh costs: low-stale units get high fresh costs and vice
    # versa — no monotone rescale fits this.
    stale_sorted = sorted(
        (u for u in art["units"] if u["solo_cost"] >= MIN_MEASURABLE_COST),
        key=lambda u: u["solo_cost"],
    )
    fresh_vals = [0.5, 1e-4, 0.2, 1e-5][: len(stale_sorted)]
    probe_units = [
        {"layer": u["layer"], "kv_head": u["kv_head"], "solo_cost": v}
        for u, v in zip(stale_sorted, fresh_vals)
    ]
    probes = tmp_path / "probes.json"
    probes.write_text(json.dumps({"units": probe_units}))
    out = tmp_path / "plan.json"
    main([
        "--policy_json", str(policy), "--reprice_probes", str(probes),
        "--out", str(out),
    ])
    assert "WARNING: probe residual" in capsys.readouterr().out
    plan = json.loads(out.read_text())
    assert plan["reprice_model"]["rms_log_residual"] > 1.0
    assert any("RANKING SUSPECT" in c for c in plan["caveats"])


def test_apply_layer_windows_caps_raw_bytes():
    from nerf_attention_tpu.serve_plan import apply_layer_windows

    units = [_unit(0, 0, 0.001), _unit(1, 0, 0.001)]
    capped = apply_layer_windows(units, [128, None], 512)
    assert capped[0]["raw_bytes"] == 250  # 1000 * 128/512
    assert capped[0]["window_rows"] == 128
    assert capped[1]["raw_bytes"] == 1000
    assert "window_rows" not in capped[1]
    # a window past the context is no cap at all
    same = apply_layer_windows(units, [4096, 0], 512)
    assert same[0]["raw_bytes"] == 1000
    # inputs are not mutated
    assert units[0]["raw_bytes"] == 1000
    with pytest.raises(ValueError, match="entries for"):
        apply_layer_windows(units, [128], 512)


def test_build_tiered_plan_skips_net_negative_units():
    """Window-capped raw slices smaller than every stored tier must not be
    served: spending quality budget to GROW memory is never right."""
    from nerf_attention_tpu.serve_plan import apply_layer_windows

    units = tiered_units_from_policy_json(_tiered_artifact())
    # 16 of 512 rows: layer-0 raw 4000 -> 125 B, below even int8's 150 B
    capped = apply_layer_windows(units, [16, None], 512)
    plan = build_tiered_plan(capped, cost_target=0.02)
    assert plan["n_skipped_net_negative"] == 2
    served = [r for r in plan["plan"] if r["serve"]]
    assert all(r["layer"] == 1 for r in served)
    assert plan["net_bytes_saved"] > 0
    # uncapped, the same budget serves the two layer-0 units first
    uncapped = build_tiered_plan(units, cost_target=0.02)
    assert uncapped["n_served"] == 3
    assert uncapped["n_skipped_net_negative"] == 0


def test_cli_layer_windows(tmp_path, capsys):
    art = _tiered_artifact()
    art["model"] = {"seq_len": 512}
    policy = tmp_path / "head_policy_results.json"
    policy.write_text(json.dumps(art))
    out = tmp_path / "plan.json"
    main(
        [
            "--policy_json", str(policy), "--tiered",
            "--layer_windows", "16,full",
            "--cost_target", "0.02", "--out", str(out),
        ]
    )
    assert "window-capped on 2/4 units (S=512)" in capsys.readouterr().out
    plan = json.loads(out.read_text())
    assert plan["n_skipped_net_negative"] == 2

    # one value broadcasts; --window_seq_len covers artifacts w/o model
    del art["model"]
    policy.write_text(json.dumps(art))
    main(
        [
            "--policy_json", str(policy), "--tiered",
            "--layer_windows", "16", "--window_seq_len", "512",
            "--cost_target", "0.02", "--out", str(out),
        ]
    )
    assert json.loads(out.read_text())["n_skipped_net_negative"] == 4

    with pytest.raises(SystemExit):  # no seq_len anywhere
        main(
            [
                "--policy_json", str(policy), "--tiered",
                "--layer_windows", "16",
            ]
        )


def test_cli_fits_mode_sink_aware_pricing(tmp_path, capsys):
    """A sink-model entropy JSON switches the law onto cache-conditional
    entropies and weights each cost by cache mass."""
    fits = tmp_path / "fit_results.json"
    fits.write_text(json.dumps(_fit_records()))
    ent = tmp_path / "entropy.json"
    ent.write_text(
        json.dumps(
            {
                "attn_sinks": True,
                "entropy_nats": [[1.0, 1.0]],  # sink-blind H: both sharp
                "cache_entropy_nats": [[6.0, 2.0]],
                "cache_mass": [[0.05, 1.0]],
            }
        )
    )
    # reshape the records onto a 1-layer, 2-head grid
    recs = _fit_records()
    for r in recs:
        if r["layer"] == 8:
            r["layer"], r["head"] = 0, 1
            r["name"] = r["name"].replace("L8_H1", "L0_H1")
    fits.write_text(json.dumps(recs))
    out = tmp_path / "plan.json"
    main(
        [
            "--fits", str(fits), "--entropy_json", str(ent),
            "--out", str(out),
        ]
    )
    assert "Sink model" in capsys.readouterr().out
    plan = json.loads(out.read_text())
    by = {
        (r["layer"], r["kv_head"]): r for r in plan["plan"]
    }
    assert by[(0, 0)]["cost_source"] == "law_predicted_sink"
    assert by[(0, 0)]["cache_mass"] == pytest.approx(0.05)
    # cost = law(H_cache, proxy) * cache_mass
    expected = float(law_cost(6.0, 0.825, DEFAULT_LAW)) * 0.05
    assert by[(0, 0)]["cost"] == pytest.approx(expected)
    assert any("law-predicted" in c for c in plan["caveats"])


def test_load_entropy_json_field_selection(tmp_path):
    p = tmp_path / "e.json"
    p.write_text(
        json.dumps(
            {"entropy_nats": [[2.0]], "cache_mass": [[0.5]]}
        )
    )
    from nerf_attention_tpu.serve_plan import load_entropy_json

    assert load_entropy_json(p)[(0, 0)] == 2.0
    assert load_entropy_json(p, field="cache_mass")[(0, 0)] == 0.5
    sparse = tmp_path / "s.json"
    sparse.write_text(
        json.dumps({"units": [{"layer": 0, "kv_head": 0, "entropy_nats": 3.0}]})
    )
    assert load_entropy_json(sparse)[(0, 0)] == 3.0
    with pytest.raises(ValueError, match="units lack"):
        load_entropy_json(sparse, field="cache_mass")


def test_cli_windows_auto_from_artifact(tmp_path, capsys):
    """A windowed head_policy artifact carries model.layer_windows; the
    plan applies them without any flag (explicit --layer_windows wins)."""
    art = _tiered_artifact()
    art["model"] = {"seq_len": 512, "layer_windows": [16, 0]}
    policy = tmp_path / "head_policy_results.json"
    policy.write_text(json.dumps(art))
    out = tmp_path / "plan.json"
    main(
        [
            "--policy_json", str(policy), "--tiered",
            "--cost_target", "0.02", "--out", str(out),
        ]
    )
    text = capsys.readouterr().out
    assert "read from the policy artifact" in text
    assert "window-capped on 2/4 units" in text
    plan = json.loads(out.read_text())
    assert plan["n_skipped_net_negative"] == 2
    # explicit flag overrides the artifact's layer map
    main(
        [
            "--policy_json", str(policy), "--tiered",
            "--layer_windows", "full,full",
            "--cost_target", "0.02", "--out", str(out),
        ]
    )
    assert json.loads(out.read_text())["n_skipped_net_negative"] == 0


def test_cli_fits_mode_windows_from_entropy_json(tmp_path, capsys):
    """measure-entropy's layer_windows map caps raw bytes in fits mode."""
    recs = _fit_records()
    for r in recs:  # put both units on layers 0/1 of a 2-layer model
        if r["layer"] == 8:
            r["layer"], r["head"] = 1, 0
            r["name"] = r["name"].replace("L8_H1", "L1_H0")
        else:
            r["head"] = 0
            r["name"] = r["name"].replace("H0", "H0")
    fits = tmp_path / "fit_results.json"
    fits.write_text(json.dumps(recs))
    ent = tmp_path / "entropy.json"
    ent.write_text(
        json.dumps(
            {
                "entropy_nats": [[6.0], [2.0]],
                "layer_windows": [128, 0],
                "seq_len": 2048,
            }
        )
    )
    out = tmp_path / "plan.json"
    main(
        [
            "--fits", str(fits), "--entropy_json", str(ent),
            "--window_seq_len", "2048", "--out", str(out),
        ]
    )
    assert "read from the entropy JSON" in capsys.readouterr().out
    plan = json.loads(out.read_text())
    by = {(r["layer"], r["kv_head"]): r for r in plan["plan"]}
    full_raw = 2 * (2048 * 128 * 2)
    assert by[(1, 0)]["raw_bytes"] == full_raw
    assert by[(0, 0)]["raw_bytes"] == round(full_raw * 128 / 2048)
    assert by[(0, 0)]["window_rows"] == 128


# --- MLA latent mode (round 5) ---------------------------------------------

from nerf_attention_tpu.serve_plan import latent_units_from_json  # noqa: E402


def _latent_artifact():
    """Synthetic mla_latent_units.json: 3 layers, 3-tier ladder where
    deeper layers quantize more cheaply (lower cost), and fp16 never
    saves bytes (stored == raw — the baseline tier)."""
    raw = 32768
    units = []
    for layer in range(3):
        units.append(
            {
                "layer": layer,
                "kv_head": 0,
                "entropy_nats": 3.0 + layer,
                "proxy": 0.9999,
                "raw_bytes": raw,
                "options": [
                    {"scheme": "fp16", "cost": 1e-6, "stored_bytes": raw},
                    {
                        "scheme": "int8_g32",
                        "cost": 1e-4 / (layer + 1),
                        "stored_bytes": raw // 4,
                    },
                    {
                        "scheme": "int4_g64",
                        "cost": 2e-3 / (layer + 1),
                        "stored_bytes": raw // 8,
                    },
                ],
            }
        )
    return {
        "mla_latent": True,
        "model": {"num_hidden_layers": 3, "latent_dim": 32, "seq_len": 512},
        "raw_latent_fp16_bytes_per_layer": raw,
        "units": units,
    }


def test_latent_units_feed_tiered_plan():
    units = latent_units_from_json(_latent_artifact())
    assert [u["layer"] for u in units] == [0, 1, 2]
    plan = build_tiered_plan(units, cost_target=0.01)
    # every layer serves (int tiers save bytes at tiny cost); with spare
    # budget the upgrade phase buys int4 where the cost allows
    assert plan["n_served"] == 3
    served_schemes = {r["scheme"] for r in plan["plan"] if r["serve"]}
    assert served_schemes <= {"int8_g32", "int4_g64"}
    assert plan["net_bytes_saved"] > 0

    # scheme subset restricts the tier menu
    only8 = latent_units_from_json(_latent_artifact(), schemes=["int8_g32"])
    plan8 = build_tiered_plan(only8, cost_target=0.01)
    assert {r["scheme"] for r in plan8["plan"] if r["serve"]} == {"int8_g32"}

    with pytest.raises(ValueError):
        latent_units_from_json(_latent_artifact(), schemes=["int2_g64"])
    with pytest.raises(ValueError):
        latent_units_from_json({"units": []})  # missing the marker


def test_cli_latent_mode(tmp_path):
    art = tmp_path / "mla_latent_units.json"
    art.write_text(json.dumps(_latent_artifact()))
    out = tmp_path / "plan.json"
    main(
        [
            "--latent_json", str(art),
            "--cost_target", "0.01", "--out", str(out),
        ]
    )
    plan = json.loads(out.read_text())
    assert plan["tiered"] is True and plan["mla_latent"] is True
    assert plan["n_served"] == 3
    assert all("scheme" in r for r in plan["plan"])
    assert any("latent tiers" in c.lower() for c in plan["caveats"])

    # --scheme subsets tiers in latent mode too
    main(
        [
            "--latent_json", str(art), "--scheme", "fp16,int8_g32",
            "--cost_target", "0.01", "--out", str(out),
        ]
    )
    sub = json.loads(out.read_text())
    assert {r["scheme"] for r in sub["plan"] if r["serve"]} == {"int8_g32"}

    # conflicting flags are rejected loudly
    for extra in (
        ["--tiered"],
        ["--layer_windows", "128"],
        ["--recommend_probes", "2"],
        ["--policy_json", "x.json"],
        ["--entropy_json", "y.json"],
    ):
        with pytest.raises(SystemExit):
            main(["--latent_json", str(art), *extra])
