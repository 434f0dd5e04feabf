"""Head-selection policy experiment (`experiments/head_policy.py`).

Pure-function units run instantly; one tiny end-to-end run (2 layers,
S=48, 10 epochs) exercises the full protocol on the CPU mesh conftest
pins.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

from nerf_attention_tpu.experiments.head_policy import (
    assign_head_gains,
    assign_sink_offsets,
    cache_conditional_entropy,
    kv_head_entropy,
    policy_orders,
    route_weights,
    run_head_policy_experiment,
)


def test_assign_head_gains_shape_range_determinism():
    g1 = assign_head_gains(8, 4, lo=1.0, hi=64.0, seed=3)
    g2 = assign_head_gains(8, 4, lo=1.0, hi=64.0, seed=3)
    assert g1.shape == (8, 4)
    np.testing.assert_array_equal(g1, g2)
    assert g1.min() == pytest.approx(1.0)
    assert g1.max() == pytest.approx(64.0)
    # shuffled: the log-spaced ladder must not survive in raster order
    assert not np.all(np.diff(g1.reshape(-1)) > 0)


def test_kv_head_entropy_grouping():
    # 1 query, 2 layers, 4 query heads, 2 kv heads: GQA repeat order maps
    # query heads (0,1)->kv0 and (2,3)->kv1 (jnp.repeat semantics).
    ent = np.array([[[1.0, 3.0, 5.0, 7.0], [2.0, 4.0, 6.0, 8.0]]])
    out = kv_head_entropy(ent, n_kv=2)
    np.testing.assert_allclose(out, [[2.0, 6.0], [3.0, 7.0]])


def test_policy_orders_are_permutations_and_ranked():
    rng = np.random.RandomState(0)
    n_l, n_kv = 4, 2
    ent = rng.uniform(1.0, 7.0, n_l * n_kv)
    proxy = rng.uniform(0.4, 0.99, n_l * n_kv)
    orders = policy_orders(
        ent, proxy, n_layers=n_l, n_kv=n_kv, n_random=2, seed=0
    )
    n = n_l * n_kv
    for name, order in orders.items():
        assert sorted(order.tolist()) == list(range(n)), name
    assert ent[orders["entropy_desc"][0]] == ent.max()
    assert ent[orders["entropy_asc"][0]] == ent.min()
    assert proxy[orders["proxy_desc"][0]] == proxy.max()
    # law = ascending (1-proxy)e^-H
    cost = (1 - proxy) * np.exp(-ent)
    assert cost[orders["law"][0]] == cost.min()
    # late_first serves the deepest layer's units before any earlier layer
    layer_of = orders["late_first"] // n_kv
    assert list(layer_of[:n_kv]) == [n_l - 1] * n_kv


def test_route_weights_matches_ffn_routing_semantics():
    """The numpy replay must agree with `_ffn`'s jax routing lines
    (fp32 softmax over all experts, lax.top_k, renormalize) on random
    inputs — same selected experts, same combine weights."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    t, n_l, h, e, k = 5, 3, 8, 6, 2
    ffn_x = rng.randn(t, n_l, 1, h).astype(np.float32)
    routers = rng.randn(n_l, h, e).astype(np.float32)

    w_np, idx_np = route_weights(ffn_x, routers, k)
    assert w_np.shape == (t, n_l, e) and idx_np.shape == (t, n_l, k)
    np.testing.assert_allclose(w_np.sum(axis=-1), 1.0, atol=1e-6)

    x = jnp.asarray(ffn_x[:, :, 0, :])
    logits = jnp.einsum("tlh,lhe->tle", x, jnp.asarray(routers))
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    top_vals, top_idx = jax.lax.top_k(probs, k)
    top_vals = top_vals / jnp.sum(top_vals, axis=-1, keepdims=True)
    w_jax = np.zeros((t, n_l, e), np.float32)
    np.put_along_axis(w_jax, np.asarray(top_idx), np.asarray(top_vals), -1)

    np.testing.assert_array_equal(idx_np, np.sort(np.asarray(top_idx), -1))
    np.testing.assert_allclose(w_np, w_jax, atol=1e-6)


def test_run_head_policy_experiment_tiny_moe(tmp_path: Path):
    """MoE stack: the routing-sensitivity leg measures flip rates along
    the serving budget axis; zero budget (true cache) must not flip."""
    res = run_head_policy_experiment(
        tmp_path,
        seq_len=48,
        n_queries=4,
        epochs=10,
        config_name="tiny",
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=16,
        hidden_size=64,
        intermediate_size=128,
        num_local_experts=4,
        schemes=(),
        budget_points=2,
        n_random=1,
        seed=0,
        verbose=False,
    )
    moe = res["moe_routing"]
    assert moe is not None
    assert moe["num_experts"] == 4 and moe["top_k"] == 2
    n_b = len(moe["budgets"])
    assert (
        len(moe["flip_rate"]) == len(moe["combine_weight_l1"])
        == len(moe["measured_cost"]) == n_b
    )
    assert moe["flip_rate"][0] == 0.0  # zero budget = identical routing
    assert moe["combine_weight_l1"][0] == 0.0
    assert all(0.0 <= f <= 1.0 for f in moe["flip_rate"])
    assert len(moe["per_layer_flip_rate_full_swap"]) == 2
    # both serving orders measured, same budget axis, same full swap
    assert set(moe["orders"]) == {"solo_asc", "law"}
    for curve in moe["orders"].values():
        assert len(curve["flip_rate"]) == n_b
        assert curve["flip_rate"][0] == 0.0
    assert moe["orders"]["law"]["flip_rate"][-1] == moe["flip_rate"][-1]
    # the policy sweep itself ran through the MoE forward
    assert res["model"]["num_local_experts"] == 4
    assert set(res["payloads"]) == {"master"}


def test_run_head_policy_experiment_tiny(tmp_path: Path):
    res = run_head_policy_experiment(
        tmp_path,
        seq_len=48,
        n_queries=4,
        epochs=10,
        config_name="tiny",
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=16,
        hidden_size=64,
        intermediate_size=128,
        schemes=("fp16",),
        budget_points=2,
        n_random=1,
        seed=0,
        verbose=False,
    )
    on_disk = json.loads((tmp_path / "head_policy_results.json").read_text())
    assert on_disk["net"] == res["net"] == "tiny"

    n_units = 2 * 2
    assert len(res["units"]) == n_units
    for u in res["units"]:
        assert 0.0 <= u["solo_cost"] <= 2.0
        assert u["entropy_nats"] > 0.0
    # induced diversity: the gains must spread measured entropy
    ents = [u["entropy_nats"] for u in res["units"]]
    assert max(ents) - min(ents) > 0.05

    assert res["moe_routing"] is None  # dense stack: no routing channel
    assert set(res["payloads"]) == {"master", "fp16"}
    for payload in res["payloads"].values():
        assert payload["stored_bytes_per_unit"] > 0
        curves = payload["policies"]
        full = None
        for name, curve in curves.items():
            cos = curve["output_cosine"]
            assert len(cos) == len(curve["budgets"])
            # zero budget = true cache: exactly the reference decode
            assert cos[0] == pytest.approx(1.0, abs=1e-6)
            # full budget is policy-independent (same final mask)
            full = cos[-1] if full is None else full
            assert cos[-1] == pytest.approx(full, abs=1e-9)
        assert {"law", "entropy_desc", "entropy_asc", "random_0"} <= set(curves)
        # the serve-plan ranking is measured as its own curve per payload
        assert "solo_asc" in curves

    # serve_plan_validation: cumulative solo sums in the plan's own order
    spv = res["serve_plan_validation"]
    master_solo = res["payloads"]["master"]["policies"]["solo_asc"]
    assert [row["budget"] for row in spv] == master_solo["budgets"]
    sums = [row["sum_solo_cost"] for row in spv]
    assert sums == sorted(sums) and sums[0] == 0.0
    assert sums[-1] == pytest.approx(
        sum(u["solo_cost"] for u in res["units"]), rel=1e-6
    )
    for row, cos in zip(spv, master_solo["output_cosine"]):
        assert row["measured_cost"] == pytest.approx(
            max(1.0 - cos, 0.0), abs=1e-9
        )

    # tiered-plan execution: the mixed payload was actually decoded
    tpv = res["tiered_plan_validation"]
    assert [row["target_frac_of_total"] for row in tpv] == [0.02, 0.1, 0.5]
    for row in tpv:
        assert row["n_served"] <= n_units
        assert 0.0 <= row["measured_cost"] <= 2.0
        assert sum(row["scheme_counts"].values()) == row["n_served"]
        assert set(row["scheme_counts"]) <= {"master", "fp16"}
        assert row["predicted_cost"] <= row["cost_target"]

    # build_plan's serving order IS the measured solo_asc prefix order
    # (the tool and the experiment must rank identically for the
    # validation curve to price the tool's plan)
    from nerf_attention_tpu.serve_plan import build_plan, units_from_policy_json

    plan = build_plan(
        units_from_policy_json(on_disk, scheme="fp16"), cost_target=1e9
    )
    assert plan["n_served"] == n_units
    plan_order = [(r["layer"], r["kv_head"]) for r in plan["plan"]]
    costs = [u["solo_cost"] for u in on_disk["units"]]
    exp_order = [
        (on_disk["units"][i]["layer"], on_disk["units"][i]["kv_head"])
        for i in np.argsort(costs, kind="stable")
    ]
    assert plan_order == exp_order


def test_head_policy_cli_wiring(tmp_path, monkeypatch):
    """Subcommand reaches the runner with CLI args threaded through
    (the --qat_epochs thread is the regression a self-review caught)."""
    import sys

    import nerf_attention_tpu.experiments.__main__ as cli

    calls = {}

    def fake_run(out_dir, **kw):
        calls.update(kw, out_dir=out_dir)
        return {"units": [], "payloads": {}}

    monkeypatch.setattr(
        "nerf_attention_tpu.experiments.head_policy."
        "run_head_policy_experiment",
        fake_run,
    )
    monkeypatch.setattr(
        "nerf_attention_tpu.experiments.head_policy.plot_head_policy",
        lambda *a, **k: None,
    )
    monkeypatch.setattr(
        sys, "argv",
        [
            "experiments", "head_policy",
            "--results_root", str(tmp_path / "root"),
            "--hp_seq_len", "96",
            "--hp_layers", "3",
            "--hp_gains", "2", "32",
            "--epochs", "9",
            "--qat_epochs", "17",
            "--schemes", "fp16,int8_g32",
            "--hp_seed", "2",
            "--hp_experts", "4",
            "--hp_moe_style", "gpt_oss",
            "--hp_sinks",
            "--hp_sink_offsets", "-1", "4",
            "--hp_window", "96",
        ],
    )
    cli.main()
    assert calls["out_dir"] == tmp_path / "root" / "head_policy"
    assert calls["seq_len"] == 96
    assert calls["num_layers"] == 3
    assert calls["gain_lo"] == 2.0 and calls["gain_hi"] == 32.0
    assert calls["epochs"] == 9
    assert calls["qat_epochs"] == 17
    assert calls["schemes"] == ("fp16", "int8_g32")
    assert calls["seed"] == 2
    assert calls["num_local_experts"] == 4
    assert calls["moe_style"] == "gpt_oss"
    assert calls["attn_sinks"] is True
    assert calls["sink_lo"] == -1.0 and calls["sink_hi"] == 4.0
    assert calls["sliding_window"] == 96


def test_head_policy_rejects_bad_qat_scheme_before_fitting(tmp_path):
    with pytest.raises(ValueError, match="QAT needs a group-wise"):
        run_head_policy_experiment(
            tmp_path, seq_len=16, epochs=1, num_layers=1,
            schemes=("fp16_qat",), verbose=False,
        )


def test_assign_sink_offsets_shape_range_decorrelation():
    off = assign_sink_offsets(8, 4, lo=-2.0, hi=6.0, seed=3)
    off2 = assign_sink_offsets(8, 4, lo=-2.0, hi=6.0, seed=3)
    assert off.shape == (8, 4)
    np.testing.assert_array_equal(off, off2)
    assert off.min() == pytest.approx(-2.0)
    assert off.max() == pytest.approx(6.0)
    # decorrelated from the gain axis: a DIFFERENT shuffle than the gains
    # at the same seed (same-rank alignment would re-couple the axes)
    gains = assign_head_gains(8, 4, seed=3)
    rank_g = np.argsort(np.argsort(gains.reshape(-1)))
    rank_o = np.argsort(np.argsort(off.reshape(-1)))
    assert not np.array_equal(rank_g, rank_o)


def test_cache_conditional_entropy_identity():
    """The (H, sink_mass) -> H_cache closed form must equal the entropy
    of the explicitly renormalized cache-row distribution."""
    rng = np.random.RandomState(0)
    for _ in range(5):
        logits = rng.randn(12)
        sink_logit = rng.randn() * 3
        z = np.concatenate([logits, [sink_logit]])
        p = np.exp(z - z.max())
        p /= p.sum()
        h_full = -np.sum(p * np.log(p))
        p_sink = p[-1]
        q = p[:-1] / (1.0 - p_sink)
        h_cache_direct = -np.sum(q * np.log(q))
        h_cache = cache_conditional_entropy(
            np.array([h_full]), np.array([p_sink])
        )[0]
        assert h_cache == pytest.approx(h_cache_direct, abs=1e-10)
    # degenerate guards
    assert cache_conditional_entropy(np.array([2.0]), np.array([0.0]))[
        0
    ] == pytest.approx(2.0)
    assert np.isfinite(
        cache_conditional_entropy(np.array([0.01]), np.array([1.0]))
    ).all()


def test_policy_orders_sink_rankings():
    rng = np.random.RandomState(1)
    n_l, n_kv = 4, 2
    n = n_l * n_kv
    ent = rng.uniform(1.0, 7.0, n)
    proxy = rng.uniform(0.4, 0.99, n)
    cache_ent = rng.uniform(0.5, 6.0, n)
    cache_mass = rng.uniform(0.05, 1.0, n)
    orders = policy_orders(
        ent, proxy, n_layers=n_l, n_kv=n_kv, n_random=1, seed=0,
        cache_entropy_u=cache_ent, cache_mass_u=cache_mass,
    )
    assert "law_sink" in orders and "cache_mass_asc" in orders
    for name, order in orders.items():
        assert sorted(order.tolist()) == list(range(n)), name
    sink_cost = (1 - proxy) * np.exp(-cache_ent) * cache_mass
    assert sink_cost[orders["law_sink"][0]] == sink_cost.min()
    assert cache_mass[orders["cache_mass_asc"][0]] == cache_mass.min()
    # without the sink stats the rankings must not appear
    base = policy_orders(ent, proxy, n_layers=n_l, n_kv=n_kv, n_random=0)
    assert "law_sink" not in base and "cache_mass_asc" not in base


def test_route_weights_gpt_oss_matches_ffn_gpt_oss_routing():
    """The numpy replay must agree with `_ffn_gpt_oss`'s routing lines
    (top-k of raw biased logits, softmax over the k) on random inputs."""
    import jax
    import jax.numpy as jnp

    from nerf_attention_tpu.experiments.head_policy import (
        route_weights_gpt_oss,
    )

    rng = np.random.RandomState(0)
    t, n_l, h, e, k = 5, 3, 8, 6, 2
    ffn_x = rng.randn(t, n_l, 1, h).astype(np.float32)
    routers = rng.randn(n_l, h, e).astype(np.float32)
    bias = rng.randn(n_l, e).astype(np.float32)

    w_np, idx_np = route_weights_gpt_oss(ffn_x, routers, bias, k)
    assert w_np.shape == (t, n_l, e) and idx_np.shape == (t, n_l, k)
    np.testing.assert_allclose(w_np.sum(axis=-1), 1.0, atol=1e-6)

    # the model's own routing lines (models/llama_jax.py:_ffn_gpt_oss)
    x = jnp.asarray(ffn_x[:, :, 0, :])
    logits = jnp.einsum("tlh,lhe->tle", x, jnp.asarray(routers)) + jnp.asarray(
        bias
    )
    top_vals, top_idx = jax.lax.top_k(logits, k)
    top_vals = jax.nn.softmax(top_vals, axis=-1)
    w_jax = np.zeros((t, n_l, e), np.float32)
    np.put_along_axis(w_jax, np.asarray(top_idx), np.asarray(top_vals), -1)

    np.testing.assert_array_equal(idx_np, np.sort(np.asarray(top_idx), -1))
    np.testing.assert_allclose(w_np, w_jax, atol=1e-6)


def test_run_head_policy_experiment_tiny_sinks_gpt_oss(tmp_path: Path):
    """GPT-OSS stack (attention sinks + top-k-then-softmax MoE): the sink
    leg captures per-head sink mass, the sink-aware rankings join the
    sweep, and the cache-conditional law fields land in the artifact."""
    res = run_head_policy_experiment(
        tmp_path,
        seq_len=48,
        n_queries=4,
        epochs=10,
        config_name="tiny",
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=16,
        hidden_size=64,
        intermediate_size=128,
        num_local_experts=4,
        moe_style="gpt_oss",
        attn_sinks=True,
        sink_lo=-2.0,
        sink_hi=6.0,
        schemes=(),
        budget_points=2,
        n_random=1,
        seed=0,
        verbose=False,
    )
    assert res["model"]["attn_sinks"] is True
    assert res["model"]["moe_style"] == "gpt_oss"
    assert res["moe_routing"]["moe_style"] == "gpt_oss"
    assert res["moe_routing"]["flip_rate"][0] == 0.0
    for u in res["units"]:
        assert 0.0 <= u["sink_mass"] <= 1.0
        assert u["cache_mass"] == pytest.approx(1.0 - u["sink_mass"])
        assert 0.0 <= u["cache_entropy_nats"] <= np.log(49) + 1e-6
    # induced diversity: the offsets must actually spread the sink mass
    masses = np.array([u["sink_mass"] for u in res["units"]])
    assert masses.max() - masses.min() > 0.2
    pol = res["payloads"]["master"]["policies"]
    assert "law_sink" in pol and "cache_mass_asc" in pol
    # every policy curve ends at the same full-swap point
    ends = {name: p["output_cosine"][-1] for name, p in pol.items()}
    assert max(ends.values()) - min(ends.values()) < 1e-6
    data = json.loads((tmp_path / "head_policy_results.json").read_text())
    assert data["sink_lo"] == -2.0 and data["sink_hi"] == 6.0
    # tiny runs may not have 4+ units above the cost floor; fields exist
    assert "entropy_law_solo_cache" in data
    assert "entropy_law_solo_sink3" in data


def test_run_head_policy_experiment_tiny_windows(tmp_path: Path):
    """Alternating sliding/full layers (GPT-OSS pattern): sliding units'
    raw bytes are window-capped, their measured entropy respects the
    window bound, and the executed tiered plan skips units no tier can
    shrink below the capped raw slice."""
    res = run_head_policy_experiment(
        tmp_path,
        seq_len=48,
        n_queries=4,
        epochs=10,
        config_name="tiny",
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=16,
        hidden_size=64,
        intermediate_size=128,
        sliding_window=8,
        schemes=(),
        budget_points=2,
        n_random=1,
        seed=0,
        verbose=False,
    )
    assert res["model"]["layer_windows"] == [8, 0]  # layer 0 sliding
    full_raw = 2 * 48 * 16 * 2
    capped_raw = 2 * 8 * 16 * 2
    for u in res["units"]:
        if u["layer"] == 0:
            assert u["window"] == 8 and u["raw_bytes"] == capped_raw
            # sliding softmax runs over <= window rows + self
            assert u["entropy_nats"] <= np.log(9) + 1e-6
        else:
            assert u["window"] is None and u["raw_bytes"] == full_raw
    assert res["payloads"]["master"]["raw_bytes_units"] == [
        u["raw_bytes"] for u in res["units"]
    ]
    # the executed tiered plans apply the net-negative skip rule against
    # the CAPPED raws: every unit whose cheapest tier stores at least its
    # (window-capped) raw slice is skipped, never served
    stored = res["payloads"]["master"]["stored_bytes_per_unit"]
    expect_skipped = sum(
        1 for u in res["units"] if stored >= u["raw_bytes"]
    )
    for row in res["tiered_plan_validation"]:
        assert row["n_skipped_net_negative"] == expect_skipped
        assert row["n_served"] <= 4 - expect_skipped
        assert row["net_bytes_saved"] >= 0  # skip rule guarantees this


def test_run_head_policy_softcap_and_nope(tmp_path: Path):
    """Round-5 stress axes: gemma2-style logit softcap and cohere2-style
    NoPE thread through to the hermetic model (metadata recorded, the
    flags measurably change the decode), and the sweep still completes
    with valid units under both."""
    common = dict(
        seq_len=48, n_queries=4, epochs=10, config_name="tiny",
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        hidden_size=64, intermediate_size=128, schemes=("fp16",),
        budget_points=2, n_random=1, seed=0, verbose=False,
    )
    base = run_head_policy_experiment(tmp_path / "base", **common)
    soft = run_head_policy_experiment(
        tmp_path / "soft", attn_logit_softcap=5.0, **common
    )
    assert soft["model"]["attn_logit_softcap"] == 5.0
    # a tight cap squashes the gained heads' logits -> entropies rise
    # relative to the uncapped model somewhere in the grid
    e_base = np.array([u["entropy_nats"] for u in base["units"]])
    e_soft = np.array([u["entropy_nats"] for u in soft["units"]])
    assert not np.allclose(e_base, e_soft)
    assert e_soft.mean() > e_base.mean()
    for u in soft["units"]:
        assert 0.0 <= u["solo_cost"] <= 2.0

    nope = run_head_policy_experiment(
        tmp_path / "nope", nope=True, sliding_window=8, **common
    )
    assert nope["model"]["nope"] is True
    assert nope["model"]["layer_windows"] == [8, 0]
    # NoPE really removes rope on the full layer: its K slice differs
    # from the roped baseline's while geometry matches
    w_nope = run_head_policy_experiment(
        tmp_path / "w", nope=False, sliding_window=8, **common
    )
    e_np = np.array([u["entropy_nats"] for u in nope["units"]])
    e_w = np.array([u["entropy_nats"] for u in w_nope["units"]])
    assert not np.allclose(e_np, e_w)
    for u in nope["units"]:
        assert 0.0 <= u["solo_cost"] <= 2.0
