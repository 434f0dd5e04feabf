"""Validate serve-plan re-pricing across context growth (offline, measured).

The plan-transfer analysis (FINDINGS "plan transfer across context
growth") measured that a serving plan's RANKING survives 4x prefix growth
(solo-cost rank correlation 0.996) while the absolute costs grow — so the
running-sum cut goes stale. `serve_plan.reprice_units` is the repair: k
fresh probe measurements fit a log-log rescale of every stale cost. This
study validates that repair against ground truth using the committed
artifact pair (same model, S=512 -> S=2048: benchmarks/r4/head_policy/
{seed0, s2048_seed0}) — both sides' solo costs are MEASURED on-chip; the
study replays the operator recipe offline at every probe count.

Beyond reference (the reference has no serving layer at all; its closest
surface is the static fit table, /root/reference/nerf_attention/
fit.py:95-118).

For each k in --probe_counts:
  1. pick probes from the STALE plan (`recommend_probes` — evenly spaced
     through the stale cost ranking),
  2. read those units' FRESH measured costs (the k masked decodes the
     operator would run),
  3. re-price all 32 costs, build the repriced plan at each target,
  4. score against the fresh-cost plan: served-set size + overlap, and
     the repriced set's TRUE cost (priced at fresh measurements) vs the
     target.
Baseline k=0 is the stale plan used unrepriced — the failure mode the
recipe exists to fix.
"""

from __future__ import annotations

import argparse
import copy
import json
from pathlib import Path

import numpy as np

from nerf_attention_tpu.serve_plan import (
    MIN_MEASURABLE_COST,
    build_plan,
    fit_reprice,
    recommend_probes,
    reprice_units,
    units_from_policy_json,
)


def _served_set(plan: dict) -> set[tuple[int, int]]:
    return {
        (r["layer"], r["kv_head"]) for r in plan["plan"] if r["serve"]
    }


def run_study(
    stale_path: Path,
    fresh_path: Path,
    probe_counts: list[int],
    targets: list[float],
) -> dict:
    with open(stale_path) as f:
        stale_data = json.load(f)
    with open(fresh_path) as f:
        fresh_data = json.load(f)
    stale_units = units_from_policy_json(stale_data)
    fresh_units = units_from_policy_json(fresh_data)
    fresh_cost = {
        (u["layer"], u["kv_head"]): u["cost"] for u in fresh_units
    }

    def true_cost(served: set) -> float:
        return float(sum(fresh_cost[key] for key in served))

    fresh_plans = {t: build_plan(fresh_units, cost_target=t) for t in targets}

    rows = []
    for k in probe_counts:
        units = copy.deepcopy(stale_units)
        if k == 0:
            model = None
            probes = {}
        else:
            picks = recommend_probes(units, k)
            probes = {
                (u["layer"], u["kv_head"]): fresh_cost[(u["layer"], u["kv_head"])]
                for u in picks
            }
            try:
                model = reprice_units(units, probes)
            except ValueError as e:
                # The honest outcome when the transfer is NOT a rescale
                # (e.g. a net upgrade collapses most costs below the
                # measurable floor): record the refusal, don't fake a fit.
                rows.append({"n_probes": k, "refused": str(e)})
                continue
        # Cost-prediction accuracy over the mutually measurable units.
        pred = np.array([u["cost"] for u in units])
        true = np.array(
            [fresh_cost[(u["layer"], u["kv_head"])] for u in units]
        )
        mask = (pred >= MIN_MEASURABLE_COST) & (true >= MIN_MEASURABLE_COST)
        rms_log = float(
            np.sqrt(np.mean((np.log(pred[mask]) - np.log(true[mask])) ** 2))
        )
        per_target = {}
        for t in targets:
            plan = build_plan(units, cost_target=t)
            served = _served_set(plan)
            oracle = _served_set(fresh_plans[t])
            per_target[str(t)] = {
                "n_served": plan["n_served"],
                "n_served_fresh": fresh_plans[t]["n_served"],
                "set_overlap": len(served & oracle),
                "true_cost_of_served": true_cost(served),
                "true_cost_over_target": true_cost(served) / t,
                "fresh_plan_cost": true_cost(oracle),
            }
        rows.append(
            {
                "n_probes": k,
                "actual_probe_pairs": (
                    model["n_probes"] if model else 0
                ),
                "reprice_model": model,
                "rms_log_cost_error": rms_log,
                "targets": per_target,
            }
        )

    # Context for the artifact: how far apart the two cost vectors are.
    sv = np.array([u["cost"] for u in stale_units])
    fv = np.array([fresh_cost[(u["layer"], u["kv_head"])] for u in stale_units])
    both = (sv >= MIN_MEASURABLE_COST) & (fv >= MIN_MEASURABLE_COST)
    try:
        full_fit = fit_reprice(sv[both], fv[both])
    except ValueError as e:
        full_fit = {"refused": str(e)}
    from scipy.stats import spearmanr  # in-image scipy

    rank_corr = (
        float(spearmanr(sv[both], fv[both]).statistic)
        if int(both.sum()) >= 2
        else None
    )
    return {
        "stale_artifact": str(stale_path),
        "fresh_artifact": str(fresh_path),
        "n_units": len(stale_units),
        "n_mutually_measurable": int(both.sum()),
        "solo_cost_rank_correlation": rank_corr,
        "oracle_full_fit": full_fit,
        "targets": targets,
        "rows": rows,
        "note": (
            "ground truth = the fresh artifact's on-chip measured solo "
            "costs; probes are read from it (replaying the k masked "
            "decodes an operator would run)"
        ),
    }


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Validate stale-plan re-pricing against the measured "
        "S=512 -> S=2048 artifact pair"
    )
    parser.add_argument(
        "--stale", type=str,
        default="benchmarks/r4/head_policy/seed0/head_policy_results.json",
    )
    parser.add_argument(
        "--fresh", type=str,
        default="benchmarks/r4/head_policy/s2048_seed0/head_policy_results.json",
    )
    parser.add_argument(
        "--probe_counts", type=int, nargs="+",
        default=[0, 2, 3, 4, 6, 8, 12, 16],
    )
    parser.add_argument(
        "--targets", type=float, nargs="+",
        default=[0.005, 0.01, 0.02, 0.05],
    )
    parser.add_argument(
        "--out", type=str,
        default="benchmarks/r4/head_policy/reprice_validation.json",
    )
    args = parser.parse_args()

    result = run_study(
        Path(args.stale), Path(args.fresh), args.probe_counts, args.targets
    )
    rc = result["solo_cost_rank_correlation"]
    ff = result["oracle_full_fit"]
    print(
        f"rank corr {rc if rc is None else format(rc, '.4f')} over "
        f"{result['n_mutually_measurable']}/{result['n_units']} units; "
        f"oracle full fit: "
        + (
            f"refused ({ff['refused']})"
            if "refused" in ff
            else f"scale exp({ff['log_scale']:.3f}) exponent {ff['exponent']:.3f}"
        )
    )
    print(
        f"{'k':>3} {'rmslog':>7} "
        + " ".join(f"[t={t:g}] n/or ov cost/t" for t in result["targets"])
    )
    for row in result["rows"]:
        if "refused" in row:
            print(f"{row['n_probes']:>3} refused: {row['refused']}")
            continue
        cells = []
        for t in result["targets"]:
            pt = row["targets"][str(t)]
            cells.append(
                f"{pt['n_served']:>2}/{pt['n_served_fresh']:<2} "
                f"{pt['set_overlap']:>2} {pt['true_cost_over_target']:>6.2f}"
            )
        print(f"{row['n_probes']:>3} {row['rms_log_cost_error']:>7.3f} " + "  ".join(cells))
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"-> {out}")


if __name__ == "__main__":
    main()
