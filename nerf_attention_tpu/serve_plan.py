"""Greedy head-serving planner: SERVING.md §4's deployment recipe as a tool.

Beyond-reference CLI (round 4): the reference has no serving layer — its
closest surface is the per-tensor fit table
(`/root/reference/nerf_attention/fit.py:95-118`), which this tool consumes
directly in ``--fits`` mode. Given per-(layer, kv-head) SOLO output costs,
it emits the greedy serving plan: the ordered list of cache slices to
serve from SIREN parameters, each with its cumulative predicted output
cost and the bytes it moves, cut at the operator's output-cost target.

Two cost sources:

* **measured** (``--policy_json``): a ``head_policy_results.json`` from
  ``experiments head_policy`` — or any JSON with the same ``units``
  schema, measured on real traffic — supplies each unit's measured
  ``solo_cost`` (1 − output cosine with only that unit swapped).
* **measured, tiered** (``--policy_json --tiered``): artifacts whose
  payloads carry per-scheme ``solo_cost`` arrays let the plan pick a
  storage scheme per unit — serve-first-then-upgrade: every unit that
  fits is served at its cheapest-cost tier, then leftover budget buys
  tier upgrades to smaller bytes, best bytes-per-cost first. (Flat
  mode prices every scheme at the MASTER-measured solo costs; storage
  quantization is output-transparent for the shipped schemes, but
  tiered mode is the calibrated path when schemes trade quality.)
* **predicted** (``--fits`` + ``--entropy_json``): a fit sweep's
  ``fit_results.json`` supplies per-unit fit quality (the proxy); the
  operator supplies per-(layer, kv-head) attention entropies measured on
  real traffic (``llama_decode_step`` returns them; aggregate with
  ``experiments.head_policy.kv_head_entropy``). Costs come from the
  two-factor law ``log(cost) = a + b·H + c·log(1 − proxy)`` — pass the
  coefficients fitted on YOUR model (``--law_json``, any
  ``head_policy_results.json``), or fall back to the hermetic-study
  prior (3-seed mean, flagged in the plan's caveats).

Why a running sum of solo costs is a valid budget rule (measured,
``benchmarks/r4/head_policy/``, 5 artifacts): ranking by measured solo
cost held 0.9995–0.9999 output cosine with half the cache served from
parameters (``solo_asc`` curves), and solo costs are ADDITIVE — the
measured cost of serving each prefix is 0.62–1.23× the running sum
through 3/4 of the cache (``serve_plan_validation``) and strongly
sub-additive beyond, so the sum is a calibrated bound and no budget
sweep is needed. ``--safety`` scales the sum before the cut;
``--safety 1.25`` covers the measured upper edge for tight targets.
Tiered plans were additionally executed end-to-end: cross-scheme
cumulative costs measured 0.86–1.09× predicted at the practical target
(``tiered_plan_validation``).

When the cache GROWS, the ranking transfers (rank corr 0.996 across 4×
growth) but the cost scale drifts — ``--recommend_probes K`` names the K
units to re-measure (one masked decode each) and ``--reprice_probes``
re-fits every stale cost from those probes via a log-log rescale before
planning (validated in ``benchmarks/r4/head_policy/
reprice_validation.json``: 4 probes recover the fresh cut to within one
served unit at every target).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

# Hermetic-study prior for the two-factor law: mean over the three seeds
# of benchmarks/r4/head_policy/seed{0,1,2} (R^2 0.83-0.91, 32 units each,
# 8L x 4kv random-init model with induced entropy diversity). A real
# deployment should refit on its own model (--law_json); the prior's
# entropy slope matched the single-attention law (~ -1 per nat) in sign
# and the fit-error amplification (c ~ 3-4) across all three seeds.
DEFAULT_LAW = {
    "intercept": 4.370,
    "entropy_slope": -1.712,
    "log1mproxy_slope": 3.447,
    "source": "hermetic prior: mean of benchmarks/r4/head_policy/seed0-2",
}


def law_cost(entropy_nats, proxy, law: dict) -> np.ndarray:
    """Predicted solo output cost from the two-factor law (clamped to [0, 2]).

    2.0 is the cosine-distance ceiling (output anti-parallel to the true
    decode) — the law can extrapolate past it at extreme (H, proxy) inputs.
    """
    h = np.asarray(entropy_nats, np.float64)
    q = np.log(np.maximum(1.0 - np.asarray(proxy, np.float64), 1e-12))
    log_cost = (
        law["intercept"]
        + law["entropy_slope"] * h
        + law["log1mproxy_slope"] * q
    )
    return np.clip(np.exp(log_cost), 0.0, 2.0)


def load_entropy_json(
    path: Path, field: str = "entropy_nats"
) -> dict[tuple[int, int], float]:
    """(layer, kv_head) -> ``field`` from either accepted layout.

    ``{"entropy_nats": [[...], ...]}`` — dense (n_layers, n_kv) array — or
    ``{"units": [{"layer": l, "kv_head": h, "entropy_nats": e}, ...]}``
    (the head_policy results schema is a superset of the sparse form).
    ``field`` selects other per-unit stats written by the same tools
    (sink models: ``cache_entropy_nats`` / ``cache_mass``).
    """
    with open(path) as f:
        data = json.load(f)
    out: dict[tuple[int, int], float] = {}
    if field in data:
        arr = np.asarray(data[field], np.float64)
        if arr.ndim != 2:
            raise ValueError(
                f"{field} must be (n_layers, n_kv_heads), got {arr.shape}"
            )
        for l in range(arr.shape[0]):
            for h in range(arr.shape[1]):
                out[(l, h)] = float(arr[l, h])
    elif "units" in data:
        for u in data["units"]:
            if field not in u:
                raise ValueError(f"{path}: units lack {field!r}")
            out[(int(u["layer"]), int(u["kv_head"]))] = float(u[field])
    else:
        raise ValueError(
            f"{path} has neither {field!r} nor 'units'"
        )
    return out


def _unit_base(u: dict) -> dict:
    """Identity + ranking features shared by the flat and tiered loaders."""
    return {
        "layer": int(u["layer"]),
        "kv_head": int(u["kv_head"]),
        "entropy_nats": float(u["entropy_nats"]),
        "proxy": 0.5
        * (float(u["key_fit_cosine"]) + float(u["value_fit_cosine"])),
    }


def units_from_policy_json(data: dict, scheme: str = "master") -> list[dict]:
    """Plan units with MEASURED solo costs from a head_policy results dict.

    The costs are always the MASTER-payload solo costs; ``scheme`` only
    selects the stored-bytes accounting. ``build_plan`` flags this with a
    caveat for lossy schemes — tiered mode is the calibrated path there.
    """
    payloads = data.get("payloads", {})
    if scheme not in payloads:
        raise ValueError(
            f"scheme {scheme!r} not in the policy artifact's payloads "
            f"({sorted(payloads)}); re-run head_policy with --schemes, or "
            f"plan at 'master' and price storage separately"
        )
    stored = int(payloads[scheme]["stored_bytes_per_unit"])
    raw = int(payloads[scheme]["raw_bytes_per_unit"])
    return [
        {
            **_unit_base(u),
            "cost": max(float(u["solo_cost"]), 0.0),
            "cost_source": "measured_solo",
            "raw_bytes": raw,
            "stored_bytes": stored,
            "bytes_scheme": scheme,
        }
        for u in data["units"]
    ]


def tiered_units_from_policy_json(
    data: dict, schemes: list[str] | None = None
) -> list[dict]:
    """Per-unit scheme OPTIONS with measured per-(unit, scheme) solo costs.

    Needs a policy artifact whose payloads carry ``solo_cost`` arrays
    (per-scheme solo decodes) — artifacts written before that leg landed
    only measured solo costs for the master payload.
    """
    payloads = data.get("payloads", {})
    names = list(payloads) if schemes is None else list(schemes)
    if not names:
        raise ValueError(
            "no storage schemes selected (empty scheme subset, or the "
            "artifact has no payloads)"
        )
    missing = [s for s in names if s not in payloads]
    if missing:
        raise ValueError(
            f"schemes {missing} not in the policy artifact's payloads "
            f"({sorted(payloads)})"
        )
    no_solo = [s for s in names if "solo_cost" not in payloads[s]]
    if no_solo:
        raise ValueError(
            f"payloads {no_solo} lack per-scheme solo costs — re-run "
            f"'experiments head_policy' (older artifacts only measured "
            f"solo costs at the master payload)"
        )
    units = []
    for i, u in enumerate(data["units"]):
        options = [
            {
                "scheme": name,
                "cost": max(float(payloads[name]["solo_cost"][i]), 0.0),
                "stored_bytes": int(payloads[name]["stored_bytes_per_unit"]),
            }
            for name in names
        ]
        units.append(
            {
                **_unit_base(u),
                "raw_bytes": int(payloads[names[0]]["raw_bytes_per_unit"]),
                "options": options,
            }
        )
    return units


def latent_units_from_json(
    data: dict, schemes: list[str] | None = None
) -> list[dict]:
    """Plan units for an MLA LATENT cache (round 5).

    DeepSeek-style Multi-head Latent Attention stores one latent per
    (layer, token) shared by every head, so the serving unit is the
    LAYER, and the measured winner on that surface is the quantized-
    latent ladder, not SIREN fits (`tools/mla_latent_study.py`,
    FINDINGS "MLA"): the tiers here are quantization schemes of the
    latent tensor itself. ``data`` is a ``mla_latent_units.json`` the
    study emits — per-layer mean attention entropy, fp16 round-trip
    proxy, and per-scheme measured SOLO costs (1 − output cosine with
    only that layer's latent quantized, vs the exact-latent decode).
    ``schemes`` restricts the tier menu. Feed the result to
    ``build_tiered_plan`` unchanged.
    """
    if not data.get("mla_latent"):
        raise ValueError(
            "not an MLA latent-units artifact (missing mla_latent: true) — "
            "produced by tools/mla_latent_study.py"
        )
    units = []
    for u in data["units"]:
        options = u["options"]
        if schemes is not None:
            have = {o["scheme"] for o in options}
            missing = [s for s in schemes if s not in have]
            if missing:
                raise ValueError(
                    f"schemes {missing} not in the latent artifact's tiers "
                    f"({sorted(have)})"
                )
            options = [o for o in options if o["scheme"] in schemes]
        units.append(
            {
                "layer": int(u["layer"]),
                "kv_head": int(u.get("kv_head", 0)),
                "entropy_nats": float(u["entropy_nats"]),
                "proxy": float(u["proxy"]),
                "raw_bytes": int(u["raw_bytes"]),
                "options": [
                    {
                        "scheme": o["scheme"],
                        "cost": max(float(o["cost"]), 0.0),
                        "stored_bytes": int(o["stored_bytes"]),
                    }
                    for o in options
                ],
            }
        )
    return units


def apply_layer_windows(
    units: list[dict], layer_windows: list[int | None], seq_len: int
) -> list[dict]:
    """Cap each unit's raw-byte accounting at its layer's sliding window.

    A sliding-attention layer only ever reads its last min(S, W) cache
    rows (`models/llama_jax.py:_causal_attention` window mask), so
    serving it from parameters frees at most that many rows of true
    cache — pricing its raw slice at the full S overstates the plan's
    net memory. For alternating-window stacks (GPT-OSS W=128, Gemma-2/3)
    at long context the overstatement on the sliding half is S/W — orders
    of magnitude. ``layer_windows`` holds one entry per layer (None or 0
    = full attention); ``seq_len`` is the context the units' raw bytes
    were priced at. Stored bytes are untouched: a SIREN payload's size
    does not depend on which rows the attention reads.
    """
    n_layers = 1 + max(u["layer"] for u in units)
    if len(layer_windows) < n_layers:
        raise ValueError(
            f"layer_windows has {len(layer_windows)} entries for "
            f"{n_layers} layers"
        )
    out = []
    for u in units:
        w = layer_windows[u["layer"]]
        nu = dict(u)
        if w:
            rows = min(int(w), int(seq_len))
            nu["raw_bytes"] = int(round(u["raw_bytes"] * rows / seq_len))
            nu["window_rows"] = rows
        out.append(nu)
    return out


def build_tiered_plan(
    units: list[dict],
    *,
    cost_target: float = 0.01,
    safety: float = 1.0,
) -> dict:
    """Greedy TIERED plan: serve first, then compress with leftover budget.

    Phase 1 serves units at their CHEAPEST-cost tier, ascending — each
    unit's raw slice usually dwarfs any inter-tier stored-bytes delta,
    so serving one more unit beats compressing an already-served one.
    Phase 2 spends whatever budget remains upgrading served units to
    smaller-bytes tiers, best bytes-saved-per-extra-cost first. (A
    smallest-bytes-first greedy is myopic here: it can burn the shared
    budget on a compressed tier and strand later units raw.) Additivity
    of solo costs across units — including across DIFFERENT schemes —
    is the measured band (``tiered_plan_validation`` in the artifacts).
    """
    choice: dict[int, dict] = {}
    cum = 0.0
    order = sorted(
        range(len(units)),
        key=lambda i: (
            min(o["cost"] for o in units[i]["options"]),
            units[i]["layer"],
            units[i]["kv_head"],
        ),
    )
    n_net_negative = 0
    for i in order:
        # Never serve a unit no tier can shrink: with window-capped raw
        # bytes (apply_layer_windows) a sliding layer's raw slice can be
        # SMALLER than any stored payload, so "serving" it would spend
        # quality budget to GROW memory.
        saving = [
            o for o in units[i]["options"]
            if o["stored_bytes"] < units[i]["raw_bytes"]
        ]
        if not saving:
            n_net_negative += 1
            continue
        best = min(saving, key=lambda o: (o["cost"], o["stored_bytes"]))
        if safety * (cum + best["cost"]) <= cost_target:
            choice[i] = best
            cum += best["cost"]
    while True:  # phase 2: tier upgrades, best ratio first
        best_up = None
        for i, cur in choice.items():
            for o in units[i]["options"]:
                saved = cur["stored_bytes"] - o["stored_bytes"]
                extra = o["cost"] - cur["cost"]
                if saved <= 0 or safety * (cum + extra) > cost_target:
                    continue
                ratio = saved / max(extra, 1e-30)
                if best_up is None or ratio > best_up[0]:
                    best_up = (ratio, i, o)
        if best_up is None:
            break
        _, i, o = best_up
        cum += o["cost"] - choice[i]["cost"]
        choice[i] = o

    plan_rows = []
    running = 0.0
    n_served = 0
    raw_served = stored_served = 0
    for rank, i in enumerate(order):
        u = units[i]
        chosen = choice.get(i)
        if chosen is not None:
            running += chosen["cost"]
            n_served += 1
            raw_served += u["raw_bytes"]
            stored_served += chosen["stored_bytes"]
        plan_rows.append(
            {
                "rank": rank,
                "layer": u["layer"],
                "kv_head": u["kv_head"],
                "entropy_nats": u["entropy_nats"],
                "proxy": u["proxy"],
                "scheme": chosen["scheme"] if chosen else None,
                "cost": chosen["cost"] if chosen else None,
                "cost_source": "measured_solo",
                "raw_bytes": u["raw_bytes"],
                "stored_bytes": chosen["stored_bytes"] if chosen else None,
                "cumulative_cost": running,
                "serve": chosen is not None,
            }
        )
    cum = running
    return {
        "tiered": True,
        "cost_target": cost_target,
        "safety": safety,
        "n_units": len(units),
        "n_served": n_served,
        "n_skipped_net_negative": n_net_negative,
        "predicted_cost_at_cut": float(cum),
        "predicted_output_cosine_at_cut": float(1.0 - cum),
        "raw_bytes_served": int(raw_served),
        "stored_bytes_served": int(stored_served),
        "net_bytes_saved": int(raw_served - stored_served),
        "plan": plan_rows,
        "caveats": [
            "cumulative_cost sums measured per-(unit, scheme) solo costs; "
            "executed tiered plans measured 0.86-1.09x the sum at the "
            "practical target, sub-additive deeper "
            "(benchmarks/r4/head_policy/, tiered_plan_validation)",
        ],
    }


MIN_MEASURABLE_COST = 1e-6  # solo costs below this are output-noise zeros

# Probe-fit residual above which the stale plan's RANKING itself is
# suspect. Measured separation (benchmarks/r4/head_policy/
# reprice_validation*.json + the cross-model negative control): rescale
# transfers (4x context growth, FM-64 net upgrade) fit with rms log
# residual <= 0.45 at every probe count; re-pricing across DIFFERENT
# models — where the ranking does not transfer (rank corr 0.30) and no
# rescale can help — leaves residual >= 2.9. One full log unit sits
# between the regimes.
REPRICE_RESIDUAL_WARN = 1.0


def recommend_probes(units: list[dict], k: int) -> list[dict]:
    """The k units an operator should re-measure to re-price a stale plan.

    Evenly spaced through the stale cost ranking (log-spanning the
    measurable range — the re-pricing fit is log-log, so probes must
    cover the spread, not cluster at one end). Units whose stale cost is
    below the measurable floor are excluded: their fresh cost carries no
    signal about the scale factor.
    """
    if k < 2:
        raise ValueError(
            f"k={k}: re-pricing (fit_reprice) needs at least 2 probe "
            f"pairs, so a probe set smaller than 2 can never be used"
        )
    measurable = [
        i for i in range(len(units))
        if units[i]["cost"] >= MIN_MEASURABLE_COST
    ]
    if len(measurable) < 2:
        raise ValueError(
            f"only {len(measurable)} units have measurable stale costs "
            f"(>= {MIN_MEASURABLE_COST:g}); re-pricing needs at least 2"
        )
    k = min(k, len(measurable))
    measurable.sort(key=lambda i: units[i]["cost"])
    picks = np.unique(
        np.round(np.linspace(0, len(measurable) - 1, k)).astype(int)
    )
    return [units[measurable[p]] for p in picks]


def fit_reprice(
    stale_costs, fresh_costs, *, min_cost: float = MIN_MEASURABLE_COST
) -> dict:
    """Fit the log-log rescale mapping stale solo costs to fresh ones.

    ``log(fresh) = log_scale + exponent * log(stale)`` over the probe
    pairs where both sides are measurable. With fewer than 4 usable
    probes the exponent pins to 1 (pure scale — the robust tiny-k
    choice); degenerate probe spreads (all stale costs equal) also pin
    it. The measured basis for the model: across 4x context growth the
    ranking held (rank corr 0.996) while absolute costs grew — a
    monotone re-map of the stale costs is exactly the missing piece
    (FINDINGS "plan transfer" / benchmarks/r4/head_policy/
    reprice_validation.json).
    """
    stale = np.asarray(stale_costs, np.float64)
    fresh = np.asarray(fresh_costs, np.float64)
    if stale.shape != fresh.shape:
        raise ValueError(f"probe shape mismatch: {stale.shape} vs {fresh.shape}")
    mask = (stale >= min_cost) & (fresh >= min_cost)
    n = int(mask.sum())
    if n < 2:
        raise ValueError(
            f"only {n} probe pairs are measurable on both sides "
            f"(>= {min_cost:g}); need at least 2"
        )
    ls, lf = np.log(stale[mask]), np.log(fresh[mask])
    spread = float(ls.max() - ls.min())
    if n >= 4 and spread > 1e-9:
        b = float(np.polyfit(ls, lf, 1)[0])
    else:
        b = 1.0
    a = float(np.mean(lf - b * ls))
    resid = lf - (a + b * ls)
    return {
        "log_scale": a,
        "exponent": b,
        "n_probes": n,
        "rms_log_residual": float(np.sqrt(np.mean(resid**2))),
    }


def apply_reprice(costs, model: dict) -> np.ndarray:
    """Repriced costs: exp(log_scale) * stale**exponent (zeros stay zero)."""
    c = np.maximum(np.asarray(costs, np.float64), 0.0)
    out = np.exp(model["log_scale"]) * np.power(
        c, model["exponent"], where=c > 0, out=np.zeros_like(c)
    )
    return np.where(c > 0, out, 0.0)


def load_probes(path: Path) -> dict[tuple[int, int], float]:
    """(layer, kv_head) -> fresh solo cost from a probe JSON.

    Accepts either a minimal ``{"units": [{"layer", "kv_head",
    "solo_cost"}, ...]}`` (what an operator writes after k masked
    decodes) or a full head_policy artifact (validation convenience).
    """
    with open(path) as f:
        data = json.load(f)
    units = data["units"] if isinstance(data, dict) else data
    return {
        (int(u["layer"]), int(u["kv_head"])): max(float(u["solo_cost"]), 0.0)
        for u in units
    }


def reprice_units(units: list[dict], probes: dict[tuple[int, int], float]) -> dict:
    """Replace every unit's cost with its repriced value, in place.

    Probed units keep their FRESH measured cost verbatim; the rest get
    the fitted re-map of their stale cost. Returns the fitted model.
    """
    keyed = {(u["layer"], u["kv_head"]): u for u in units}
    missing = sorted(set(probes) - set(keyed))
    if missing:
        raise ValueError(f"probe units not in the stale plan: {missing}")
    pairs = [(keyed[k]["cost"], v) for k, v in sorted(probes.items())]
    model = fit_reprice([p[0] for p in pairs], [p[1] for p in pairs])
    for u in units:
        key = (u["layer"], u["kv_head"])
        u["cost"] = (
            probes[key]
            if key in probes
            else float(apply_reprice(u["cost"], model)[()])
        )
        u["cost_source"] = (
            "fresh_probe" if key in probes else "repriced_stale"
        )
    return model


def _stored_bytes_for_record(rec: dict, scheme: str) -> int:
    """Exact stored bytes of one record's network under ``scheme``.

    Builds the checkpoint's parameter layout (shapes are all
    ``param_bytes`` reads) from the record's own architecture fields.
    """
    from nerf_attention_tpu.models.siren import layer_dims
    from nerf_attention_tpu.ops.quantize import param_bytes
    from nerf_attention_tpu.types import SIRENConfig

    config = SIRENConfig(
        hidden_features=int(rec["hidden_features"]),
        hidden_layers=int(rec["hidden_layers"]),
        omega_0=float(rec["omega_0"]),
        name=str(rec["config_name"]),
    )
    params = [
        (np.zeros((d_in, d_out), np.float32), np.zeros((d_out,), np.float32))
        for d_in, d_out in layer_dims(config, int(rec["d_head"]))
    ]
    return param_bytes(params, scheme)


def units_from_fits(
    records: list[dict],
    entropy: dict[tuple[int, int], float],
    *,
    config_name: str = "medium",
    law: dict | None = None,
    scheme: str = "fp32",
    cache_mass: dict[tuple[int, int], float] | None = None,
) -> list[dict]:
    """Plan units with LAW-PREDICTED costs from fit records + entropies.

    Each (layer, head) needs both its key and value record at
    ``config_name`` (the sweep always fits K and V together —
    `fit.py`'s L{l}_H{h}_{kv}_{config} grid); proxy is their mean.

    ``cache_mass`` (attention-sink models) makes the pricing sink-aware:
    ``entropy`` should then hold the CACHE-CONDITIONAL entropies and each
    law cost is weighted by the head's cache mass — the softmax fraction
    a reconstruction can actually touch (a sink-dominated head is nearly
    free to serve however sharp its full distribution looks). Both come
    from ``measure-entropy`` on a sink checkpoint (``cache_entropy_nats``
    / ``cache_mass`` fields).
    """
    law = DEFAULT_LAW if law is None else law
    by_unit: dict[tuple[int, int], dict[str, dict]] = {}
    for rec in records:
        if rec["config_name"] != config_name:
            continue
        by_unit.setdefault((int(rec["layer"]), int(rec["head"])), {})[
            rec["kv_type"]
        ] = rec
    if not by_unit:
        raise ValueError(f"no fit records with config_name={config_name!r}")
    missing_kv = [k for k, v in by_unit.items() if len(v) != 2]
    if missing_kv:
        raise ValueError(
            f"units missing a key or value record at {config_name!r}: "
            f"{sorted(missing_kv)}"
        )
    missing_ent = sorted(set(by_unit) - set(entropy))
    if missing_ent:
        raise ValueError(
            f"entropy_json lacks measured entropies for fitted units "
            f"{missing_ent}"
        )
    if cache_mass is not None:
        missing_cm = sorted(set(by_unit) - set(cache_mass))
        if missing_cm:
            raise ValueError(
                f"cache_mass lacks entries for fitted units {missing_cm}"
            )
    units = []
    for (layer, head), recs in sorted(by_unit.items()):
        proxy = 0.5 * (
            float(recs["key"]["final_cosine_mean"])
            + float(recs["value"]["final_cosine_mean"])
        )
        h_nats = entropy[(layer, head)]
        cost = float(law_cost(h_nats, proxy, law)[()])
        extra = {}
        if cache_mass is not None:
            cm = float(cache_mass[(layer, head)])
            cost *= cm
            extra = {"cache_mass": cm}
        units.append(
            {
                "layer": layer,
                "kv_head": head,
                "entropy_nats": h_nats,
                "proxy": proxy,
                "cost": cost,
                "cost_source": (
                    "law_predicted_sink"
                    if cache_mass is not None
                    else "law_predicted"
                ),
                **extra,
                "raw_bytes": int(recs["key"]["raw_size_bytes"])
                + int(recs["value"]["raw_size_bytes"]),
                "stored_bytes": _stored_bytes_for_record(recs["key"], scheme)
                + _stored_bytes_for_record(recs["value"], scheme),
            }
        )
    return units


def build_plan(
    units: list[dict],
    *,
    cost_target: float = 0.01,
    safety: float = 1.0,
) -> dict:
    """Greedy ascending-cost plan cut where safety·(running sum) > target."""
    order = sorted(
        range(len(units)),
        key=lambda i: (units[i]["cost"], units[i]["layer"], units[i]["kv_head"]),
    )
    plan_rows = []
    cum = 0.0
    n_served = 0
    raw_served = stored_served = 0
    for rank, i in enumerate(order):
        u = units[i]
        cum += u["cost"]
        serve = safety * cum <= cost_target
        if serve:
            n_served = rank + 1
            raw_served += u["raw_bytes"]
            stored_served += u["stored_bytes"]
        plan_rows.append(
            {
                "rank": rank,
                **u,
                "cumulative_cost": cum,
                "serve": serve,
            }
        )
    caveats = [
        "cumulative_cost sums solo costs; measured totals were 0.62-1.23x "
        "the sum through 3/4 of the cache and below it beyond "
        "(benchmarks/r4/head_policy/, serve_plan_validation) — "
        "--safety 1.25 covers the upper edge",
    ]
    if any(r["cost_source"].startswith("law_predicted") for r in plan_rows):
        caveats.append(
            "costs are law-predicted from fit quality + entropy; measure "
            "solo costs on your model (experiments head_policy protocol) "
            "to calibrate before trusting the absolute cut"
        )
    if any(r["cost_source"] == "repriced_stale" for r in plan_rows):
        caveats.append(
            "unprobed costs are re-priced from a stale plan via the fitted "
            "log-log rescale; validated across 4x context growth where 4+ "
            "probes recovered the fresh cut (benchmarks/r4/head_policy/"
            "reprice_validation.json) — ranking-stable traffic assumed, "
            "re-measure in full when content shifts"
        )
    lossy = {
        r["bytes_scheme"]
        for r in plan_rows
        if r.get("bytes_scheme") not in (None, "master")
    }
    if lossy:
        caveats.append(
            f"stored bytes priced at {sorted(lossy)} but costs are the "
            f"MASTER-measured solo costs; a lossy tier can cost more at "
            f"the output than this plan predicts — use --tiered for "
            f"measured per-scheme costs"
        )
    return {
        "cost_target": cost_target,
        "safety": safety,
        "n_units": len(units),
        "n_served": n_served,
        "predicted_cost_at_cut": float(
            sum(r["cost"] for r in plan_rows[:n_served])
        ),
        "predicted_output_cosine_at_cut": float(
            1.0 - sum(r["cost"] for r in plan_rows[:n_served])
        ),
        "raw_bytes_served": int(raw_served),
        "stored_bytes_served": int(stored_served),
        "net_bytes_saved": int(raw_served - stored_served),
        "plan": plan_rows,
        "caveats": caveats,
    }


def _print_plan(plan: dict, top: int = 12) -> None:
    print(
        f"Serve {plan['n_served']}/{plan['n_units']} cache slices from "
        f"parameters at cost target {plan['cost_target']:g} "
        f"(safety {plan['safety']:g}):"
    )
    print(
        f"  predicted output cosine >= "
        f"{plan['predicted_output_cosine_at_cut']:.4f} | raw KV freed "
        f"{plan['raw_bytes_served'] / 1e6:.2f} MB, parameters added "
        f"{plan['stored_bytes_served'] / 1e6:.2f} MB (net "
        f"{plan['net_bytes_saved'] / 1e6:+.2f} MB)"
    )
    if plan["net_bytes_saved"] < 0 and plan["n_served"]:
        print(
            "  NOTE: parameters outweigh the raw slices at this geometry — "
            "serving from parameters only saves memory when S*d_head is "
            "large relative to the network (SERVING.md section 5 trade)"
        )
    tiered = plan.get("tiered", False)
    header = (
        f"  {'rank':>4} {'L':>3} {'kv':>3} {'H(nats)':>8} {'proxy':>7} "
        f"{'cost':>10} {'cum':>10} serve"
        + (f" {'scheme':>16}" if tiered else "")
    )
    print(header)
    for row in plan["plan"][:top]:
        cost = f"{row['cost']:>10.2e}" if row["cost"] is not None else " " * 10
        print(
            f"  {row['rank']:>4} {row['layer']:>3} {row['kv_head']:>3} "
            f"{row['entropy_nats']:>8.2f} {row['proxy']:>7.4f} "
            f"{cost} {row['cumulative_cost']:>10.2e} "
            f"{'yes' if row['serve'] else 'no '}"
            + (f" {row['scheme'] or '(raw)':>16}" if tiered else "")
        )
    if len(plan["plan"]) > top:
        print(f"  ... {len(plan['plan']) - top} more rows in the plan JSON")
    for c in plan["caveats"]:
        print(f"  caveat: {c}")


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(
        description="Plan which (layer, kv-head) cache slices to serve from "
        "SIREN parameters at an output-cost target (SERVING.md section 4)"
    )
    src = parser.add_argument_group("cost source (pick one)")
    src.add_argument(
        "--policy_json", type=str, default=None,
        help="head_policy_results.json with MEASURED per-unit solo costs",
    )
    src.add_argument(
        "--fits", type=str, default=None,
        help="fit_results.json — costs PREDICTED via the two-factor law "
        "(requires --entropy_json)",
    )
    src.add_argument(
        "--latent_json", type=str, default=None,
        help="mla_latent_units.json (tools/mla_latent_study.py) — MLA "
        "latent cache: per-LAYER units tiered over the quantized-latent "
        "ladder with measured solo costs (always a tiered plan; --scheme "
        "takes a comma-separated tier subset)",
    )
    parser.add_argument(
        "--entropy_json", type=str, default=None,
        help="measured per-(layer, kv-head) attention entropies: "
        '{"entropy_nats": [[...]]} dense or {"units": [...]} sparse',
    )
    parser.add_argument(
        "--law_json", type=str, default=None,
        help="head_policy_results.json whose entropy_law_solo_2factor "
        "coefficients replace the hermetic prior (fits mode)",
    )
    parser.add_argument(
        "--config", type=str, default="medium",
        help="architecture whose fit records to plan over (fits mode)",
    )
    parser.add_argument(
        "--scheme", type=str, default=None,
        help="storage scheme for the byte accounting: a payload name from "
        "the policy artifact (policy mode, default master) or a quantize "
        "scheme like int4_g128 / int8_g32_l0fp32 (fits mode, default fp32)",
    )
    parser.add_argument(
        "--tiered", action="store_true",
        help="policy mode: per-unit storage schemes, serve-first-then-"
        "upgrade (needs per-scheme solo costs in the artifact); "
        "--scheme then takes a comma-separated subset of payload names",
    )
    parser.add_argument(
        "--recommend_probes", type=int, default=None, metavar="K",
        help="policy mode: print the K units to re-measure when the cache "
        "has grown (evenly spaced through the stale cost ranking), then "
        "exit — step 1 of the re-pricing recipe",
    )
    parser.add_argument(
        "--reprice_probes", type=str, default=None, metavar="PROBES_JSON",
        help="policy mode: fresh solo costs for a probe subset "
        '({"units": [{"layer", "kv_head", "solo_cost"}, ...]}); fits the '
        "log-log rescale and re-prices every stale cost before planning — "
        "step 2 of the re-pricing recipe (the ranking transfers across "
        "context growth, only the cut needs fresh pricing)",
    )
    parser.add_argument(
        "--layer_windows", type=str, default=None,
        help="per-layer sliding windows for the raw-byte accounting: a "
        "comma list with one entry per layer (0 or 'full' = full "
        "attention, e.g. '128,0,128,0'), or one value broadcast to every "
        "layer. A sliding layer only reads its last min(S, W) cache rows, "
        "so its raw slice is priced at the window, not the full context; "
        "tiered plans then skip units no tier can shrink below that",
    )
    parser.add_argument(
        "--window_seq_len", type=int, default=None,
        help="context length the raw bytes were priced at (default: the "
        "policy artifact's model.seq_len, or the fit records' seq_len)",
    )
    parser.add_argument("--cost_target", type=float, default=0.01)
    parser.add_argument(
        "--safety", type=float, default=1.0,
        help="multiply the running cost sum before the cut (1.25 covers "
        "the measured 1.23x additivity upper edge on tight targets)",
    )
    parser.add_argument("--top", type=int, default=12)
    parser.add_argument(
        "--out", type=str, default=None, help="write the plan JSON here"
    )
    args = parser.parse_args(argv)

    n_sources = sum(
        x is not None for x in (args.policy_json, args.fits, args.latent_json)
    )
    if n_sources != 1:
        parser.error(
            "pass exactly one of --policy_json / --fits / --latent_json"
        )
    if args.fits is not None and args.entropy_json is None:
        parser.error("--fits mode requires --entropy_json")
    if args.fits is None and (
        args.entropy_json is not None or args.law_json is not None
    ):
        parser.error(
            "--entropy_json/--law_json only apply in --fits mode; "
            "measured-cost plans use the artifact's own solo costs"
        )
    if args.latent_json is not None and (
        args.tiered or args.layer_windows is not None
        or args.recommend_probes is not None or args.reprice_probes is not None
    ):
        parser.error(
            "--latent_json plans are always tiered over the latent "
            "quantization ladder; --tiered/--layer_windows/probe flags "
            "don't apply (MLA latents are full-attention, per-layer units)"
        )

    if args.tiered and args.policy_json is None:
        parser.error("--tiered needs --policy_json (measured per-scheme costs)")
    if (args.recommend_probes is not None or args.reprice_probes is not None) and (
        args.policy_json is None or args.tiered
    ):
        parser.error(
            "--recommend_probes/--reprice_probes need flat --policy_json "
            "mode (per-scheme tiered costs would each need their own "
            "probes — re-run head_policy for a fresh tiered plan)"
        )
    if args.recommend_probes is not None and args.recommend_probes < 2:
        parser.error(
            "--recommend_probes needs K >= 2: the re-pricing fit "
            "(fit_reprice) requires at least 2 measurable probe pairs, so "
            "a smaller probe set could never be used in step 2"
        )

    reprice_model = None
    if args.latent_json is not None:
        with open(args.latent_json) as f:
            data = json.load(f)
        subset = (
            [s.strip() for s in args.scheme.split(",") if s.strip()]
            if args.scheme
            else None
        )
        units = latent_units_from_json(data, schemes=subset)
        print(
            f"MLA latent plan: {len(units)} per-layer latent units, tiers "
            f"{sorted({o['scheme'] for u in units for o in u['options']})}"
        )
    elif args.policy_json is not None:
        with open(args.policy_json) as f:
            data = json.load(f)
        if args.tiered:
            subset = (
                [s.strip() for s in args.scheme.split(",") if s.strip()]
                if args.scheme
                else None
            )
            units = tiered_units_from_policy_json(data, schemes=subset)
        else:
            units = units_from_policy_json(data, scheme=args.scheme or "master")
            if args.recommend_probes is not None:
                picks = recommend_probes(units, args.recommend_probes)
                print(
                    f"Re-measure these {len(picks)} units' solo costs on the "
                    f"grown cache (one masked decode each), then re-plan "
                    f"with --reprice_probes:"
                )
                print(f"  {'L':>3} {'kv':>3} {'stale cost':>12}")
                for u in picks:
                    print(
                        f"  {u['layer']:>3} {u['kv_head']:>3} "
                        f"{u['cost']:>12.3e}"
                    )
                return
            if args.reprice_probes is not None:
                probes = load_probes(Path(args.reprice_probes))
                model = reprice_model = reprice_units(units, probes)
                print(
                    f"Re-priced {len(units) - len(probes)} stale costs from "
                    f"{model['n_probes']} probes: fresh = "
                    f"exp({model['log_scale']:.3f}) * "
                    f"stale^{model['exponent']:.3f} "
                    f"(rms log residual {model['rms_log_residual']:.3f})"
                )
                if model["rms_log_residual"] > REPRICE_RESIDUAL_WARN:
                    print(
                        f"  WARNING: probe residual "
                        f"{model['rms_log_residual']:.2f} > "
                        f"{REPRICE_RESIDUAL_WARN:g} — the probes are not "
                        f"consistent with a rescale of the stale costs, so "
                        f"the RANKING itself has likely shifted (measured "
                        f"signature of a model/traffic change, not cache "
                        f"growth). Re-measure all units instead of "
                        f"trusting this plan."
                    )
    else:
        with open(args.fits) as f:
            records = json.load(f)
        ent_path = Path(args.entropy_json)
        with open(ent_path) as f:
            ent_meta = json.load(f)
        cache_mass = None
        if ent_meta.get("attn_sinks") and "cache_entropy_nats" in ent_meta:
            # Sink checkpoint: price the law on the cache-conditional
            # entropy and weight each cost by the head's cache mass —
            # the sink-blind full-H law misprices sink-dominated heads
            # (measured: benchmarks/r4/head_policy_sinks/).
            entropy = load_entropy_json(ent_path, field="cache_entropy_nats")
            cache_mass = load_entropy_json(ent_path, field="cache_mass")
            print(
                "Sink model: pricing on cache-conditional entropies, "
                "costs weighted by cache mass"
            )
        else:
            entropy = load_entropy_json(ent_path)
        law = None
        if args.law_json is not None:
            with open(args.law_json) as f:
                law_src = json.load(f)
            if (
                "entropy_law_solo_2factor" in law_src
                and law_src["entropy_law_solo_2factor"] is None
            ):
                parser.error(
                    f"{args.law_json}: entropy_law_solo_2factor is null — "
                    f"that head_policy run had too few units with "
                    f"measurable cost to fit the law; use another "
                    f"artifact or omit --law_json for the hermetic prior"
                )
            law = law_src.get("entropy_law_solo_2factor") or law_src
            missing = {
                "intercept", "entropy_slope", "log1mproxy_slope"
            } - set(law)
            if missing:
                parser.error(f"--law_json lacks coefficients: {sorted(missing)}")
            law = {**law, "source": args.law_json}
        units = units_from_fits(
            records, entropy, config_name=args.config, law=law,
            scheme=args.scheme or "fp32", cache_mass=cache_mass,
        )

    windows = None
    if args.layer_windows is not None:
        tokens = [t.strip().lower() for t in args.layer_windows.split(",")]
        windows = [
            None if t in ("0", "full", "none", "") else int(t)
            for t in tokens
        ]
        if len(windows) == 1:
            windows = windows * (1 + max(u["layer"] for u in units))
    elif args.policy_json is not None:
        # Artifacts from a windowed head_policy run record the layer map;
        # apply it automatically so the plan's byte accounting matches
        # the model the costs were measured on.
        lw = data.get("model", {}).get("layer_windows")
        if lw:
            windows = [int(w) or None for w in lw]
            print("Layer windows read from the policy artifact")
    elif args.fits is not None:
        # measure-entropy records the checkpoint's window layer map.
        lw = ent_meta.get("layer_windows")
        if lw and any(lw):
            windows = [int(w) or None for w in lw]
            print("Layer windows read from the entropy JSON")
    if windows is not None:
        seq_len = args.window_seq_len
        if seq_len is None and args.policy_json is not None:
            s_art = data.get("model", {}).get("seq_len")
            seq_len = int(s_art) if s_art else None
        if seq_len is None and args.fits is not None:
            with_s = [r for r in records if "seq_len" in r]
            seq_len = int(with_s[0]["seq_len"]) if with_s else None
        if seq_len is None:
            parser.error(
                "--layer_windows needs the pricing context: pass "
                "--window_seq_len (the inputs carry no seq_len)"
            )
        units = apply_layer_windows(units, windows, seq_len)
        capped = sum(1 for u in units if "window_rows" in u)
        print(
            f"Raw-byte accounting window-capped on {capped}/{len(units)} "
            f"units (S={seq_len})"
        )

    builder = (
        build_tiered_plan
        if (args.tiered or args.latent_json is not None)
        else build_plan
    )
    plan = builder(
        units, cost_target=args.cost_target, safety=args.safety
    )
    if args.latent_json is not None:
        plan["mla_latent"] = True
        plan["caveats"].append(
            "MLA latent tiers: costs are per-layer solo quantization "
            "decodes; composed plans measured additive in the study's "
            "executed leg (tiered_plan_validation_latent, "
            "tools/mla_latent_study.py)"
        )
    if reprice_model is not None:
        plan["reprice_model"] = reprice_model
        if reprice_model["rms_log_residual"] > REPRICE_RESIDUAL_WARN:
            plan["caveats"].append(
                f"RANKING SUSPECT: probe-fit rms log residual "
                f"{reprice_model['rms_log_residual']:.2f} exceeds "
                f"{REPRICE_RESIDUAL_WARN:g} — the measured signature of a "
                f"model/traffic change (cross-model control: residual >= "
                f"2.9, rank corr 0.30); re-measure all units"
            )
    if args.fits is not None:
        plan["law"] = (
            {**DEFAULT_LAW} if args.law_json is None
            else {k: v for k, v in law.items()}
        )
    _print_plan(plan, top=args.top)
    if args.out:
        out = Path(args.out)
        out.parent.mkdir(parents=True, exist_ok=True)
        with open(out, "w") as f:
            json.dump(plan, f, indent=2)
        print(f"  plan -> {out}")


if __name__ == "__main__":
    sys.exit(main())
