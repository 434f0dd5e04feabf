"""Execute a serve-plan end-to-end as a multi-token rollout (round 5).

Until this study, the planner's bottom line ("serve these units at these
tiers, pay ~this output cost, free ~these bytes") was an extrapolation
from per-step algebra: `experiments/head_policy.py` validates plans through
single `llama_decode_step` calls with pre-reconstructed caches swapped in,
and the tiered validation is cross-scheme additivity at ONE step. Here the
plan actually serves: the planned units' cache rows are replaced by their
(scheme-tiered) SIREN reconstructions in a pre-allocated buffer, and
`llama_decode_rollout` runs T autoregressive tokens in one dispatch over
it — each step appending its own exact K/V and attending to both the
reconstructed prefix AND the generated suffix. Measured per budget:

  * per-step output cosine vs the all-HBM rollout (does per-step algebra
    predict multi-token drift? the self-appended rows are computed FROM
    reconstruction-perturbed hidden states, a compounding channel no
    single-step validation sees);
  * tokens/s for the planned rollout vs the all-HBM rollout (the swap is
    free at serve time — same program, different buffer contents — so any
    delta is contention noise, asserted);
  * the reconstruct-into-buffer cost itself, timed with the
    quantized-resident fused kernel (`ops/siren_quant_pallas.py`) whose
    HBM operands ARE the plan's stored payloads — plus the resident bytes,
    closing the loop with the on-device compression frontier.

Hermetic like head_policy: per-head K-projection gains induce real entropy
diversity (`experiments/head_policy.py:assign_head_gains`), so the plan's
ranking is measurable without model weights.

Reference equivalent: none — the reference has no serving loop at all; its
decode story stops at per-layer reconstruction latency
(`/root/reference/nerf_attention/evaluate.py:173-242`).
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

MIN_COST = 1e-6  # serve_plan.MIN_MEASURABLE_COST


def _cos(a: np.ndarray, b: np.ndarray, axis=-1) -> np.ndarray:
    num = np.sum(a * b, axis=axis)
    den = np.maximum(
        np.linalg.norm(a, axis=axis) * np.linalg.norm(b, axis=axis), 1e-12
    )
    return num / den


def run_seed(
    *,
    seed: int,
    seq_len: int,
    rollout_tokens: int,
    budgets: list[float],
    schemes: tuple[str, ...],
    config_name: str,
    epochs: int,
    n_queries: int,
    impl: str,
    timing_reps: int,
    hybrid: bool = False,
    verbose: bool = True,
) -> dict:
    import jax
    import jax.numpy as jnp

    from nerf_attention_tpu.experiments.attention_error import (
        _quantized_view,
        _reconstruct,
    )
    from nerf_attention_tpu.experiments.head_policy import (
        apply_head_gains,
        assign_head_gains,
        kv_head_entropy,
    )
    from nerf_attention_tpu.models.llama_jax import (
        LlamaConfig,
        init_random_llama,
        llama_decode_rollout,
        llama_decode_step,
        llama_prefill_kv,
    )
    from nerf_attention_tpu.ops.quantize import param_bytes
    from nerf_attention_tpu.parallel.sweep import fit_batch, select_fit_params
    from nerf_attention_tpu.serve_plan import build_tiered_plan
    from nerf_attention_tpu.types import CONFIGS_BY_NAME
    from nerf_attention_tpu.utils.timing import _per_iter_samples, replicate_stats

    net = CONFIGS_BY_NAME[config_name]
    t0 = time.perf_counter()
    n_l, n_heads, n_kv, d = 8, 8, 4, 32
    config = LlamaConfig(
        vocab_size=512,
        hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=n_l,
        num_attention_heads=n_heads,
        num_key_value_heads=n_kv,
        head_dim=d,
    )
    s, t_steps = seq_len, rollout_tokens
    n_units = n_l * n_kv

    gains = assign_head_gains(n_l, n_kv, lo=1.0, hi=64.0, seed=seed)
    params = apply_head_gains(config, init_random_llama(config, seed=seed), gains)
    rng = np.random.RandomState(seed)
    ids = jnp.asarray(rng.randint(0, config.vocab_size, s), jnp.int32)
    gen_ids = jnp.asarray(
        rng.randint(0, config.vocab_size, t_steps), jnp.int32
    )
    keys, values = llama_prefill_kv(config, params, ids)
    ck = jnp.asarray(keys[:, :, :s, :])
    cv = jnp.asarray(values[:, :, :s, :])

    # --- per-unit entropy + per-step reference at the last prefix rows ---
    q_tokens = ids[s - n_queries : s]
    q_positions = jnp.arange(s - n_queries, s, dtype=jnp.int32)

    @jax.jit
    def decode_true(p, toks, pos, k_c, v_c):
        h, _, ent = jax.vmap(
            lambda t, q: llama_decode_step(config, p, t, q, k_c, v_c),
            in_axes=(0, 0),
        )(toks, pos)
        return h, ent

    h_true, ent_true = decode_true(params, q_tokens, q_positions, ck, cv)
    ent_u = kv_head_entropy(np.asarray(ent_true), n_kv).reshape(-1)

    # --- fit every (layer, kv-head) K and V slice in one batched program ---
    targets = np.concatenate([np.asarray(ck), np.asarray(cv)]).reshape(
        2 * n_units, s, d
    )
    fit = fit_batch(targets, net, epochs=epochs, seed=seed, impl=impl)
    k_cos = np.asarray(fit.cosine_mean[:n_units], np.float64)
    v_cos = np.asarray(fit.cosine_mean[n_units:], np.float64)
    proxy_u = 0.5 * (k_cos + v_cos)
    if verbose:
        print(
            f"[seed {seed}] fit K {k_cos.mean():.4f} V {v_cos.mean():.4f} | "
            f"entropy {ent_u.min():.2f}-{ent_u.max():.2f} nats | "
            f"{time.perf_counter() - t0:.0f}s",
            flush=True,
        )

    # --- reconstructions + per-(unit, scheme) solo costs (one step) ---
    CHUNK = 16

    @jax.jit
    def decode_masked(p, toks, pos, k_c, v_c, k_hat, v_hat, unit_masks, h_ref):
        def one(mask):
            m = mask.reshape(n_l, n_kv)[:, :, None, None]
            ka = jnp.where(m, k_hat, k_c)
            va = jnp.where(m, v_hat, v_c)
            h, _, _ = jax.vmap(
                lambda t, q: llama_decode_step(config, p, t, q, ka, va),
                in_axes=(0, 0),
            )(toks, pos)
            return h

        h = jax.vmap(one)(unit_masks)
        num = jnp.sum(h * h_ref[None], -1)
        den = jnp.maximum(
            jnp.linalg.norm(h, axis=-1) * jnp.linalg.norm(h_ref, axis=-1)[None],
            1e-12,
        )
        return num / den

    def solo_costs(k_hat, v_hat) -> np.ndarray:
        solo = np.eye(n_units, dtype=bool)
        out = np.empty(n_units)
        for lo in range(0, n_units, CHUNK):
            chunk = solo[lo : lo + CHUNK]
            pad = CHUNK - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad, n_units), bool)])
            cosv = np.asarray(
                decode_masked(
                    params, q_tokens, q_positions, ck, cv,
                    jnp.asarray(k_hat), jnp.asarray(v_hat),
                    jnp.asarray(chunk), h_true,
                )
            ).mean(axis=1)
            out[lo : lo + CHUNK - pad] = cosv[: CHUNK - pad]
        return np.maximum(1.0 - out, MIN_COST)

    recons: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    costs: dict[str, np.ndarray] = {}
    stored: dict[str, np.ndarray] = {}
    for scheme in schemes:
        view = (
            fit
            if scheme == "master"
            else _quantized_view(fit, scheme, targets=targets, config=net)
        )
        k_hat = _reconstruct(view, np.arange(n_units), s, net, None).reshape(
            n_l, n_kv, s, d
        )
        v_hat = _reconstruct(
            view, np.arange(n_units, 2 * n_units), s, net, None
        ).reshape(n_l, n_kv, s, d)
        recons[scheme] = (k_hat, v_hat)
        costs[scheme] = solo_costs(k_hat, v_hat)
        bytes_scheme = "fp32" if scheme == "master" else scheme
        stored[scheme] = np.array(
            [
                param_bytes(select_fit_params(fit.params, u), bytes_scheme)
                + param_bytes(select_fit_params(fit.params, n_units + u), bytes_scheme)
                for u in range(n_units)
            ]
        )
        if verbose:
            print(
                f"[seed {seed}] {scheme}: solo cost median "
                f"{np.median(costs[scheme]):.2e} | "
                f"stored/unit {stored[scheme].mean()/1024:.1f} KiB",
                flush=True,
            )

    raw_bytes_u = 2 * s * d * 2  # K+V at raw fp16
    units = [
        {
            "layer": u // n_kv,
            "kv_head": u % n_kv,
            "entropy_nats": float(ent_u[u]),
            "proxy": float(proxy_u[u]),
            "raw_bytes": raw_bytes_u,
            "options": [
                {
                    "scheme": sch,
                    "cost": float(costs[sch][u]),
                    "stored_bytes": int(stored[sch][u]),
                }
                for sch in schemes
            ],
        }
        for u in range(n_units)
    ]

    # --- the rollout surface -------------------------------------------
    s_buf = s + t_steps
    base_k = np.zeros((n_l, n_kv, s_buf, d), np.float32)
    base_v = np.zeros((n_l, n_kv, s_buf, d), np.float32)
    base_k[:, :, :s] = np.asarray(ck)
    base_v[:, :, :s] = np.asarray(cv)

    @jax.jit
    def rollout(p, toks, kb, vb):
        h, _, _, _ = llama_decode_rollout(
            config, p, toks, jnp.int32(s), kb, vb
        )
        return h

    @jax.jit
    def rollout_timed(p, toks, kb, vb, n):
        def body(_, carry):
            kb, vb = carry
            _, (kb2, vb2), _, _ = llama_decode_rollout(
                config, p, toks, jnp.int32(s), kb, vb
            )
            return kb2, vb2

        kb, vb = jax.lax.fori_loop(0, n, body, (kb, vb))
        return kb[0, 0, 0, :8]

    h_base = np.asarray(rollout(params, gen_ids, jnp.asarray(base_k), jnp.asarray(base_v)))
    base_samples = _per_iter_samples(
        rollout_timed, params, gen_ids, jnp.asarray(base_k), jnp.asarray(base_v),
        reps=timing_reps, samples=3,
    )
    base_stats = replicate_stats(base_samples)
    base_tps = t_steps / base_stats["median"]

    def planned_buffers(plan) -> tuple[np.ndarray, np.ndarray]:
        kb, vb = base_k.copy(), base_v.copy()
        for row in plan["plan"]:
            if not row["serve"]:
                continue
            l, h = row["layer"], row["kv_head"]
            k_hat, v_hat = recons[row["scheme"]]
            kb[l, h, :s] = k_hat[l, h]
            vb[l, h, :s] = v_hat[l, h]
        return kb, vb

    budget_rows = []
    for target in budgets:
        plan = build_tiered_plan(units, cost_target=target)
        kb, vb = planned_buffers(plan)
        h_plan = np.asarray(rollout(params, gen_ids, jnp.asarray(kb), jnp.asarray(vb)))
        step_cos = _cos(h_plan, h_base)
        plan_samples = _per_iter_samples(
            rollout_timed, params, gen_ids, jnp.asarray(kb), jnp.asarray(vb),
            reps=timing_reps, samples=3,
        )
        plan_stats = replicate_stats(plan_samples)
        measured = float(np.maximum(1.0 - step_cos.mean(), 0.0))
        row = {
            "cost_target": target,
            "n_served": plan["n_served"],
            "schemes_served": sorted(
                {r["scheme"] for r in plan["plan"] if r["serve"]}
            ),
            "predicted_cost_at_cut": plan["predicted_cost_at_cut"],
            "raw_bytes_served": plan["raw_bytes_served"],
            "stored_bytes_served": plan["stored_bytes_served"],
            "net_bytes_saved": plan["net_bytes_saved"],
            "rollout_mean_cost": measured,
            "rollout_final_step_cosine": float(step_cos[-1]),
            "rollout_first_step_cosine": float(step_cos[0]),
            "per_step_cosine": [float(c) for c in step_cos],
            "measured_over_predicted": float(
                measured / max(plan["predicted_cost_at_cut"], MIN_COST)
            ),
            "tokens_per_s": t_steps / plan_stats["median"],
            "rollout_s_stats": plan_stats,
        }
        budget_rows.append(row)
        if verbose:
            print(
                f"[seed {seed}] target {target:g}: served {row['n_served']}/"
                f"{n_units} pred {row['predicted_cost_at_cut']:.2e} "
                f"measured {measured:.2e} (x{row['measured_over_predicted']:.2f}) "
                f"| {row['tokens_per_s']:.0f} tok/s (base {base_tps:.0f})",
                flush=True,
            )

    # Full-swap anchor: every unit served from the master fit.
    kb, vb = base_k.copy(), base_v.copy()
    k_hat, v_hat = recons["master"]
    kb[:, :, :s], vb[:, :, :s] = k_hat, v_hat
    h_full = np.asarray(rollout(params, gen_ids, jnp.asarray(kb), jnp.asarray(vb)))
    full_cos = _cos(h_full, h_base)

    # --- reconstruct-into-buffer cost, quantized-resident kernel --------
    recon_legs = []
    int_schemes = [sch for sch in schemes if sch != "master"]
    if int_schemes:
        from nerf_attention_tpu.ops.siren_quant_pallas import (
            pack_resident_params,
            resident_param_bytes,
            siren_decode_batch_quant,
        )

        top_plan = build_tiered_plan(units, cost_target=budgets[-1])
        served_by_scheme: dict[str, list[int]] = {}
        for r in top_plan["plan"]:
            if r["serve"] and r["scheme"] != "master":
                served_by_scheme.setdefault(r["scheme"], []).append(
                    r["layer"] * n_kv + r["kv_head"]
                )
        for sch, served in sorted(served_by_scheme.items()):
            rows = served + [n_units + u for u in served]  # K nets then V nets
            unit_params = [
                (np.asarray(w)[rows], np.asarray(b)[rows]) for w, b in fit.params
            ]
            packed = pack_resident_params(unit_params, sch)

            @jax.jit
            def recon_timed(ops, n, _sch=sch, _layout=packed[1]):
                def body(_, acc):
                    # Thread acc into an operand (value-preserving) so the
                    # reconstruct isn't loop-invariant — XLA would hoist a
                    # constant-input pallas_call out of the timing loop.
                    dep = (acc[0] * 0).astype(ops[0].dtype)
                    ops_dep = (ops[0] + dep,) + tuple(ops[1:])
                    out = siren_decode_batch_quant(
                        None, _sch, net.omega_0, s, packed=(ops_dep, _layout),
                        interpret=jax.default_backend() != "tpu",
                        sin_impl="fast",
                    )
                    return acc + out[0, 0, :8]

                return jax.lax.fori_loop(
                    0, n, body, jnp.zeros(8, jnp.float32)
                )

            recon_samples = _per_iter_samples(
                recon_timed, tuple(packed[0]), reps=max(2, timing_reps // 2),
                samples=3,
            )
            recon_stats = replicate_stats(recon_samples)
            recon_legs.append(
                {
                    "scheme": sch,
                    "n_units_served": len(served),
                    "recon_ms": recon_stats["median"] * 1e3,
                    "recon_s_stats": recon_stats,
                    "resident_bytes": resident_param_bytes(packed[0]),
                    "raw_bytes_replaced": len(served) * raw_bytes_u,
                    "tokens_per_s_with_per_rollout_recon": t_steps
                    / (base_stats["median"] + recon_stats["median"]),
                }
            )
            if verbose:
                leg = recon_legs[-1]
                print(
                    f"[seed {seed}] recon {sch}: {leg['n_units_served']} units "
                    f"{leg['recon_ms']:.2f} ms | resident "
                    f"{leg['resident_bytes']/1024:.0f} KiB vs raw "
                    f"{leg['raw_bytes_replaced']/1024:.0f} KiB",
                    flush=True,
                )

    # --- hybrid rollout: served units carry ZERO prefix cache ----------
    hybrid_legs = []
    if hybrid:
        from nerf_attention_tpu.models.llama_hybrid import make_hybrid_rollout

        top_plan = build_tiered_plan(units, cost_target=budgets[-1])
        served_mask = np.zeros((n_l, n_kv), bool)
        for r in top_plan["plan"]:
            if r["serve"]:
                served_mask[r["layer"], r["kv_head"]] = True
        plan_degenerate = not served_mask.any()
        if plan_degenerate:
            # Tiny-shape smoke runs: the byte-skip rule can leave the plan
            # empty (stored > raw at small S). Measure the hybrid surface
            # anyway on the cheapest-cost quarter, flagged as such.
            order = np.argsort(costs["master"])[: max(1, n_units // 4)]
            served_mask.reshape(-1)[order] = True
        n_srv = int(served_mask.sum())
        k_unit_params = [
            (np.asarray(w)[:n_units], np.asarray(b)[:n_units])
            for w, b in fit.params
        ]
        v_unit_params = [
            (np.asarray(w)[n_units:], np.asarray(b)[n_units:])
            for w, b in fit.params
        ]
        km, ks = fit.target_mean[:n_units], fit.target_std[:n_units]
        vm, vs = fit.target_mean[n_units:], fit.target_std[n_units:]
        cache_k_uns = tuple(
            jnp.asarray(np.asarray(ck)[l][~served_mask[l]]) for l in range(n_l)
        )
        cache_v_uns = tuple(
            jnp.asarray(np.asarray(cv)[l][~served_mask[l]]) for l in range(n_l)
        )
        for sch in ["fp32"] + [s_ for s_ in schemes if s_ != "master"]:
            roll_fn, info = make_hybrid_rollout(
                config, params, served_mask, k_unit_params, v_unit_params,
                km, ks, vm, vs, net.omega_0, seq_len=s,
                rollout_tokens=t_steps, scheme=sch, sin_impl="fast",
                interpret=jax.default_backend() != "tpu",
            )
            h_hyb, _ = roll_fn(gen_ids, cache_k_uns, cache_v_uns)
            h_hyb = np.asarray(h_hyb)
            # buffer-swap twin at the SAME uniform assignment (parity arm)
            view_sch = "master" if sch == "fp32" else sch
            kb, vb = base_k.copy(), base_v.copy()
            k_hat, v_hat = recons[view_sch]
            m3 = served_mask[:, :, None, None]
            kb[:, :, :s] = np.where(m3, k_hat, np.asarray(ck))
            vb[:, :, :s] = np.where(m3, v_hat, np.asarray(cv))
            h_swap = np.asarray(
                rollout(params, gen_ids, jnp.asarray(kb), jnp.asarray(vb))
            )
            parity_cos = _cos(h_hyb, h_swap)
            drift_cos = _cos(h_hyb, h_base)

            @jax.jit
            def hybrid_timed(toks, ck_t, cv_t, n, _roll=roll_fn):
                def body(_, carry):
                    ck_c, cv_c = carry
                    hs, _ = _roll(toks, ck_c, cv_c)
                    delta = (jnp.mean(hs) * 1e-30).astype(jnp.float32)
                    ck_c = tuple(c + delta for c in ck_c)
                    return ck_c, cv_c

                ck_c, cv_c = jax.lax.fori_loop(
                    0, n, body, (ck_t, cv_t)
                )
                return sum(jnp.sum(c) for c in ck_c)

            hyb_samples = _per_iter_samples(
                hybrid_timed, gen_ids, cache_k_uns, cache_v_uns,
                reps=max(2, timing_reps // 2), samples=3,
            )
            hyb_stats = replicate_stats(hyb_samples)
            hybrid_legs.append(
                {
                    "scheme": sch,
                    "n_served": n_srv,
                    "plan_degenerate_fallback": plan_degenerate,
                    "tokens_per_s": t_steps / hyb_stats["median"],
                    "rollout_s_stats": hyb_stats,
                    "hbm_bytes_hybrid": info["hbm_bytes_hybrid"],
                    "hbm_bytes_full": info["hbm_bytes_full"],
                    "resident_param_bytes": info["resident_param_bytes"],
                    "parity_cos_vs_buffer_swap_min": float(parity_cos.min()),
                    "drift_mean_cost": float(
                        np.maximum(1.0 - drift_cos.mean(), 0.0)
                    ),
                    "drift_final_step_cosine": float(drift_cos[-1]),
                }
            )
            if verbose:
                leg = hybrid_legs[-1]
                print(
                    f"[seed {seed}] hybrid {sch}: {n_srv}/{n_units} served "
                    f"{leg['tokens_per_s']:.0f} tok/s (base {base_tps:.0f}) | "
                    f"HBM {leg['hbm_bytes_hybrid']/1024:.0f} KiB vs full "
                    f"{leg['hbm_bytes_full']/1024:.0f} KiB | parity "
                    f"{leg['parity_cos_vs_buffer_swap_min']:.6f}",
                    flush=True,
                )

    return {
        "seed": seed,
        "solo_costs": {sch: [float(c) for c in costs[sch]] for sch in schemes},
        "stored_bytes_per_unit": {
            sch: [int(b) for b in stored[sch]] for sch in schemes
        },
        "entropy_nats": [float(e) for e in ent_u],
        "fit_cos_k_mean": float(k_cos.mean()),
        "fit_cos_v_mean": float(v_cos.mean()),
        "base_tokens_per_s": base_tps,
        "base_rollout_s_stats": base_stats,
        "budgets": budget_rows,
        "full_swap_mean_cost": float(np.maximum(1.0 - full_cos.mean(), 0.0)),
        "full_swap_final_step_cosine": float(full_cos[-1]),
        "recon_legs": recon_legs,
        "hybrid_legs": hybrid_legs,
        "wall_s": time.perf_counter() - t0,
    }


def plot_study(results: dict, out_png: Path) -> None:
    """Two panels: multi-token drift per budget, and measured-vs-predicted.

    Budgets are ordered magnitudes -> one-hue sequential ramp (darker =
    tighter budget spent); the full-swap anchor is neutral gray. Seeds
    overlay as thin lines of the same budget color.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    seeds = results["seeds"]
    budgets = [r["cost_target"] for r in seeds[0]["budgets"]]
    # single-hue sequential: light -> dark with budget index
    shades = [plt.cm.Blues(0.4 + 0.5 * i / max(len(budgets) - 1, 1))
              for i in range(len(budgets))]

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10.5, 4.2))
    for bi, target in enumerate(budgets):
        for si, sd in enumerate(seeds):
            row = sd["budgets"][bi]
            ax1.plot(
                range(1, len(row["per_step_cosine"]) + 1),
                row["per_step_cosine"],
                color=shades[bi], lw=1.4, alpha=0.85,
                label=f"target {target:g}" if si == 0 else None,
            )
    for sd in seeds:
        ax1.axhline(
            1.0 - sd["full_swap_mean_cost"], color="0.55", lw=1.0, ls="--",
            label="full swap (mean)" if sd is seeds[0] else None,
        )
    ax1.set_xlabel("generated token index")
    ax1.set_ylabel("output cosine vs all-HBM rollout")
    ax1.set_title("Planned rollout drift over generated tokens")
    ax1.grid(alpha=0.3)
    ax1.legend(fontsize=8)

    for bi, target in enumerate(budgets):
        xs = [sd["budgets"][bi]["predicted_cost_at_cut"] for sd in seeds]
        ys = [sd["budgets"][bi]["rollout_mean_cost"] for sd in seeds]
        ax2.plot(
            xs, ys, "o", ms=7, color=shades[bi], label=f"target {target:g}"
        )
    lims = ax2.get_xlim()
    lo = min(lims[0], ax2.get_ylim()[0])
    hi = max(lims[1], ax2.get_ylim()[1])
    span = [max(lo, 1e-7), hi]
    ax2.plot(span, span, "-", color="0.7", lw=1.0, label="y = x (additive)")
    ax2.set_xscale("log")
    ax2.set_yscale("log")
    ax2.set_xlabel("plan's predicted cost (sum of per-step solos)")
    ax2.set_ylabel("measured multi-token rollout cost")
    ax2.set_title("Per-step algebra vs executed rollout")
    ax2.grid(alpha=0.3, which="both")
    ax2.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out_png, dpi=130)
    plt.close(fig)
    print(f"wrote {out_png}")


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(
        description="Execute serve-plans as multi-token rollouts"
    )
    parser.add_argument("--out", type=Path,
                        default=Path("benchmarks/r5/plan_rollout.json"))
    parser.add_argument("--seq_len", type=int, default=512)
    parser.add_argument("--rollout_tokens", type=int, default=64)
    parser.add_argument("--budgets", type=float, nargs="+",
                        default=[0.003, 0.01, 0.03])
    parser.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    parser.add_argument("--schemes", nargs="+",
                        default=["master", "int8_g32", "int4_g128"])
    parser.add_argument("--config", default="small")
    parser.add_argument("--epochs", type=int, default=2000)
    parser.add_argument("--n_queries", type=int, default=8)
    parser.add_argument("--impl", default="auto")
    parser.add_argument("--timing_reps", type=int, default=None,
                        help="rollouts per timing leg (default: 5 TPU, 2 CPU)")
    parser.add_argument("--hybrid", action="store_true",
                        help="add hybrid-rollout legs: top-budget served set "
                        "attended straight from packed parameters "
                        "(models/llama_hybrid.make_hybrid_rollout) — zero "
                        "prefix cache HBM for served units")
    args = parser.parse_args(argv)

    from nerf_attention_tpu.utils import compile_cache

    compile_cache.enable()
    import jax

    if "master" not in args.schemes:
        raise SystemExit("--schemes must include 'master' (full-swap anchor)")
    reps = args.timing_reps
    if reps is None:
        reps = 5 if jax.default_backend() == "tpu" else 2

    results = {
        "study": "plan_rollout",
        "backend": jax.default_backend(),
        "seq_len": args.seq_len,
        "rollout_tokens": args.rollout_tokens,
        "schemes": list(args.schemes),
        "config": args.config,
        "epochs": args.epochs,
        "seeds": [],
    }
    for seed in args.seeds:
        results["seeds"].append(
            run_seed(
                seed=seed,
                seq_len=args.seq_len,
                rollout_tokens=args.rollout_tokens,
                budgets=list(args.budgets),
                schemes=tuple(args.schemes),
                config_name=args.config,
                epochs=args.epochs,
                n_queries=args.n_queries,
                impl=args.impl,
                timing_reps=reps,
                hybrid=args.hybrid,
            )
        )
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(results, indent=1))
    print(f"wrote {args.out}")
    plot_study(results, args.out.with_suffix(".png"))


if __name__ == "__main__":
    main()
