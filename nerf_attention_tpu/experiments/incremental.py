"""Experiment 7 (beyond reference): incremental refitting of a growing cache.

The reference fits each KV tensor ONCE at a fixed context length
(`/root/reference/nerf_attention/fit.py` — the whole study is static), but
the object being replaced is a LIVE KV cache: during generation it grows
every token, so "replace the cache with a SIREN" really means "keep a
SIREN current while its target appends". This experiment measures that
sustaining cost — the practicality axis the reference never touches.

Protocol. One long cache is generated once at the final context length;
the cache "as it existed" at length S is its prefix ``kv[:S]`` (tokens
append; old entries never change — real KV-cache semantics). Under this
framework's coordinate convention (``positions`` = linspace(0, 1, S),
`models/siren.py:152`), growth RECOMPRESSES every token's input coordinate,
so a stale network is wrong two ways: it has never seen the new tokens AND
its old knowledge sits at shifted coordinates. At each growth step
(+``chunk`` tokens) three numbers are measured, batched over a sample of
tensors in one jitted program per length:

  * stale     — the previous snapshot's params evaluated at the new length
                unchanged (the zero-cost floor)
  * warm      — fine-tune FROM the previous params, recording the CosSim
                trajectory EVERY epoch (one extra denormalized forward per
                step inside the scan), so epochs-to-parity is read off the
                curve rather than guessed from a fixed budget
  * scratch   — a fresh-init fit with the production budget (the control
                the sweep would pay to refit from nothing)

Headline: epochs for warm to come within ``tolerance`` of scratch's final
quality, per step and summed over the whole 2048→4096 growth — the
measured answer to "is a fitted cache maintainable, or must you re-pay the
full sweep per chunk?".

``coords="absolute"`` re-runs the same protocol with token i pinned at
i / (final_len - 1) for the whole growth, so appends extend the domain
instead of recompressing it — isolating how much of the sustaining cost
is the coordinate convention rather than the new tokens themselves.

Outputs ``incremental_results.json`` and ``incremental_refit.png`` under
the experiment output dir.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import jax
import jax.numpy as jnp
import numpy as np

from nerf_attention_tpu.io import kvstore
from nerf_attention_tpu.models.siren import (
    init_siren,
    positions,
    siren_apply_maybe_fm,
)
from nerf_attention_tpu.parallel.sweep import (
    _make_optimizer,
    _resolve_sin,
    cosine_similarity,
    normalize_targets,
)
from nerf_attention_tpu.types import CONFIGS_BY_NAME

MEDIUM = CONFIGS_BY_NAME["medium"]


def _fit_with_trajectory(
    targets: jnp.ndarray,
    init_params,
    *,
    config,
    epochs: int,
    lr: float,
    fm_mult: float | None,
    sin_impl: str = "fast",
    total_len: int | None = None,
):
    """Batched fit recording per-epoch denormalized CosSim.

    targets: (N, S, D). init_params: batched leaves [(N, in, out), (N, out)]
    (warm start) or None (fresh init, seeded). Returns (final params,
    trajectory (epochs, N) of mean CosSim vs the UNnormalized targets).
    ``total_len`` pins coordinates to the cache's final length (absolute
    convention); None is the relative linspace(0, 1, S) default.
    """
    n, seq_len, d_head = targets.shape
    pos = positions(seq_len, total_len=total_len)
    omega = config.omega_0
    sin = _resolve_sin(sin_impl)
    tx = _make_optimizer(lr, epochs)

    import optax

    def one_fit(params, target):
        tn, mean, std = normalize_targets(target)
        opt_state = tx.init(params)

        def loss_fn(p):
            pred = siren_apply_maybe_fm(p, omega, fm_mult, pos, sin=sin)
            return jnp.mean((pred - tn) ** 2), pred

        def step(carry, _):
            p, s = carry
            (_, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            updates, s = tx.update(grads, s, p)
            # cos reuses the pre-update forward: traj[k] is quality after k
            # update steps (traj[0] = the init/warm-start quality).
            cos = jnp.mean(cosine_similarity(pred * std + mean, target))
            return (optax.apply_updates(p, updates), s), cos

        (params_f, _), cos_traj = jax.lax.scan(
            step, (params, opt_state), length=epochs
        )
        return params_f, cos_traj

    return jax.jit(jax.vmap(one_fit))(init_params, targets)


def _eval_batch(
    params, targets, *, config, fm_mult, sin_impl="fast", total_len=None
):
    """Mean denormalized CosSim of batched params against (N, S, D) targets,
    normalizing each target exactly as a fit at this length would."""
    n, seq_len, d_head = targets.shape
    pos = positions(seq_len, total_len=total_len)
    sin = _resolve_sin(sin_impl)

    def one(p, target):
        _, mean, std = normalize_targets(target)
        pred = siren_apply_maybe_fm(p, config.omega_0, fm_mult, pos, sin=sin)
        return jnp.mean(cosine_similarity(pred * std + mean, target))

    return np.asarray(jax.jit(jax.vmap(one))(params, targets))


def _init_batch(n: int, config, d_head: int, seed: int):
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    return jax.vmap(lambda k: init_siren(k, config, d_head))(keys)


def run_incremental_experiment(
    kv_dir: Path,
    output_dir: Path,
    *,
    start_len: int = 2048,
    chunk: int = 256,
    layer_idx: int = 8,
    max_heads: int = 2,
    epochs_full: int = 2000,
    warm_epochs: int = 1000,
    lr: float = 1e-4,
    tolerance: float = 0.005,
    fm_mult: float | None = None,
    coords: str = "relative",
    verbose: bool = True,
) -> dict:
    """Measure warm-refit vs from-scratch cost over a growing cache.

    ``kv_dir`` must hold a cache at the FINAL length (its metadata seq_len);
    prefixes of it are the cache's earlier states. Uses ``max_heads`` heads'
    K and V from ``layer_idx`` (2*max_heads tensors, batched).

    ``coords``: "relative" (reference-parity linspace(0, 1, S) — growth
    recompresses every coordinate) or "absolute" (token i sits at
    i / (final_len - 1) forever — appends extend the domain without moving
    what the network already learned). The two coincide at the final
    length, so final-length quality is directly comparable across modes."""
    kv_dir, output_dir = Path(kv_dir), Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    metadata = kvstore.load_metadata(kv_dir)
    final_len = metadata.seq_len
    if final_len <= start_len:
        raise ValueError(
            f"cache seq_len {final_len} must exceed start_len {start_len}"
        )
    if coords not in ("relative", "absolute"):
        raise ValueError(f"coords must be relative|absolute, got {coords!r}")
    total_len = final_len if coords == "absolute" else None
    layer_idx = min(layer_idx, metadata.num_layers - 1)
    keys_a, values_a = kvstore.load_layer(kv_dir, layer_idx)
    tensors, names = [], []
    for h in range(min(metadata.num_kv_heads, max_heads)):
        tensors.append(np.asarray(keys_a[h], np.float32))
        names.append(f"L{layer_idx}_H{h}_key")
        tensors.append(np.asarray(values_a[h], np.float32))
        names.append(f"L{layer_idx}_H{h}_value")
    full = np.stack(tensors)  # (N, final_len, D)
    n = full.shape[0]

    snapshots = list(range(start_len, final_len + 1, chunk))
    if snapshots[-1] != final_len:
        snapshots.append(final_len)

    if verbose:
        print(
            f"Incremental refit: {n} tensors (layer {layer_idx}), cache "
            f"{start_len}->{final_len} in +{chunk} chunks, warm budget "
            f"{warm_epochs} vs scratch {epochs_full} epochs"
            + (f", FM-SIREN M={fm_mult:g}" if fm_mult else "")
            + (f", {coords} coordinates" if coords != "relative" else "")
        )

    steps = []
    t0 = time.perf_counter()
    params = None  # batched params carried across snapshots
    for i, seq_len in enumerate(snapshots):
        targets = jnp.asarray(full[:, :seq_len])
        scratch_params, scratch_traj = _fit_with_trajectory(
            targets, _init_batch(n, MEDIUM, full.shape[-1], seed=i),
            config=MEDIUM, epochs=epochs_full, lr=lr, fm_mult=fm_mult,
            total_len=total_len,
        )
        scratch_traj = np.asarray(scratch_traj)  # (N, epochs)
        scratch_final = float(np.mean(scratch_traj[:, -1]))
        rec = {
            "seq_len": seq_len,
            "scratch_final_cosine": scratch_final,
            "scratch_epochs": epochs_full,
        }
        if params is None:
            params = scratch_params  # the starting snapshot's nets
            rec["role"] = "initial fit"
        else:
            stale = float(
                np.mean(
                    _eval_batch(
                        params, targets, config=MEDIUM, fm_mult=fm_mult,
                        total_len=total_len,
                    )
                )
            )
            warm_params, warm_traj = _fit_with_trajectory(
                targets, params, config=MEDIUM, epochs=warm_epochs, lr=lr,
                fm_mult=fm_mult, total_len=total_len,
            )
            warm_traj = np.asarray(warm_traj)
            warm_mean = warm_traj.mean(axis=0)  # (epochs,)
            # traj[k] is quality after k updates, so the hit index IS the
            # number of warm epochs spent.
            target_q = scratch_final - tolerance
            hits = np.nonzero(warm_mean >= target_q)[0]
            epochs_to_parity = int(hits[0]) if hits.size else None
            rec.update(
                {
                    "role": "growth step",
                    "stale_cosine": stale,
                    "warm_final_cosine": float(warm_mean[-1]),
                    "warm_epochs_budget": warm_epochs,
                    "epochs_to_parity": epochs_to_parity,
                    "parity_target": target_q,
                    "warm_trajectory_every_50": [
                        float(x) for x in warm_mean[49::50]
                    ],
                }
            )
            params = warm_params
        steps.append(rec)
        if verbose:
            if rec["role"] == "initial fit":
                print(
                    f"  S={seq_len}: initial fit {scratch_final:.4f} "
                    f"({epochs_full} epochs)"
                )
            else:
                etp = rec["epochs_to_parity"]
                print(
                    f"  S={seq_len}: stale {rec['stale_cosine']:.4f} | warm "
                    f"{rec['warm_final_cosine']:.4f} | scratch "
                    f"{scratch_final:.4f} | parity at "
                    f"{etp if etp is not None else f'>{warm_epochs}'} epochs"
                )

    growth = [s for s in steps if s["role"] == "growth step"]
    reached = [
        s["epochs_to_parity"]
        for s in growth
        if s["epochs_to_parity"] is not None
    ]
    total_warm = sum(
        s["epochs_to_parity"]
        if s["epochs_to_parity"] is not None
        else s["warm_epochs_budget"]
        for s in growth
    )
    total_scratch = epochs_full * len(growth)
    results = {
        "config": MEDIUM.name,
        "layer": layer_idx,
        "n_tensors": n,
        "fm_mult": fm_mult,
        "coords": coords,
        "start_len": start_len,
        "final_len": final_len,
        "chunk": chunk,
        "tolerance": tolerance,
        "steps": steps,
        "growth_steps": len(growth),
        "steps_reaching_parity": len(reached),
        "total_warm_epochs_to_parity": total_warm,
        "total_scratch_epochs": total_scratch,
        "sustain_speedup_vs_scratch": (
            total_scratch / total_warm if total_warm else None
        ),
        "wall_seconds": time.perf_counter() - t0,
    }
    with open(output_dir / "incremental_results.json", "w") as f:
        json.dump(results, f, indent=2)
    if verbose:
        print(
            f"Sustaining {start_len}->{final_len}: {total_warm} warm epochs "
            f"vs {total_scratch} from-scratch "
            f"({results['sustain_speedup_vs_scratch']:.1f}x cheaper), "
            f"{len(reached)}/{len(growth)} steps reached parity "
            f"(in {results['wall_seconds']:.0f}s)"
        )
    plot_incremental(results, output_dir)
    return results


def plot_incremental(results: dict, output_dir: Path) -> None:
    """Per-step stale/warm/scratch quality plus the epochs-to-parity bars."""
    output_dir = Path(output_dir)
    growth = [s for s in results["steps"] if s["role"] == "growth step"]
    if not growth:
        return
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(13, 5))
    xs = [s["seq_len"] for s in growth]
    ax1.plot(
        xs, [s["scratch_final_cosine"] for s in growth],
        "o-", color="#2ecc71", label="from-scratch refit (2000 ep)",
    )
    ax1.plot(
        xs, [s["warm_final_cosine"] for s in growth],
        "s-", color="#3498db", label="warm refit (budget)",
    )
    ax1.plot(
        xs, [s["stale_cosine"] for s in growth],
        "v--", color="#e74c3c", label="stale network (0 epochs)",
    )
    ax1.set(
        xlabel="Context length (tokens)", ylabel="Cosine Similarity",
        title="Quality while the cache grows",
    )
    ax1.legend(fontsize=9)
    ax1.grid(True, alpha=0.3)

    parity = [
        s["epochs_to_parity"]
        if s["epochs_to_parity"] is not None
        else s["warm_epochs_budget"]
        for s in growth
    ]
    colors = [
        "#3498db" if s["epochs_to_parity"] is not None else "#e74c3c"
        for s in growth
    ]
    ax2.bar([str(x) for x in xs], parity, color=colors)
    ax2.axhline(
        results["steps"][0]["scratch_epochs"], color="#2ecc71",
        linestyle="--", label="from-scratch budget",
    )
    ax2.set(
        xlabel="Context length (tokens)",
        ylabel=f"Warm epochs to parity (tol {results['tolerance']})",
        title="Cost of keeping the network current",
    )
    ax2.legend(fontsize=9)
    ax2.grid(True, alpha=0.3, axis="y")
    plt.tight_layout()
    plt.savefig(
        output_dir / "incremental_refit.png", dpi=150, bbox_inches="tight"
    )
    plt.close()
    print(f"  Saved: {output_dir}/incremental_refit.png")
