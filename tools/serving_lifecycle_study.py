"""Serving lifecycle: compress -> serve -> roll out -> absorb -> repeat.

The r4 studies each measured one edge of the serving loop: the policy
says WHICH heads to serve from parameters, the rollout-drift study says
self-appended KV are free at serving entropies, and the incremental
experiment says a warm refit absorbs appended tokens for ~0.05-0.35
epochs/token under absolute coordinates. This study closes the loop and
runs it for MULTIPLE cycles — the steady state a real server lives in:

  cycle c:
    1. serve: the cache is the nets' reconstruction at length L_c
       (the raw prefix was discarded at compression time — that is the
       point of compression);
    2. roll out T tokens over it (`llama_decode_rollout`, self-appends —
       the measured-right default), keeping the raw appended rows;
    3. absorb: warm-refit each net at L_{c+1} = L_c + T on the only
       truth the server still owns — its OWN reconstruction for
       [0, L_c) plus the raw appends for [L_c, L_{c+1}) — then discard
       the raws (absolute coordinates, so old rows never move);
    4. repeat.

Step 3 is self-distillation: each cycle re-encodes the previous
reconstruction. The question is whether this accumulates generation
loss (the JPEG-recompression failure mode) or stays fixed because a
warm net is already at a loss minimum of its own output. Measured
against the TRUE trajectory (the full prefill, which the server never
sees): per-cycle proxy CosSim of the reconstruction (old region vs
absorbed regions) and per-cycle output cosine of the rollout vs the
true-cache decode at the same positions.

Hermetic protocol: the end-metric studies' 8-layer random-init model
and global Q/K gain knob (`tools/model_end_metric_study.py`); exogenous
tokens (no lm_head — BASELINE.md). Writes
``serving_lifecycle{tag}.json`` under --out.

Run on the real chip (per-length compiles dominate the first run):
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/serving_lifecycle_study.py \
        --out benchmarks/r4
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DEFAULT_GAINS = (8.0, 32.0)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def plot_serving_lifecycle(json_paths, out_png) -> None:
    """Two panels over cycles: (left) rollout output cosine — the loop's
    serving quality — and (right) reconstruction vs the true trajectory,
    first-region (the fixed-point evidence) vs whole-cache mean. Color
    carries the gain regime (blue diffuse / orange sharp), linestyle the
    metric, so identity never rides color alone. Seeds faint, mean bold.
    Full 0-1 axes: the flatness claims are only honest unzoomed."""
    import json as _json

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    per_gain = {}  # gain -> list over seeds of cycle-rows
    for p in json_paths:
        data = _json.loads(Path(p).read_text())
        for row in data["gains"]:
            per_gain.setdefault(row["gain"], []).append(row["cycles"])

    blue, orange = "#3b6fb6", "#d9762b"
    styles = {
        min(per_gain): (blue, "o", "diffuse"),
        max(per_gain): (orange, "s", "sharp"),
    }
    fig, (ax, axr) = plt.subplots(1, 2, figsize=(11.0, 4.2))
    for gain, seeds in sorted(per_gain.items()):
        color, marker, regime = styles[gain]
        ent = np.mean(
            [c["attn_entropy_nats_mean"] for cycs in seeds for c in cycs]
        )
        cyc_x = np.array([c["cycle"] for c in seeds[0]])
        out = np.array(
            [[c["rollout_output_cosine_mean"] for c in cycs] for cycs in seeds]
        )
        for s in out:
            ax.plot(cyc_x, s, color=color, lw=0.7, alpha=0.3)
        ax.plot(
            cyc_x, out.mean(0), color=color, marker=marker, lw=2.2,
            label=f"gain {gain:g} ({regime}, ~{ent:.1f} nats)",
        )
        for key, ls, name in (
            ("recon_vs_true_cosine_first_region", "-", "first region"),
            ("recon_vs_true_cosine_mean", ":", "whole cache"),
        ):
            arr = np.array([[c[key] for c in cycs] for cycs in seeds])
            for s in arr:
                axr.plot(cyc_x, s, color=color, ls=ls, lw=0.7, alpha=0.3)
            axr.plot(
                cyc_x, arr.mean(0), color=color, ls=ls, marker=marker,
                lw=2.2, label=f"gain {gain:g} {name}",
            )

    ax.set_xlabel("lifecycle cycle")
    ax.set_ylabel("rollout output cosine vs true-cache decode")
    ax.set_title(
        "Serving quality across compress→serve→absorb cycles\n"
        "seed mean bold, seeds faint", fontsize=10,
    )
    axr.set_xlabel("lifecycle cycle (= re-encodes of the first region)")
    axr.set_ylabel("reconstruction cosine vs true trajectory")
    axr.set_title(
        "Self-distillation is a fixed point\n"
        "first region flat; sharp-regime decline is absorbed rollouts",
        fontsize=10,
    )
    for a in (ax, axr):
        a.set_ylim(0.0, 1.05)
        a.set_xticks(cyc_x)
        a.grid(alpha=0.25)
        a.legend(fontsize=8, loc="lower left")
    fig.tight_layout()
    fig.savefig(out_png, dpi=150)
    log(f"wrote {out_png}")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default="benchmarks/r4")
    parser.add_argument("--start_len", type=int, default=512)
    parser.add_argument("--chunk", type=int, default=128)
    parser.add_argument("--cycles", type=int, default=4)
    parser.add_argument("--epochs", type=int, default=2000,
                        help="cycle-0 compression budget")
    parser.add_argument("--warm_epochs", type=int, default=500,
                        help="per-cycle absorb budget")
    parser.add_argument("--net", type=str, default="small")
    parser.add_argument("--gains", type=str, default=None)
    parser.add_argument("--layers", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tag", type=str, default="")
    parser.add_argument(
        "--plot", type=str, default=None,
        help="comma-separated serving_lifecycle*.json paths: render the "
        "figure from existing artifacts and exit (no chip needed)",
    )
    args = parser.parse_args()
    if args.plot:
        out_dir = Path(args.out)
        out_dir.mkdir(parents=True, exist_ok=True)
        plot_serving_lifecycle(
            [s.strip() for s in args.plot.split(",")],
            out_dir / "serving_lifecycle.png",
        )
        return
    gains = (
        [float(x) for x in args.gains.split(",")]
        if args.gains
        else list(DEFAULT_GAINS)
    )

    from nerf_attention_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_attention_tpu.experiments.incremental import (
        _eval_batch,
        _fit_with_trajectory,
        _init_batch,
    )
    from nerf_attention_tpu.models.llama_jax import (
        LlamaConfig,
        init_random_llama,
        llama_decode_rollout,
        llama_prefill_kv,
    )
    from nerf_attention_tpu.models.siren import positions, siren_apply_maybe_fm
    from nerf_attention_tpu.parallel.sweep import normalize_targets
    from nerf_attention_tpu.types import CONFIGS_BY_NAME

    net = CONFIGS_BY_NAME[args.net]
    s0, t_chunk, n_cyc = args.start_len, args.chunk, args.cycles
    horizon = s0 + n_cyc * t_chunk
    n_l = args.layers

    config = LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_hidden_layers=n_l, num_attention_heads=8, num_key_value_heads=4,
        head_dim=32,
    )
    n_kv, d = config.num_key_value_heads, config.head_dim
    n_slices = 2 * n_l * n_kv
    log(
        f"backend={jax.default_backend()}  L={n_l} S0={s0} +{t_chunk}x{n_cyc}"
        f" -> {horizon}  net={net.name}  absorb={args.warm_epochs} ep"
    )
    np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))  # warm the client

    def recon_at(params_b, targets_for_stats, length):
        """Denormalized reconstruction (N, length, d) under absolute coords.

        The server denormalizes with the stats of the targets the nets
        were LAST fit on — exactly what it stores beside the params.
        """
        pos = positions(length, total_len=horizon)
        stats = [normalize_targets(t)[1:] for t in targets_for_stats]
        mean = jnp.asarray(np.stack([m for m, _ in stats]))
        std = jnp.asarray(np.stack([sd for _, sd in stats]))

        def one(p, m, sd):
            return siren_apply_maybe_fm(p, net.omega_0, None, pos) * sd + m

        return jax.jit(jax.vmap(one))(params_b, mean, std)

    cos_rows = jax.jit(
        lambda a, b: jnp.sum(a * b, -1)
        / jnp.maximum(
            jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1), 1e-12
        )
    )

    results = {
        "model": {
            "num_hidden_layers": n_l, "num_attention_heads": 8,
            "num_key_value_heads": n_kv, "head_dim": d, "hidden_size": 256,
            "start_len": s0, "chunk": t_chunk, "cycles": n_cyc,
            "horizon": horizon,
        },
        "net": net.name,
        "epochs": args.epochs,
        "warm_epochs": args.warm_epochs,
        "seed": args.seed,
        "coords": "absolute",
        "gains": [],
    }

    for gain in gains:
        t0 = time.perf_counter()
        rng = np.random.RandomState(args.seed)
        params = init_random_llama(config, seed=args.seed)
        layers = dict(params["layers"])
        scale = jnp.asarray(np.sqrt(gain), jnp.float32)
        layers["q"] = layers["q"] * scale
        layers["k"] = layers["k"] * scale
        params = {**params, "layers": layers}

        ids = jnp.asarray(rng.randint(0, config.vocab_size, horizon), jnp.int32)
        keys, values = llama_prefill_kv(config, params, ids)  # the TRUE world
        true_slices = np.concatenate(
            [np.asarray(keys), np.asarray(values)]
        ).reshape(n_slices, horizon, d)

        # cycle 0: compress the real prefix (the one time raw truth exists)
        targets = true_slices[:, :s0, :].copy()
        net_params, _ = _fit_with_trajectory(
            jnp.asarray(targets), _init_batch(n_slices, net, d, args.seed),
            config=net, epochs=args.epochs, lr=1e-4, fm_mult=None,
            total_len=horizon,
        )

        row = {"gain": gain, "cycles": []}
        for c in range(n_cyc):
            l_c = s0 + c * t_chunk
            l_next = l_c + t_chunk
            recon = recon_at(net_params, targets, l_c)  # (N, l_c, d)
            rec = np.asarray(recon).reshape(2 * n_l, n_kv, l_c, d)
            pad = jnp.zeros((n_l, n_kv, horizon - l_c, d), jnp.float32)
            k_buf = jnp.concatenate([jnp.asarray(rec[:n_l]), pad], axis=2)
            v_buf = jnp.concatenate([jnp.asarray(rec[n_l:]), pad], axis=2)

            # serve T tokens; reference = the same rollout over TRUE cache
            toks = ids[l_c:l_next]
            h_srv, _, (k_app, v_app), ent = llama_decode_rollout(
                config, params, toks, l_c, k_buf, v_buf
            )
            pad_t = jnp.zeros((n_l, n_kv, horizon - l_c, d), jnp.float32)
            kt = jnp.concatenate([keys[:, :, :l_c, :], pad_t], axis=2)
            vt = jnp.concatenate([values[:, :, :l_c, :], pad_t], axis=2)
            h_true, _, _, _ = llama_decode_rollout(
                config, params, toks, l_c, kt, vt
            )
            out_cos = np.asarray(cos_rows(h_srv, h_true), np.float64)

            # absorb: self-distill old region + raw appends, warm refit
            appends = np.concatenate(
                [np.asarray(k_app), np.asarray(v_app)], axis=1
            )  # (T, 2*n_l, n_kv, 1, d)
            appends = appends.transpose(1, 2, 0, 3, 4).reshape(
                n_slices, t_chunk, d
            )
            targets = np.concatenate(
                [np.asarray(recon), appends], axis=1
            )  # (N, l_next, d)
            net_params, _ = _fit_with_trajectory(
                jnp.asarray(targets), net_params,
                config=net, epochs=args.warm_epochs, lr=1e-4, fm_mult=None,
                total_len=horizon,
            )

            # score the absorbed nets against the TRUE trajectory
            recon_next = recon_at(net_params, targets, l_next)
            true_next = jnp.asarray(true_slices[:, :l_next, :])
            slice_cos = np.asarray(
                jax.jit(
                    jax.vmap(lambda a, b: jnp.mean(cos_rows(a, b)))
                )(recon_next, true_next),
                np.float64,
            )
            old_cos = float(
                np.asarray(
                    jax.jit(jax.vmap(lambda a, b: jnp.mean(cos_rows(a, b))))(
                        recon_next[:, :s0, :], true_next[:, :s0, :]
                    )
                ).mean()
            )
            cyc = {
                "cycle": c,
                "served_len": l_c,
                "absorbed_len": l_next,
                "rollout_output_cosine_mean": float(out_cos.mean()),
                "rollout_output_cosine_last8": float(out_cos[-8:].mean()),
                "attn_entropy_nats_mean": float(np.asarray(ent).mean()),
                "recon_vs_true_cosine_mean": float(slice_cos.mean()),
                "recon_vs_true_cosine_first_region": old_cos,
            }
            row["cycles"].append(cyc)
            log(
                f"  gain={gain} cycle {c}: serve@{l_c} out "
                f"{cyc['rollout_output_cosine_mean']:.4f} | absorbed@{l_next}"
                f" recon-vs-true {cyc['recon_vs_true_cosine_mean']:.4f}"
                f" (first {s0} rows {old_cos:.4f})"
            )

        results["gains"].append(row)
        log(f"  gain={gain} done in {time.perf_counter() - t0:.0f}s")

    name = f"serving_lifecycle{args.tag}.json"
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / name, "w") as f:
        json.dump(results, f, indent=2)
    log(f"wrote {out_dir / name}")


if __name__ == "__main__":
    main()
