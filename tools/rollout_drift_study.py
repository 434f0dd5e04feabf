"""Rollout drift: does serving from parameters contaminate the growing cache?

The full-model end-metric (`tools/model_end_metric_study.py`) prices a
swapped cache at independent decode steps — every query reads the same
cache. Real decoding is sequential: each generated token APPENDS its own
K/V to the cache, and with a reconstructed prefix those appends are
computed from drifted hidden states. This study separates the two error
channels the end-metric conflates away:

  (a) reference — true prefix, self-appended KV (all exact);
  (b) drift     — reconstructed prefix, self-appended KV: appends inherit
                  the drift and later steps re-read them;
  (c) control   — reconstructed prefix, but appends FORCED to (a)'s exact
                  rows: the prefix error is present, the contamination
                  channel is cut.

If (b) tracks (c), cache contamination does not compound — the prefix
swap is the whole cost. If (b) falls away from (c) with step index, the
self-appended rows amplify the drift and a compressed-cache server must
re-materialize exact KV for generated tokens.

The scan decodes over a PRE-ALLOCATED (S+T)-row buffer, writing each
step's append at its position — the static-cache pattern
`llama_decode_step`'s position mask supports (rows past the filled
prefix are invisible; `models/llama_jax.py:_layer_decode`).

Hermetic protocol (no weights in this environment, BASELINE.md): the
end-metric study's 8-layer random-init model and global Q/K gain knob;
every (layer, kv-head, K|V) slice fitted in one batched program; T
sequential decode steps with true tail tokens (no lm_head is loaded —
drift is studied through the CACHE channel, tokens stay exogenous).

Writes ``rollout_drift{tag}.json`` under --out.

Run on the real chip:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/rollout_drift_study.py \
        --out benchmarks/r4
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DEFAULT_GAINS = (1.0, 8.0, 32.0)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def plot_rollout_drift(json_paths, out_png) -> None:
    """Two panels from the sharpest gain of each artifact: per-step output
    cosine for the two arms (seed-mean bold, seeds faint), and the
    control−drift gap per seed. Blue/orange with distinct linestyles so
    identity never rides color alone."""
    import json as _json

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    rows = []
    for p in json_paths:
        data = _json.loads(Path(p).read_text())
        row = max(data["gains"], key=lambda g: g["gain"])
        rows.append((data.get("seed", 0), row))
    drift = np.array(
        [r["per_step_output_cosine"]["drift_self_append"] for _, r in rows]
    )
    ctrl = np.array(
        [r["per_step_output_cosine"]["control_exact_append"] for _, r in rows]
    )
    steps = np.arange(1, drift.shape[1] + 1)
    ent = np.mean([r["attn_entropy_nats_mean"] for _, r in rows])

    def roll(x, w=17):
        # centered rolling mean; per-step cosine over single tokens is
        # high-variance, the trend is the signal
        k = np.ones(w) / w
        return np.convolve(x, k, mode="valid"), steps[w // 2 : -(w // 2)]

    blue, orange = "#3b6fb6", "#d9762b"
    fig, (ax, axg) = plt.subplots(1, 2, figsize=(12.0, 4.4))
    for arr, color, ls, name in (
        (drift, blue, "-", "self-append (serving default)"),
        (ctrl, orange, "--", "exact-append control"),
    ):
        ax.plot(steps, arr.mean(0), color=color, ls=ls, lw=0.6, alpha=0.3)
        sm, st = roll(arr.mean(0))
        ax.plot(st, sm, color=color, ls=ls, lw=2.2, label=name)
    ax.axhline(1.0, color="0.6", lw=0.8)
    ax.set_xlabel("rollout step")
    ax.set_ylabel("output cosine vs true-cache rollout")
    ax.set_title(
        f"Sharp attention (~{ent:.1f} nats), reconstructed prefix\n"
        f"seed mean: raw faint, 17-step rolling bold", fontsize=10,
    )
    ax.grid(alpha=0.25)
    ax.legend(fontsize=8, loc="lower left")

    for (seed, _), d, c in zip(rows, drift, ctrl):
        gap_sm, st = roll(c - d)
        line, = axg.plot(st, gap_sm, lw=1.8, label=f"seed {seed}")
        axg.plot(steps, c - d, lw=0.5, alpha=0.18, color=line.get_color())
    axg.axhline(0.0, color="0.4", lw=0.8)
    axg.set_xlabel("rollout step")
    axg.set_ylabel("control − self-append (gap)")
    axg.set_title(
        "Contamination emerges slowly\nper-seed gap, 17-step rolling mean",
        fontsize=10,
    )
    axg.grid(alpha=0.25)
    axg.legend(fontsize=8)

    fig.tight_layout()
    fig.savefig(out_png, dpi=130)
    plt.close(fig)
    log(f"wrote {out_png}")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default="benchmarks/r4")
    parser.add_argument("--seq_len", type=int, default=512)
    parser.add_argument("--steps", type=int, default=64)
    parser.add_argument("--epochs", type=int, default=2000)
    parser.add_argument("--net", type=str, default="small")
    parser.add_argument("--gains", type=str, default=None)
    parser.add_argument("--layers", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tag", type=str, default="")
    parser.add_argument(
        "--plot_from", type=str, default=None,
        help="comma-separated rollout_drift*.json paths: render the figure "
        "from existing artifacts (no device work) and exit",
    )
    args = parser.parse_args()
    if args.plot_from:
        out_dir = Path(args.out)
        out_dir.mkdir(parents=True, exist_ok=True)
        plot_rollout_drift(
            [p.strip() for p in args.plot_from.split(",") if p.strip()],
            out_dir / "rollout_drift.png",
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

    from nerf_attention_tpu.experiments.attention_error import _reconstruct
    from nerf_attention_tpu.models.llama_jax import (
        LlamaConfig,
        init_random_llama,
        llama_decode_rollout,
        llama_prefill_kv,
    )
    from nerf_attention_tpu.parallel.sweep import fit_batch
    from nerf_attention_tpu.types import CONFIGS_BY_NAME

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    net = CONFIGS_BY_NAME[args.net]
    s, t_steps, n_l = args.seq_len, args.steps, args.layers

    config = LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_hidden_layers=n_l, num_attention_heads=8, num_key_value_heads=4,
        head_dim=32,
    )
    n_kv, d = config.num_key_value_heads, config.head_dim
    log(
        f"backend={jax.default_backend()}  model L={n_l} H=8/kv4 d=32 "
        f"S={s} T={t_steps}  net={net.name}  epochs={args.epochs}"
    )
    np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))  # warm the client

    cos_rows = jax.jit(
        lambda a, b: jnp.sum(a * b, -1)
        / jnp.maximum(
            jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1), 1e-12
        )
    )

    def pad_buffer(prefix):
        zeros = jnp.zeros(prefix.shape[:2] + (t_steps, prefix.shape[3]),
                          prefix.dtype)
        return jnp.concatenate([prefix, zeros], axis=2)

    results = {
        "model": {
            "num_hidden_layers": n_l, "num_attention_heads": 8,
            "num_key_value_heads": n_kv, "head_dim": d, "hidden_size": 256,
            "seq_len": s, "rollout_steps": t_steps,
        },
        "net": net.name,
        "epochs": args.epochs,
        "seed": args.seed,
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

        ids = jnp.asarray(
            rng.randint(0, config.vocab_size, s + t_steps), jnp.int32
        )
        keys, values = llama_prefill_kv(config, params, ids)
        ck = jnp.asarray(keys[:, :, :s, :])
        cv = jnp.asarray(values[:, :, :s, :])
        toks = ids[s:]

        # (a) reference: true prefix, self appends (== exact appends)
        h_ref, _, (k_app, v_app), ent_ref = llama_decode_rollout(
            config, params, toks, s, pad_buffer(ck), pad_buffer(cv)
        )
        ent = np.asarray(ent_ref)

        # fit every slice in one batched program (K rows then V rows)
        targets = np.concatenate(
            [np.asarray(ck), np.asarray(cv)]
        ).reshape(2 * n_l * n_kv, s, d)
        batch = fit_batch(targets, net, epochs=args.epochs, seed=args.seed)
        n_half = n_l * n_kv
        recon = _reconstruct(batch, np.arange(2 * n_half), s, net, None)
        rec = recon.reshape(2 * n_l, n_kv, s, d)
        ck_hat, cv_hat = jnp.asarray(rec[:n_l]), jnp.asarray(rec[n_l:])
        k_cos = float(batch.cosine_mean[:n_half].mean())
        v_cos = float(batch.cosine_mean[n_half:].mean())

        # (b) drift: reconstructed prefix, self appends
        h_drift, _, (kd_app, _), _ = llama_decode_rollout(
            config, params, toks, s, pad_buffer(ck_hat), pad_buffer(cv_hat)
        )
        # (c) control: reconstructed prefix, exact appends
        h_ctrl, _, _, _ = llama_decode_rollout(
            config, params, toks, s, pad_buffer(ck_hat), pad_buffer(cv_hat),
            forced_keys=k_app, forced_values=v_app,
        )

        cos_drift = np.asarray(cos_rows(h_drift, h_ref), np.float64)
        cos_ctrl = np.asarray(cos_rows(h_ctrl, h_ref), np.float64)
        # appended-key drift relative to the exact appends, per step
        app_err = np.asarray(
            jnp.linalg.norm((kd_app - k_app).reshape(t_steps, -1), axis=-1)
            / jnp.maximum(
                jnp.linalg.norm(k_app.reshape(t_steps, -1), axis=-1), 1e-12
            ),
            np.float64,
        )

        q = max(1, t_steps // 4)
        row = {
            "gain": gain,
            "attn_entropy_nats_mean": float(ent.mean()),
            "key_proxy_cosine": k_cos,
            "value_proxy_cosine": v_cos,
            "per_step_output_cosine": {
                "drift_self_append": [float(x) for x in cos_drift],
                "control_exact_append": [float(x) for x in cos_ctrl],
            },
            "per_step_appended_key_rel_error": [float(x) for x in app_err],
            "summary": {
                "drift_first_quarter_mean": float(cos_drift[:q].mean()),
                "drift_last_quarter_mean": float(cos_drift[-q:].mean()),
                "control_first_quarter_mean": float(cos_ctrl[:q].mean()),
                "control_last_quarter_mean": float(cos_ctrl[-q:].mean()),
                "compounding_gap_last_quarter": float(
                    (cos_ctrl[-q:] - cos_drift[-q:]).mean()
                ),
            },
        }
        results["gains"].append(row)
        sm = row["summary"]
        log(
            f"  gain={gain}: H {ent.mean():.2f} nats | proxy K {k_cos:.4f} "
            f"V {v_cos:.4f} | drift {sm['drift_first_quarter_mean']:.4f}"
            f"->{sm['drift_last_quarter_mean']:.4f} | control "
            f"{sm['control_first_quarter_mean']:.4f}"
            f"->{sm['control_last_quarter_mean']:.4f} | gap(last q) "
            f"{sm['compounding_gap_last_quarter']:+.5f} "
            f"({time.perf_counter() - t0:.0f}s)"
        )

    name = f"rollout_drift{args.tag}.json"
    with open(out_dir / name, "w") as f:
        json.dump(results, f, indent=2)
    log(f"wrote {out_dir / name}")


if __name__ == "__main__":
    main()
