"""MLA decode-step ladder: materialized vs rematerializing vs absorbed.

The serving question MLA uniquely poses (beyond the reference's single
cache surface, `/root/reference/nerf_attention/fit.py:20-118`): what
does one decode step cost under each way of holding the cache?

  * ``materialized`` — `mla_decode_step` over the per-head K/V cache in
    HBM: fewest attention FLOPs, but the step streams
    H*(qk_head_dim + v_head_dim) bytes per token per layer.
  * ``latent_remat`` — `mla_decode_step_latent`: stores only the latent
    (8x smaller at V2-Lite geometry, 71x at V3) but re-expands EVERY
    cached row through ``kv_b`` each step — S*r*H*(nope+dv) FLOPs per
    layer per token, the price of the naive latent serving loop.
  * ``absorbed`` — `mla_decode_step_absorbed`: DeepSeek's
    weight-absorption identity; attention runs IN latent space, so the
    step both reads the small cache AND does ~2*S*H*r FLOPs. The
    hypothesis this tool measures: absorbed dominates both at scale on
    TPU, because decode is HBM-bound and the latent is the smallest
    thing one can stream.
  * ``absorbed_pallas`` — the same step with ``attn_impl='pallas'``
    (`ops/mla_absorbed_pallas.py`): one fused pass over the cache
    instead of XLA's two streams (score contraction, then combine) and
    no fp32 (H, S) logit round-trip — the remaining 2-3x between the
    XLA absorbed step and the latent HBM floor.

Geometry defaults to DeepSeek-V2-Lite ratios (H=16, r=512, nope=128,
rope=64, dv=128) with a short all-dense stack — the FFN is identical
across paths, so path deltas are attention-path deltas. Caches are
random-latent-derived and CONSISTENT across paths (materialized =
kv_b-expansion of the same latents), so the tool also records cross-path
output cosines at the first ladder point. Timing is the dependent-loop
two-point protocol (`utils/timing.py`): each iteration's position is
perturbed by (mean(h) * 1e-30 -> int32), which is 0 at runtime but
data-dependent, so steps serialize and nothing hoists. Caches AND the
weight pytree ride as traced operands, not closure constants (a
closed-over pytree is baked into the compile payload as constants and
overflows the tunnel's remote-compile body — HTTP 413, measured at this
geometry's ~316 MB of weights).

Run on the real chip:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/mla_decode_bench.py \
        --out benchmarks/r4
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

LADDER = [1024, 4096, 16384, 32768]
HBM_GBPS_V5E = 819.0  # v5e HBM bandwidth, for the roofline column


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default="benchmarks/r4")
    parser.add_argument("--samples", type=int, default=5)
    parser.add_argument("--num_layers", type=int, default=4)
    parser.add_argument("--num_heads", type=int, default=16)
    parser.add_argument("--kv_lora_rank", type=int, default=512)
    parser.add_argument("--qk_nope_head_dim", type=int, default=128)
    parser.add_argument("--qk_rope_head_dim", type=int, default=64)
    parser.add_argument("--v_head_dim", type=int, default=128)
    parser.add_argument("--hidden_size", type=int, default=2048)
    parser.add_argument("--intermediate_size", type=int, default=4096)
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument(
        "--ladder", type=str, default=None,
        help="comma-separated seq_len override (smoke tests)",
    )
    parser.add_argument("--reps", type=int, default=None)
    parser.add_argument(
        "--quant_schemes", type=str, default="int8_g32,int4_g64",
        help="comma-separated quant-RESIDENT absorbed legs ('' disables): "
        "the latent cache rides as bit-packed codes in HBM and "
        "dequantizes in VMEM (ops/mla_quant_pallas.py) — the ladder's "
        "storage win made true on-device",
    )
    args = parser.parse_args()
    ladder = [int(x) for x in args.ladder.split(",")] if args.ladder else LADDER

    from nerf_attention_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_attention_tpu.models.mla_jax import (
        MLAConfig,
        init_random_mla,
        materialize_from_latent,
        mla_decode_step,
        mla_decode_step_absorbed,
        mla_decode_step_latent,
    )
    from nerf_attention_tpu.utils.timing import (
        _on_tpu,
        _per_iter_samples,
        replicate_stats,
    )

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    itemsize = 2 if args.dtype == "bfloat16" else 4
    config = MLAConfig(
        model_type="deepseek_v2",
        vocab_size=4096,
        hidden_size=args.hidden_size,
        intermediate_size=args.intermediate_size,
        num_hidden_layers=args.num_layers,
        num_attention_heads=args.num_heads,
        kv_lora_rank=args.kv_lora_rank,
        qk_nope_head_dim=args.qk_nope_head_dim,
        qk_rope_head_dim=args.qk_rope_head_dim,
        v_head_dim=args.v_head_dim,
    )
    params = init_random_mla(config, seed=0, dtype=dtype)
    kv_b = params["dense_layers"]["kv_b"]  # (L, r, H*(nope+dv))
    n_l = config.num_hidden_layers
    mat_row = config.num_attention_heads * (
        config.qk_head_dim + config.v_head_dim
    )
    log(
        f"backend={jax.default_backend()}  L={n_l} H={config.num_attention_heads} "
        f"r={config.kv_lora_rank} latent_dim={config.latent_dim} "
        f"materialized/latent bytes per token = {mat_row / config.latent_dim:.1f}x"
    )
    reps = args.reps if args.reps else (8 if _on_tpu() else 2)

    # Warm the client before any timed work.
    np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))

    token = jnp.asarray(7, jnp.int32)

    def make_caches(s: int):
        """Random latents + their kv_b expansion: consistent across paths."""
        lat = (
            jax.random.normal(
                jax.random.PRNGKey(s), (n_l, s, config.latent_dim)
            )
            * 0.5
        ).astype(dtype)
        ks, vs = [], []
        for layer in range(n_l):
            k, v = materialize_from_latent(config, lat[layer], kv_b[layer])
            ks.append(k)
            vs.append(v)
        return lat, jnp.stack(ks), jnp.stack(vs)

    def time_step(step, cache_ops, s: int):
        """Per-iteration seconds for one decode step over these caches.

        ``params`` rides as a traced operand alongside the caches — a
        closed-over weight pytree is baked into the compile payload as
        constants and overflows the tunnel's remote-compile body at this
        geometry (HTTP 413, measured: ~316 MB of closure weights)."""

        @jax.jit
        def run(p, *rest):
            caches, n_iter = rest[:-1], rest[-1]
            pos0 = jnp.asarray(s, jnp.int32)

            def body(_, carry):
                off, acc = carry
                h = step(p, token, pos0 + off, *caches)[0]
                d = jnp.mean(h).astype(jnp.float32) * 1e-30
                return (off + d.astype(jnp.int32), acc + d)

            return jax.lax.fori_loop(
                0, n_iter, body, (jnp.int32(0), jnp.float32(0.0))
            )[1]

        return replicate_stats(
            [
                v * 1e3
                for v in _per_iter_samples(
                    run, params, *cache_ops, reps=reps, samples=args.samples
                )
            ]
        )

    paths = {
        "materialized": lambda p, tok, pos, ck, cv: mla_decode_step(
            config, p, tok, pos, ck, cv
        ),
        "latent_remat": lambda p, tok, pos, lat: mla_decode_step_latent(
            config, p, tok, pos, lat
        ),
        "absorbed": lambda p, tok, pos, lat: mla_decode_step_absorbed(
            config, p, tok, pos, lat
        ),
        "absorbed_pallas": lambda p, tok, pos, lat: mla_decode_step_absorbed(
            config, p, tok, pos, lat, attn_impl="pallas"
        ),
    }

    results = {
        "geometry": {
            "num_layers": n_l,
            "num_heads": config.num_attention_heads,
            "kv_lora_rank": config.kv_lora_rank,
            "qk_nope_head_dim": config.qk_nope_head_dim,
            "qk_rope_head_dim": config.qk_rope_head_dim,
            "v_head_dim": config.v_head_dim,
            "hidden_size": config.hidden_size,
            "intermediate_size": config.intermediate_size,
            "dtype": args.dtype,
            "latent_dim": config.latent_dim,
            "materialized_over_latent_bytes": mat_row / config.latent_dim,
        },
        "backend": jax.default_backend(),
        "protocol": {
            "timer": "dependent-loop two-point (utils/timing.py)",
            "reps": reps,
            "samples": args.samples,
        },
        "ladder": [],
    }

    # Cross-path output agreement at the first ladder point (the caches
    # are consistent, so all three compute the same attention).
    s0 = ladder[0]
    lat, ck, cv = make_caches(s0)
    h_mat = np.asarray(
        mla_decode_step(config, params, token, s0, ck, cv)[0], np.float32
    )
    h_lat = np.asarray(
        mla_decode_step_latent(config, params, token, s0, lat)[0], np.float32
    )
    h_abs = np.asarray(
        mla_decode_step_absorbed(config, params, token, s0, lat)[0],
        np.float32,
    )
    h_pal = np.asarray(
        mla_decode_step_absorbed(
            config, params, token, s0, lat, attn_impl="pallas"
        )[0],
        np.float32,
    )

    def cosine(a, b):
        return float(
            np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        )

    qschemes = [x for x in args.quant_schemes.split(",") if x]
    if qschemes:
        from nerf_attention_tpu.models.mla_jax import (
            mla_decode_step_absorbed_quant,
            pack_mla_latent_stack,
        )
        from nerf_attention_tpu.ops.mla_quant_pallas import (
            resident_latent_bytes,
        )

        quant_parity = {}
        for sch in qschemes:
            ops0, layout0 = pack_mla_latent_stack(
                np.asarray(lat, np.float32), sch
            )
            h_q = np.asarray(
                mla_decode_step_absorbed_quant(
                    config, params, token, s0, tuple(ops0), layout0
                )[0],
                np.float32,
            )
            quant_parity[sch] = {
                "cos_vs_absorbed": cosine(h_q, h_abs),
                "max_abs_vs_absorbed": float(np.abs(h_q - h_abs).max()),
            }
            log(
                f"quant[{sch}] @S={s0}: cos(quant, abs)="
                f"{quant_parity[sch]['cos_vs_absorbed']:.6f}"
            )

    results["parity"] = {
        "seq_len": s0,
        "cos_absorbed_vs_materialized": cosine(h_abs, h_mat),
        "cos_absorbed_vs_latent_remat": cosine(h_abs, h_lat),
        "max_abs_absorbed_vs_latent_remat": float(
            np.abs(h_abs - h_lat).max()
        ),
        "cos_pallas_vs_absorbed": cosine(h_pal, h_abs),
        "max_abs_pallas_vs_absorbed": float(np.abs(h_pal - h_abs).max()),
    }
    if qschemes:
        results["parity"]["quant_resident"] = quant_parity
    log(f"parity @S={s0}: cos(abs, mat)={results['parity']['cos_absorbed_vs_materialized']:.6f}")

    for s in ladder:
        lat, ck, cv = make_caches(s)
        mat_bytes = int(ck.size + cv.size) * itemsize
        lat_bytes = int(lat.size) * itemsize
        row = {
            "seq_len": s,
            "cache_bytes": {
                "materialized": mat_bytes,
                "latent": lat_bytes,
                "ratio": mat_bytes / lat_bytes,
            },
            "hbm_floor_ms": {
                # cache-stream lower bound at v5e bandwidth
                "materialized": mat_bytes / HBM_GBPS_V5E / 1e6,
                "latent": lat_bytes / HBM_GBPS_V5E / 1e6,
            },
            "step_ms": {},
        }
        for name, step in paths.items():
            ops = (ck, cv) if name == "materialized" else (lat,)
            t0 = time.time()
            row["step_ms"][name] = time_step(step, ops, s)
            log(
                f"S={s:6d}  {name:13s}  "
                f"{row['step_ms'][name]['median']:8.3f} ms  "
                f"(iqr {row['step_ms'][name]['iqr']:.3f}, "
                f"wall {time.time() - t0:.0f}s)"
            )
        for sch in qschemes:
            ops_s, layout_s = pack_mla_latent_stack(
                np.asarray(lat, np.float32), sch
            )

            def step_q(p, tok, pos, *o, _l=layout_s):
                return mla_decode_step_absorbed_quant(
                    config, p, tok, pos, tuple(o), _l
                )

            name = f"absorbed_quant_{sch}"
            t0 = time.time()
            row["step_ms"][name] = time_step(step_q, tuple(ops_s), s)
            row["cache_bytes"][f"quant_{sch}_resident"] = (
                resident_latent_bytes(ops_s)
            )
            log(
                f"S={s:6d}  {name:22s}  "
                f"{row['step_ms'][name]['median']:8.3f} ms  "
                f"resident {resident_latent_bytes(ops_s) / 1e6:.1f} MB vs "
                f"latent {lat_bytes / 1e6:.1f} MB  "
                f"(wall {time.time() - t0:.0f}s)"
            )
        med = {k: v["median"] for k, v in row["step_ms"].items()}
        row["speedup_absorbed_over"] = {
            "materialized": med["materialized"] / med["absorbed"],
            "latent_remat": med["latent_remat"] / med["absorbed"],
        }
        row["speedup_pallas_over"] = {
            "materialized": med["materialized"] / med["absorbed_pallas"],
            "latent_remat": med["latent_remat"] / med["absorbed_pallas"],
            "absorbed_xla": med["absorbed"] / med["absorbed_pallas"],
        }
        results["ladder"].append(row)
        del lat, ck, cv

    out_json = out_dir / "mla_absorbed_decode.json"
    with open(out_json, "w") as f:
        json.dump(results, f, indent=2)
    log(f"wrote {out_json}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (ax, ax2) = plt.subplots(1, 2, figsize=(11, 4.2))
        xs = [r["seq_len"] for r in results["ladder"]]
        styles = {
            "materialized": ("#888888", "o"),
            "latent_remat": ("#d62728", "s"),
            "absorbed": ("#1f77b4", "D"),
            "absorbed_pallas": ("#2ca02c", "^"),
        }
        for name, (color, marker) in styles.items():
            med = [r["step_ms"][name]["median"] for r in results["ladder"]]
            lo = [r["step_ms"][name]["q25"] for r in results["ladder"]]
            hi = [r["step_ms"][name]["q75"] for r in results["ladder"]]
            ax.plot(xs, med, marker=marker, color=color, label=name)
            ax.fill_between(xs, lo, hi, color=color, alpha=0.2, lw=0)
        ax.plot(
            xs,
            [r["hbm_floor_ms"]["latent"] for r in results["ladder"]],
            ls="--", color="#1f77b4", alpha=0.5, label="latent HBM floor",
        )
        ax.plot(
            xs,
            [r["hbm_floor_ms"]["materialized"] for r in results["ladder"]],
            ls="--", color="#888888", alpha=0.5, label="materialized HBM floor",
        )
        ax.set_xscale("log", base=2)
        ax.set_yscale("log")
        ax.set_xlabel("cached tokens S")
        ax.set_ylabel("decode step (ms)")
        ax.set_title(
            f"MLA decode step, L={n_l} H={config.num_attention_heads} "
            f"r={config.kv_lora_rank} ({args.dtype})"
        )
        ax.legend(fontsize=8)
        ax.grid(alpha=0.3)

        ax2.plot(
            xs,
            [r["speedup_absorbed_over"]["materialized"] for r in results["ladder"]],
            marker="o", color="#888888", label="vs materialized",
        )
        ax2.plot(
            xs,
            [r["speedup_absorbed_over"]["latent_remat"] for r in results["ladder"]],
            marker="s", color="#d62728", label="vs latent remat",
        )
        ax2.plot(
            xs,
            [r["speedup_pallas_over"]["absorbed_xla"] for r in results["ladder"]],
            marker="^", color="#2ca02c", label="pallas vs absorbed XLA",
        )
        ax2.axhline(1.0, color="k", lw=0.8, alpha=0.5)
        ax2.set_xscale("log", base=2)
        ax2.set_xlabel("cached tokens S")
        ax2.set_ylabel("absorbed speedup (x)")
        ax2.set_title("weight absorption payoff")
        ax2.legend(fontsize=8)
        ax2.grid(alpha=0.3)
        fig.tight_layout()
        fig.savefig(out_dir / "mla_absorbed_decode.png", dpi=120)
        log(f"wrote {out_dir / 'mla_absorbed_decode.png'}")
    except Exception as e:  # pragma: no cover - figure is best-effort
        log(f"figure skipped: {e}")


if __name__ == "__main__":
    main()
