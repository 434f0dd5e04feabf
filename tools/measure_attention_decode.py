"""Attention-from-parameters ladder: one-pass fused vs two-pass vs cache.

The serving question behind `ops/siren_attention_pallas.py`: what does a
decode step ``O = softmax(q K^T / sqrt(d)) V`` cost when the KV cache is
stored as SIREN parameters? Three paths, measured per seq_len over a
layer's worth of heads:

  * ``fused``   — the one-pass kernel: K/V tiles reconstructed in VMEM and
    consumed by the online softmax; no reconstructed tensor touches HBM.
  * ``twopass`` — the pre-kernel story: batched fused decode materializes
    K-hat/V-hat to HBM, XLA attention reads them back.
  * ``cache``   — the conventional baseline: attention over an fp32 KV
    cache already resident in HBM (what serving pays when the cache is
    stored raw; its memory cost is the ``kv_bytes`` column).

All three run under the same dependent-loop two-point timer as the rest of
the benchmarks (`utils/timing.py`): the loop body perturbs the first-layer
biases of BOTH nets and the query block by (output mean * 1e-30), so no
pass can be hoisted, and replicates are interleaved. A fused-vs-twopass
parity check at the first ladder point is recorded in the JSON.

Run on the real chip:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/measure_attention_decode.py \
        --out benchmarks/r4
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

LADDER = [2048, 8192, 32768]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default="benchmarks/r4")
    parser.add_argument("--samples", type=int, default=5)
    parser.add_argument("--n_heads", type=int, default=8)
    parser.add_argument("--head_dim", type=int, default=128)
    parser.add_argument("--n_queries", type=int, default=1)
    parser.add_argument("--config", type=str, default="medium")
    parser.add_argument("--sin_impl", type=str, default="fast")
    parser.add_argument(
        "--ladder", type=str, default=None,
        help="comma-separated seq_len override (smoke tests)",
    )
    parser.add_argument(
        "--quant_schemes", type=str, default="int8_g32,int6_g64,int4_g128",
        help="comma-separated quantized-RESIDENT fused legs ('' disables): "
        "the kernel's HBM operands are the bit-packed payloads "
        "(ops/siren_quant_pallas.py), so param_bytes_resident is the "
        "on-device footprint, not the at-rest one",
    )
    args = parser.parse_args()
    ladder = [int(x) for x in args.ladder.split(",")] if args.ladder else LADDER

    from nerf_attention_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_attention_tpu.experiments.attention_error import attention_outputs
    from nerf_attention_tpu.models.siren import init_siren
    from nerf_attention_tpu.ops.siren_attention_pallas import (
        siren_attention_decode_fused,
    )
    from nerf_attention_tpu.ops.siren_pallas import siren_decode_batch
    from nerf_attention_tpu.types import CONFIGS_BY_NAME
    from nerf_attention_tpu.utils.timing import (
        _on_tpu,
        _per_iter_samples,
        replicate_stats,
    )

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    config = CONFIGS_BY_NAME[args.config]
    n, d, t = args.n_heads, args.head_dim, args.n_queries
    log(f"backend={jax.default_backend()}  config={config.name}  "
        f"heads={n}  D={d}  T={t}")

    # Warm the client before any timed work.
    np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))

    keys = jax.random.split(jax.random.PRNGKey(0), 2 * n + 3)
    stack = lambda plist: [
        (jnp.stack([p[i][0] for p in plist]), jnp.stack([p[i][1] for p in plist]))
        for i in range(len(plist[0]))
    ]
    k_params = stack([init_siren(keys[i], config, d) for i in range(n)])
    v_params = stack([init_siren(keys[n + i], config, d) for i in range(n)])
    k_mean = jax.random.normal(keys[-3], (n, 1, d)) * 0.3
    v_mean = jax.random.normal(keys[-2], (n, 1, d)) * 0.3
    k_std = jnp.abs(k_mean) + 0.7
    v_std = jnp.abs(v_mean) + 0.5
    q = jax.random.normal(keys[-1], (n, t, d)) * 0.8
    per_net_elems = sum(w.size // n + b.size // n for w, b in k_params)
    param_bytes = 2 * n * per_net_elems * 4

    def time_variant(forward, operands, reps, extras=()):
        """Dependent-loop timer over (k_params, v_params, q) operands.

        ``extras`` (e.g. the raw HBM caches of the baseline variant) are
        traced arguments, NOT closure constants — closed-over arrays embed
        in the compile payload, and a 268 MB cache overflows the tunnel's
        remote-compile request limit (HTTP 413, measured).
        """

        @jax.jit
        def run(ops, extra, n_iter):
            def body(_, carry):
                (kp, vp, qq), acc = carry
                out = forward(kp, vp, qq, *extra)
                delta = jnp.mean(out).astype(jnp.float32) * 1e-30
                kp2 = [(kp[0][0], kp[0][1] + delta)] + list(kp[1:])
                vp2 = [(vp[0][0], vp[0][1] + delta)] + list(vp[1:])
                return ((kp2, vp2, qq + delta), acc + delta)

            return jax.lax.fori_loop(0, n_iter, body, (ops, jnp.float32(0.0)))[1]

        deltas = [
            v * 1e3
            for v in _per_iter_samples(
                run, operands, extras, reps=reps, samples=args.samples
            )
        ]
        return replicate_stats(deltas)

    schemes = [s for s in args.quant_schemes.split(",") if s]
    packed = {}
    if schemes:
        from nerf_attention_tpu.ops.siren_quant_pallas import (
            pack_resident_params,
            resident_param_bytes,
            siren_attention_decode_quant,
        )

        for sch in schemes:
            packed[sch] = (
                pack_resident_params(k_params, sch),
                pack_resident_params(v_params, sch),
            )

    def time_quant(sch, seq_len, reps):
        """Dependent-loop timer for the quantized-resident fused kernel.

        The perturbation rides the final-layer bias operand (always dq
        fp32 in the packed layout) of both nets plus the query block, so
        the pallas_call cannot be hoisted out of the timing loop.
        """
        (k_ops, k_layout), (v_ops, v_layout) = packed[sch]

        @jax.jit
        def run(ko, vo, qq, n_iter):
            def body(_, carry):
                (ko, vo, qv), acc = carry
                out = siren_attention_decode_quant(
                    None, None, k_mean, k_std, v_mean, v_std, qv, sch,
                    omega, seq_len, sin_impl=args.sin_impl, causal=False,
                    packed=((ko, k_layout), (vo, v_layout)),
                )
                delta = jnp.mean(out).astype(jnp.float32) * 1e-30
                ko2 = tuple(ko[:-1]) + (ko[-1] + delta,)
                vo2 = tuple(vo[:-1]) + (vo[-1] + delta,)
                return ((ko2, vo2, qv + delta), acc + delta)

            return jax.lax.fori_loop(
                0, n_iter, body, ((ko, vo, qq), jnp.float32(0.0))
            )[1]

        deltas = [
            v * 1e3
            for v in _per_iter_samples(
                run, tuple(k_ops), tuple(v_ops), q,
                reps=reps, samples=args.samples,
            )
        ]
        return replicate_stats(deltas)

    omega = float(config.omega_0)
    rows = []
    parity = None
    quant_parity = {}
    for seq_len in ladder:
        t0 = time.perf_counter()

        def fused(kp, vp, qq, _s=seq_len):
            return siren_attention_decode_fused(
                kp, vp, k_mean, k_std, v_mean, v_std, qq, omega, _s,
                sin_impl=args.sin_impl, causal=False, interpret=not _on_tpu(),
            )

        def twopass(kp, vp, qq, _s=seq_len):
            k_hat = (
                siren_decode_batch(
                    kp, omega, _s, sin_impl=args.sin_impl, interpret=not _on_tpu()
                )
                * k_std + k_mean
            )
            v_hat = (
                siren_decode_batch(
                    vp, omega, _s, sin_impl=args.sin_impl, interpret=not _on_tpu()
                )
                * v_std + v_mean
            )
            allowed = jnp.ones((t, _s), bool)
            return jax.vmap(
                lambda qh, kh, vh: attention_outputs(qh, kh, vh, allowed)[0]
            )(qq, k_hat, v_hat)

        k_cache = jax.random.normal(jax.random.PRNGKey(7), (n, seq_len, d))
        v_cache = jax.random.normal(jax.random.PRNGKey(8), (n, seq_len, d))

        def cache_attn(kp, vp, qq, kh_all, vh_all, _s=seq_len):
            allowed = jnp.ones((t, _s), bool)
            return jax.vmap(
                lambda qh, kh, vh: attention_outputs(qh, kh, vh, allowed)[0]
            )(qq, kh_all, vh_all)

        if parity is None:
            a = np.asarray(fused(k_params, v_params, q))
            b = np.asarray(twopass(k_params, v_params, q))
            parity = {
                "seq_len": seq_len,
                "max_abs_err": float(np.abs(a - b).max()),
                "mean_abs_err": float(np.abs(a - b).mean()),
            }
            log(f"  parity fused-vs-twopass @S={seq_len}: "
                f"max {parity['max_abs_err']:.2e}")

        reps = (
            max(30, 2_000_000 // max(seq_len * n, 1)) if _on_tpu() else 10
        )
        operands = (k_params, v_params, q)
        fused_ms = time_variant(fused, operands, reps)
        twopass_ms = time_variant(twopass, operands, reps)
        # Raw cache attention is ~10-50x cheaper than the fused kernel: at
        # the fused rep count its two-point difference sits below tunnel
        # noise and every sample hits the timer's 1e-12 clamp (measured:
        # a 2.7e-12 ms "median" at S=2048).  Scale reps up so the work is
        # measurable, and flag the row when the clamp still fires.
        cache_ms = time_variant(
            cache_attn, operands, reps * 16, extras=(k_cache, v_cache)
        )
        cache_clamped = cache_ms["median"] * 1e-3 <= 1.5e-12 / (3 * reps * 16)
        if cache_clamped:
            cache_ms = dict(cache_ms, below_noise=True)

        # Quant-RESIDENT raw-cache attention (round 5): the fp32 cache
        # baseline's K/V ride as bit-packed codes, dequantized per tile
        # in VMEM (ops/kv_quant_pallas.py). Cache attention is
        # HBM-bandwidth-bound, so fewer resident bytes should read as
        # lower latency (the MLA result on the GQA surface).
        kv_quant_rows = {}
        if schemes:
            from nerf_attention_tpu.ops.kv_quant_pallas import (
                kv_cache_attention_quant,
                pack_kv_unit_stack,
                resident_kv_bytes,
            )

            ck_np = np.asarray(k_cache)
            cv_np = np.asarray(v_cache)
            for sch in schemes:
                pk = pack_kv_unit_stack(ck_np, sch)
                pv = pack_kv_unit_stack(cv_np, sch)

                # Packed ops ride as TRACED operands (not closure
                # constants): closed-over arrays bake into the compile
                # payload — measured 275 MB cache entries / tunnel bodies
                # at S=32768 before this was threaded.
                def kvq_timed(qq, k_ops_t, v_ops_t, n, _lk=pk[1], _lv=pv[1]):
                    def body(_, carry):
                        qq_c, acc = carry
                        out = kv_cache_attention_quant(
                            qq_c, (k_ops_t, _lk), (v_ops_t, _lv), seq_len,
                            scale=1.0 / np.sqrt(d),
                            interpret=not _on_tpu(),
                        )
                        delta = jnp.mean(out).astype(jnp.float32) * 1e-30
                        return qq_c + delta, acc + delta

                    return jax.lax.fori_loop(
                        0, n, body, (qq, jnp.float32(0.0))
                    )[1]

                kvq_samples = _per_iter_samples(
                    jax.jit(kvq_timed), q, tuple(pk[0]), tuple(pv[0]),
                    reps=reps * 4, samples=args.samples,
                )
                kvq_stats = replicate_stats([v * 1e3 for v in kvq_samples])
                kv_quant_rows[sch] = {
                    "ms": kvq_stats,
                    "cache_bytes_resident": resident_kv_bytes(pk[0])
                    + resident_kv_bytes(pv[0]),
                    "over_fp32_cache": (
                        None
                        if cache_clamped
                        else kvq_stats["median"]
                        / max(cache_ms["median"], 1e-12)
                    ),
                }
                log(
                    f"  S={seq_len}: kv_cache_quant[{sch}] "
                    f"{kvq_stats['median']:.4f}ms  resident "
                    f"{kv_quant_rows[sch]['cache_bytes_resident']/1024:.0f} "
                    f"KiB (fp32 cache {2 * n * seq_len * d * 4/1024:.0f} KiB)"
                )
        quant_rows = {}
        for sch in schemes:
            if sch not in quant_parity:
                # parity vs the plain fused kernel on host-dequantized nets:
                # the same dequantized fp32 weights, so agreement is fp32
                # op-order noise.
                from nerf_attention_tpu.ops.quantize import quantize_params

                def _dq(params, _sch=sch):
                    n_nets = params[0][0].shape[0]
                    per = [
                        quantize_params(
                            [(np.asarray(w)[i], np.asarray(b)[i]) for w, b in params],
                            _sch,
                        )[1]
                        for i in range(n_nets)
                    ]
                    return [
                        (
                            jnp.stack([per[i][li][0] for i in range(n_nets)]),
                            jnp.stack([per[i][li][1] for i in range(n_nets)]),
                        )
                        for li in range(len(params))
                    ]

                a = np.asarray(
                    siren_attention_decode_quant(
                        None, None, k_mean, k_std, v_mean, v_std, q, sch,
                        omega, seq_len, sin_impl=args.sin_impl, causal=False,
                        packed=packed[sch],
                    )
                )
                b = np.asarray(
                    siren_attention_decode_fused(
                        _dq(k_params), _dq(v_params), k_mean, k_std, v_mean,
                        v_std, q, omega, seq_len, sin_impl=args.sin_impl,
                        causal=False, interpret=not _on_tpu(),
                    )
                )
                quant_parity[sch] = {
                    "seq_len": seq_len,
                    "max_abs_err": float(np.abs(a - b).max()),
                }
                log(f"  parity quant[{sch}]-vs-fused-dequant @S={seq_len}: "
                    f"max {quant_parity[sch]['max_abs_err']:.2e}")
            q_ms = time_quant(sch, seq_len, reps)
            quant_rows[sch] = {
                "ms": q_ms,
                "param_bytes_resident": resident_param_bytes(
                    packed[sch][0][0]
                ) + resident_param_bytes(packed[sch][1][0]),
                "over_fp32_fused": q_ms["median"] / max(fused_ms["median"], 1e-12),
            }
            log(f"  S={seq_len}: quant[{sch}] {q_ms['median']:.4f}ms "
                f"[{q_ms['q25']:.4f},{q_ms['q75']:.4f}]  "
                f"resident {quant_rows[sch]['param_bytes_resident']/1024:.0f} KiB "
                f"({quant_rows[sch]['over_fp32_fused']:.2f}x fp32-fused)")
        kv_bytes = 2 * n * seq_len * d * 4
        row = {
            "seq_len": seq_len,
            "fused_ms": fused_ms,
            "twopass_ms": twopass_ms,
            "cache_attn_ms": cache_ms,
            "speedup_vs_twopass": twopass_ms["median"]
            / max(fused_ms["median"], 1e-12),
            "fused_over_cache": (
                None
                if cache_clamped
                else fused_ms["median"] / max(cache_ms["median"], 1e-12)
            ),
            "kv_bytes_fp32": kv_bytes,
            "param_bytes_fp32": param_bytes,
            "compression": kv_bytes / max(param_bytes, 1),
            "quant_resident": quant_rows,
            "kv_cache_quant_resident": kv_quant_rows,
        }
        rows.append(row)
        log(
            f"  S={seq_len}: fused {fused_ms['median']:.4f}ms "
            f"[{fused_ms['q25']:.4f},{fused_ms['q75']:.4f}]  "
            f"twopass {twopass_ms['median']:.4f}ms "
            f"[{twopass_ms['q25']:.4f},{twopass_ms['q75']:.4f}]  "
            f"cache {cache_ms['median']:.4f}ms "
            f"[{cache_ms['q25']:.4f},{cache_ms['q75']:.4f}]  "
            f"speedup {row['speedup_vs_twopass']:.2f}x  "
            f"(took {time.perf_counter() - t0:.0f}s)"
        )

    payload = {
        "backend": jax.default_backend(),
        "config": config.name,
        "n_heads": n,
        "head_dim": d,
        "n_queries": t,
        "sin_impl": args.sin_impl,
        "samples_per_point": args.samples,
        "parity_fused_vs_twopass": parity,
        "parity_quant_vs_fused_dequant": quant_parity,
        "quant_schemes": schemes,
        "ladder": rows,
    }
    with open(out_dir / "attention_decode.json", "w") as f:
        json.dump(payload, f, indent=2)
    log(f"wrote {out_dir / 'attention_decode.json'}")


if __name__ == "__main__":
    main()
