"""MFU accounting for the sweep + a measured bottleneck decomposition.

VERDICT r1 item 3: the ~20 TFLOP/s sustained estimate (~10% of v5e bf16
peak) needed profiling evidence. This tool measures, per architecture
group:

  * steady-state time per epoch via a dynamic-epoch trainer (one jitted
    program per config, `lax.fori_loop` over steps, so two trip counts can
    be differenced WITHOUT a second compile — scan-length recompiles through
    the tunnel cost 20-160s each);
  * analytic matmul FLOPs per epoch (forward 2*S*sum(in*out) per fit,
    backward 2x forward: dX and dW each cost a forward-sized matmul);
  * MFU vs the v5e bf16 peak AND vs the chip's *measured* achievable fp32
    and bf16 matmul rates (big square matmuls), because the sweep trains in
    fp32 by design (bf16 training breaks the CosSim parity target —
    CLAUDE.md) and fp32 MXU throughput is a fraction of bf16;
  * a component decomposition at the medium shape: sweep-shaped batched
    matmul, forward only, forward+backward, full optimizer step — naming
    where the non-matmul time goes.

Also captures a jax.profiler trace of one medium-group segment for the
record. Run on the real chip:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/mfu_profile.py --out benchmarks/r2
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

V5E_BF16_PEAK = 197e12  # TPU v5e published bf16 peak, FLOP/s


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def matmul_flops_per_row(config, head_dim: int) -> int:
    """2*sum(in*out) over the network's layers (one position row)."""
    h = config.hidden_features
    dims = [(1, h)] + [(h, h)] * config.hidden_layers + [(h, head_dim)]
    return sum(2 * i * o for i, o in dims)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default="benchmarks/r3")
    # N>=5 interleaved replicates: the floor FINDINGS' replicate-policy
    # claim commits every archived latency stat to.
    parser.add_argument("--samples", type=int, default=5)
    parser.add_argument("--n1", type=int, default=200)
    parser.add_argument("--n_fits", type=int, default=40)
    parser.add_argument("--seq_len", type=int, default=2048)
    parser.add_argument("--head_dim", type=int, default=128)
    parser.add_argument("--square", type=int, default=4096)
    parser.add_argument(
        "--sin_impl", type=str, default="exact", choices=["exact", "fast"],
        help="group-table sine path. Default 'exact': the archived r2 "
        "attribution (benchmarks/r2/mfu_profile.json) profiles the exact "
        "sine to expose the sine bound; pass 'fast' to profile the "
        "production (polynomial-sine) XLA step instead",
    )
    parser.add_argument("--trace", action="store_true",
                        help="also capture a jax.profiler trace (medium group)")
    args = parser.parse_args()

    from nerf_attention_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from nerf_attention_tpu.models.siren import init_siren, positions, siren_apply
    from nerf_attention_tpu.parallel.sweep import (
        _make_optimizer,
        normalize_targets,
    )
    from nerf_attention_tpu.types import CONFIGS_FULL
    from nerf_attention_tpu.utils.timing import (
        _per_iter_samples,
        replicate_stats,
        time_perturbed_forward_ms,
    )

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    backend = jax.default_backend()
    log(f"backend={backend}")
    np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))  # client warm

    rng = np.random.default_rng(0)
    targets_np = rng.standard_normal((args.n_fits, args.seq_len, args.head_dim)).astype(np.float32)
    targets = jnp.asarray(targets_np)
    pos = positions(args.seq_len)

    # ---- dynamic-epoch group trainer (shared with train_impl_bench) ----
    from tools.bench_common import make_group_runner

    def make_runner(config):
        return make_group_runner(
            config, args.head_dim, args.seq_len, impl="xla",
            sin_impl=args.sin_impl,
        )

    keys = jax.random.split(jax.random.PRNGKey(0), args.n_fits)
    groups = []
    for config in CONFIGS_FULL:
        run = make_runner(config)
        t0 = time.perf_counter()
        deltas = _per_iter_samples(
            run, keys, targets, reps=args.n1, samples=args.samples
        )
        per_epoch = replicate_stats([d * 1e3 for d in deltas])  # ms/epoch
        flops_epoch = args.n_fits * 3 * args.seq_len * matmul_flops_per_row(config, args.head_dim)
        tflops = flops_epoch / (per_epoch["median"] / 1e3) / 1e12
        groups.append(
            {
                "config": config.name,
                "ms_per_epoch": per_epoch,
                "matmul_flops_per_epoch": flops_epoch,
                "sustained_tflops": tflops,
                "mfu_vs_bf16_peak": tflops * 1e12 / V5E_BF16_PEAK,
            }
        )
        log(
            f"  {config.name}: {per_epoch['median']:.3f} ms/epoch "
            f"[{per_epoch['q25']:.3f},{per_epoch['q75']:.3f}] -> "
            f"{tflops:.1f} TFLOP/s ({tflops * 1e12 / V5E_BF16_PEAK * 100:.1f}% of "
            f"bf16 peak) (took {time.perf_counter() - t0:.0f}s)"
        )

    # ---- achievable matmul rates on this chip ----
    def matmul_rate(m, k, n, dtype, batch=None):
        shape_a = (m, k) if batch is None else (batch, m, k)
        shape_b = (k, n) if batch is None else (batch, k, n)
        # Random operands: splat constants (jnp.ones) let XLA's simplifier
        # collapse broadcast-of-scalar patterns and the dot itself.
        ka, kb = jax.random.split(jax.random.PRNGKey(0))
        a = jax.random.normal(ka, shape_a, dtype=jnp.float32).astype(dtype)
        b = jax.random.normal(kb, shape_b, dtype=jnp.float32).astype(dtype)

        def fwd(p):
            (w0, b0) = p[0]
            x = a * (1 + b0[0, 0] * 1e-30)
            return (
                jnp.einsum("...ik,...kn->...in", x, w0)
                if batch is not None
                else x @ w0
            )

        ms = time_perturbed_forward_ms([(b, jnp.zeros((1, 1), dtype))], fwd, reps=50)
        flops = 2 * m * k * n * (batch or 1)
        return flops / (ms / 1e3) / 1e12, ms

    rates = {}
    for label, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        big, _ = matmul_rate(args.square, args.square, args.square, dtype)
        rates[f"square_{args.square}_{label}_tflops"] = big
        swept, _ = matmul_rate(args.seq_len, 256, 256, dtype, batch=args.n_fits)
        rates[f"sweep_shaped_batched_{label}_tflops"] = swept
        log(
            f"  achievable {label}: square-{args.square} {big:.1f} TFLOP/s, "
            f"sweep-shaped batched {swept:.1f} TFLOP/s"
        )

    # ---- decomposition at the medium shape ----
    medium = next(c for c in CONFIGS_FULL if c.name == "medium")
    omega = medium.omega_0
    tn, mean, std = jax.vmap(normalize_targets)(targets)
    params0 = jax.vmap(lambda k: init_siren(k, medium, args.head_dim))(keys)
    params0 = [(w, b) for w, b in params0]

    def vloss(p):
        pred = jax.vmap(lambda q: siren_apply(q, omega, pos))(p)
        return jnp.mean((pred - tn) ** 2)

    def fwd_only(p):
        return vloss(p)

    def fwd_bwd(p):
        loss, grads = jax.value_and_grad(vloss)(p)
        # Keep the backward pass alive in the dependent loop's output.
        keep = sum(jnp.mean(g) for pair in grads for g in pair)
        return loss + keep * 1e-30

    decomp = {}
    decomp["forward_ms"] = time_perturbed_forward_ms(
        params0, fwd_only, reps=400, samples=args.samples, stats=True
    )
    decomp["forward_backward_ms"] = time_perturbed_forward_ms(
        params0, fwd_bwd, reps=200, samples=args.samples, stats=True
    )
    medium_group = next(g for g in groups if g["config"] == "medium")
    decomp["full_step_ms"] = medium_group["ms_per_epoch"]
    fwd_flops = args.n_fits * args.seq_len * matmul_flops_per_row(medium, args.head_dim)
    decomp["matmul_limited_forward_ms"] = (
        fwd_flops / (rates["sweep_shaped_batched_fp32_tflops"] * 1e12) * 1e3
    )
    decomp["matmul_limited_step_ms"] = 3 * decomp["matmul_limited_forward_ms"]

    # Transcendental attribution: the same forward with sin stripped (XLA
    # keeps identical matmul/elementwise structure) and the raw VPU sine
    # rate. The decode kernel's bf16 non-speedup (benchmarks/r2/
    # decode_ladder.json) is explained iff sin carries most of the time.
    def siren_apply_nosin(p):
        h = pos
        for w, b in p[:-1]:
            h = omega * (h @ w + b)  # sine replaced by identity
        w, b = p[-1]
        return h @ w + b

    def fwd_nosin(p):
        pred = jax.vmap(siren_apply_nosin)(p)
        return jnp.mean((pred - tn) ** 2)

    decomp["forward_nosin_ms"] = time_perturbed_forward_ms(
        params0, fwd_nosin, reps=400, samples=args.samples, stats=True
    )

    sin_elems = args.n_fits * args.seq_len * medium.hidden_features * (
        medium.hidden_layers + 1
    )
    # Random operand: a splat constant (jnp.ones) lets XLA rewrite
    # sin(broadcast(s)) as broadcast(sin(s)) and the measurement collapses
    # to one scalar sine.
    big = jax.random.uniform(
        jax.random.PRNGKey(0), (args.n_fits * args.seq_len, 256),
        jnp.float32, -50.0, 50.0,
    )

    def sin_only(p):
        (w0, b0) = p[0]
        return jnp.sin(big + b0[0, 0])

    sin_ms = time_perturbed_forward_ms(
        [(jnp.zeros((1, 1)), jnp.zeros((1, 1)))], sin_only, reps=200
    )
    decomp["vpu_sin_gelems_per_s"] = (
        args.n_fits * args.seq_len * 256 / (sin_ms / 1e3) / 1e9
    )
    decomp["sin_elems_per_forward"] = sin_elems
    decomp["sin_limited_forward_ms"] = (
        sin_elems / (decomp["vpu_sin_gelems_per_s"] * 1e9) * 1e3
    )

    from nerf_attention_tpu.ops.fastmath import fast_sin

    def fast_sin_only(p):
        (w0, b0) = p[0]
        return fast_sin(big + b0[0, 0])

    fast_ms = time_perturbed_forward_ms(
        [(jnp.zeros((1, 1)), jnp.zeros((1, 1)))], fast_sin_only, reps=200
    )
    decomp["vpu_fast_sin_gelems_per_s"] = (
        args.n_fits * args.seq_len * 256 / (fast_ms / 1e3) / 1e9
    )
    log(
        f"  medium decomposition: fwd {decomp['forward_ms']['median']:.3f} ms "
        f"(no-sin {decomp['forward_nosin_ms']['median']:.3f} ms, "
        f"sin-limited {decomp['sin_limited_forward_ms']:.3f} ms @ "
        f"{decomp['vpu_sin_gelems_per_s']:.1f} Gsin/s), "
        f"fwd+bwd {decomp['forward_backward_ms']['median']:.3f} ms, "
        f"full step {decomp['full_step_ms']['median']:.3f} ms, "
        f"matmul-limited step {decomp['matmul_limited_step_ms']:.3f} ms"
    )

    if args.trace:
        from nerf_attention_tpu.utils.tracing import trace

        run = make_runner(medium)
        np.asarray(run(keys, targets, 50))
        with trace(out_dir / "trace_medium"):
            np.asarray(run(keys, targets, 200))
        log(f"  trace written to {out_dir / 'trace_medium'}")

    payload = {
        "backend": backend,
        "sin_impl": args.sin_impl,
        "geometry": {"n_fits": args.n_fits, "seq_len": args.seq_len, "head_dim": args.head_dim},
        "v5e_bf16_peak_tflops": V5E_BF16_PEAK / 1e12,
        "groups": groups,
        "achievable": rates,
        "medium_decomposition": decomp,
    }
    with open(out_dir / "mfu_profile.json", "w") as f:
        json.dump(payload, f, indent=2)
    log(f"wrote {out_dir / 'mfu_profile.json'}")


if __name__ == "__main__":
    main()
