"""Honest on-device microbenchmarks.

Per-call wall-clock timing of sub-millisecond ops measures dispatch overhead,
not the device (remote/tunneled TPUs add ~0.4 ms per call; the reference's
own 0.15 ms-vs-3 ms discrepancy, FINDINGS.md:97-100, is this same
measurement-context trap). Every timer here therefore runs the op inside one
jitted fori_loop with a *genuine data dependence* between iterations — each
step's input depends on the previous step's output through a non-foldable
perturbation — so XLA can neither hoist the op out of the loop nor overlap
iterations. One dispatch, N serialized executions, amortized time.
"""

from __future__ import annotations

import time


import jax
import jax.numpy as jnp
import numpy as np


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _sync(out) -> None:
    """Force completion. block_until_ready can return early on tunneled
    platforms (observed on axon) — fetching the value to host cannot. All
    timed fns therefore return a small (scalar-ish) output."""
    np.asarray(jax.tree_util.tree_leaves(out)[-1])


def _timed_once(run, n: int, *args) -> float:
    start = time.perf_counter()
    _sync(run(*args, n))
    return time.perf_counter() - start


def _per_iter_samples(
    run, *args, reps: int = 200, samples: int = 3
) -> list[float]:
    """Replicate per-iteration device times via two-point differences.

    A single timed call includes a large constant (host->device dispatch +
    scalar-fetch round-trip; tens of ms through a tunnel). Timing the loop at
    n and 4n and differencing cancels the constant exactly. Replicates are
    *interleaved* (t1,t2 pairs back-to-back) so each delta sees the same
    moment of device contention — the spread across replicates is then an
    honest error bar for the shared-chip variance documented in CLAUDE.md.
    """
    n1, n2 = reps, 4 * reps
    _sync(run(*args, n1))  # compile both loop lengths + warm
    _sync(run(*args, n2))
    deltas = []
    for _ in range(samples):
        t1 = _timed_once(run, n1, *args)
        t2 = _timed_once(run, n2, *args)
        deltas.append(max(t2 - t1, 1e-12) / (n2 - n1))
    return deltas


def replicate_stats(values: list[float]) -> dict:
    """Median + interquartile range of replicate measurements."""
    arr = np.asarray(values, dtype=float)
    q25, q50, q75 = np.percentile(arr, [25, 50, 75])
    return {
        "median": float(q50),
        "q25": float(q25),
        "q75": float(q75),
        "iqr": float(q75 - q25),
        "n": int(arr.size),
    }


def _per_iter_seconds(run, *args, reps: int = 200, samples: int = 3) -> float:
    return float(
        np.median(_per_iter_samples(run, *args, reps=reps, samples=samples))
    )


def time_perturbed_forward_ms(
    params, forward_fn, reps: int, samples: int = 3, stats: bool = False
):
    """Dependent-loop timer for any ``forward_fn(params) -> array`` (ms).

    Each iteration perturbs the first-layer bias by (prev output mean * 1e-30)
    — numerically invisible, but it forces a full dependent re-evaluation, so
    XLA can neither hoist the forward out of the loop nor overlap iterations.

    ``stats=True`` returns ``replicate_stats`` (median/q25/q75/iqr, ms)
    over the interleaved replicates instead of the bare median.
    """

    @jax.jit
    def run(params, n):
        def body(_, carry):
            p, acc = carry
            out = forward_fn(p)
            delta = jnp.mean(out).astype(jnp.float32) * 1e-30
            (w0, b0), rest = p[0], p[1:]
            return ([(w0, b0 + delta.astype(b0.dtype))] + rest, acc + delta)

        return jax.lax.fori_loop(0, n, body, (params, jnp.float32(0.0)))[1]

    deltas = [
        d * 1e3 for d in _per_iter_samples(run, params, reps=reps, samples=samples)
    ]
    return replicate_stats(deltas) if stats else float(np.median(deltas))


def time_siren_forward_ms(params, omega: float, seq_len: int, reps: int | None = None,
                          fused: bool = True, compute_dtype=None,
                          samples: int = 3, stats: bool = False,
                          sin_impl: str = "exact", fm_mult: float | None = None):
    """Amortized per-evaluation time of a full SIREN decode (ms).

    ``compute_dtype=jnp.bfloat16`` times the bf16 fused-decode variant and
    ``sin_impl='fast'`` the polynomial-sine variant (fused path only).
    ``fm_mult`` times the FM-SIREN decode (per-unit first-layer
    frequencies — in-kernel since r4). ``stats=True`` returns
    median/q25/q75/iqr.
    """
    from nerf_attention_tpu.models.siren import positions, siren_apply_maybe_fm
    from nerf_attention_tpu.ops.siren_pallas import siren_decode_fused
    from nerf_attention_tpu.parallel.sweep import _resolve_sin

    if reps is None:
        # Enough iterations that the n..4n delta rises above RTT jitter. On
        # the CPU test backend the loop runs serially at ~10us/step — full
        # TPU rep counts would take minutes, and there is no RTT to beat.
        reps = max(100, 2_000_000 // max(seq_len, 1)) if _on_tpu() else 20
    params = [(jnp.asarray(w), jnp.asarray(b)) for w, b in params]
    use_fused = fused and _on_tpu()
    dtype = compute_dtype if compute_dtype is not None else jnp.float32
    pos = positions(seq_len)
    sin = _resolve_sin(sin_impl)

    def forward(p):
        if use_fused:
            return siren_decode_fused(
                p, float(omega), seq_len, compute_dtype=dtype,
                sin_impl=sin_impl, fm_mult=fm_mult,
            )
        # Non-fused path: honor the variant options too, so non-TPU runs
        # don't mislabel exact-fp32 re-measurements as fast-sin/bf16 columns.
        pc = [(w.astype(dtype), b.astype(dtype)) for w, b in p]
        y = siren_apply_maybe_fm(pc, float(omega), fm_mult, pos.astype(dtype), sin=sin)
        return y.astype(jnp.float32)

    return time_perturbed_forward_ms(
        params, forward, reps, samples=samples, stats=stats
    )


MIN_POOL_BYTES = 128 * 1024 * 1024  # >> 16 MB VMEM: slices must come from HBM


def _random_pool(shape, dtype):
    """Random-valued read pool for the HBM timers.

    A jnp.ones pool is the CLAUDE.md splat-constant trap: today it is only
    protected because the pool is a jit *parameter* (opaque to XLA), but a
    constant pool one refactor away would let the simplifier fold the timed
    reduction and silently zero the measured bandwidth. Random contents
    make the measurement robust by construction.
    """
    return jax.random.uniform(
        jax.random.PRNGKey(0), shape, dtype=jnp.float32
    ).astype(dtype)


def measured_hbm_read_ms(
    seq_len: int, d_head: int, reps: int | None = None, dtype=jnp.bfloat16,
    samples: int = 3, stats: bool = False,
):
    """Measured time to read one (S, D) KV slice from HBM.

    Each loop iteration reduces a different (S, D) slice of a pool far larger
    than VMEM, so every read streams from HBM (a VMEM-sized carry would get
    pinned on-chip by XLA and measure VMEM bandwidth instead). The slice
    index depends on the running value, so iterations serialize like real
    decode steps.
    """
    slice_bytes = seq_len * d_head * jnp.dtype(dtype).itemsize
    if reps is None:
        # Target ~15 GB of traffic between the two timing points so the
        # delta dwarfs RTT jitter even for sub-microsecond slice reads.
        # CPU (tests): tiny reps — functionality only, no RTT to amortize.
        reps = int(np.clip(15e9 / slice_bytes / 3, 200, 50_000)) if _on_tpu() else 20
    pool_bytes = MIN_POOL_BYTES if _on_tpu() else 4 * 1024 * 1024
    k = max(2, pool_bytes // slice_bytes)
    pool = _random_pool((k, seq_len, d_head), dtype)

    @jax.jit
    def run(pool, n):
        def body(i, acc):
            # Index depends on acc (runtime, non-foldable) -> serialized.
            jitter = (acc * jnp.float32(1e-30)).astype(jnp.int32)
            idx = (i + jitter) % k
            s = jnp.sum(
                jax.lax.dynamic_index_in_dim(pool, idx, axis=0, keepdims=False),
                dtype=jnp.float32,
            )
            return acc + s * jnp.float32(1e-30)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    deltas = [d * 1e3 for d in _per_iter_samples(run, pool, reps=reps, samples=samples)]
    return replicate_stats(deltas) if stats else float(np.median(deltas))


def measured_hbm_stream_read_ms(
    n_slices: int,
    seq_len: int,
    d_head: int,
    reps: int | None = None,
    dtype=jnp.bfloat16,
    samples: int = 3,
    stats: bool = False,
):
    """Measured time for ONE streaming read of a full (N, S, D) KV cache.

    Unlike ``measured_hbm_read_ms`` (one slice, extrapolated ×N by callers),
    this reads the whole cache as a single reduction per iteration — one
    dispatch, full-cache prefetch behavior, no per-slice loop overhead. Two
    pool copies with an accumulator-dependent index keep iterations
    serialized and defeat on-chip residency (each copy alone usually exceeds
    VMEM at real cache sizes anyway).
    """
    total_bytes = n_slices * seq_len * d_head * jnp.dtype(dtype).itemsize
    if reps is None:
        # ~15 GB of traffic between the two timing points (see
        # _per_iter_seconds); CPU tests only need functionality.
        reps = int(np.clip(15e9 / total_bytes / 3, 8, 2000)) if _on_tpu() else 3
    pool = _random_pool((2, n_slices, seq_len, d_head), dtype)

    @jax.jit
    def run(pool, n):
        def body(i, acc):
            jitter = (acc * jnp.float32(1e-30)).astype(jnp.int32)
            idx = (i + jitter) % 2
            s = jnp.sum(
                jax.lax.dynamic_index_in_dim(pool, idx, axis=0, keepdims=False),
                dtype=jnp.float32,
            )
            return acc + s * jnp.float32(1e-30)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    deltas = [d * 1e3 for d in _per_iter_samples(run, pool, reps=reps, samples=samples)]
    return replicate_stats(deltas) if stats else float(np.median(deltas))


def time_jitted_ms(fn, *args, reps: int = 100) -> float:
    """Wall-clock per call for an already-jitted fn (includes dispatch).

    Use only for ops >> dispatch latency; prefer the dependent-loop timers
    above for microsecond-scale ops.
    """
    jax.block_until_ready(fn(*args))
    for _ in range(5):
        fn(*args)
    jax.block_until_ready(fn(*args))
    start = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / reps * 1e3
