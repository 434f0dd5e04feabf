"""Batched SIREN training: many fits as ONE compiled XLA program.

The reference trains its 280-fit sweep sequentially — 2000 tiny optimizer
steps x 280 fits = 560k kernel launches, launch-latency bound
(`/root/reference/nerf_attention/fit.py:54-86`, `siren.py:98-105`). Here every
group of same-architecture fits becomes ``jit(vmap(lax.scan(train_step)))``:

  * ``lax.scan`` over epochs removes per-step Python dispatch entirely,
  * ``vmap`` over the fit axis turns N tiny matmuls into N-times-larger
    batched matmuls that tile onto the MXU,
  * the fit axis is sharded across the device mesh (pure data parallel,
    zero collectives in the hot loop).

Training numerics match the reference (`siren.py:82-128`): positions are
linspace(0,1,S) as an (S,1) column; targets are z-normalized per output dim
with an unbiased std clamped to >= 1e-3; the loss is full-batch MSE on the
normalized targets; the optimizer is Adam(lr=1e-4) under cosine annealing to
lr*0.01 over the full epoch budget.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerf_attention_tpu.models.siren import (
    init_siren,
    positions,
    siren_apply,
    siren_apply_maybe_fm,
)
from nerf_attention_tpu.parallel.mesh import (
    FIT_AXIS,
    batch_sharding,
    pad_to_multiple,
    shard_batch,
    shard_map_compat,
)
from nerf_attention_tpu.types import SIRENConfig

STD_CLAMP = 1e-3  # reference siren.py:86
COSINE_EPS = 1e-8  # torch F.cosine_similarity default eps


@dataclass
class BatchFitMetrics:
    """Results for N fits of one architecture; arrays lead with the fit axis."""

    params: list[tuple[np.ndarray, np.ndarray]]  # each array (N, in, out) / (N, out)
    target_mean: np.ndarray  # (N, 1, D)
    target_std: np.ndarray  # (N, 1, D)
    losses: np.ndarray  # (N, epochs) normalized-target MSE per step
    final_mse: np.ndarray  # (N,)
    cosine_mean: np.ndarray  # (N,)
    cosine_min: np.ndarray  # (N,)
    cosine_std: np.ndarray  # (N,)
    per_pos_mse: np.ndarray  # (N, S)
    cosine_sims: np.ndarray  # (N, S)
    train_time_seconds: float  # wall-clock for the whole batch
    num_fits: int

    @property
    def seconds_per_fit(self) -> float:
        return self.train_time_seconds / max(self.num_fits, 1)


def cosine_similarity(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Row-wise cosine similarity over the last axis, torch eps semantics:
    x1.x2 / max(||x1|| * ||x2||, eps) — the clamp applies to the PRODUCT of
    norms (F.cosine_similarity docs), which matters only for degenerate
    near-zero rows."""
    denom = jnp.linalg.norm(pred, axis=-1) * jnp.linalg.norm(target, axis=-1)
    return jnp.sum(pred * target, axis=-1) / jnp.maximum(denom, COSINE_EPS)


def normalize_targets(targets: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-dim z-normalization with clamped unbiased std (siren.py:85-87)."""
    mean = jnp.mean(targets, axis=0, keepdims=True)
    std = jnp.std(targets, axis=0, keepdims=True, ddof=1)
    std = jnp.maximum(std, STD_CLAMP)
    return (targets - mean) / std, mean, std


def _make_optimizer(lr: float, epochs: int) -> optax.GradientTransformation:
    # CosineAnnealingLR(T_max=epochs, eta_min=lr*0.01) == cosine_decay(alpha=.01)
    schedule = optax.cosine_decay_schedule(lr, decay_steps=epochs, alpha=0.01)
    return optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8)


def _resolve_sin(sin_impl: str):
    if sin_impl == "exact":
        return jnp.sin
    if sin_impl != "fast":
        raise ValueError(f"sin_impl must be exact|fast, got {sin_impl!r}")
    from nerf_attention_tpu.ops.fastmath import fast_sin

    return fast_sin


def _resolve_apply(fm_mult: float | None):
    """The forward used by training/eval: shared-omega SIREN, or the
    FM variant with per-unit first-layer multipliers spread 1..fm_mult
    (equal parameter count; see models/siren.py and FINDINGS r3 — the
    measured quality lever on hard values)."""
    return partial(siren_apply_maybe_fm, fm_mult=fm_mult)


def _single_fit(
    key: jax.Array,
    target: jax.Array,
    *,
    config: SIRENConfig,
    epochs: int,
    lr: float,
    sin_impl: str = "fast",
    fm_mult: float | None = None,
):
    """Train one SIREN on one (S, D) tensor. Traced once, vmapped over fits."""
    seq_len, d_head = target.shape
    pos = positions(seq_len, dtype=target.dtype)
    tx = _make_optimizer(lr, epochs)
    omega = config.omega_0
    sin = _resolve_sin(sin_impl)
    apply = _resolve_apply(fm_mult)

    targets_norm, mean, std = normalize_targets(target)
    params = init_siren(key, config, d_head, dtype=target.dtype)
    opt_state = tx.init(params)

    def loss_fn(p):
        pred = apply(p, omega, x=pos, sin=sin)
        return jnp.mean((pred - targets_norm) ** 2)

    def step(carry, _):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    (params, _), losses = jax.lax.scan(step, (params, opt_state), length=epochs)

    # Final evaluation in real (de-normalized) space (siren.py:119-126).
    metrics = _final_eval(params, omega, pos, target, mean, std, apply=apply)
    metrics["losses"] = losses
    metrics["target_mean"] = mean
    metrics["target_std"] = std
    return params, metrics


def _final_eval(params, omega: float, pos, target, mean, std, apply=siren_apply):
    """De-normalized final metrics for one fit (siren.py:119-126)."""
    pred = apply(params, omega, x=pos) * std + mean
    err = pred - target
    cos = cosine_similarity(pred, target)
    return {
        "final_mse": jnp.mean(err**2),
        "cosine_mean": jnp.mean(cos),
        "cosine_min": jnp.min(cos),
        "cosine_std": jnp.std(cos, ddof=1),
        "per_pos_mse": jnp.mean(err**2, axis=1),
        "cosine_sims": cos,
    }


def _pallas_group_train(
    keys, targets, *, config: SIRENConfig, epochs: int, lr: float,
    sin_impl: str = "fast", mxu: str = "fp32", fm_mult: float | None = None,
):
    """One group's training with the fused kernel: whole forward+backward is
    one fused TPU kernel per step (ops/siren_train_pallas.py); init, the
    Adam update, and the final evaluation stay in XLA. Numerics match the
    XLA path up to fp32 reduction-order rounding. Pure function of its
    shard — also the per-device body under shard_map."""
    from nerf_attention_tpu.ops.siren_train_pallas import siren_train_grads

    n, seq_len, d_head = targets.shape
    omega = config.omega_0
    pos = positions(seq_len, dtype=targets.dtype)
    tx = _make_optimizer(lr, epochs)

    interpret = jax.default_backend() != "tpu"  # CPU tests run interpreted

    targets_norm, mean, std = jax.vmap(normalize_targets)(targets)
    params = jax.vmap(lambda k: init_siren(k, config, d_head, dtype=targets.dtype))(
        keys
    )
    opt_state = tx.init(params)

    def step(carry, _):
        p, s = carry
        loss, grads = siren_train_grads(
            p, targets_norm, omega=omega, interpret=interpret,
            sin_impl=sin_impl, mxu=mxu, fm_mult=fm_mult,
        )
        updates, s = tx.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    (params, _), losses = jax.lax.scan(step, (params, opt_state), length=epochs)

    apply = _resolve_apply(fm_mult)
    eval_fn = lambda p, t, m, sd: _final_eval(p, omega, pos, t, m, sd, apply=apply)
    metrics = jax.vmap(eval_fn)(params, targets, mean, std)
    metrics["losses"] = losses.T  # (N, epochs)
    metrics["target_mean"] = mean
    metrics["target_std"] = std
    return params, metrics


@functools.lru_cache(maxsize=32)
def _pallas_sharded_jitted(mesh, config: SIRENConfig, epochs: int, lr: float,
                           sin_impl: str, mxu: str = "fp32",
                           fm_mult: float | None = None):
    """Build (once per (mesh, config, epochs, lr, sin_impl, mxu, fm_mult))
    the jitted shard_map wrapper for the fused kernel. Caching here is what
    lets the jit trace cache hit across calls — a fresh jax.jit(closure) per
    invocation would re-trace (and, without the persistent compile cache,
    recompile) every multi-device pallas dispatch. Bounded maxsize: the
    cache pins each Mesh object and its closure for its lifetime, so an
    unbounded cache would leak meshes in long-lived processes that create
    them repeatedly."""
    from jax.sharding import PartitionSpec as P

    body = partial(
        _pallas_group_train, config=config, epochs=epochs, lr=lr,
        sin_impl=sin_impl, mxu=mxu, fm_mult=fm_mult,
    )
    spec = P(FIT_AXIS)
    # Every output leaf leads with the fit axis, so one spec serves as the
    # pytree prefix.
    fn = shard_map_compat(
        body, mesh=mesh, in_specs=(spec, spec), out_specs=spec
    )
    return jax.jit(fn)


def _fit_batch_pallas_sharded(
    keys, targets, mesh, *, config: SIRENConfig, epochs: int, lr: float,
    sin_impl: str = "fast", mxu: str = "fp32", fm_mult: float | None = None,
):
    """Fused-kernel training with the fit axis sharded over a mesh.

    shard_map is the composition layer pjit can't provide for pallas_call
    (a pallas_call under plain GSPMD would not be partitioned); each device
    runs the fused kernel on its local shard of fits — zero collectives,
    same layout as the XLA path's GSPMD partitioning. Inputs must already
    be sharded/padded to the mesh (fit_batch_dispatch does both).
    """
    fn = _pallas_sharded_jitted(mesh, config, epochs, lr, sin_impl, mxu, fm_mult)
    return fn(keys, targets)


@partial(
    jax.jit,
    static_argnames=(
        "config", "epochs", "lr", "impl", "sin_impl", "mxu", "fm_mult"
    ),
)
def _fit_batch_compiled(
    keys, targets, *, config: SIRENConfig, epochs: int, lr: float,
    impl: str = "xla", sin_impl: str = "fast", mxu: str = "fp32",
    fm_mult: float | None = None,
):
    if impl == "xla":
        fit = partial(
            _single_fit, config=config, epochs=epochs, lr=lr,
            sin_impl=sin_impl, fm_mult=fm_mult,
        )
        return jax.vmap(fit)(keys, targets)

    params, metrics = _pallas_group_train(
        keys, targets, config=config, epochs=epochs, lr=lr, sin_impl=sin_impl,
        mxu=mxu, fm_mult=fm_mult,
    )
    return params, metrics


def resolve_impl(
    impl: str, *, multi_device: bool = False, config: SIRENConfig | None = None,
) -> str:
    """'auto' -> fused Pallas kernel on a single TPU chip, XLA otherwise.

    Measured on v5e @ S=2048, 40 fits x 2000 epochs (benchmarks/r2/
    train_impl.json): with the polynomial sine the XLA step is
    HBM-activation-bound — every step writes each hidden activation plus
    cosine residuals to HBM and reads them back — and the fused kernel
    (ops/siren_train_pallas.py), which keeps activations in VMEM scratch,
    beats it on every architecture except tiny (small 1.17x, medium 1.96x,
    large 1.55x, deep 2.14x). With the exact sine both paths were
    sine-throughput-bound and the kernel never won (r1 verdict); sine cost
    dropping 4.5x exposed the memory bound.

    tiny (hidden=64) stays on XLA: its activations underfill the 128-wide
    lane dimension and its HBM traffic is small, so per-grid-cell overhead
    dominates (measured 0.29 vs 0.18 ms/epoch).

    'auto' also falls back to XLA off-TPU (interpret-mode pallas is only for
    tests) and on a multi-device mesh (the shard_map-wrapped kernel path —
    _fit_batch_pallas_sharded — works and is tested on the CPU mesh, but has
    no multi-chip hardware measurement yet; opt in with impl='pallas').
    """
    # fm_mult no longer constrains impl: since r4 the fused train AND decode
    # kernels take per-unit first-layer frequencies (one (1, H) multiplier
    # operand), so FM resolves exactly like the plain SIREN — the framework's
    # quality flagship runs on its perf flagship path.
    if impl != "auto":
        return impl
    if multi_device or jax.default_backend() != "tpu":
        return "xla"
    if config is not None and config.hidden_features < 128:
        return "xla"
    return "pallas"


def fit_batch_dispatch(
    targets: np.ndarray,
    config: SIRENConfig,
    *,
    epochs: int = 2000,
    lr: float = 1e-4,
    seed: int = 0,
    mesh=None,
    dtype=jnp.float32,
    impl: str = "auto",
    sin_impl: str = "fast",
    mxu: str = "fp32",
    fm_mult: float | None = None,
):
    """Enqueue one architecture group's batched training; don't block.

    Returns an opaque (n, params, metrics) handle of device arrays. The jit
    dispatch compiles (or loads from the persistent cache) synchronously on
    the host, but execution proceeds asynchronously on the device — so
    dispatching the next group overlaps its compile with this group's run.
    """
    n = targets.shape[0]
    targets = jnp.asarray(targets, dtype=dtype)
    keys = jax.random.split(jax.random.PRNGKey(seed), n)

    multi_device = mesh is not None and int(np.prod(mesh.devices.shape)) > 1
    impl = resolve_impl(impl, multi_device=multi_device, config=config)
    if impl == "xla" and mxu != "fp32":
        # The XLA autodiff path has no MXU-precision knob; silently training
        # fp32 while the caller believes it measured bf16 MXU passes would
        # mislabel results (same guard train_impl_bench applies to variants).
        raise ValueError(
            f"mxu={mxu!r} requires the pallas implementation; this call "
            f"resolved to impl='xla' (pass impl='pallas' explicitly)"
        )

    if multi_device:
        n_dev = int(np.prod(mesh.devices.shape))
        n_pad = pad_to_multiple(n, n_dev)
        if n_pad != n:
            # Wrap-around indexing pads to any multiple, including when the
            # pad amount exceeds the batch size (n < n_dev).
            idx = jnp.arange(n_pad) % n
            targets = targets[idx]
            keys = keys[idx]
        targets = shard_batch(targets, mesh)
        keys = jax.device_put(keys, batch_sharding(mesh, keys.ndim, FIT_AXIS))

    if impl == "pallas" and multi_device:
        params, metrics = _fit_batch_pallas_sharded(
            keys, targets, mesh, config=config, epochs=epochs, lr=lr,
            sin_impl=sin_impl, mxu=mxu, fm_mult=fm_mult,
        )
    else:
        params, metrics = _fit_batch_compiled(
            keys, targets, config=config, epochs=epochs, lr=lr, impl=impl,
            sin_impl=sin_impl, mxu=mxu, fm_mult=fm_mult,
        )
    return n, params, metrics


def fit_batch_collect(
    handle, train_time_seconds: float, with_params: bool = True
) -> BatchFitMetrics:
    """Host-materialize a dispatched group's results.

    ``with_params=False`` skips pulling the parameter arrays to the host —
    the sweep only needs them for the medium group's checkpoints, and the
    other six groups' params are ~200 MB/sweep of dead device->host
    traffic through the tunnel (large alone is ~94 MB).
    """
    n, params, metrics = handle
    # np.asarray forces completion: block_until_ready can return early on
    # tunneled platforms (observed on axon).
    final_mse_host = np.asarray(metrics["final_mse"])

    take = lambda x: np.asarray(x[:n])
    return BatchFitMetrics(
        params=[(take(w), take(b)) for w, b in params] if with_params else [],
        target_mean=take(metrics["target_mean"]),
        target_std=take(metrics["target_std"]),
        losses=take(metrics["losses"]),
        final_mse=final_mse_host[:n],
        cosine_mean=take(metrics["cosine_mean"]),
        cosine_min=take(metrics["cosine_min"]),
        cosine_std=take(metrics["cosine_std"]),
        per_pos_mse=take(metrics["per_pos_mse"]),
        cosine_sims=take(metrics["cosine_sims"]),
        train_time_seconds=train_time_seconds,
        num_fits=n,
    )


def fit_batch(
    targets: np.ndarray,
    config: SIRENConfig,
    *,
    epochs: int = 2000,
    lr: float = 1e-4,
    seed: int = 0,
    mesh=None,
    dtype=jnp.float32,
    impl: str = "auto",
    sin_impl: str = "fast",
    mxu: str = "fp32",
    fm_mult: float | None = None,
) -> BatchFitMetrics:
    """Fit one SIREN per (S, D) tensor in ``targets`` (N, S, D), all at once.

    When ``mesh`` is given, the fit axis is sharded across its devices
    (padding N up to a multiple of the device count; padded results dropped).
    ``impl``: 'xla' (autodiff reference path), 'pallas' (fused TPU training
    kernel), or 'auto'.
    """
    start = time.perf_counter()
    handle = fit_batch_dispatch(
        targets, config, epochs=epochs, lr=lr, seed=seed, mesh=mesh, dtype=dtype,
        impl=impl, sin_impl=sin_impl, mxu=mxu, fm_mult=fm_mult,
    )
    np.asarray(handle[2]["final_mse"])  # block
    return fit_batch_collect(handle, time.perf_counter() - start)


def select_fit_params(batch_params, i: int):
    """Extract fit i's parameter pytree from batched params."""
    return [(np.asarray(w[i]), np.asarray(b[i])) for w, b in batch_params]
