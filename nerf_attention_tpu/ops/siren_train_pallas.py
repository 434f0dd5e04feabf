"""Fused SIREN training step (loss + gradients) as one Pallas TPU kernel.

The sweep's hot loop is 2000 optimizer steps over a batch of independent tiny
MLPs (`parallel/sweep.py`). Under plain XLA each step writes every layer's
activations to HBM in the forward pass and reads them back in the backward
pass — for a 40-fit medium group that is ~20x more HBM traffic than the
targets themselves. This kernel computes the per-fit loss AND all parameter
gradients in a single fused pass: activations live only in VMEM scratch,
positions are synthesized on-chip from the grid index, and the only HBM
traffic per step is the (N, S, D) normalized-target read plus the tiny
parameter/gradient tensors.

Grid: (fit n, row-tile t) with both dimensions sequential; gradient outputs
are blocked per fit and accumulated across the row-tile axis (initialized at
t == 0, summed thereafter — the standard Pallas revisiting pattern).

The backward math is written out explicitly (no custom_vjp needed — the
optimizer consumes gradients directly):

    y    = h_{L-1} @ Wf + bf,   h_i = sin(omega * a_i),  a_i = h_{i-1} @ W_i + b_i
    dy   = 2 (y - t) / (S * D)          # d mean((y-t)^2) / dy, masked past S
    dWf  = h_{L-1}^T dy, dbf = colsum dy, dh = dy Wf^T
    da_i = dh_i * omega * cos(a_i)
    dW_i = h_{i-1}^T da_i, db_i = colsum da_i, dh_{i-1} = da_i W_i^T

Status (measured, v5e, S=2048, 40 fits x 2000 epochs — benchmarks/r2/
train_impl.json): with the exact sine this kernel lands within ~10-20% of
XLA autodiff but never faster (both paths are sine-throughput-bound, r1
verdict). With the polynomial sine in-kernel (``sin_impl='fast'``, sharing
one range reduction between the backward's sin/cos pair), the sine cost
drops ~4.5x and the XLA path's HBM activation traffic becomes the bound —
the fused kernel then wins ~2x (medium 1.71 -> 0.87 ms/epoch), so it is the
sweep's 'auto' choice on a single TPU chip
(`parallel/sweep.py:resolve_impl`). Parity: tests/test_siren_train_pallas.py.
Equivalent reference computation: the torch forward/backward inside
`/root/reference/nerf_attention/siren.py:98-105`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_attention_tpu.ops.tiling import SUBLANE, round_up



VMEM_BUDGET = 6 * 1024 * 1024  # measured-safe: medium @2048 rows blows 16 MB


def pick_tile(hidden: int, d_out: int, n_layers: int, scratch_per_layer: int = 1) -> int:
    """Largest row tile whose *estimated* working set fits the VMEM budget.

    Bigger tiles mean fewer grid cells (less per-cell overhead and fewer
    revisits of the gradient accumulators). The estimate counts activation
    scratch (``scratch_per_layer`` (tile, hidden) arrays per sine layer:
    1 for the pre-sine stash, 2 for the sincos stash), double-buffered
    target tiles, and matmul/transpose temporaries; the budget is calibrated
    against Mosaic's actual allocator (medium hidden=256 fits at 1024 rows,
    OOMs at 2048).
    """
    for tile in (2048, 1024, 512, 256):
        work = 4 * tile * hidden * (n_layers - 1) * scratch_per_layer
        work += 2 * 4 * tile * d_out  # target tile, double-buffered
        work += 2 * 4 * tile * hidden  # h / transpose temporaries
        if work <= VMEM_BUDGET:
            return tile
    return 256


def _train_kernel(
    *refs,
    omega: float,
    seq_len: int,
    tile: int,
    n_layers: int,
    fast: bool,
    stash_sincos: bool,
    mxu_bf16: bool,
    fm: bool,
):
    """One (fit, row-tile) cell: forward, loss contribution, grad accumulation.

    refs layout:
      inputs:  w_0, b_0, ..., w_{L-1}, b_{L-1}, targets_tile[, fm multipliers]
      outputs: loss, dw_0, db_0, ..., dw_{L-1}, db_{L-1}
      scratch: a_0 ... a_{L-2}            (pre-sine activations; stash='act')
           or  h_0, c_0, ..., h_{L-2}, c_{L-2}  (post-sine + cos; stash='sincos')

    ``fm``: FM-SIREN per-unit first-layer frequencies — the first sine layer
    computes sin(omega * mult_i * (xW+b)_i), so the first-layer scale is the
    (1, H) multiplier row instead of the scalar omega, in both the forward
    and the da_0 term of the backward. Everything else is unchanged (the
    hidden layers share omega as in the plain SIREN).
    """
    n_in = 2 * n_layers + 1 + (1 if fm else 0)
    n_out = 2 * n_layers + 1
    in_refs = refs[:n_in]
    out_refs = refs[n_in : n_in + n_out]
    act_refs = refs[n_in + n_out :]

    t_ref = in_refs[2 * n_layers]
    loss_ref = out_refs[0]  # (1, N) full-array block, revisited by every cell
    grad_refs = out_refs[1:]

    n_idx = pl.program_id(0)
    t_idx = pl.program_id(1)

    # Positions for this row tile: row r of the full sequence -> r / (S-1),
    # masked past the true sequence length (padding rows contribute nothing).
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + t_idx * tile
    x = row.astype(jnp.float32) / jnp.float32(max(seq_len - 1, 1))
    valid = (row < seq_len).astype(jnp.float32)  # (tile, 1)

    omega_f = jnp.float32(omega)

    # Transcendental implementation: the polynomial pair shares one range
    # reduction when both sin and cos of the same tensor are needed (the
    # backward pass consumes sin(a_{i-1}) as the previous activation and
    # cos(a_{i-1}) as the next iteration's sine derivative).
    if fast:
        from nerf_attention_tpu.ops.fastmath import fast_cos, fast_sin, fast_sincos

        sin_f, cos_f, sincos_f = fast_sin, fast_cos, fast_sincos
    else:
        sin_f, cos_f = jnp.sin, jnp.cos
        sincos_f = lambda a: (jnp.sin(a), jnp.cos(a))

    def w(i):
        return in_refs[2 * i][0]  # (in, out)

    def b(i):
        return in_refs[2 * i + 1][0]  # (1, out)

    # MXU pass precision: optionally feed the systolic array bf16 operands
    # (fp32 accumulate via preferred_element_type). Everything else —
    # params, activations in scratch, sine/cos, loss/grad reductions —
    # stays fp32; only the dot inputs are rounded.
    if mxu_bf16:
        def dot(lhs, rhs):
            return jnp.dot(
                lhs.astype(jnp.bfloat16),
                rhs.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
    else:
        def dot(lhs, rhs):
            return jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)

    # First-layer scale: scalar omega, or the (1, H) per-unit FM multiplier
    # row (broadcasts over the tile axis on the VPU — negligible next to the
    # sine). The same scale reappears in the backward's da_0.
    scale0 = omega_f * in_refs[-1][:] if fm else omega_f

    # ---- Forward ----
    # stash='act': store pre-sine activations; backward re-derives sin/cos.
    # stash='sincos': compute sincos once here, store post-sine h AND cos —
    # backward then does ZERO trig (trade: 2x activation scratch per layer,
    # so a smaller row tile at the same VMEM budget).
    # First sine layer: (tile,1) @ (1,H) is a broadcast multiply (VPU).
    a = scale0 * (x * w(0) + b(0))
    if stash_sincos:
        h, c = sincos_f(a)
        act_refs[0][:] = h
        act_refs[1][:] = c
    else:
        act_refs[0][:] = a
        h = sin_f(a)
    for i in range(1, n_layers - 1):
        a = omega_f * (dot(h, w(i)) + b(i))
        if stash_sincos:
            h, c = sincos_f(a)
            act_refs[2 * i][:] = h
            act_refs[2 * i + 1][:] = c
        else:
            act_refs[i][:] = a
            h = sin_f(a)
    y = dot(h, w(n_layers - 1)) + b(n_layers - 1)

    # ---- Loss + dy (masked, mean over S*D real elements) ----
    target = t_ref[0]  # (tile, D)
    d_out = target.shape[-1]
    err = (y - target) * valid
    inv_n = jnp.float32(1.0 / (seq_len * d_out))

    @pl.when((n_idx == 0) & (t_idx == 0))
    def _init_loss():
        loss_ref[...] = jnp.zeros_like(loss_ref)

    # Scatter this cell's contribution into lane n via a one-hot mask
    # (dynamic lane stores are not supported; a masked vector add is).
    lane = jax.lax.broadcasted_iota(jnp.int32, loss_ref.shape, 1)
    onehot = (lane == n_idx).astype(jnp.float32)
    loss_ref[...] += onehot * (jnp.sum(err * err) * inv_n)
    dy = (2.0 * inv_n) * err  # (tile, D)

    @pl.when(t_idx == 0)
    def _init_grads():
        for g in grad_refs:
            g[...] = jnp.zeros_like(g)

    # ---- Backward ----
    def dw_ref(i):
        return grad_refs[2 * i]

    def db_ref(i):
        return grad_refs[2 * i + 1]

    # Final linear layer.
    dw_ref(n_layers - 1)[0] += dot(h.T, dy)
    db_ref(n_layers - 1)[0] += jnp.sum(dy, axis=0, keepdims=True)
    dh = dot(dy, w(n_layers - 1).T)

    if stash_sincos:
        # All trig already paid in the forward pass; read h/cos from scratch.
        for i in range(n_layers - 2, 0, -1):
            da = dh * omega_f * act_refs[2 * i + 1][:]
            h_prev = act_refs[2 * (i - 1)][:]
            dw_ref(i)[0] += dot(h_prev.T, da)
            db_ref(i)[0] += jnp.sum(da, axis=0, keepdims=True)
            dh = dot(da, w(i).T)
        da0 = dh * scale0 * act_refs[1][:]
    else:
        # Hidden sine layers, last to first. cos(a_{i-1}) computed alongside
        # sin(a_{i-1}) carries over to the next iteration's sine derivative.
        cos_carry = None
        for i in range(n_layers - 2, 0, -1):
            c_i = cos_carry if cos_carry is not None else cos_f(act_refs[i][:])
            da = dh * omega_f * c_i
            h_prev, cos_carry = sincos_f(act_refs[i - 1][:])
            dw_ref(i)[0] += dot(h_prev.T, da)
            db_ref(i)[0] += jnp.sum(da, axis=0, keepdims=True)
            dh = dot(da, w(i).T)
        c_0 = cos_carry if cos_carry is not None else cos_f(act_refs[0][:])
        da0 = dh * scale0 * c_0

    # First sine layer: dW0 = x^T da0 computed as a column sum (VPU).
    dw_ref(0)[0] += jnp.sum(x * da0, axis=0, keepdims=True)
    db_ref(0)[0] += jnp.sum(da0, axis=0, keepdims=True)


@partial(
    jax.jit,
    static_argnames=(
        "omega", "tile", "interpret", "sin_impl", "stash", "mxu", "fm_mult"
    ),
)
def siren_train_grads(
    params,
    targets_norm: jax.Array,
    *,
    omega: float,
    tile: int | None = None,
    interpret: bool = False,
    sin_impl: str = "exact",
    stash: str = "auto",
    mxu: str = "fp32",
    fm_mult: float | None = None,
):
    """Loss and gradients for a batch of SIRENs in one fused kernel.

    params: [(W, b), ...] with W (N, in, out), b (N, out) — one network per
    fit. targets_norm: (N, S, D) z-normalized targets. Returns
    (loss (N,), grads) with grads shaped exactly like params.
    ``sin_impl='fast'`` uses the polynomial sine/cosine (ops/fastmath) inside
    the kernel — same measured-parity trade as the XLA fast path.
    ``stash='sincos'`` stores post-sine h and cos in scratch instead of the
    pre-sine activations: the backward pass then does zero trig, at the cost
    of 2x activation scratch (smaller row tile at the same VMEM budget).
    ``stash='auto'`` picks per config from the v5e measurement
    (benchmarks/r2/train_impl_stash.json): sincos wins ~3% on
    large/deep (wide or deep nets, trig-heavy), act elsewhere (medium's
    tile halves 1024->512 under 2x scratch, cancelling the trig saving).
    ``fm_mult`` trains the FM-SIREN variant: per-unit first-layer frequency
    multipliers linspace(1, fm_mult, hidden) — the exact array the XLA path
    derives (models/siren.py:fm_frequency_multipliers) enters the kernel as
    one (1, hidden) input, so fused-vs-XLA FM parity is bit-level on the
    multipliers themselves. Same parameter shapes/count as the plain SIREN.
    ``mxu='bf16'`` rounds the MXU pass operands to bf16 (fp32 accumulate);
    params, activations, trig, and reductions stay fp32 — this is NOT full
    bf16 training (measured -0.014 CosSim, rejected), it only targets the
    fp32-vs-bf16 matmul-rate gap (102 vs 207 TFLOP/s on v5e).

    Measured verdict (v5e, benchmarks/r3/train_impl_bf16mxu.json): a
    no-op-to-slightly-slower dead end. Mosaic's DEFAULT f32 matmul already
    rounds operands to bf16 (one-pass DEFAULT precision: explicit bf16
    casts compile to bit-identical results on every config, and only
    Precision.HIGHEST changes values), so the bf16-rate lever is already
    on; the explicit casts just add VPU convert cost (~3%). Option kept
    for documentation and CPU-interpret studies, where the rounding is
    real.
    """
    n, seq_len, d_out = targets_norm.shape
    n_layers = len(params)
    hidden = params[0][0].shape[-1]
    if stash not in ("auto", "act", "sincos"):
        raise ValueError(f"stash must be auto|act|sincos, got {stash!r}")
    if sin_impl not in ("exact", "fast"):
        raise ValueError(f"sin_impl must be exact|fast, got {sin_impl!r}")
    if mxu not in ("fp32", "bf16"):
        raise ValueError(f"mxu must be fp32|bf16, got {mxu!r}")
    if stash == "auto":
        stash = "sincos" if (hidden >= 512 or n_layers >= 5) else "act"
    stash_sincos = stash == "sincos"
    scratch_per_layer = 2 if stash_sincos else 1

    if tile is None:
        tile = pick_tile(hidden, d_out, n_layers, scratch_per_layer)
    tile = min(tile, round_up(seq_len, SUBLANE))
    padded_s = round_up(seq_len, tile)
    n_tiles = padded_s // tile
    if padded_s != seq_len:
        targets_norm = jnp.pad(
            targets_norm, ((0, 0), (0, padded_s - seq_len), (0, 0))
        )

    # Flatten params to rank-3 VMEM operands: W (N, in, out), b (N, 1, out).
    flat: list[jax.Array] = []
    for w, b_ in params:
        flat.append(w.astype(jnp.float32))
        flat.append(b_.reshape(n, 1, -1).astype(jnp.float32))

    # Per-fit blocks for weights/grads; per-(fit, tile) blocks for targets.
    def fit_block(shape):
        return pl.BlockSpec(
            (1, *shape[1:]), lambda n_, t_: (n_, 0, 0), memory_space=pltpu.VMEM
        )

    in_specs = [fit_block(f.shape) for f in flat]
    in_specs.append(
        pl.BlockSpec(
            (1, tile, d_out), lambda n_, t_: (n_, t_, 0), memory_space=pltpu.VMEM
        )
    )
    extra_inputs: list[jax.Array] = []
    if fm_mult is not None:
        from nerf_attention_tpu.models.siren import fm_frequency_multipliers

        extra_inputs.append(
            fm_frequency_multipliers(hidden, fm_mult).reshape(1, hidden)
        )
        in_specs.append(
            pl.BlockSpec(
                (1, hidden), lambda n_, t_: (0, 0), memory_space=pltpu.VMEM
            )
        )

    loss_spec = pl.BlockSpec((1, n), lambda n_, t_: (0, 0), memory_space=pltpu.VMEM)
    out_specs = [loss_spec] + [fit_block(f.shape) for f in flat]
    out_shape = [jax.ShapeDtypeStruct((1, n), jnp.float32)] + [
        jax.ShapeDtypeStruct(f.shape, jnp.float32) for f in flat
    ]

    flops_per_row = sum(2 * w.shape[1] * w.shape[2] for w, _ in zip(flat[::2], flat[1::2]))
    kernel = partial(
        _train_kernel,
        omega=float(omega),
        seq_len=seq_len,
        tile=tile,
        n_layers=n_layers,
        fast=sin_impl == "fast",
        stash_sincos=stash_sincos,
        mxu_bf16=mxu == "bf16",
        fm=fm_mult is not None,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(n, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((tile, hidden), jnp.float32)
            for _ in range((n_layers - 1) * scratch_per_layer)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * n * padded_s * flops_per_row,
            bytes_accessed=targets_norm.size * 4 + sum(f.size * 8 for f in flat),
            transcendentals=2 * n * padded_s * hidden * (n_layers - 1),
        ),
        interpret=interpret,
    )(*flat, targets_norm, *extra_inputs)

    loss = outs[0][0]
    grads = [
        (outs[1 + 2 * i], outs[2 + 2 * i].reshape(n, -1))
        for i in range(n_layers)
    ]
    return loss, grads
