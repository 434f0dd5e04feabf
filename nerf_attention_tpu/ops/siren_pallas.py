"""Fused SIREN decode kernel (Pallas/TPU).

The decode-latency question at the heart of the study — "can computing
f(position) beat reading the KV slice from HBM?" — deserves the fastest
honest implementation. This kernel evaluates the ENTIRE network in one
pallas_call:

  * positions are synthesized on-chip from the grid index (broadcasted_iota),
    so the kernel reads nothing from HBM except the weights (one VMEM-resident
    copy, a few hundred KB);
  * all layers (matmul -> sin) fuse into a single program per row-tile: zero
    intermediate HBM traffic, no per-op dispatch;
  * the first layer's degenerate (TILE,1)@(1,H) matmul is computed as a
    broadcast multiply-add on the VPU instead of wasting an MXU pass.

Reference equivalent: the eager per-layer torch forward timed in
`/root/reference/nerf_attention/evaluate.py:173-219`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_attention_tpu.ops.tiling import SUBLANE, round_up

DEFAULT_TILE = 512




# The polynomial sine (ops/fastmath.py): the decode kernel is sine-
# throughput-bound at large S, so this is its speed-of-light lever.
from nerf_attention_tpu.ops.fastmath import fast_sin


def _layer_stack(weight_refs, x, omega: float, n_layers: int, compute_dtype,
                 sin_impl: str = "exact", mult=None):
    """Shared network body for the fused kernels.

    ``compute_dtype=bfloat16`` runs the hidden/final matmuls with bf16
    operands (double MXU throughput, half the VMEM weight traffic) and fp32
    accumulation; the position input and the first (VPU broadcast) layer
    stay fp32 — positions are linspace(0,1,S), and bf16's ~2^-8 relative
    resolution would collapse adjacent rows for S beyond a few hundred.
    Sines are evaluated in fp32 either way; ``sin_impl='fast'`` swaps the
    exact sine for the polynomial ``fast_sin`` (the decode kernel is
    sine-throughput-bound at large S). ``mult`` (FM-SIREN, (1, H) fp32)
    gives each first-layer unit its own frequency omega*mult_i — a VPU
    broadcast multiply, negligible next to the sine.
    """
    sin = jnp.sin if sin_impl == "exact" else fast_sin
    w0 = weight_refs[0][:].astype(jnp.float32)  # (1, H)
    b0 = weight_refs[1][:].astype(jnp.float32)  # (1, H)
    scale0 = omega if mult is None else omega * mult
    h = sin(scale0 * (x * w0 + b0)).astype(compute_dtype)

    # Hidden sine layers on the MXU.
    for layer in range(1, n_layers - 1):
        w = weight_refs[2 * layer][:]
        b = weight_refs[2 * layer + 1][:].astype(jnp.float32)
        acc = jnp.dot(h, w, preferred_element_type=jnp.float32)
        h = sin(omega * (acc + b)).astype(compute_dtype)

    # Final plain linear.
    wf = weight_refs[2 * (n_layers - 1)][:]
    bf = weight_refs[2 * (n_layers - 1) + 1][:].astype(jnp.float32)
    return jnp.dot(h, wf, preferred_element_type=jnp.float32) + bf


def _siren_kernel(
    *refs, omega: float, seq_len: int, tile: int, n_layers: int, compute_dtype,
    sin_impl: str, fm: bool,
):
    """One row-tile of the full network. refs = w0,b0,...,wn,bn,[mult],out."""
    out_ref = refs[-1]
    weight_refs = refs[: 2 * n_layers]
    mult = refs[2 * n_layers][:] if fm else None

    i = pl.program_id(0)
    # positions = linspace(0, 1, S): row r -> r / (S-1). TPU iota is
    # integer-only; cast afterwards.
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + i * tile
    x = row.astype(jnp.float32) / jnp.float32(max(seq_len - 1, 1))

    out_ref[:] = _layer_stack(
        weight_refs, x, omega, n_layers, compute_dtype, sin_impl, mult=mult
    ).astype(out_ref.dtype)


def _flat_weights(params, compute_dtype, n: int | None = None) -> list[jax.Array]:
    """Interleaved [w, b, ...] operands in the kernel compute dtype.

    Weights carry the compute dtype (bf16 halves their VMEM footprint and
    feeds the MXU at double rate); biases keep the weight dtype too but are
    upcast inside the kernel before the fp32 sine. Biases become rank-2
    (rank-3 when batched over ``n`` networks) so every VMEM operand is
    tile-shaped.
    """
    flat: list[jax.Array] = []
    bias_shape = (1, -1) if n is None else (n, 1, -1)
    for w, b in params:
        flat.append(w.astype(compute_dtype))
        flat.append(b.reshape(*bias_shape).astype(compute_dtype))
    return flat


@partial(
    jax.jit,
    static_argnames=(
        "omega", "seq_len", "tile", "interpret", "compute_dtype", "sin_impl",
        "fm_mult",
    ),
)
def siren_decode_fused(
    params,
    omega: float,
    seq_len: int,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
    compute_dtype=jnp.float32,
    sin_impl: str = "exact",
    fm_mult: float | None = None,
) -> jax.Array:
    """Evaluate a SIREN at linspace(0,1,seq_len) in one fused kernel.

    params: [(W, b), ...] with W laid out (in, out). Returns (seq_len, D)
    in ``compute_dtype`` (bf16 output is the serving-realistic shape: the
    KV cache being replaced is bf16). ``fm_mult`` evaluates the FM-SIREN
    variant: the exact linspace(1, fm_mult, H) multipliers the XLA forward
    derives enter the kernel as one (1, H) fp32 operand.
    """
    n_layers = len(params)
    d_out = params[-1][0].shape[1]

    tile = min(tile, round_up(seq_len, SUBLANE))
    padded_s = round_up(seq_len, tile)
    grid = (padded_s // tile,)

    flat = _flat_weights(params, compute_dtype)
    if fm_mult is not None:
        from nerf_attention_tpu.models.siren import fm_frequency_multipliers

        hidden0 = params[0][0].shape[1]
        flat.append(fm_frequency_multipliers(hidden0, fm_mult).reshape(1, hidden0))
    kernel = partial(
        _siren_kernel,
        omega=float(omega),
        seq_len=seq_len,
        tile=tile,
        n_layers=n_layers,
        compute_dtype=compute_dtype,
        sin_impl=sin_impl,
        fm=fm_mult is not None,
    )

    hidden = params[0][0].shape[1]
    itemsize = jnp.dtype(compute_dtype).itemsize
    flops_per_row = sum(2 * w.shape[0] * w.shape[1] for w, _ in params)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(f.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for f in flat
        ],
        out_specs=pl.BlockSpec((tile, d_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded_s, d_out), compute_dtype),
        cost_estimate=pl.CostEstimate(
            flops=padded_s * flops_per_row,
            bytes_accessed=sum(f.size * itemsize for f in flat)
            + padded_s * d_out * itemsize,
            transcendentals=padded_s * hidden * (n_layers - 1),
        ),
        interpret=interpret,
    )(*flat)
    return out[:seq_len]


def siren_decode(
    params, omega: float, seq_len: int, fm_mult: float | None = None
) -> jax.Array:
    """Fused decode with automatic fallback off-TPU (interpret on CPU)."""
    on_tpu = jax.default_backend() == "tpu"
    params = [(jnp.asarray(w), jnp.asarray(b)) for w, b in params]
    return siren_decode_fused(
        params, float(omega), seq_len, interpret=not on_tpu, fm_mult=fm_mult
    )


def siren_decode_batch_sharded(
    params,
    omega: float,
    seq_len: int,
    mesh,
    axis: str = "fit",
    interpret: bool = False,
    compute_dtype=jnp.float32,
    fm_mult: float | None = None,
) -> jax.Array:
    """Batched fused decode with the network axis sharded over a mesh.

    Each device runs the Pallas kernel on its local shard of networks —
    shard_map is the composition layer pjit can't provide for pallas_call
    (a pallas_call under plain GSPMD would not be partitioned). Zero
    collectives: the network axis is embarrassingly parallel, exactly like
    the fit sweep. N must be divisible by the mesh size.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = params[0][0].shape[0]
    n_dev = int(np.prod(mesh.devices.shape))
    if n % n_dev:
        raise ValueError(f"network count {n} not divisible by mesh size {n_dev}")

    from nerf_attention_tpu.parallel.mesh import shard_map_compat

    leaf_spec = P(axis, None, None)
    bias_spec = P(axis, None)
    in_specs = [(leaf_spec, bias_spec) for _ in params]
    body = lambda p: siren_decode_batch(
        p, omega, seq_len, interpret=interpret, compute_dtype=compute_dtype,
        fm_mult=fm_mult,
    )
    fn = shard_map_compat(
        body, mesh=mesh, in_specs=(in_specs,), out_specs=leaf_spec
    )
    params = jax.device_put(
        [(w, b) for w, b in params],
        [(NamedSharding(mesh, leaf_spec), NamedSharding(mesh, bias_spec)) for _ in params],
    )
    return fn(params)


class _BatchHeadView:
    """Adapter presenting the leading-network-blocked refs as rank-2 reads."""

    def __init__(self, ref):
        self._ref = ref

    def __getitem__(self, _):
        return self._ref[0]


def _siren_batch_kernel(
    *refs, omega: float, seq_len: int, tile: int, n_layers: int, compute_dtype,
    sin_impl: str, fm: bool,
):
    """One (network, row-tile) cell of the batched decode.

    refs = w_0, b_0, ..., w_{L-1}, b_{L-1} (each blocked per network),
    [fm multipliers (shared (1, H))], out.
    """
    out_ref = refs[-1]
    weight_refs = [_BatchHeadView(r) for r in refs[: 2 * n_layers]]
    mult = refs[2 * n_layers][:] if fm else None

    t_idx = pl.program_id(1)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + t_idx * tile
    x = row.astype(jnp.float32) / jnp.float32(max(seq_len - 1, 1))

    out_ref[0] = _layer_stack(
        weight_refs, x, omega, n_layers, compute_dtype, sin_impl, mult=mult
    ).astype(out_ref.dtype)


@partial(
    jax.jit,
    static_argnames=(
        "omega", "seq_len", "tile", "interpret", "compute_dtype", "sin_impl",
        "fm_mult",
    ),
)
def siren_decode_batch(
    params,
    omega: float,
    seq_len: int,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
    compute_dtype=jnp.float32,
    sin_impl: str = "exact",
    fm_mult: float | None = None,
) -> jax.Array:
    """Decode N SIRENs at once: one fused kernel over a (network, tile) grid.

    params: [(W, b), ...] with leading network axis — W (N, in, out),
    b (N, out). Returns (N, seq_len, D). This is the serving shape of the
    study's question: reconstructing EVERY (layer, head, K|V) slice of a KV
    cache each decode step means evaluating hundreds of networks per token;
    batching them into one kernel amortizes dispatch and keeps each
    network's weights VMEM-resident for all of its row tiles.
    """
    n = params[0][0].shape[0]
    n_layers = len(params)
    d_out = params[-1][0].shape[-1]

    tile = min(tile, round_up(seq_len, SUBLANE))
    padded_s = round_up(seq_len, tile)
    grid = (n, padded_s // tile)

    flat = _flat_weights(params, compute_dtype, n=n)
    hidden = params[0][0].shape[-1]
    in_specs = [
        pl.BlockSpec(
            (1, *f.shape[1:]), lambda ni, ti: (ni, 0, 0),
            memory_space=pltpu.VMEM,
        )
        for f in flat
    ]
    if fm_mult is not None:
        from nerf_attention_tpu.models.siren import fm_frequency_multipliers

        flat.append(fm_frequency_multipliers(hidden, fm_mult).reshape(1, hidden))
        in_specs.append(
            pl.BlockSpec(
                (1, hidden), lambda ni, ti: (0, 0), memory_space=pltpu.VMEM
            )
        )
    kernel = partial(
        _siren_batch_kernel,
        omega=float(omega),
        seq_len=seq_len,
        tile=tile,
        n_layers=n_layers,
        compute_dtype=compute_dtype,
        sin_impl=sin_impl,
        fm=fm_mult is not None,
    )
    itemsize = jnp.dtype(compute_dtype).itemsize
    flops_per_row = sum(2 * w.shape[1] * w.shape[2] for w in flat[: 2 * n_layers : 2])
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tile, d_out), lambda ni, ti: (ni, ti, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, padded_s, d_out), compute_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n * padded_s * flops_per_row,
            bytes_accessed=sum(f.size * itemsize for f in flat)
            + n * padded_s * d_out * itemsize,
            transcendentals=n * padded_s * hidden * (n_layers - 1),
        ),
        interpret=interpret,
    )(*flat)
    return out[:, :seq_len, :]
