"""Quantization-aware fine-tuning for stored SIREN parameters.

Beyond-reference extension (round 4, extending the r3 storage study): plain
post-training int4 rounds a trained network onto a coarse grid and eats the
quality the sweep earned. A short quantization-aware fine-tune repairs most
of that: the forward pass sees the EXACT fp16-scaled int4 grid the
serializer would store (`ops/quantize.py:_int_groupwise`), gradients flow
through the rounding with the straight-through estimator, and the batched
trainer shape (jit + vmap over checkpoints, `lax.scan` over epochs —
`parallel/sweep.py`) makes a few hundred epochs over every saved medium
checkpoint one cheap compiled program.

Storage-only contract, same as the quantization experiment: QAT moves the
fp32 master weights so that their int4 projection reconstructs well; what
is persisted (and re-priced) is still the plain int4 payload of the
fine-tuned weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerf_attention_tpu.models.siren import positions, siren_apply_maybe_fm
from nerf_attention_tpu.ops.quantize import INT4_GROUP


def fake_quant_groupwise(
    w: jax.Array, group: int = INT4_GROUP, bits: int = 4
) -> jax.Array:
    """Project weights onto the stored int<bits> grid (jax twin of
    ``quantize._int_groupwise``): symmetric -qmax..qmax, one fp16-rounded
    scale per ``group`` rows of the input axis, per output channel. Works
    on (in, out) and batched (..., in, out) leaves.
    """
    qmax = float((1 << (bits - 1)) - 1)
    *batch, rows, channels = w.shape
    n_groups = -(-rows // group)
    pad = n_groups * group - rows
    grouped = jnp.pad(
        w, [(0, 0)] * len(batch) + [(0, pad), (0, 0)]
    ).reshape(*batch, n_groups, group, channels)
    amax = jnp.abs(grouped).max(axis=-2, keepdims=True)
    # Same fp16-smallest-normal floor as quantize._int_groupwise: a dead
    # group's scale must not round to fp16 zero (NaN in the divide would
    # poison the whole batched fine-tune through the shared mean loss).
    scale = (
        jnp.maximum(
            (jnp.maximum(amax, 1e-12) / qmax).astype(jnp.float16),
            jnp.asarray(np.finfo(np.float16).tiny, jnp.float16),
        )
        .astype(jnp.float32)
    )
    q = jnp.clip(jnp.round(grouped / scale), -qmax, qmax)
    dq = (q * scale).reshape(*batch, n_groups * group, channels)
    return dq[..., :rows, :]


def fake_quant_int4(w: jax.Array, group: int = INT4_GROUP) -> jax.Array:
    """int4 view of ``fake_quant_groupwise`` (the r4 frontier default)."""
    return fake_quant_groupwise(w, group, bits=4)


def _ste(w: jax.Array, group: int, bits: int) -> jax.Array:
    """Straight-through estimator: forward = fake-quantized, grad = identity."""
    return w + jax.lax.stop_gradient(fake_quant_groupwise(w, group, bits) - w)


def qat_finetune_checkpoints(
    loaded: list[dict], base_scheme: str, epochs: int
) -> list[list[tuple]]:
    """Stack loaded checkpoints, fine-tune against ``base_scheme``'s stored
    grid in ONE batched program, and return per-checkpoint fp32 params.

    ``loaded`` entries are ``{"ckpt": load_siren_checkpoint(..) dict,
    "original": (S, D) target tensor}`` — the shape both callers
    (`experiments/quantized_params.py` and `compress.py`) hold. The batch
    MUST be architecturally homogeneous: leaves stack only for equal
    shapes, and — silently worse — a mixed fm_mult/omega batch would
    fine-tune every net after the first with the WRONG forward, so both
    are validated here rather than trusted from ``loaded[0]``.
    """
    from nerf_attention_tpu.ops.quantize import parse_scheme, split_scheme

    kind, bits, group = parse_scheme(base_scheme)
    _, skip_first = split_scheme(base_scheme)
    if kind != "int" or group is None:
        raise ValueError(
            f"QAT needs a group-wise integer base scheme, got {base_scheme!r}"
        )
    if not loaded:
        return []
    omegas = {float(e["ckpt"]["config"].omega_0) for e in loaded}
    fm_mults = {e["ckpt"].get("fm_mult") for e in loaded}
    if len(omegas) > 1 or len(fm_mults) > 1:
        raise ValueError(
            "QAT batch mixes forwards: omega_0 "
            f"{sorted(omegas)}, fm_mult {sorted(fm_mults, key=str)} — "
            "fine-tuning them under one forward would corrupt every net "
            "after the first; split the directory by network family"
        )
    first = loaded[0]["ckpt"]
    n_layers = len(first["params"])
    params = [
        (
            np.stack([e["ckpt"]["params"][i][0] for e in loaded]),
            np.stack([e["ckpt"]["params"][i][1] for e in loaded]),
        )
        for i in range(n_layers)
    ]
    targets_norm = np.stack(
        [
            (e["original"] - np.asarray(e["ckpt"]["target_mean"]))
            / np.asarray(e["ckpt"]["target_std"])
            for e in loaded
        ]
    ).astype(np.float32)
    tuned, _ = qat_finetune_batch(
        params,
        targets_norm,
        omega=omegas.pop(),
        fm_mult=fm_mults.pop(),
        epochs=epochs,
        group=group,
        bits=bits,
        skip_first=skip_first,
    )
    tuned = [(np.asarray(w), np.asarray(b)) for w, b in tuned]
    return [
        [(w[idx], b[idx]) for w, b in tuned] for idx in range(len(loaded))
    ]


def qat_finetune_batch(
    params,
    targets_norm: jax.Array,
    *,
    omega: float,
    fm_mult: float | None = None,
    epochs: int = 300,
    lr: float = 3e-5,
    group: int = INT4_GROUP,
    bits: int = 4,
    skip_first: bool = False,
    sin_impl: str = "fast",
):
    """Fine-tune a batch of trained SIRENs against their stored-grid
    projection (``bits``-bit, ``group``-element fp16 scales — int4 by
    default, any ``int<B>_g<N>`` grid via the matching bits/group).

    params: batched leaves ``[(W (N, in, out), b (N, out)), ...]`` — every
    network the same architecture (the sweep only checkpoints medium, so
    stacking all saved checkpoints is always legal). targets_norm:
    (N, S, D) z-normalized targets, the same tensors the sweep trained on.
    Biases stay full-precision in the forward (they are stored fp16 —
    `ops/quantize.py:quantize_params`). Returns fine-tuned fp32 params in
    the same batched layout; quality is measured by int4-quantizing THOSE
    (`experiments/quantized_params.py`).
    """
    from nerf_attention_tpu.parallel.sweep import _make_optimizer, _resolve_sin

    params = [(jnp.asarray(w), jnp.asarray(b)) for w, b in params]
    targets_norm = jnp.asarray(targets_norm)
    seq_len = targets_norm.shape[1]
    pos = positions(seq_len)
    sin = _resolve_sin(sin_impl)
    tx = _make_optimizer(lr, epochs)

    @jax.jit
    def run(params):
        opt_state = tx.init(params)

        def loss_fn(p):
            # skip_first: a _l0fp32 scheme stores layer 0 in fp32, so the
            # straight-through projection must leave it off the int grid.
            fq = [
                (w if (skip_first and i == 0) else _ste(w, group, bits), b)
                for i, (w, b) in enumerate(p)
            ]
            pred = jax.vmap(
                lambda q: siren_apply_maybe_fm(q, omega, fm_mult, pos, sin=sin)
            )(fq)
            return jnp.mean((pred - targets_norm) ** 2)

        def step(carry, _):
            p, s = carry
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = tx.update(grads, s, p)
            return (optax.apply_updates(p, updates), s), loss

        (p, _), losses = jax.lax.scan(step, (params, opt_state), None, length=epochs)
        return p, losses

    tuned, losses = run(params)
    return [(w, b) for w, b in tuned], losses
