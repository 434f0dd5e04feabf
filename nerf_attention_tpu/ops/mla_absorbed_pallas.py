"""Fused weight-absorbed MLA decode attention (Pallas/TPU).

The absorbed MLA decode step (`models/mla_jax.py:_mla_layer_decode_absorbed`,
DeepSeek's serving identity) is HBM-bound on the latent cache, and the XLA
lowering streams that cache TWICE per step — once for the score contraction
``q_lat · c + q_pe · pe`` and once for the output combine ``probs @ c`` —
plus an fp32 (H, S) logit round-trip between them. This kernel runs the
whole per-layer attention in one pass: each (tile, latent_dim) block of the
latent cache is DMA'd to VMEM once and consumed on the spot by a
flash-style online-softmax accumulation over all H query heads
simultaneously (the latent is SHARED across heads — gridding over heads
would re-read it H times). The new token's own latent row rides as a
separate (SUBLANE, latent_dim) input fused at the last grid step, so the
cache buffer is never copied to append it.

Outputs are the latent-space attention ``o_lat = probs @ c`` (the W_uv
combine and o-projection stay in XLA — they are S-independent) and the
per-head softmax entropies, computed online from the carried
(max, denom, sum of weight*score) triple.

Masking matches the decode contract (`models/mla_jax.py` decode mask):
cache rows strictly BEFORE ``position`` attend, plus the self row — a
large negative finite (not -inf) keeps masked lanes NaN-free. A fully
masked block leaves the running max at ``_MASKED`` so its unit weights
are annihilated by ``alpha = exp(m_old - m_new) = 0`` once a real score
arrives (the self row guarantees one); garbage lanes of the ragged final
tile fall under the same mask because ``position <= s_buf``.

Layout note: latent rows are (kv_lora_rank + rope_dim) wide — 576 at
DeepSeek geometry, NOT a multiple of 128 lanes. Blocks span the whole
minor dim (Mosaic pads), and the two in-kernel lane slices land on
128-multiples: c = block[:, :512], pe = block[:, 512:].

Reference equivalent: none — the reference serves a raw materialized
cache (`/root/reference/nerf_attention/fit.py:20-118` is its only cache
surface). This is the TPU serving kernel for the framework's 10th model
family.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_attention_tpu.ops.tiling import SUBLANE, round_up

DEFAULT_TILE = 1024
_MASKED = -1e30  # finite "minus infinity": exp underflows to 0, no NaN algebra


def _absorbed_kernel(
    pos_ref,  # (1, 1) SMEM int32 — rows < pos attend
    q_ref,  # (H_pad, latent_dim) queries, [:, :r]=q_lat, [:, r:]=q_pe
    lat_ref,  # (tile, latent_dim) one cache block
    new_ref,  # (SUBLANE, latent_dim), row 0 = the new token's latent
    o_ref,  # (H_pad, r) out: latent-space attention
    ent_ref,  # (H_pad, 1) out: per-head entropy
    m_sc,  # (H_pad, 1) scratch: running max
    l_sc,  # (H_pad, 1) scratch: running denominator
    ws_sc,  # (H_pad, 1) scratch: running sum of weight * score (entropy)
    acc_sc,  # (H_pad, r) scratch: running probs @ c
    *,
    r: int,
    scale: float,
    tile: int,
    n_tiles: int,
    compute_dtype,
):
    ti = pl.program_id(0)

    @pl.when(ti == 0)
    def _init():
        m_sc[:] = jnp.full(m_sc.shape, _MASKED, jnp.float32)
        l_sc[:] = jnp.zeros(l_sc.shape, jnp.float32)
        ws_sc[:] = jnp.zeros(ws_sc.shape, jnp.float32)
        acc_sc[:] = jnp.zeros(acc_sc.shape, jnp.float32)

    pos = pos_ref[0, 0]
    h_pad = q_ref.shape[0]
    q = q_ref[:].astype(compute_dtype)  # (H_pad, latent_dim)
    lat = lat_ref[:].astype(compute_dtype)  # (tile, latent_dim)

    # Scores for every head against this block: one contraction over the
    # full latent row (c and pe parts together — q is their concat too);
    # the logit scale lands on the fp32 scores, matching the XLA path.
    s = jax.lax.dot_general(
        q, lat, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * jnp.float32(scale)  # (H_pad, tile)
    col = jax.lax.broadcasted_iota(jnp.int32, (h_pad, tile), 1) + ti * tile
    s = jnp.where(col < pos, s, jnp.float32(_MASKED))
    # Zero masked rows of the combine operand: their weight is exactly 0,
    # but the ragged final tile's out-of-bounds rows are UNDEFINED memory
    # and 0 * NaN would poison the accumulator (the score path above is
    # already safe — `where` replaces any NaN score with _MASKED).
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + ti * tile
    c_blk = jnp.where(row < pos, lat[:, :r], jnp.zeros((), compute_dtype))

    def online_update(s_blk, c_blk):
        """Merge one (H_pad, K) score block + its (K, r) c rows."""
        m_new = jnp.maximum(m_sc[:], jnp.max(s_blk, axis=-1, keepdims=True))
        alpha = jnp.exp(m_sc[:] - m_new)
        p = jnp.exp(s_blk - m_new)  # masked lanes: exactly 0
        l_sc[:] = alpha * l_sc[:] + jnp.sum(p, axis=-1, keepdims=True)
        # 0 * _MASKED = -0.0 (finite), so masked lanes contribute nothing.
        ws_sc[:] = alpha * ws_sc[:] + jnp.sum(p * s_blk, axis=-1, keepdims=True)
        acc_sc[:] = alpha * acc_sc[:] + jax.lax.dot_general(
            p.astype(compute_dtype),
            c_blk,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_sc[:] = m_new

    online_update(s, c_blk)

    @pl.when(ti == n_tiles - 1)
    def _self_and_emit():
        # The new token's own row: always attends, never in the buffer.
        new = new_ref[:].astype(compute_dtype)  # (SUBLANE, latent_dim)
        s_self = jax.lax.dot_general(
            q, new, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * jnp.float32(scale)  # (H_pad, SUBLANE)
        row = jax.lax.broadcasted_iota(jnp.int32, s_self.shape, 1)
        s_self = jnp.where(row == 0, s_self, jnp.float32(_MASKED))
        online_update(s_self, new[:, :r])

        l = l_sc[:]
        o_ref[:] = (acc_sc[:] / l).astype(o_ref.dtype)
        # H = -sum p_i log p_i with p_i = exp(s_i - m)/l  ==  m + log l - ws/l.
        ent_ref[:] = (m_sc[:] + jnp.log(l) - ws_sc[:] / l).astype(ent_ref.dtype)


def mla_absorbed_attention(
    q: jax.Array,
    cache_latent: jax.Array,
    latent_new: jax.Array,
    position: jax.Array,
    *,
    kv_lora_rank: int,
    scale: float,
    tile: int = DEFAULT_TILE,
    interpret: bool | None = None,
):
    """One layer's absorbed decode attention, one pass over the cache.

    q: (H, kv_lora_rank + rope_dim) — concat of the absorbed
    ``q_nope @ W_uk`` and the post-RoPE ``q_pe``; ``scale`` is the logit
    scale, applied to the fp32 scores inside the kernel. cache_latent:
    (S_buf, latent_dim) — rows < ``position`` attend (pre-allocated
    buffers: unfilled rows are invisible). latent_new: (1, latent_dim)
    the query token's own latent row. Returns
    (o_lat (H, kv_lora_rank) fp32, entropy (H,) fp32).

    Not itself jitted — the callers (`mla_decode_step_absorbed` with
    ``attn_impl='pallas'``) already are. ``interpret=None`` resolves to
    interpret mode off-TPU (CPU tests).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, latent_dim = q.shape
    s_buf = cache_latent.shape[0]
    r = kv_lora_rank

    if s_buf == 0:
        # First token of a fresh sequence: no cache rows exist and
        # ``position`` is necessarily 0 (the contract is position <=
        # s_buf), so only the self row attends. Feed the kernel one
        # all-zero block — the ``col < pos`` mask hides every row of it —
        # instead of a zero-tile grid (which would divide by zero below).
        s_buf = SUBLANE
        cache_latent = jnp.zeros((SUBLANE, latent_dim), cache_latent.dtype)

    tile = min(tile, round_up(s_buf, SUBLANE))
    n_tiles = -(-s_buf // tile)
    h_pad = round_up(h, SUBLANE)

    compute_dtype = cache_latent.dtype
    q_p = jnp.zeros((h_pad, latent_dim), q.dtype).at[:h].set(q)
    new_p = (
        jnp.zeros((SUBLANE, latent_dim), latent_new.dtype)
        .at[:1]
        .set(latent_new)
    )
    pos_arr = jnp.asarray(position, jnp.int32).reshape(1, 1)

    kernel = partial(
        _absorbed_kernel,
        r=r,
        scale=float(scale),
        tile=tile,
        n_tiles=n_tiles,
        compute_dtype=compute_dtype,
    )
    itemsize = jnp.dtype(compute_dtype).itemsize
    o_lat, ent = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (h_pad, latent_dim), lambda ti: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile, latent_dim), lambda ti: (ti, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (SUBLANE, latent_dim), lambda ti: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (h_pad, r), lambda ti: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (h_pad, 1), lambda ti: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h_pad, r), jnp.float32),
            jax.ShapeDtypeStruct((h_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((h_pad, 1), jnp.float32),
            pltpu.VMEM((h_pad, 1), jnp.float32),
            pltpu.VMEM((h_pad, 1), jnp.float32),
            pltpu.VMEM((h_pad, r), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            # score dot + combine dot per cache row, for every head
            flops=2 * h_pad * (n_tiles * tile) * (latent_dim + r),
            bytes_accessed=(n_tiles * tile) * latent_dim * itemsize
            + (2 * h_pad * latent_dim + h_pad * r) * 4,
            transcendentals=h_pad * (n_tiles * tile),
        ),
        interpret=interpret,
    )(pos_arr, q_p, cache_latent, new_p)
    return o_lat[:h], ent[:h, 0]
