"""Truncated and randomized SVD for the low-rank compression baseline.

The reference uses ``torch.linalg.svd`` on CPU per tensor
(`/root/reference/nerf_attention/experiments/svd.py:53-54`). Here the exact
SVD runs through XLA, and a randomized range-finder variant (Halko et al.
2011) is provided for long sequences where only a small leading subspace is
needed — it is matmul-dominated and maps straight onto the MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def truncated_svd(matrix: jax.Array, rank: int):
    """Exact SVD truncated to ``rank`` -> (U_r, S_r, Vt_r)."""
    u, s, vt = jnp.linalg.svd(matrix, full_matrices=False)
    return u[:, :rank], s[:rank], vt[:rank, :]


def svd_reconstruct(u: jax.Array, s: jax.Array, vt: jax.Array) -> jax.Array:
    """Low-rank reconstruction U_r diag(S_r) Vt_r."""
    return (u * s[None, :]) @ vt


@partial(jax.jit, static_argnames=("rank",))
def truncated_reconstruct(matrix: jax.Array, rank: int) -> jax.Array:
    """Rank-``rank`` approximation of ``matrix`` in one jitted call."""
    return svd_reconstruct(*truncated_svd(matrix, rank))


@partial(jax.jit, static_argnames=("rank", "oversample", "n_iter"))
def randomized_svd(
    matrix: jax.Array,
    rank: int,
    *,
    key: jax.Array | None = None,
    oversample: int = 10,
    n_iter: int = 4,
):
    """Randomized truncated SVD (Halko-Martinsson-Tropp).

    Projects onto a random (rank + oversample)-dimensional range with
    ``n_iter`` power iterations (QR-stabilized), then takes the exact SVD of
    the small projected matrix. For an (S, D) KV slice with S >> D this costs
    O(S * D * k) matmul FLOPs instead of a full O(S * D^2) SVD and stays on
    the systolic array.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    m, n = matrix.shape
    k = min(rank + oversample, min(m, n))

    omega = jax.random.normal(key, (n, k), dtype=matrix.dtype)
    y = matrix @ omega
    q, _ = jnp.linalg.qr(y)
    for _ in range(n_iter):
        z = matrix.T @ q
        q, _ = jnp.linalg.qr(z)
        y = matrix @ q
        q, _ = jnp.linalg.qr(y)

    b = q.T @ matrix  # (k, n)
    u_b, s, vt = jnp.linalg.svd(b, full_matrices=False)
    u = q @ u_b
    return u[:, :rank], s[:rank], vt[:rank, :]


def svd_rank_for_compression(
    seq_len: int,
    d_head: int,
    target_compression: float,
    raw_bytes_per_elem: int = 2,
) -> int:
    """Rank whose factor storage hits a target compression ratio.

    Factors stored fp32: svd_bytes = (S*r + r + r*D) * 4. With
    ``raw_bytes_per_elem=2`` this is the reference's current-code formula
    (svd.py:48-51, fp16 raw accounting); with 4 it reproduces the accounting
    behind the *published* results table (ranks 60/30/15/7 at S=2048, D=128 —
    see SURVEY.md §2 #14 for the discrepancy).
    """
    raw_bytes = seq_len * d_head * raw_bytes_per_elem
    rank = max(1, int(raw_bytes / (target_compression * 4 * (seq_len + 1 + d_head))))
    return min(rank, min(seq_len, d_head))


def svd_size_bytes(seq_len: int, d_head: int, rank: int) -> int:
    """fp32 storage for (U_r, S_r, Vt_r) (reference svd.py:56)."""
    return (seq_len * rank + rank + rank * d_head) * 4
