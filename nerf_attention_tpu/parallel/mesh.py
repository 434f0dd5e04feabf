"""Device-mesh and sharding helpers.

The fit sweep is embarrassingly parallel over the fit axis (each SIREN trains
on its own (S, D) tensor), so the parallel layout is a 1-D mesh whose single
axis shards the leading batch dimension of every batched array. XLA compiles
the vmapped training step into an SPMD program with zero collectives in the
hot loop; metrics come back with one implicit all-gather at the end.

The reference has no distributed code at all (SURVEY.md §2) — its 280 fits run
sequentially on one GPU. Here the same sweep is one jitted program over
however many chips the mesh has.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FIT_AXIS = "fit"


def fit_mesh(devices: list | None = None, axis_name: str = FIT_AXIS) -> Mesh:
    """A 1-D mesh over all (or the given) devices for the fit-batch axis."""
    devs = np.array(devices if devices is not None else jax.devices())
    return Mesh(devs, axis_names=(axis_name,))


def batch_sharding(mesh: Mesh, ndim: int, axis_name: str = FIT_AXIS) -> NamedSharding:
    """NamedSharding that splits dim 0 across the mesh, replicating the rest."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def shard_batch(x: jax.Array | np.ndarray, mesh: Mesh, axis_name: str = FIT_AXIS):
    """Place a batched array on the mesh, sharded along its leading axis."""
    return jax.device_put(x, batch_sharding(mesh, np.ndim(x), axis_name))


def pad_to_multiple(n: int, k: int) -> int:
    """Smallest multiple of k that is >= n (fit batches pad up to the mesh)."""
    return ((n + k - 1) // k) * k


def shard_map_compat(body, *, mesh: Mesh, in_specs, out_specs):
    """shard_map across the jax 0.9 API move, replication checks off.

    Newer jax exposes ``jax.shard_map`` (flag named ``check_vma``); older
    releases only have ``jax.experimental.shard_map.shard_map``
    (``check_rep``). Bodies here either wrap pallas_call (whose out_shape
    carries no varying-mesh-axes annotation) or mix per-shard compute with
    explicit collectives, so the automatic replication check is disabled in
    both spellings.
    """
    common = dict(mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    try:
        return jax.shard_map(body, check_vma=False, **common)
    except (AttributeError, TypeError):
        from jax.experimental.shard_map import shard_map as _shard_map

        return _shard_map(body, check_rep=False, **common)
