"""Multi-device sharding of the fit sweep on the virtual 8-device CPU mesh."""

import jax
import numpy as np

from nerf_attention_tpu.parallel.mesh import (
    batch_sharding,
    fit_mesh,
    pad_to_multiple,
    shard_batch,
)
from nerf_attention_tpu.parallel.sweep import fit_batch
from nerf_attention_tpu.types import SIRENConfig

TINY = SIRENConfig(16, 1, 30.0, "t")


def _targets(n, seq_len=64, d_head=4):
    t = np.linspace(0, 1, seq_len)[:, None]
    return np.stack(
        [np.sin(2 * np.pi * (i + 1) * t) * np.ones((1, d_head)) for i in range(n)]
    ).astype(np.float32)


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_pad_to_multiple():
    assert pad_to_multiple(40, 8) == 40
    assert pad_to_multiple(12, 8) == 16
    assert pad_to_multiple(1, 8) == 8


def test_shard_batch_places_on_all_devices():
    mesh = fit_mesh()
    x = shard_batch(np.zeros((16, 4, 4), np.float32), mesh)
    assert len(x.sharding.device_set) == 8


def test_sharded_sweep_matches_single_device_quality():
    mesh = fit_mesh()
    targets = _targets(8)
    sharded = fit_batch(targets, TINY, epochs=200, seed=0, mesh=mesh)
    local = fit_batch(targets, TINY, epochs=200, seed=0, mesh=None)
    # Identical program + identical keys -> identical numerics up to fp
    # reduction ordering differences across shardings.
    np.testing.assert_allclose(
        sharded.cosine_mean, local.cosine_mean, atol=1e-4
    )
    assert sharded.num_fits == 8


def test_sharded_sweep_pads_uneven_batches():
    mesh = fit_mesh()
    targets = _targets(5)  # not divisible by 8 -> padded to 8, cropped back
    result = fit_batch(targets, TINY, epochs=100, seed=0, mesh=mesh)
    assert result.num_fits == 5
    assert result.cosine_mean.shape == (5,)
    assert result.losses.shape == (5, 100)
    assert np.isfinite(result.cosine_mean).all()


def test_sharded_sweep_pad_exceeds_batch():
    mesh = fit_mesh()
    targets = _targets(3)  # pad amount (5) > batch size (3): wrap-around
    result = fit_batch(targets, TINY, epochs=50, seed=0, mesh=mesh)
    assert result.num_fits == 3
    assert result.cosine_mean.shape == (3,)
    assert np.isfinite(result.cosine_mean).all()


def test_pallas_impl_sharded_matches_xla_quality():
    """The shard_map-wrapped fused kernel trains to the XLA optimum."""
    mesh = fit_mesh()
    targets = _targets(8)
    pal = fit_batch(targets, TINY, epochs=150, seed=0, mesh=mesh, impl="pallas")
    xla = fit_batch(targets, TINY, epochs=150, seed=0, mesh=mesh, impl="xla")
    np.testing.assert_allclose(pal.cosine_mean, xla.cosine_mean, atol=2e-3)
    np.testing.assert_allclose(pal.losses, xla.losses, rtol=1e-3, atol=1e-5)
    assert pal.num_fits == 8 and pal.losses.shape == (8, 150)


def test_pallas_impl_sharded_pads_uneven_batches():
    mesh = fit_mesh()
    targets = _targets(5)  # padded to 8 across the mesh, cropped back
    result = fit_batch(targets, TINY, epochs=50, seed=0, mesh=mesh, impl="pallas")
    assert result.num_fits == 5
    assert result.cosine_mean.shape == (5,)
    assert np.isfinite(result.cosine_mean).all()


def test_batch_sharding_spec():
    mesh = fit_mesh()
    sharding = batch_sharding(mesh, ndim=3)
    spec = sharding.spec
    assert spec[0] == "fit" and spec[1] is None and spec[2] is None
