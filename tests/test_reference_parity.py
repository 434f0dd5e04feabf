"""Direct numerical parity against the reference implementation.

These tests execute the actual reference code (mounted read-only at
/root/reference) as an oracle and are skipped wherever it isn't present —
the rest of the suite is hermetic.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference repo not mounted"
)


@pytest.fixture(scope="module")
def reference_pkg():
    torch = pytest.importorskip("torch")  # noqa: F841
    sys.path.insert(0, str(REFERENCE))
    try:
        import nerf_attention as ref

        yield ref
    finally:
        sys.path.remove(str(REFERENCE))


def test_synthetic_generator_matches_reference(reference_pkg, tmp_path):
    """Same seeds -> same tensors, to float32 grid rounding.

    The RNG draw streams are identical; the only divergence source is the
    time grid (the reference builds it with torch.linspace in float32, ours
    is np.linspace in float64), which perturbs the smooth carriers by
    ~1e-7 relative. Spike positions/widths/amplitudes and all noise are
    bit-identical, so any drift beyond float32 rounding would blow far past
    this tolerance.
    """
    from nerf_attention_tpu.io import kvstore
    from nerf_attention_tpu.synthetic import generate_synthetic_kv

    ref_dir = tmp_path / "ref"
    ours_dir = tmp_path / "ours"
    kwargs = dict(seq_len=96, num_layers=2, num_kv_heads=2, head_dim=6)
    reference_pkg.extract_kv_cache_synthetic(output_dir=ref_dir, **kwargs)
    generate_synthetic_kv(output_dir=ours_dir, verbose=False, **kwargs)

    import torch

    for layer in range(2):
        ref_data = torch.load(ref_dir / f"layer_{layer:02d}.pt", weights_only=True)
        k_ours, v_ours = kvstore.load_layer(ours_dir, layer)
        np.testing.assert_allclose(
            k_ours, ref_data["keys"].numpy(), rtol=0, atol=5e-5
        )
        np.testing.assert_allclose(
            v_ours, ref_data["values"].numpy(), rtol=0, atol=5e-5
        )


def test_siren_init_matches_reference(reference_pkg):
    """Init DISTRIBUTIONS match: same bounds per layer, uniform in range."""
    import jax

    from nerf_attention_tpu.models.siren import init_bound, init_siren, layer_dims
    from nerf_attention_tpu.types import SIRENConfig

    torch = pytest.importorskip("torch")
    config = SIRENConfig(32, 2, 30.0, "t")
    ref_model = reference_pkg.SIREN(
        reference_pkg.SIRENConfig(32, 2, 30.0, "t"), out_features=8
    )
    params = init_siren(jax.random.PRNGKey(0), config, 8)

    ref_linears = [m for m in ref_model.modules() if isinstance(m, torch.nn.Linear)]
    assert len(ref_linears) == len(params) == len(layer_dims(config, 8))
    for i, (lin, (w, b)) in enumerate(zip(ref_linears, params)):
        assert lin.weight.shape == tuple(reversed(w.shape))  # torch is (out, in)
        bound = init_bound(config, i, w.shape[0])
        for arr in (np.asarray(w), lin.weight.detach().numpy()):
            assert np.abs(arr).max() <= bound + 1e-7
            # A uniform draw over (-bound, bound) fills the range.
            assert np.abs(arr).max() >= bound * 0.5


def test_fit_quality_matches_reference_on_same_tensor(reference_pkg):
    """Both trainers reach the same CosSim on one smooth target (±0.01)."""
    import jax  # noqa: F401

    from nerf_attention_tpu.fit import fit_siren
    from nerf_attention_tpu.types import SIRENConfig

    s, d = 128, 8
    t = np.linspace(0, 1, s, dtype=np.float32)[:, None]
    target = (np.sin(2 * np.pi * 3 * t) + 0.3 * np.cos(2 * np.pi * 7 * t)) * np.ones(
        (1, d), np.float32
    )

    import torch

    ref_result = reference_pkg.fit_siren(
        torch.from_numpy(target),
        reference_pkg.SIRENConfig(64, 1, 30.0, "t64"),
        epochs=800,
        device="cpu",
        verbose=False,
    )
    ours = fit_siren(
        target, SIRENConfig(64, 1, 30.0, "t64"), epochs=800, verbose=False
    )
    assert abs(ours.final_cosine_mean - ref_result.final_cosine_mean) < 0.01
    assert ours.num_parameters == sum(
        p.numel() for p in ref_result.model.parameters()
    )
