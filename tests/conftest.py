"""Test harness: all tests run on CPU JAX with 8 virtual devices.

This is the fake-backend multi-chip strategy the reference lacks entirely
(SURVEY.md §4): sharding/mesh code paths are exercised hermetically without
TPU hardware. Environment must be set before jax initializes.
"""

import os

# Stash the shell's platform pin (e.g. "axon") before forcing CPU, so
# subprocess tests can reproduce the driver's real environment.
os.environ.setdefault(
    "NERF_TEST_SHELL_JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS", "")
)
os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may pin a TPU platform
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Some images pre-import jax from sitecustomize (TPU plugin registration)
# before this file runs; backends are still lazy, so a config update works.
import jax

jax.config.update("jax_platforms", "cpu")

# The persistent compilation cache must be OFF in tests: XLA:CPU
# executable (de)serialization on this image wedges indefinitely for
# large programs (faulthandler-captured twice — once in
# get_executable_and_time on a repo .jax_cache entry, once in
# put_executable_and_time's executable.serialize() writing to a FRESH
# temp dir; the image's jaxlib also warns its XLA:CPU AOT machine
# features don't match this host). The study stage's fit program is big
# enough to cross the 1 s write threshold and hang the whole suite at
# ~85%. Disabling the cache sidesteps serialize entirely — CPU compiles
# at test shapes are cheap. The dir redirect is belt-and-braces for
# anything that re-enables the flag (utils/compile_cache.enable()
# respects an explicit dir setting).
import tempfile

try:
    jax.config.update("jax_enable_compilation_cache", False)
    jax.config.update(
        "jax_compilation_cache_dir",
        tempfile.mkdtemp(prefix="jax_cache_tests_"),
    )
except Exception:
    pass

import numpy as np
import pytest

from nerf_attention_tpu.synthetic import generate_synthetic_kv


@pytest.fixture(scope="session")
def tiny_kv_dir(tmp_path_factory):
    """A small deterministic synthetic KV cache shared across tests."""
    kv_dir = tmp_path_factory.mktemp("kv") / "kv_cache"
    generate_synthetic_kv(
        seq_len=128,
        num_layers=4,
        num_kv_heads=2,
        head_dim=16,
        output_dir=kv_dir,
        verbose=False,
    )
    return kv_dir


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)


def assert_figure_png(path, min_px=(320, 240), min_ink=0.005, min_colors=8):
    """Per-figure image QA: the PNG exists, has real size, and real content.

    Catches the failure modes an ``exists()`` assert misses: a blank canvas
    (all-white render because a panel got empty data), a single-color
    figure, or a truncated/corrupt file. ``min_ink`` is the fraction of
    non-white pixels; every real panel (axes frame + ticks alone) clears
    0.5% easily.
    """
    import matplotlib.image as mpimg

    img = mpimg.imread(str(path))  # (H, W, 4) float in [0, 1]
    h, w = img.shape[:2]
    assert w >= min_px[0] and h >= min_px[1], f"{path}: tiny render {w}x{h}"
    rgb = img[..., :3]
    ink = float(np.mean(np.any(rgb < 0.95, axis=-1)))
    assert ink >= min_ink, f"{path}: {ink:.4%} non-white pixels — blank figure?"
    # Quantized color diversity: a legit multi-element figure has many more.
    colors = np.unique(
        (rgb.reshape(-1, 3) * 16).astype(np.uint8), axis=0
    ).shape[0]
    assert colors >= min_colors, f"{path}: only {colors} distinct colors"


@pytest.fixture()
def figqa():
    """Image-QA callable: figqa(png_path) asserts the render has content."""
    return assert_figure_png
