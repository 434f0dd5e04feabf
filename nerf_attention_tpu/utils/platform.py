"""--device CLI flag semantics (reference fit.py:188-194 --device parity).

The reference flag picks a torch device string ("cuda"/"cpu") with a
CUDA-unavailable fallback to CPU. The JAX translation is platform selection,
with one hazard: accelerators can be registered under plugin-specific
platform names (the chip here appears via the experimental "axon" PJRT
plugin, with JAX_PLATFORMS pinned by the environment). Hard-pinning
jax_platforms='tpu' on such an environment kills the run with "Unable to
initialize backend 'tpu'". So:

- ``--device cpu`` hard-pins the CPU backend (hermetic, always valid);
- ``--device tpu`` means "use the accelerator": leave the ambient platform
  selection untouched and only verify an accelerator actually came up,
  falling back with a message like the reference's CUDA check.
"""

from __future__ import annotations


def pin_platform(device: str | None) -> None:
    """Apply a CLI ``--device`` choice. Call before any jax array op."""
    if device is None:
        return
    import jax

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
        return
    # device == "tpu": the environment selects the accelerator platform
    # (possibly under a plugin name); pinning the literal string would break
    # plugin backends. Verify and warn instead of overriding.
    if jax.default_backend() == "cpu":
        print("TPU requested but no accelerator backend available, using CPU")
