"""Profiler tracing: capture XLA/TPU traces around any pipeline stage.

The reference's only observability is wall-clock prints
(`/root/reference/nerf_attention/siren.py:96,117`, `evaluate.py:189-203`).
The TPU-native equivalent is a real profiler: ``jax.profiler`` emits a
TensorBoard-compatible trace (XLA ops, fusion boundaries, HBM traffic) that
answers *why* a number is slow, not just how slow. Enabled with
``--profile_dir`` on the fit CLI or the ``trace()`` context manager anywhere.
"""

from __future__ import annotations

import contextlib
from pathlib import Path


@contextlib.contextmanager
def trace(profile_dir: str | Path | None):
    """Capture a jax.profiler trace into ``profile_dir`` (no-op when None).

    View with: tensorboard --logdir <profile_dir> (Profile tab), or
    xprof. Works on TPU and CPU backends.
    """
    if profile_dir is None:
        yield
        return

    import sys

    import jax

    profile_dir = Path(profile_dir)
    profile_dir.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(profile_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        # stderr: callers like bench.py reserve stdout for machine-readable
        # output (one JSON line) — diagnostics must not corrupt it.
        print(
            f"  Profiler trace written to {profile_dir}/ "
            f"(view: tensorboard --logdir {profile_dir})",
            file=sys.stderr,
        )


def annotate(name: str):
    """Named region that shows up in the trace timeline (TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
