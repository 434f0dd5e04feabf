"""Persistent XLA compilation cache shared by every CLI entry point.

Compiles on the tunneled TPU backend cost tens of seconds to minutes; the
persistent cache turns every repeat invocation of the same program shape into
a few-second deserialize. Call ``enable()`` early in each CLI main — it is a
no-op if the jax version lacks the config knobs or a cache dir is already set.
"""

from __future__ import annotations

from pathlib import Path

DEFAULT_CACHE_DIR = Path(__file__).resolve().parents[2] / ".jax_cache"


def enable(cache_dir: str | Path | None = None) -> None:
    import jax

    target = Path(cache_dir) if cache_dir is not None else DEFAULT_CACHE_DIR
    try:
        if jax.config.jax_compilation_cache_dir:  # respect an explicit setting
            return
        target.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(target))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache knobs vary across jax versions; never fail the pipeline
