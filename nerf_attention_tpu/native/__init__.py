"""Native (C++) components, loaded through ctypes.

The only native piece so far is the synthetic-KV signal generator
(synthkv.cpp) — the host-side hot loop of the extraction stage (the reference
generates per-dim signals in a Python loop, extract.py:202-234; at 32 layers x
8 heads x 128 dims x 8192 tokens the Python path takes minutes). It is built
on demand with g++ into ``build/synthkv.so`` and falls back to the pure-numpy
path silently if no compiler is available. ``NERF_ATTENTION_NO_NATIVE=1``
disables it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "synthkv.cpp"
_SO = _HERE / "build" / "synthkv.so"

_lib = None
_tried = False


def _build() -> bool:
    _SO.parent.mkdir(exist_ok=True)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(_SO),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def load_synthkv():
    """Return the synthkv ctypes library, building it if needed; None if
    unavailable (no compiler / disabled by env)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("NERF_ATTENTION_NO_NATIVE"):
        return None
    if not _SRC.exists():
        # Source pruned (e.g. a trimmed install): use a prebuilt .so if one
        # exists, otherwise fall back to numpy — never raise.
        if not _SO.exists():
            return None
    elif not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None

    lib.synth_head.argtypes = [
        ctypes.c_uint32, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.synth_head.restype = None
    lib.synth_layer.argtypes = [
        ctypes.c_uint32, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.synth_layer.restype = None
    try:
        lib.synth_hard_values.argtypes = [
            ctypes.c_uint32, ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.POINTER(ctypes.c_float),
        ]
        lib.synth_hard_values.restype = None
        lib.synth_hard_values_layer.argtypes = [
            ctypes.c_uint32, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.synth_hard_values_layer.restype = None
    except AttributeError:
        pass  # prebuilt .so predating hard-values; numpy fallback covers it
    lib.rng_doubles.argtypes = [
        ctypes.c_uint32, ctypes.c_int, ctypes.POINTER(ctypes.c_double)
    ]
    lib.rng_randints.argtypes = [
        ctypes.c_uint32, ctypes.c_long, ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.rng_gauss.argtypes = [
        ctypes.c_uint32, ctypes.c_int, ctypes.POINTER(ctypes.c_double)
    ]
    _lib = lib
    return _lib
