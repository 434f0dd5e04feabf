"""Native (C++) components, loaded through ctypes.

Two native pieces, each the host-side hot loop of a pipeline stage, each
built on demand with g++ into ``build/*.so`` with a silent pure-numpy
fallback (``NERF_ATTENTION_NO_NATIVE=1`` disables both):

- synthkv.cpp — the synthetic-KV signal generator (the reference generates
  per-dim signals in a Python loop, extract.py:202-234; at 32 layers x
  8 heads x 128 dims x 8192 tokens the Python path takes minutes).
- qcodec.cpp — the bit-packed quantized-checkpoint codec
  (io/quantized.py): packing/unpacking int<B> code streams when shipping
  or serving a compressed sweep.
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

_QCODEC_SRC = _HERE / "qcodec.cpp"
_QCODEC_SO = _HERE / "build" / "qcodec.so"
_qcodec_lib = None
_qcodec_tried = False


def _compile(src: Path, so: Path) -> bool:
    so.parent.mkdir(exist_ok=True)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(src), "-o", str(so),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def _build() -> bool:
    return _compile(_SRC, _SO)


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


def load_qcodec():
    """Return the qcodec ctypes library, building it if needed; None if
    unavailable (no compiler / disabled by env)."""
    global _qcodec_lib, _qcodec_tried
    if _qcodec_lib is not None or _qcodec_tried:
        return _qcodec_lib
    _qcodec_tried = True
    if os.environ.get("NERF_ATTENTION_NO_NATIVE"):
        return None
    if not _QCODEC_SRC.exists():
        if not _QCODEC_SO.exists():
            return None
    elif (
        not _QCODEC_SO.exists()
        or _QCODEC_SO.stat().st_mtime < _QCODEC_SRC.stat().st_mtime
    ):
        if not _compile(_QCODEC_SRC, _QCODEC_SO):
            return None
    try:
        lib = ctypes.CDLL(str(_QCODEC_SO))
    except OSError:
        return None

    lib.pack_codes.argtypes = [
        ctypes.POINTER(ctypes.c_int8), ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.pack_codes.restype = None
    lib.unpack_codes.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int8),
    ]
    lib.unpack_codes.restype = None
    _qcodec_lib = lib
    return _qcodec_lib
