"""Native bit-packing codec: bit-exact parity with the numpy path.

`native/qcodec.cpp` is the serving-side twin of
`io/quantized.py:pack_codes/unpack_codes`; the stored `.npz` payloads must
be identical no matter which codec wrote or reads them.
"""

import ctypes

import numpy as np
import pytest

from nerf_attention_tpu.io import quantized as q
from nerf_attention_tpu.native import load_qcodec

lib = load_qcodec()
needs_native = pytest.mark.skipif(lib is None, reason="no C++ toolchain")


def _numpy_pack(codes: np.ndarray, bits: int) -> np.ndarray:
    qmax = (1 << (bits - 1)) - 1
    u = (codes.reshape(-1).astype(np.int16) + qmax).astype(np.uint8)
    if bits == 8:
        return u
    unpacked = np.unpackbits(u[:, None], axis=1, bitorder="little", count=bits)
    return np.packbits(unpacked.reshape(-1), bitorder="little")


def _numpy_unpack(packed: np.ndarray, bits: int, size: int) -> np.ndarray:
    qmax = (1 << (bits - 1)) - 1
    if bits == 8:
        u = packed[:size]
    else:
        unpacked = np.unpackbits(
            np.asarray(packed, np.uint8), bitorder="little", count=size * bits
        ).reshape(size, bits)
        u = np.packbits(unpacked, axis=1, bitorder="little")[:, 0]
    return (u.astype(np.int16) - qmax).astype(np.int8)


@needs_native
@pytest.mark.parametrize("bits", [2, 3, 4, 5, 6, 8])
@pytest.mark.parametrize("n", [1, 7, 8, 999, 4096])
def test_native_pack_matches_numpy(bits, n):
    qmax = (1 << (bits - 1)) - 1
    rng = np.random.default_rng(bits * 1000 + n)
    codes = rng.integers(-qmax, qmax + 1, size=n).astype(np.int8)

    native = np.empty(-(-n * bits // 8), dtype=np.uint8)
    lib.pack_codes(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        ctypes.c_long(n), ctypes.c_int(bits),
        native.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    np.testing.assert_array_equal(native, _numpy_pack(codes, bits))

    # Cross decode: numpy reads the native stream, native reads numpy's.
    np.testing.assert_array_equal(_numpy_unpack(native, bits, n), codes)
    back = np.empty(n, dtype=np.int8)
    lib.unpack_codes(
        _numpy_pack(codes, bits).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)
        ),
        ctypes.c_long(n), ctypes.c_int(bits),
        back.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
    )
    np.testing.assert_array_equal(back, codes)


@pytest.mark.parametrize("bits", [3, 4, 8])
def test_public_api_roundtrips_whatever_codec_is_active(bits):
    """io.quantized.pack/unpack round-trip regardless of which codec the
    environment provides (native or numpy fallback)."""
    qmax = (1 << (bits - 1)) - 1
    rng = np.random.default_rng(bits)
    codes = rng.integers(-qmax, qmax + 1, size=2051).astype(np.int8)
    packed = q.pack_codes(codes, bits)
    assert packed.dtype == np.uint8
    assert packed.size == -(-codes.size * bits // 8)
    np.testing.assert_array_equal(q.unpack_codes(packed, bits, codes.size), codes)
    # The stream is the documented layout whichever codec produced it.
    np.testing.assert_array_equal(packed, _numpy_pack(codes, bits))
