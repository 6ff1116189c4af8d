"""ctypes binding for the native host runtime (native/rtk_host.cpp).

Threaded C++ decode of raw mesh buffers (strided / u16 / u32 / f32 / f64)
into the canonical packed arrays the device build consumes — the native
analogue of the reference's host-side decode tasks (rtk.c:1028-1114).
Falls back to the NumPy path transparently if the toolchain is missing.
"""
from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_ROOT = pathlib.Path(__file__).resolve().parents[2]
_SRC = _ROOT / "native" / "rtk_host.cpp"
_BUILD = _ROOT / "native" / "build"
_SO = _BUILD / "librtk_host.so"

_lib = None
_lib_failed = False

_F32, _F64, _U16, _U32 = 0, 1, 2, 3


def _load():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            _BUILD.mkdir(parents=True, exist_ok=True)
            subprocess.run(
                ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                 "-pthread", str(_SRC), "-o", str(_SO)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(_SO))
        lib.rtkh_decode_positions.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.rtkh_decode_indices.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int]
        lib.rtkh_gather_soup.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.rtkh_hardware_threads.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def _threads(lib, n_items) -> int:
    hw = lib.rtkh_hardware_threads()
    return max(1, min(hw, int(n_items) >> 16 or 1))


def decode_positions(buf: bytes, count: int, stride: int,
                     dtype: str) -> np.ndarray:
    """(count, 3) f32 from a strided raw buffer; dtype 'f32' or 'f64'."""
    lib = _load()
    assert lib is not None
    out = np.empty((count, 3), np.float32)
    buf = bytes(buf) if not isinstance(buf, bytes) else buf
    src = ctypes.cast(ctypes.c_char_p(buf), ctypes.c_void_p)  # no copy
    lib.rtkh_decode_positions(
        src, count, stride,
        _F64 if dtype == "f64" else _F32,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _threads(lib, count))
    return out


def decode_indices(buf: bytes, count: int, stride: int,
                   dtype: str) -> np.ndarray:
    """(count,) u32 from a strided raw buffer; dtype 'u16' or 'u32'."""
    lib = _load()
    assert lib is not None
    out = np.empty((count,), np.uint32)
    buf = bytes(buf) if not isinstance(buf, bytes) else buf
    src = ctypes.cast(ctypes.c_char_p(buf), ctypes.c_void_p)  # no copy
    lib.rtkh_decode_indices(
        src, count, stride,
        _U16 if dtype == "u16" else _U32,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        _threads(lib, count))
    return out


def gather_soup(positions: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """(len(indices), 3) f32 = positions[indices] (threaded gather)."""
    lib = _load()
    assert lib is not None
    positions = np.ascontiguousarray(positions, np.float32)
    indices = np.ascontiguousarray(indices, np.uint32).reshape(-1)
    out = np.empty((indices.shape[0], 3), np.float32)
    lib.rtkh_gather_soup(
        positions.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        indices.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _threads(lib, indices.shape[0]))
    return out
