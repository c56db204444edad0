"""ctypes bindings for the native host kernels (C++).

Builds mea_native.cpp into a shared library on first import (g++,
cached next to the source); falls back silently to the numpy
implementations in ops/mea.py when no toolchain is available. Set
MUSCLE_TPU_NO_NATIVE=1 to force the numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "mea_native.cpp")
_LIB = os.path.join(_HERE, "libmuscle_native.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """The loaded shared library, or None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("MUSCLE_TPU_NO_NATIVE"):
        return None
    if not os.path.exists(_LIB) or \
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.mea_align.restype = ctypes.c_int64
    lib.mea_align.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float)]
    lib.build_post_accumulate.restype = None
    lib.build_post_accumulate.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32)]
    lib.build_post_accumulate_sparse.restype = None
    lib.build_post_accumulate_sparse.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_int]
    lib.build_post_accumulate_csr.restype = None
    lib.build_post_accumulate_csr.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_int]
    lib.mea_score.restype = ctypes.c_float
    lib.mea_score.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def mea_align_native(post: np.ndarray):
    """(score, path) via the C++ kernel; None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    lx, ly = post.shape
    post = np.ascontiguousarray(post, dtype=np.float32)
    rows = np.empty(2 * (ly + 1), dtype=np.float32)
    tb = np.empty(lx * ly, dtype=np.uint8)
    path_buf = ctypes.create_string_buffer(int(lx + ly) + 1)
    score = ctypes.c_float()
    n = lib.mea_align(_fptr(post), lx, ly, _fptr(rows),
                      tb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                      path_buf, ctypes.byref(score))
    if n < 0:
        return None
    return float(score.value), path_buf.raw[:n].decode()


def build_post_accumulate_csr_native(out: np.ndarray, vals: np.ndarray,
                                     cols: np.ndarray, rowptr: np.ndarray,
                                     ptc1: np.ndarray, ptc2: np.ndarray,
                                     transposed: bool) -> bool:
    """CSR accumulation (pack_store wire format); False if unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    assert out.dtype == np.float32 and out.flags.c_contiguous
    vals = np.ascontiguousarray(vals, dtype=np.float32)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    rowptr = np.ascontiguousarray(rowptr, dtype=np.int64)
    ptc1 = np.ascontiguousarray(ptc1, dtype=np.uint32)
    ptc2 = np.ascontiguousarray(ptc2, dtype=np.uint32)
    lib.build_post_accumulate_csr(
        _fptr(out), out.shape[1], _fptr(vals),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        rowptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(rowptr) - 1,
        ptc1.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ptc2.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        1 if transposed else 0)
    return True


def build_post_accumulate_sparse_native(out: np.ndarray, vals: np.ndarray,
                                        cols: np.ndarray, ptc1: np.ndarray,
                                        ptc2: np.ndarray,
                                        transposed: bool) -> bool:
    """Sparse fixed-K accumulation; False if native unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    assert out.dtype == np.float32 and out.flags.c_contiguous
    vals = np.ascontiguousarray(vals, dtype=np.float32)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    ptc1 = np.ascontiguousarray(ptc1, dtype=np.uint32)
    ptc2 = np.ascontiguousarray(ptc2, dtype=np.uint32)
    lib.build_post_accumulate_sparse(
        _fptr(out), out.shape[1], _fptr(vals),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        vals.shape[0], vals.shape[1],
        ptc1.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ptc2.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        1 if transposed else 0)
    return True


def build_post_accumulate_native(out: np.ndarray, P: np.ndarray,
                                 ptc1: np.ndarray, ptc2: np.ndarray) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    assert out.dtype == np.float32 and out.flags.c_contiguous
    P = np.ascontiguousarray(P, dtype=np.float32)
    ptc1 = np.ascontiguousarray(ptc1, dtype=np.uint32)
    ptc2 = np.ascontiguousarray(ptc2, dtype=np.uint32)
    lib.build_post_accumulate(
        _fptr(out), out.shape[1], _fptr(P), P.shape[0], P.shape[1],
        ptc1.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ptc2.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return True
