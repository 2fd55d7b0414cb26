"""
ctypes bindings for the native host CSR utilities.

The native library is the framework's C++ component (the role of the
reference's cffi-built MKL shim, reference: tasks.py:24-55 +
csr/kernels/mkl/_api.py): it accelerates host-side construction paths that
run on numpy buffers before data ships to the TPU.  The library is built
on demand with g++ (see :mod:`csr_tpu.native.build`) and cached next to
this file; every caller has a pure-Python/XLA fallback, so a missing
toolchain only costs speed.
"""

from __future__ import annotations

import ctypes
import logging
import os

import numpy as np

_log = logging.getLogger(__name__)

_LIB = None
_TRIED = False


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _fp(a):
    t = ctypes.c_double if a.dtype == np.float64 else ctypes.c_float
    return a.ctypes.data_as(ctypes.POINTER(t))


def get_lib():
    """The loaded native library, or None when unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("CSR_TPU_NO_NATIVE"):
        return None
    try:
        from .build import ensure_built

        path = ensure_built()
        lib = ctypes.CDLL(path)
        for name in ("csrt_filter_zeros_f64", "csrt_filter_zeros_f32"):
            getattr(lib, name).restype = ctypes.c_int64
        _LIB = lib
    except Exception as e:  # missing toolchain, sandboxed build, ...
        _log.debug("native csr host library unavailable: %s", e)
        _LIB = None
    return _LIB


def available() -> bool:
    return get_lib() is not None


def from_coo(nrows: int, rows, cols, values=None):
    """Native COO->CSR; returns (rowptrs i64, colinds i32, values) numpy
    arrays, or None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    nnz = len(rows)
    rowptrs = np.empty(nrows + 1, np.int64)
    out_cols = np.empty(nnz, np.int32)
    if values is None:
        lib.csrt_from_coo_structure(
            nnz, _i32p(rows), _i32p(cols), nrows, _i64p(rowptrs), _i32p(out_cols)
        )
        return rowptrs, out_cols, None
    values = np.ascontiguousarray(values)
    if values.dtype == np.float64:
        fn = lib.csrt_from_coo_f64
    elif values.dtype == np.float32:
        fn = lib.csrt_from_coo_f32
    else:
        return None
    out_vals = np.empty(nnz, values.dtype)
    fn(
        nnz, _i32p(rows), _i32p(cols), _fp(values), nrows,
        _i64p(rowptrs), _i32p(out_cols), _fp(out_vals),
    )
    return rowptrs, out_cols, out_vals


def transpose(nrows, ncols, rowptrs, colinds, values=None):
    """Native CSR transpose on host arrays, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    rowptrs = np.ascontiguousarray(rowptrs, np.int64)
    colinds = np.ascontiguousarray(colinds, np.int32)
    nnz = len(colinds)
    t_rps = np.empty(ncols + 1, np.int64)
    t_cis = np.empty(nnz, np.int32)
    if values is None:
        lib.csrt_transpose_structure(
            nrows, ncols, _i64p(rowptrs), _i32p(colinds), _i64p(t_rps), _i32p(t_cis)
        )
        return t_rps, t_cis, None
    values = np.ascontiguousarray(values)
    if values.dtype == np.float64:
        fn = lib.csrt_transpose_f64
    elif values.dtype == np.float32:
        fn = lib.csrt_transpose_f32
    else:
        return None
    t_vls = np.empty(nnz, values.dtype)
    fn(
        nrows, ncols, _i64p(rowptrs), _i32p(colinds), _fp(values),
        _i64p(t_rps), _i32p(t_cis), _fp(t_vls),
    )
    return t_rps, t_cis, t_vls


def transpose_host(nrows, ncols, rowptrs, colinds, values=None):
    """CSR transpose on host arrays: native counting sort when the library
    is available, a numpy stable argsort otherwise.  Always returns the
    ``(t_rowptrs, t_colinds, t_values)`` triple (the TPU analog of the
    reference's two-pass count-then-scatter, csr/structure.py:172-237)."""
    t = transpose(nrows, ncols, rowptrs, colinds, values)
    if t is not None:
        return t
    rp = np.asarray(rowptrs)
    cis = np.asarray(colinds)
    order = np.argsort(cis, kind="stable")
    rids = np.repeat(np.arange(nrows, dtype=np.int32), np.diff(rp))
    t_rps = np.zeros(ncols + 1, np.int64)
    np.cumsum(np.bincount(cis, minlength=ncols), out=t_rps[1:])
    t_vls = None if values is None else np.asarray(values)[order]
    return t_rps, rids[order].astype(np.int32), t_vls


def sort_rows(nrows, rowptrs, colinds, values=None):
    """Native in-place per-row column sort; mutates colinds/values.
    Returns True on success."""
    lib = get_lib()
    if lib is None:
        return False
    rowptrs = np.ascontiguousarray(rowptrs, np.int64)
    assert colinds.dtype == np.int32 and colinds.flags.c_contiguous
    if values is None:
        lib.csrt_sort_rows_structure(nrows, _i64p(rowptrs), _i32p(colinds))
        return True
    if values.dtype == np.float64:
        lib.csrt_sort_rows_f64(nrows, _i64p(rowptrs), _i32p(colinds), _fp(values))
    elif values.dtype == np.float32:
        lib.csrt_sort_rows_f32(nrows, _i64p(rowptrs), _i32p(colinds), _fp(values))
    else:
        return False
    return True


def _mb_bind(lib):
    i64, i64p = ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    lib.csrt_mb_plan.restype = i64
    lib.csrt_mb_plan.argtypes = [i64, i64, i64, i64p, i32p, i64, i64, i64]
    lib.csrt_mb_fill.restype = i64
    lib.csrt_mb_fill.argtypes = [i64, i64, i64, i64p, i32p, f32p, i64, i64,
                                 i64, i64, f32p, u16p, i32p]
    lib.csrt_mb_plan3.restype = i64
    lib.csrt_mb_plan3.argtypes = [i64, i64, i64, i64p, i32p, i64, i64, i64p]


def plan_microrows(nrows, ncols, rowptrs, cols, window: int,
                   pad_mult: int, pair: int = 1):
    """Native micro-row count for a given (window, pair) layout choice
    (for the layout chooser), or None when the native library is
    unavailable."""
    # the native group mask arithmetic (gmask = pair-1) is only valid for
    # powers of two; reject bad callers here rather than miscounting
    assert pair in (1, 2, 4), pair
    lib = get_lib()
    if lib is None or not hasattr(lib, "csrt_mb_plan"):
        return None
    _mb_bind(lib)
    rowptrs = np.ascontiguousarray(rowptrs, np.int64)
    cols = np.ascontiguousarray(cols, np.int32)
    m = lib.csrt_mb_plan(
        len(cols), nrows, ncols, _i64p(rowptrs), _i32p(cols),
        int(window).bit_length() - 1, pad_mult, pair,
    )
    return None if m < 0 else int(m)


def plan_microrows3(nrows, ncols, rowptrs, cols, window: int, pad_mult: int):
    """Native micro-row counts for pair = (1, 2, 4) at one window width in
    a single sort+walk, or None when unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "csrt_mb_plan3"):
        return None
    _mb_bind(lib)
    rowptrs = np.ascontiguousarray(rowptrs, np.int64)
    cols = np.ascontiguousarray(cols, np.int32)
    out3 = np.empty(3, np.int64)
    rc = lib.csrt_mb_plan3(
        len(cols), nrows, ncols, _i64p(rowptrs), _i32p(cols),
        int(window).bit_length() - 1, pad_mult, _i64p(out3),
    )
    return None if rc < 0 else tuple(int(v) for v in out3)


def build_microblocks(nrows, ncols, rowptrs, cols, values, m_round: int,
                      window: int, pad_mult: int, pair: int = 1):
    """Native micro-block layout build (see csr_host.cpp csrt_mb_*).

    Returns ``(vals, meta, rbcb, m)`` numpy arrays with ``m_pad`` rows
    rounded up to ``m_round``, or ``None`` when the native library is
    unavailable or the matrix exceeds the packing range."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "csrt_mb_plan"):
        return None
    _mb_bind(lib)
    rowptrs = np.ascontiguousarray(rowptrs, np.int64)
    cols = np.ascontiguousarray(cols, np.int32)
    nnz = len(cols)
    cshift = int(window).bit_length() - 1
    m = lib.csrt_mb_plan(nnz, nrows, ncols, _i64p(rowptrs), _i32p(cols),
                         cshift, pad_mult, pair)
    if m < 0:
        return None
    m_pad = -(-max(int(m), 1) // m_round) * m_round
    vals = np.zeros((m_pad, 128), np.float32)
    meta = np.zeros((m_pad, 128), np.uint16)
    rbcb = np.zeros(m_pad, np.int32)
    if values is not None:
        values = np.ascontiguousarray(values, np.float32)
        vp = _fp(values)
    else:
        vp = None
    m2 = lib.csrt_mb_fill(
        nnz, nrows, ncols, _i64p(rowptrs), _i32p(cols), vp, cshift, pad_mult,
        pair, m_pad,
        _fp(vals), meta.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        _i32p(rbcb),
    )
    assert m2 == m, (m2, m)
    return vals, meta, rbcb, int(m)
