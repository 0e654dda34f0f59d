"""ctypes bindings for the C++ host-preprocessing library (csrc/).

Builds ``libmggcn_host.so`` lazily with g++ -O3 -fopenmp on first use and
falls back to numpy silently when no compiler is available — the framework
never hard-depends on the native path, it just goes faster with it
(mirroring how the reference leans on TBB for its host ops, mg_gcn.hpp:13).

Set ``MG_GCN_NO_NATIVE=1`` to disable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_CSRC = os.path.join(os.path.dirname(_HERE), "csrc")
_BUILD = os.path.join(_CSRC, "build")
_SO = os.path.join(_BUILD, "libmggcn_host.so")

_lib = None
_tried = False

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _build() -> bool:
    src = os.path.join(_CSRC, "mggcn_host.cpp")
    if not os.path.exists(src):
        return False
    try:
        os.makedirs(_BUILD, exist_ok=True)
    except OSError:  # read-only checkout: numpy fallback
        return False
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-std=c++17", src, "-o", _SO,
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if r.returncode != 0:
        print(f"mggcn native build failed:\n{r.stderr}", file=sys.stderr)
        return False
    return True


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("MG_GCN_NO_NATIVE"):
        return None
    src = os.path.join(_CSRC, "mggcn_host.cpp")
    stale = (
        not os.path.exists(_SO)
        or (
            os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(_SO)
        )  # ABI changes (e.g. the r_bits params) must force a rebuild
    )
    if stale and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    c = ctypes.c_int64
    i32 = ctypes.c_int32
    lib.mggcn_expand_rows.argtypes = [c, _i64p, _i32p]
    lib.mggcn_normalize.argtypes = [c, c, _i64p, _i32p, _f32p, _f32p, ctypes.c_int, _f64p]
    lib.mggcn_transpose.argtypes = [c, c, c, _i64p, _i32p, _f32p, _i64p, _i32p, _f32p]
    lib.mggcn_comm_volume.argtypes = [c, c, _i64p, _i64p, _i32p, _u8p, c, _i64p]
    lib.mggcn_edge_sort.argtypes = [
        c, c, _i64p, _i32p, _f32p, ctypes.c_void_p, c, c, c,
        _i32p, _i32p, _f32p, _i32p, _i32p,
    ]
    lib.mggcn_edge_sort.restype = ctypes.c_int
    lib.mggcn_edge_fill.argtypes = [
        c, c, c, c, _i64p, _i64p, _i64p, _i64p,
        _i32p, _i32p, _f32p, ctypes.c_void_p, i32, i32, i32,
        _i32p, ctypes.c_void_p,
    ]
    lib.mggcn_gather_sort.argtypes = [
        c, c, _i64p, _i32p, _f32p, c, c, i32, i32,
        _i32p, _i32p, _f32p, _i64p, _i64p, _i64p,
    ]
    lib.mggcn_gather_sort.restype = c
    lib.mggcn_gather_fill.argtypes = [
        c, c, _i64p, _i64p, _i64p, _i64p, _i64p,
        _i32p, _i32p, _f32p, c, i32, i32, _i32p, ctypes.c_void_p,
    ]
    lib.mggcn_num_threads.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    if os.environ.get("MG_GCN_NO_NATIVE"):
        return False
    return _load() is not None


def _prep(csr):
    indptr = np.ascontiguousarray(csr.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(csr.indices, dtype=np.int32)
    data = np.ascontiguousarray(csr.data, dtype=np.float32)
    return indptr, indices, data


def expand_rows(csr) -> np.ndarray:
    lib = _load()
    indptr, _, _ = _prep(csr)
    rows = np.empty(csr.nnz, np.int32)
    lib.mggcn_expand_rows(csr.nrows, indptr, rows)
    return rows


def normalize(csr, axis: bool) -> np.ndarray:
    """Returns the normalized data array (same index structure)."""
    lib = _load()
    indptr, indices, data = _prep(csr)
    out = np.empty_like(data)
    scratch = np.zeros(csr.ncols if axis else 1, np.float64)
    lib.mggcn_normalize(
        csr.nrows, csr.ncols, indptr, indices, data, out, 1 if axis else 0, scratch
    )
    return out


def transpose(csr):
    from .formats import CSRData

    lib = _load()
    indptr, indices, data = _prep(csr)
    t_indptr = np.empty(csr.ncols + 1, np.int64)
    t_indices = np.empty(csr.nnz, np.int32)
    t_data = np.empty(csr.nnz, np.float32)
    lib.mggcn_transpose(
        csr.nrows, csr.ncols, csr.nnz, indptr, indices, data,
        t_indptr, t_indices, t_data,
    )
    return CSRData(
        indptr=t_indptr, indices=t_indices, data=t_data,
        shape=(csr.ncols, csr.nrows),
    )


def comm_volume(csr, part: np.ndarray) -> np.ndarray:
    lib = _load()
    indptr, indices, _ = _prep(csr)
    P = len(part) - 1
    marks = np.zeros(P * csr.ncols, np.uint8)
    vol = np.zeros(P * P, np.int64)
    lib.mggcn_comm_volume(
        csr.nrows, P, np.ascontiguousarray(part, np.int64), indptr, indices,
        marks, csr.ncols, vol,
    )
    return vol.reshape(P, P)


def _cptr(arr):
    """void* of a float32/int32 array, or None (NULL) when arr is None."""
    if arr is None:
        return None
    return arr.ctypes.data_as(ctypes.c_void_p)


def edge_sort(csr, wq, br: int, n_sub: int, n_tr: int):
    """Stable sort of the edge list by the edge-tile sub-tile key —
    bit-identical to np.argsort(kind="stable") on the same keys (the
    parallel counting sort preserves input order within each key). Returns
    (rows_s, cols_s, data_s, wq_s-or-None, skey_s)."""
    lib = _load()
    indptr, indices, data = _prep(csr)
    nnz = csr.nnz
    rows_s = np.empty(nnz, np.int32)
    cols_s = np.empty(nnz, np.int32)
    data_s = np.empty(nnz, np.float32)
    skey_s = np.empty(nnz, np.int32)
    wq_c = np.ascontiguousarray(wq, np.int32) if wq is not None else None
    wq_s = np.empty(nnz, np.int32) if wq is not None else None
    rc = lib.mggcn_edge_sort(
        csr.nrows, nnz, indptr, indices, data, _cptr(wq_c), br, n_sub, n_tr,
        rows_s, cols_s, data_s,
        wq_s if wq_s is not None else skey_s,  # dummy target when unused
        skey_s,
    )
    if rc != 0:
        raise ValueError("edge key out of range (shapes vs br/n_sub mismatch)")
    return rows_s, cols_s, data_s, wq_s, skey_s


def edge_fill(chunk_e0, chunk_e1, chunk_tr, chunk_gsub, rows_s, cols_s,
              data_s, wq_s, K: int, BC: int, br: int, valid_bit: int,
              wq_shift: int, wq_bias: int):
    """Fused slot fill of the edge-tile idx (+w) arrays (one pass, no numpy
    temporaries). Returns (idx[S*CPS, K], w-or-zero-size)."""
    lib = _load()
    total = int(chunk_e0.shape[0])
    idx = np.zeros((total, K), np.int32)
    int8_mode = wq_s is not None
    w = np.zeros((total, K) if not int8_mode else (0,), np.float32)
    lib.mggcn_edge_fill(
        total, K, BC, br,
        np.ascontiguousarray(chunk_e0, np.int64),
        np.ascontiguousarray(chunk_e1, np.int64),
        np.ascontiguousarray(chunk_tr, np.int64),
        np.ascontiguousarray(chunk_gsub, np.int64),
        rows_s, cols_s, data_s, _cptr(wq_s),
        valid_bit, wq_shift, wq_bias,
        idx.reshape(-1), _cptr(w if not int8_mode else None),
    )
    return idx, w


def gather_sort_pair(csr, n_win: int, n_st: int, pair: bool, r_bits: int = 14):
    """Stable two-pass sort of the edge list into serial-gather group order
    (group key, then pairs-before-singles within each group) — bit-identical
    to the numpy double argsort. Returns (rows_s, cols_s, data_s, groups,
    gcounts, g_pair_edges)."""
    lib = _load()
    indptr, indices, data = _prep(csr)
    nnz = csr.nnz
    rows_s = np.empty(nnz, np.int32)
    cols_s = np.empty(nnz, np.int32)
    data_s = np.empty(nnz, np.float32)
    max_groups = min(n_st * n_win, max(nnz, 1))
    groups = np.empty(max_groups, np.int64)
    gcounts = np.empty(max_groups, np.int64)
    g_pair = np.empty(max_groups, np.int64)
    ng = lib.mggcn_gather_sort(
        csr.nrows, nnz, indptr, indices, data, n_win, n_st,
        1 if pair else 0, r_bits, rows_s, cols_s, data_s, groups, gcounts,
        g_pair,
    )
    if ng < 0:
        raise ValueError("gather key out of range (shapes vs n_win mismatch)")
    return rows_s, cols_s, data_s, groups[:ng], gcounts[:ng], g_pair[:ng]


def gather_fill(s_e0, s_e1, s_st, s_win, s_lp, rows_s, cols_s, data_s,
                e_blk: int, w_bits: int, binary: bool, r_bits: int = 14):
    """Fused slot fill of the serial-gather idx (+w) arrays."""
    lib = _load()
    S = int(s_e0.shape[0])
    idx = np.zeros((S, e_blk), np.int32)
    w = np.zeros((S, e_blk) if not binary else (0,), np.float32)
    lib.mggcn_gather_fill(
        S, e_blk,
        np.ascontiguousarray(s_e0, np.int64),
        np.ascontiguousarray(s_e1, np.int64),
        np.ascontiguousarray(s_st, np.int64),
        np.ascontiguousarray(s_win, np.int64),
        np.ascontiguousarray(s_lp, np.int64),
        rows_s, cols_s, data_s, rows_s.shape[0], w_bits, r_bits,
        idx.reshape(-1), _cptr(w if not binary else None),
    )
    return idx, w
