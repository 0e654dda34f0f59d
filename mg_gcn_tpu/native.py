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
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    c = ctypes.c_int64
    lib.mggcn_expand_rows.argtypes = [c, _i64p, _i32p]
    lib.mggcn_normalize.argtypes = [c, c, _i64p, _i32p, _f32p, _f32p, ctypes.c_int, _f64p]
    lib.mggcn_transpose.argtypes = [c, c, c, _i64p, _i32p, _f32p, _i64p, _i32p, _f32p]
    lib.mggcn_comm_volume.argtypes = [c, c, _i64p, _i64p, _i32p, _u8p, c, _i64p]
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
