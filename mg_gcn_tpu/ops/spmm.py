"""Sparse × dense matmul (SpMM) — the hot op of full-batch GCN training.

This is the TPU-native replacement for the reference's cuSPARSE SpMM path
(``cuda_utils.hpp:27-102``). Sparse adjacency matrices are converted once, on
the host, into **static-shape padded edge lists** (TPU/XLA requires static
shapes), and SpMM is provided with several interchangeable implementations:

* ``xla`` — gather + segment-sum, compiled by XLA. Works everywhere and is
  the correctness baseline.
* ``pallas`` — hand-written Pallas kernel (see :mod:`.spmm_pallas`) using a
  row-block × column-block tiling that keeps the dense operand block resident
  in VMEM while streaming edges.

``aggregate`` wraps a forward/backward matrix pair with a ``custom_vjp`` so
that reverse-mode autodiff uses the pre-transposed matrix (the reference
keeps A and Aᵀ side by side for exactly this reason, ``gcn.hpp:13-48``)
instead of differentiating through a scatter.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import CSRData

DEFAULT_IMPL = "xla"


from .spmm_pattern import round_up  # noqa: E402


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["rows", "cols", "vals"],
    meta_fields=["n_rows", "n_cols", "nnz"],
)
@dataclass(frozen=True)
class COOMat:
    """A sparse matrix as a row-sorted, padded COO edge list.

    Padding edges carry ``val == 0`` and point at ``(n_rows - 1, 0)``, so any
    accumulate-style consumer is unaffected by them. ``rows`` is sorted
    ascending (padding at the end), which lets XLA use the sorted-segment
    fast path for ``segment_sum``.
    """

    rows: jax.Array  # i32[nnz_pad]
    cols: jax.Array  # i32[nnz_pad]
    vals: jax.Array  # f32[nnz_pad]
    n_rows: int
    n_cols: int
    nnz: int  # true edge count (before padding)

    @property
    def nnz_pad(self) -> int:
        return self.rows.shape[0]

    @staticmethod
    def from_csr(
        csr: CSRData, pad_to: int = 512, device=None, val_dtype=np.float32
    ) -> "COOMat":
        """``val_dtype=np.float64`` is the f64 numerics mode (parity with the
        reference's double kernel templates, cuda_utils.cu:392-451; needs
        jax_enable_x64 or the upload silently truncates to f32)."""
        counts = np.diff(csr.indptr).astype(np.int64)
        rows = np.repeat(np.arange(csr.nrows, dtype=np.int32), counts)
        nnz = int(rows.shape[0])
        nnz_pad = max(round_up(nnz, pad_to), pad_to)
        pad = nnz_pad - nnz
        rows_p = np.concatenate([rows, np.full(pad, csr.nrows - 1, np.int32)])
        cols_p = np.concatenate([csr.indices.astype(np.int32), np.zeros(pad, np.int32)])
        vals_p = np.concatenate(
            [csr.data.astype(val_dtype), np.zeros(pad, val_dtype)]
        )
        put = lambda x: jax.device_put(x, device) if device is not None else jnp.asarray(x)
        return COOMat(
            rows=put(rows_p),
            cols=put(cols_p),
            vals=put(vals_p),
            n_rows=csr.nrows,
            n_cols=csr.ncols,
            nnz=nnz,
        )


# cap on the materialized (edges, d) gather: XLA allocates it whole, so big
# graphs must stream edge chunks through a scan (v5e HBM is 16 GB; on a
# virtual CPU mesh every device shares host RAM — lower the cap via env)
import os as _os

GATHER_BYTES_CAP = int(_os.environ.get("MG_GCN_GATHER_CAP", 2 << 30))


def _spmm_coo_xla(mat: COOMat, B: jax.Array) -> jax.Array:
    """C[i, :] = sum over edges (i, j, v) of v * B[j, :] via gather+segment-sum.

    When the gathered (nnz, d) intermediate would exceed GATHER_BYTES_CAP
    (XLA materializes it), edges stream through a lax.scan in fixed chunks —
    O(chunk * d) peak memory instead of O(nnz * d)."""
    d = B.shape[1]
    gather_bytes = mat.nnz_pad * d * B.dtype.itemsize
    if gather_bytes <= GATHER_BYTES_CAP:
        gathered = B[mat.cols] * mat.vals[:, None].astype(B.dtype)
        return jax.ops.segment_sum(
            gathered,
            mat.rows,
            num_segments=mat.n_rows,
            indices_are_sorted=True,
            unique_indices=False,
        )
    n_chunks = -(-gather_bytes // GATHER_BYTES_CAP)
    chunk = -(-mat.nnz_pad // n_chunks)
    pad = n_chunks * chunk - mat.nnz_pad
    rows = jnp.concatenate([mat.rows, jnp.full(pad, mat.n_rows - 1, mat.rows.dtype)])
    cols = jnp.concatenate([mat.cols, jnp.zeros(pad, mat.cols.dtype)])
    vals = jnp.concatenate([mat.vals, jnp.zeros(pad, mat.vals.dtype)])

    def body(acc, part):
        r, c, v = part
        g = B[c] * v[:, None].astype(B.dtype)
        # chunk rows span a contiguous range but not segment-aligned; a
        # full-width segment_sum per chunk keeps it simple and exact
        return acc + jax.ops.segment_sum(
            g, r, num_segments=mat.n_rows, indices_are_sorted=True
        ), None

    acc0 = jnp.zeros((mat.n_rows, d), B.dtype)
    acc, _ = jax.lax.scan(
        body,
        acc0,
        (
            rows.reshape(n_chunks, chunk),
            cols.reshape(n_chunks, chunk),
            vals.reshape(n_chunks, chunk),
        ),
    )
    return acc


def spmm(mat, B: jax.Array, impl: str | None = None) -> jax.Array:
    """``C = mat @ B`` for a device-resident sparse matrix.

    ``mat`` may be a :class:`COOMat` or a :class:`TiledMat`
    (from :mod:`.spmm_pallas`).
    """
    impl = impl or DEFAULT_IMPL
    from . import spmm_edges, spmm_gather, spmm_pallas, spmm_pattern, spmm_pattern_sparse

    if isinstance(mat, spmm_edges.EdgeTileMat):
        return spmm_edges.spmm_edge_tiles(mat, B)
    if isinstance(mat, spmm_gather.GatherMat):
        return spmm_gather.spmm_gather(mat, B)
    if isinstance(mat, spmm_pattern.PatternMat):
        return spmm_pattern.spmm_pattern(mat, B)
    if isinstance(mat, spmm_pattern_sparse.BlockPatternMat):
        return spmm_pattern_sparse.spmm_block_pattern(mat, B)
    if isinstance(mat, spmm_pallas.TiledMat):
        return spmm_pallas.spmm_tiled(mat, B)
    if impl == "xla":
        return _spmm_coo_xla(mat, B)
    raise ValueError(f"unknown spmm impl {impl!r} for {type(mat).__name__}")


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["fwd", "bwd"],
    meta_fields=[],
)
@dataclass
class AggPair:
    """A forward/backward sparse-matrix pair.

    For GCN this is (Â, Âᵀ): forward aggregation uses ``fwd``, the VJP uses
    ``bwd`` (mirrors ``sparse_linear``'s (A, A_T) members, gcn.hpp:13-48).
    """

    fwd: Any
    bwd: Any

    @staticmethod
    def from_csr_pair(csr_fwd: CSRData, csr_bwd: CSRData, **kw) -> "AggPair":
        return AggPair(COOMat.from_csr(csr_fwd, **kw), COOMat.from_csr(csr_bwd, **kw))


@jax.custom_vjp
def aggregate(pair: AggPair, B: jax.Array) -> jax.Array:
    """``C = pair.fwd @ B`` whose VJP computes ``G_B = pair.bwd @ G``."""
    return spmm(pair.fwd, B)


def _aggregate_fwd(pair, B):
    return spmm(pair.fwd, B), pair


def _aggregate_bwd(pair, g):
    gb = spmm(pair.bwd, g)
    zero = jax.tree.map(_zero_cotangent, pair)
    return zero, gb


def _zero_cotangent(x):
    if np.issubdtype(x.dtype, np.floating):
        return jnp.zeros_like(x)
    return np.zeros(x.shape, jax.dtypes.float0)


aggregate.defvjp(_aggregate_fwd, _aggregate_bwd)
