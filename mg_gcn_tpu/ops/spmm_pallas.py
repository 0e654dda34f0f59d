"""Pallas TPU SpMM kernels over a 2-D tiled sparse format.

**Status: debug/reference engine, interpret-mode only on v5e.** Its ELL
gather (``B_block[lcol[:, k]]``) needs a cross-vreg vector gather Mosaic
does not provide on this generation (PERF.md "Hardware constraints"), so it
never compiles to real v5e hardware. The production engines that superseded
it: dense/block bit-pattern kernels (spmm_pattern*), the edge-tile one-hot
MXU kernel (spmm_edges), and the windowed serial-gather kernel
(spmm_gather). It stays as an independent cross-check implementation in
the golden tests (tests/test_golden.py) and as the design record for a
future TPU generation with a wider dynamic_gather.

Design (TPU-first, not a CUDA translation): the sparse matrix is cut into a
grid of (BR × BC) tiles on the host. For each row-block the kernel keeps a
(BR, d) accumulator in VMEM and iterates over column-blocks; Pallas's grid
pipeline streams the corresponding (BC, d) slice of the dense operand into
VMEM (double-buffered DMA, overlapping with compute — the TPU analogue of the
reference's double-buffered NCCL broadcast + SpMM accumulation loop,
``cuda_utils.hpp:58-92``). Within a tile, edges are stored in ELL layout —
each local row padded to the tile's max degree — so each ELL step performs a
vectorized VMEM gather of BR rows and a fused multiply-accumulate on the VPU.

Two tile-interior strategies:

* ``ell``  — vectorized: ``B_block[lcol[:, k]]`` gathers BR rows at once.
* ``edge`` — scalar fallback: one edge per loop iteration (always compiles).

The ELL slot count varies wildly across tiles on power-law graphs, so tiles
are *bucketed*: the host stores per-tile slot counts and the kernel loops
only ``ceil(count)`` steps using ``@pl.when`` masking over the padded bound.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats import CSRData


from .spmm_pattern import round_up  # noqa: E402


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["lcol", "val", "nsteps"],
    meta_fields=["n_rows", "n_cols", "nnz", "br", "bc", "interpret"],
)
@dataclass(frozen=True)
class TiledMat:
    """Tiled-ELL sparse matrix for the Pallas SpMM kernel.

    ``lcol``/``val`` have shape (n_rb, n_cb, K, BR): slot-major so that one
    ELL step reads a contiguous (BR,) vector of column indices / values.
    Padded slots have val == 0 and lcol == 0. ``nsteps[rb, cb]`` is the
    number of ELL slots actually used by that tile (<= K).
    """

    lcol: jax.Array  # i32[n_rb, n_cb, K, BR]
    val: jax.Array  # f32[n_rb, n_cb, K, BR]
    nsteps: jax.Array  # i32[n_rb, n_cb]
    n_rows: int
    n_cols: int
    nnz: int
    br: int
    bc: int
    interpret: bool = False

    @property
    def n_rb(self) -> int:
        return self.lcol.shape[0]

    @property
    def n_cb(self) -> int:
        return self.lcol.shape[1]

    @property
    def ell_k(self) -> int:
        return self.lcol.shape[2]

    @staticmethod
    def from_csr(
        csr: CSRData,
        br: int = 512,
        bc: int = 512,
        interpret: bool = False,
    ) -> "TiledMat":
        n, m = csr.shape
        if br != bc:
            raise ValueError(
                "TiledMat requires square tiles (br == bc): Mosaic's vector "
                "gather constrains the gather table and output to one shape"
            )
        n_rb = -(-n // br)
        n_cb = -(-m // bc)
        counts = np.diff(csr.indptr).astype(np.int64)
        rows = np.repeat(np.arange(n, dtype=np.int64), counts)
        cols = csr.indices.astype(np.int64)
        vals = csr.data.astype(np.float32)
        rb = rows // br
        cb = cols // bc
        lrow = (rows % br).astype(np.int32)
        lcol_flat = (cols % bc).astype(np.int32)

        # Per-(tile, local row) degree -> ELL slot index for each edge.
        tile_id = (rb * n_cb + cb).astype(np.int64)
        order = np.lexsort((lrow, tile_id))
        tile_s, lrow_s, lcol_s, val_s = (
            tile_id[order],
            lrow[order],
            lcol_flat[order],
            vals[order],
        )
        # slot index = position within the (tile, lrow) run
        key = tile_s * br + lrow_s
        first = np.concatenate([[True], key[1:] != key[:-1]])
        run_start = np.flatnonzero(first)
        run_len = np.diff(np.append(run_start, key.shape[0]))
        slot = np.arange(key.shape[0], dtype=np.int64) - np.repeat(run_start, run_len)

        k_per_tile = np.zeros(n_rb * n_cb, dtype=np.int64)
        np.maximum.at(k_per_tile, tile_s, slot + 1)
        K = max(int(k_per_tile.max(initial=0)), 1)

        # storage is (tiles, K, br) with the GLOBAL max slot count K — a
        # single hub row inflates every tile. This debug/cross-check kernel
        # refuses rather than silently allocating tens of GB; the production
        # paths (pattern/block/COO) handle such graphs.
        bytes_needed = 2 * n_rb * n_cb * K * br * 4
        if bytes_needed > 4e9:
            raise ValueError(
                f"TiledMat ELL storage would need {bytes_needed/1e9:.1f} GB "
                f"(K={K} slots x {n_rb * n_cb} tiles); this debug kernel "
                "only supports small/regular graphs — use impl='pattern', "
                "'block' or 'xla'"
            )

        lcol_arr = np.zeros((n_rb * n_cb, K, br), dtype=np.int32)
        val_arr = np.zeros((n_rb * n_cb, K, br), dtype=np.float32)
        lcol_arr[tile_s, slot, lrow_s] = lcol_s
        val_arr[tile_s, slot, lrow_s] = val_s
        return TiledMat(
            lcol=jnp.asarray(lcol_arr.reshape(n_rb, n_cb, K, br)),
            val=jnp.asarray(val_arr.reshape(n_rb, n_cb, K, br)),
            nsteps=jnp.asarray(k_per_tile.reshape(n_rb, n_cb).astype(np.int32)),
            n_rows=n,
            n_cols=m,
            nnz=int(vals.shape[0]),
            br=br,
            bc=bc,
            interpret=interpret,
        )


def _spmm_kernel(nsteps_ref, lcol_ref, val_ref, b_ref, out_ref, acc_ref):
    """One grid step = one (row-block, col-block) tile.

    Grid is (n_rb, n_cb) with the column dimension innermost; the accumulator
    lives in VMEM scratch and is flushed to the output on the last column
    block of each row.
    """
    cb = pl.program_id(1)
    n_cb = pl.num_programs(1)

    @pl.when(cb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    k_used = nsteps_ref[pl.program_id(0), cb]
    kmax = lcol_ref.shape[2]
    b = b_ref[:]

    def step(k, acc):
        idx = lcol_ref[0, 0, k, :]  # i32[BR]
        v = val_ref[0, 0, k, :]  # f32[BR]
        # Mosaic's vector gather (tpu.dynamic_gather) requires operand,
        # indices and output to share one shape, so tiles are square
        # (BR == BC) and the per-step row-gather is expressed as
        # take_along_axis with broadcast indices.
        idx2d = jnp.broadcast_to(idx[:, None], b.shape)
        gathered = jnp.take_along_axis(b, idx2d, axis=0)  # (BR, d)
        return acc + gathered * v[:, None].astype(gathered.dtype)

    acc = jax.lax.fori_loop(
        0, jnp.minimum(k_used, kmax), step, acc_ref[:], unroll=False
    )
    acc_ref[:] = acc

    @pl.when(cb == n_cb - 1)
    def _():
        out_ref[:] = acc_ref[:]


def spmm_tiled(mat: TiledMat, B: jax.Array) -> jax.Array:
    """``C = mat @ B`` with the tiled-ELL Pallas kernel.

    B must have static shape (n_cols_padded, d) with n_cols_padded >=
    n_cb * bc is not required — the column BlockSpec pads the final block.
    Output is (n_rows, d) (trimmed from the padded row blocks).
    """
    n_rb, n_cb, K, br = mat.lcol.shape
    d = B.shape[1]
    out_shape = jax.ShapeDtypeStruct((n_rb * br, d), B.dtype)

    grid = (n_rb, n_cb)
    out = pl.pallas_call(
        _spmm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # nsteps, whole array
            pl.BlockSpec(
                (1, 1, K, br), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, K, br), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((mat.bc, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((br, d), B.dtype)],
        interpret=mat.interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * mat.nnz * d,
            bytes_accessed=(
                mat.lcol.size * 8 + B.size * B.dtype.itemsize * n_rb + out_shape.size * 4
            ),
            transcendentals=0,
        ),
    )(
        mat.nsteps,
        mat.lcol.reshape(n_rb, n_cb, K, br),
        mat.val.reshape(n_rb, n_cb, K, br),
        _pad_rows(B, n_cb * mat.bc),
    )
    return out[: mat.n_rows]


def _pad_rows(B: jax.Array, n: int) -> jax.Array:
    if B.shape[0] == n:
        return B
    if B.shape[0] > n:
        raise ValueError(f"B has {B.shape[0]} rows, tiled matrix expects <= {n}")
    return jnp.pad(B, ((0, n - B.shape[0]), (0, 0)))
