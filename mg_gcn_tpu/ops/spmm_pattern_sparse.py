"""Block-sparse bit-packed pattern SpMM — skips empty tile groups.

Extension of :mod:`.spmm_pattern` for graphs with locality (community
structure, RCM/cluster orderings): the pattern is cut into (512 × 4096)
tile regions and only the *nonempty* tiles are stored — as a compact
``(T, 512, 128)`` int32 array — and scheduled. Compute and HBM traffic then
scale with the number of occupied tiles instead of n², and so does pattern
memory (lifting the n ≲ 300k single-chip ceiling for clustered graphs).

The same compact tile array serves both directions; only the *schedule*
differs:

* forward (C = Pᵀ B): tiles sorted by column-group (the output), the kernel
  accumulates into one (d, 4096) output block per group;
* backward (C = P B): the same tiles sorted by row-block.

Schedules are scalar-prefetched (``pltpu.PrefetchScalarGridSpec``) and
**plane-compacted**: a tile with ``lp`` nonempty (TILE_R × 128)-column
bit-planes expands into ``ceil(lp / K_PLANES)`` grid steps, each carrying
exactly K_PLANES plane ids (padding slots point at an *empty* plane of the
same tile, whose contribution is exactly zero). The kernel body is fully
unconditional — K_PLANES dynamic-plane unpack+matmul per step (Mosaic v5e
supports vector shift by a traced scalar, dynamic lane-offset stores and
dynamic sublane reads — all probed) — so *compute* scales with the number of
live planes at 512×128 granularity while *storage* stays at tile
granularity, and no per-plane branch cost is paid (a previous predicated
variant spent ~250 cycles of `pl.when` overhead per live plane). Per grid
step t the prefetched arrays give the tile id, outer block id (output),
inner block id (dense operand), a first-visit flag, and the K_PLANES plane
ids. Uniform random graphs have ~100% occupancy and match the dense-pattern
kernel; banded/clustered graphs skip in proportion to live planes.
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
from .spmm_pattern import (
    D_MAX,
    GROUP,
    _acc_dtype,
    _unpack_plane,
    is_binary,
    round_up,
)

TILE_R = 512  # tile rows (= J_FWD = O_BWD of the dense-pattern kernel)
K_PLANES = 8  # plane slots per grid step (compacted schedule)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "tiles",
        "fwd_tile",
        "fwd_outer",
        "fwd_inner",
        "fwd_first",
        "fwd_planes",
        "bwd_tile",
        "bwd_outer",
        "bwd_inner",
        "bwd_first",
        "bwd_planes",
        "scale",
    ],
    meta_fields=[
        "n",
        "n_pad",
        "nnz",
        "orientation",
        "scale_side",
        "dtype_name",
        "tile_r",
        "plane_occ",
    ],
)
@dataclass(frozen=True)
class BlockPatternMat:
    """One direction over compact block-sparse pattern tiles.

    ``tiles[t]`` is the (TILE_R, 128)-word bit block of tile region t; the
    fwd_*/bwd_* arrays are the two schedules (only the one matching
    ``orientation`` is used by the kernel, but both ride along so a single
    pytree can be flipped between directions with dataclasses.replace).
    """

    tiles: jax.Array  # i32[T, TILE_R, 128]
    fwd_tile: jax.Array  # i32[Sf]
    fwd_outer: jax.Array  # i32[Sf]  (column-group id -> output block)
    fwd_inner: jax.Array  # i32[Sf]  (row-chunk id -> dense-operand block)
    fwd_first: jax.Array  # i32[Sf]
    fwd_planes: jax.Array  # i32[Sf * K_PLANES] plane ids (empties pad)
    bwd_tile: jax.Array
    bwd_outer: jax.Array  # (row-block id -> output block)
    bwd_inner: jax.Array  # (column-group id -> dense-operand block)
    bwd_first: jax.Array
    bwd_planes: jax.Array
    scale: jax.Array
    n: int
    n_pad: int
    nnz: int
    orientation: str  # "PT" | "P"
    scale_side: str
    dtype_name: str = "bfloat16"
    tile_r: int = TILE_R
    plane_occ: float = 1.0  # fraction of (tile_r x 128) plane regions live

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype_name)

    @property
    def num_tiles(self) -> int:
        return self.tiles.shape[0]

    @property
    def occupancy(self) -> float:
        total = (self.n_pad // self.tile_r) * (self.n_pad // GROUP)
        return self.num_tiles / total


def estimate_occupancy(csr: CSRData) -> tuple[float, float]:
    """(tile_occ, plane_occ): fraction of (TILE_R × GROUP) tile regions and
    of (TILE_R × 128) plane regions containing any edge — one cheap pass over
    the edge list. tile_occ governs block-sparse *memory* and streaming;
    plane_occ governs *compute* (the kernel skips whole empty tiles and,
    within occupied tiles, empty 128-column bit-planes)."""
    n_pad = round_up(csr.nrows, GROUP)
    n_g = n_pad // GROUP
    n_rb = n_pad // TILE_R
    occ = np.zeros((n_rb, n_g), bool)
    pocc = np.zeros((n_rb, n_pad // 128), bool)
    indptr, cols, n = csr.indptr, csr.indices, csr.nrows
    for rb in range(n_rb):
        e0 = int(indptr[min(rb * TILE_R, n)])
        e1 = int(indptr[min((rb + 1) * TILE_R, n)])
        if e1 > e0:
            occ[rb, cols[e0:e1] >> 12] = True  # GROUP = 4096 = 1 << 12
            pocc[rb, cols[e0:e1] >> 7] = True  # plane = 128 columns
    return occ.sum() / occ.size, pocc.sum() / pocc.size


def _build_tiles_on_device(
    pos: np.ndarray, bitpos: np.ndarray, T: int, tile_r: int = TILE_R
) -> jax.Array:
    """Compact tile array built by on-device scatter (see
    spmm_pattern.pack_bits_on_device for the exact-f32-halves trick).
    Edges may be chunked arbitrarily: the per-position bit sums are additive
    across chunks because every (pos, bit) pair is unique."""
    seg_count = T * tile_r * 128
    chunk = 1 << 25  # 32M edges per scatter

    @jax.jit
    def add_chunk(lo, hi, p, b):
        b = b.astype(jnp.int32)
        clamped = jnp.clip(b, 0, 15)
        clamped_hi = jnp.clip(b - 16, 0, 15)
        val_lo = jnp.where(b < 16, jnp.int32(1) << clamped, 0).astype(jnp.float32)
        val_hi = jnp.where((b >= 16) & (b < 32), jnp.int32(1) << clamped_hi, 0).astype(
            jnp.float32
        )
        lo = lo + jax.ops.segment_sum(val_lo, p, num_segments=seg_count)
        hi = hi + jax.ops.segment_sum(val_hi, p, num_segments=seg_count)
        return lo, hi

    lo = jnp.zeros(seg_count, jnp.float32)
    hi = jnp.zeros(seg_count, jnp.float32)
    nnz = pos.shape[0]
    for e0 in range(0, max(nnz, 1), chunk):
        p = pos[e0 : e0 + chunk]
        b = bitpos[e0 : e0 + chunk]
        if p.size == 0:
            break
        pad = (-p.size) % chunk if nnz > chunk else 0
        if pad and p.size < chunk:
            p = np.concatenate([p, np.full(pad, seg_count - 1, np.int32)])
            b = np.concatenate([b, np.full(pad, 33, b.dtype)])
        lo, hi = add_chunk(lo, hi, jnp.asarray(p), jnp.asarray(b))
    packed = (hi.astype(jnp.int32) << 16) | lo.astype(jnp.int32)
    return packed.reshape(T, tile_r, 128)


def block_pattern_pair_from_binary_csr(
    csr: CSRData,
    dtype: str = "bfloat16",
    build_on_device: bool = True,
    tile_r: int = TILE_R,
) -> tuple[BlockPatternMat, BlockPatternMat]:
    """Build the (Âᵀ·, Â·) block-sparse pair. See spmm_pattern for the
    normalization semantics (gcn.hpp:946-954)."""
    if not is_binary(csr):
        raise ValueError("pattern SpMM needs a binary adjacency (data == 1)")
    n = csr.nrows
    n_pad = round_up(n, GROUP)
    if GROUP % tile_r:
        raise ValueError(f"tile_r {tile_r} must divide GROUP={GROUP}")
    n_rb = n_pad // tile_r
    n_g = n_pad // GROUP

    # Two chunked passes over the edges (per row-block), all int32: the
    # previous whole-graph int64 temporaries + np.unique sort dominated the
    # Reddit-scale build on slow-memory hosts.
    indptr = csr.indptr
    cols32 = csr.indices
    occ = np.zeros((n_rb, n_g), bool)
    for rbi in range(n_rb):
        e0 = int(indptr[min(rbi * tile_r, n)])
        e1 = int(indptr[min((rbi + 1) * tile_r, n)])
        if e1 > e0:
            occ[rbi, cols32[e0:e1] >> 12] = True  # GROUP = 4096
    occupied = np.flatnonzero(occ.reshape(-1)).astype(np.int64)  # sorted
    T = occupied.shape[0]
    if T * tile_r * 128 >= 2**31:
        raise ValueError(
            f"{T} occupied tiles exceed int32 addressing; use the dense "
            "pattern or COO path"
        )
    tile_index = np.full(n_rb * n_g, -1, np.int32)
    tile_index[occupied] = np.arange(T, dtype=np.int32)

    # pack bits tile-locally: tile t, local row r (<TILE_R), local col c
    # (<GROUP) -> word [t, r, c % 128], bit c // 128 (the strided layout of
    # spmm_pattern restricted to one group); plane counts ride along for the
    # per-tile masks
    nnz = csr.nnz
    pos = np.empty(nnz, np.int32)
    bitpos = np.empty(nnz, np.int8)
    plane_counts = np.zeros((T + 1) * 32, np.int64)
    for rbi in range(n_rb):
        r0 = min(rbi * tile_r, n)
        r1 = min((rbi + 1) * tile_r, n)
        e0, e1 = int(indptr[r0]), int(indptr[r1])
        if e1 == e0:
            continue
        c = cols32[e0:e1]
        cnt = np.diff(indptr[r0 : r1 + 1])
        lrow = np.repeat(np.arange(r1 - r0, dtype=np.int32), cnt)
        t_edge = tile_index[rbi * n_g + (c >> 12)]
        lcol = c & (GROUP - 1)
        bp = (lcol >> 7).astype(np.int8)
        pos[e0:e1] = (
            t_edge.astype(np.int64) * tile_r + lrow
        ) * 128 + (lcol & 127)
        bitpos[e0:e1] = bp
        plane_counts += np.bincount(
            t_edge.astype(np.int64) * 32 + bp, minlength=(T + 1) * 32
        )
    if build_on_device:
        tiles_dev = _build_tiles_on_device(pos, bitpos, T, tile_r)
        tiles = None
    else:
        flat = np.zeros(T * tile_r * 128, dtype=np.uint32)
        order = np.argsort(bitpos, kind="stable")
        pos_s = pos[order]
        bounds = np.searchsorted(bitpos[order], np.arange(33))
        for b in range(32):
            seg = pos_s[bounds[b] : bounds[b + 1]]
            if seg.size:
                flat[seg] |= np.uint32(1 << b)
        tiles = flat.view(np.int32).reshape(T, tile_r, 128)

    occ_rb = occupied // n_g
    occ_g = occupied % n_g

    # Every output block must be visited at least once or its accumulator is
    # never initialized: append one all-zero tile (index T) and a step for
    # each empty outer block.
    if tiles is None:
        tiles_all = jnp.concatenate(
            [tiles_dev, jnp.zeros((1, tile_r, 128), jnp.int32)]
        )
    else:
        tiles_all = jnp.asarray(
            np.concatenate([tiles, np.zeros((1, tile_r, 128), np.int32)])
        )

    # per-tile plane masks: bit b set iff plane b (tile columns
    # [b·128, (b+1)·128)) contains an edge; padding tile T stays 0
    plane_bits = (plane_counts.reshape(T + 1, 32) > 0).astype(np.uint32)
    tile_pmask = (plane_bits << np.arange(32, dtype=np.uint32)).sum(
        axis=1, dtype=np.uint32
    )

    # plane-compacted slot table: plane_slots[t] lists the tile's live plane
    # ids first (ascending), then repeats one of its *empty* planes as
    # padding (the all-zero plane contributes exactly 0 to the matmul)
    bits = ((tile_pmask[:, None] >> np.arange(32)) & 1).astype(bool)  # (T+1, 32)
    lp = bits.sum(axis=1).astype(np.int64)
    plane_order = np.argsort(~bits, axis=1, kind="stable")  # live first
    fill = plane_order[np.arange(T + 1), np.minimum(lp, 31)]  # first empty
    fill = np.where(lp < 32, fill, 0)  # fully-live tiles never pad
    plane_slots = np.where(
        np.arange(32)[None, :] < lp[:, None], plane_order, fill[:, None]
    ).astype(np.int32)
    steps_of = np.maximum(-(-lp // K_PLANES), 1).astype(np.int64)
    plane_occ = float(lp[:T].sum()) / max(T * 32, 1)

    def schedule(outer_ids, inner_ids, n_outer):
        missing = np.setdiff1d(np.arange(n_outer), np.unique(outer_ids))
        tile_ids = np.concatenate([np.arange(T), np.full(missing.size, T)])
        outer_all = np.concatenate([outer_ids, missing])
        inner_all = np.concatenate([inner_ids, np.zeros(missing.size, np.int64)])
        order = np.lexsort((inner_all, outer_all))
        tile = tile_ids[order]
        outer = outer_all[order]
        inner = inner_all[order]
        # expand each tile entry into ceil(lp/K_PLANES) grid steps
        reps = steps_of[tile]
        s_tile = np.repeat(tile, reps).astype(np.int32)
        s_outer = np.repeat(outer, reps).astype(np.int32)
        s_inner = np.repeat(inner, reps).astype(np.int32)
        total = int(reps.sum())
        starts = np.repeat(np.cumsum(reps) - reps, reps)
        sub = np.arange(total) - starts  # step index within its tile
        planes = plane_slots[
            s_tile[:, None], sub[:, None] * K_PLANES + np.arange(K_PLANES)[None, :]
        ].reshape(-1)
        first = np.concatenate(
            [[1], (s_outer[1:] != s_outer[:-1]).astype(np.int32)]
        )
        return s_tile, s_outer, s_inner, first.astype(np.int32), planes

    # forward: outer = column-group (output), inner = row-block (operand)
    f_tile, f_outer, f_inner, f_first, f_planes = schedule(occ_g, occ_rb, n_g)
    # backward: outer = row-block (output), inner = column-group (operand)
    b_tile, b_outer, b_inner, b_first, b_planes = schedule(occ_rb, occ_g, n_rb)

    indeg = np.bincount(csr.indices, minlength=n_pad).astype(np.float64)
    with np.errstate(divide="ignore"):
        s = np.where(indeg > 0, 1.0 / indeg, 0.0).astype(np.float32)

    common = dict(
        tiles=tiles_all,
        fwd_tile=jnp.asarray(f_tile),
        fwd_outer=jnp.asarray(f_outer),
        fwd_inner=jnp.asarray(f_inner),
        fwd_first=jnp.asarray(f_first),
        fwd_planes=jnp.asarray(f_planes),
        bwd_tile=jnp.asarray(b_tile),
        bwd_outer=jnp.asarray(b_outer),
        bwd_inner=jnp.asarray(b_inner),
        bwd_first=jnp.asarray(b_first),
        bwd_planes=jnp.asarray(b_planes),
        scale=jnp.asarray(s),
        n=n,
        n_pad=n_pad,
        nnz=csr.nnz,
        dtype_name=dtype,
        tile_r=tile_r,
        plane_occ=plane_occ,
    )
    fwd = BlockPatternMat(orientation="PT", scale_side="post", **common)
    bwd = BlockPatternMat(orientation="P", scale_side="pre", **common)
    return fwd, bwd


def _fwd_kernel_sparse(
    tile_ref, outer_ref, inner_ref, first_ref, planes_ref, b_ref, pack_ref, out_ref,
    plane_ref, plane2_ref, *, cdtype,
):
    t = pl.program_id(0)

    @pl.when(first_ref[t] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    bf = b_ref[:] if b_ref.dtype == cdtype else b_ref[:].astype(cdtype)
    # two-stage software pipeline: unpack slot k+1 on the VPU while the MXU
    # multiplies slot k (dynamic plane ids: traced-scalar shift + dynamic
    # lane-offset store; padding slots repeat an empty plane, += 0)
    bs = [planes_ref[t * K_PLANES + k] for k in range(K_PLANES)]
    bufs = (plane_ref, plane2_ref)
    bufs[0][:] = _unpack_plane(pack_ref[0], bs[0], cdtype)
    for k in range(K_PLANES):
        if k + 1 < K_PLANES:
            bufs[(k + 1) % 2][:] = _unpack_plane(pack_ref[0], bs[k + 1], cdtype)
        v = jnp.dot(
            bf, bufs[k % 2][:], preferred_element_type=_acc_dtype(cdtype)
        )
        out_ref[:, pl.ds(bs[k] * 128, 128)] += v


def _bwd_kernel_sparse(
    tile_ref, outer_ref, inner_ref, first_ref, planes_ref, b_ref, pack_ref, out_ref,
    plane_ref, plane2_ref, *, cdtype,
):
    t = pl.program_id(0)

    @pl.when(first_ref[t] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # two-stage software pipeline (see forward kernel); dynamic sublane read
    bs = [planes_ref[t * K_PLANES + k] for k in range(K_PLANES)]
    bufs = (plane_ref, plane2_ref)
    bufs[0][:] = _unpack_plane(pack_ref[0], bs[0], cdtype)
    for k in range(K_PLANES):
        if k + 1 < K_PLANES:
            bufs[(k + 1) % 2][:] = _unpack_plane(pack_ref[0], bs[k + 1], cdtype)
        blk = b_ref[pl.ds(bs[k] * 128, 128), :]
        if blk.dtype != cdtype:
            blk = blk.astype(cdtype)
        out_ref[:] += jnp.dot(
            bufs[k % 2][:], blk, preferred_element_type=_acc_dtype(cdtype)
        )


def _call_fwd(mat: BlockPatternMat, bf: jax.Array) -> jax.Array:
    if bf.shape[0] > D_MAX:  # scoped-VMEM bound, see spmm_pattern.D_MAX
        return jnp.concatenate(
            [_call_fwd(mat, bf[i : i + D_MAX]) for i in range(0, bf.shape[0], D_MAX)],
            axis=0,
        )
    d_pad, n_pad = bf.shape
    steps = mat.fwd_tile.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(
                (d_pad, mat.tile_r),
                lambda t, tile, outer, inner, first, planes: (0, inner[t]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, mat.tile_r, 128),
                lambda t, tile, outer, inner, first, planes: (tile[t], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (d_pad, GROUP),
            lambda t, tile, outer, inner, first, planes: (0, outer[t]),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((mat.tile_r, 128), mat.compute_dtype),
            pltpu.VMEM((mat.tile_r, 128), mat.compute_dtype),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel_sparse, cdtype=mat.compute_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d_pad, n_pad), _acc_dtype(mat.compute_dtype)),
        cost_estimate=pl.CostEstimate(
            flops=2 * mat.num_tiles * mat.tile_r * GROUP * d_pad,
            bytes_accessed=mat.tiles.size * 4 + bf.size * 4 * 2,
            transcendentals=0,
        ),
    )(
        mat.fwd_tile, mat.fwd_outer, mat.fwd_inner, mat.fwd_first, mat.fwd_planes,
        bf, mat.tiles,
    )


def _call_bwd(mat: BlockPatternMat, bm: jax.Array) -> jax.Array:
    if bm.shape[1] > D_MAX:
        return jnp.concatenate(
            [_call_bwd(mat, bm[:, i : i + D_MAX]) for i in range(0, bm.shape[1], D_MAX)],
            axis=1,
        )
    n_pad, d_pad = bm.shape
    steps = mat.bwd_tile.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(
                (GROUP, d_pad),
                lambda t, tile, outer, inner, first, planes: (inner[t], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, mat.tile_r, 128),
                lambda t, tile, outer, inner, first, planes: (tile[t], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (mat.tile_r, d_pad),
            lambda t, tile, outer, inner, first, planes: (outer[t], 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((mat.tile_r, 128), mat.compute_dtype),
            pltpu.VMEM((mat.tile_r, 128), mat.compute_dtype),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel_sparse, cdtype=mat.compute_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d_pad), _acc_dtype(mat.compute_dtype)),
        cost_estimate=pl.CostEstimate(
            flops=2 * mat.num_tiles * mat.tile_r * GROUP * d_pad,
            bytes_accessed=mat.tiles.size * 4 + bm.size * 4 * 2,
            transcendentals=0,
        ),
    )(
        mat.bwd_tile, mat.bwd_outer, mat.bwd_inner, mat.bwd_first, mat.bwd_planes,
        bm, mat.tiles,
    )


def spmm_block_pattern(mat: BlockPatternMat, b: jax.Array) -> jax.Array:
    """``C = M @ B`` for row-major B (n, d); returns (n, d) float32.
    Layout/scale/int8 handling is the shared dense-pattern wrapper."""
    from .spmm_pattern import apply_pattern_calls

    return apply_pattern_calls(mat, b, _call_fwd, _call_bwd)
