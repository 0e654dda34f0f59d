"""Bit-packed dense-pattern SpMM — the MXU-native aggregation kernel.

TPU v5e has no cross-vreg hardware gather (see PERF.md), so classic
gather/scatter SpMM formulations run at ~6-12 cycles *per edge*. This kernel
exploits a structural fact of GCN aggregation instead: the normalized
adjacency factors as ``binary pattern × diagonal scale``:

    Â = normalize_cols(A) = P · diag(s),  s_j = 1 / in_degree(j)

for the unweighted graphs the reference trains on (prep.py writes data=1.0).
Both the forward (Âᵀ·B = diag(s)·(Pᵀ·B)) and backward (Â·G = P·(diag(s)·G))
aggregations therefore need only the *pattern* P, stored bit-packed —
n²/8 bytes (6.8 GB for Reddit-scale n=233k) — plus a length-n scale vector.

**Strided bit layout**: uint32 word ``pack[i, g*128 + w]`` bit ``b`` holds
``P[i, g*4096 + b*128 + w]``. A (R, 128-word) VMEM block then unpacks into 32
*bit-planes* of shape (R, 128) with two VPU ops each (shift, mask) and **zero
cross-lane movement** — each plane is a contiguous 128-column slice of the
pattern tile, fed straight to the MXU:

* forward  (C = Pᵀ B): feature-major ``Cf[:, cols_b] += Bf_blk @ plane_b`` —
  a standard (d, J)·(J, 128) matmul per plane;
* backward (C = P B): row-major ``C_blk += plane_b @ B[rows_b, :]`` —
  a standard (O, 128)·(128, d) matmul per plane.

Dense-matmul speed regardless of where the edges are: no gather, no scatter,
fully static shapes, bf16 (or f32 for exact mode) MXU inputs with f32
accumulation.

Scope: pattern-representable (binary) adjacencies with n small enough that
n²/8 fits in HBM (n ≲ 300k single-chip; the distributed row partition divides
this by the mesh size). Weighted or larger graphs use the COO/XLA path
(ops/spmm.py).
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

GROUP = 4096  # pattern columns per 128-word group (32 bit-planes x 128 lanes)
J_FWD = 512  # forward contraction chunk (pattern rows per grid step)
# Backward output chunk: the dense operand is fully re-streamed once per
# output block (the inner grid dim must be the accumulation dim), so bigger
# blocks cut that HBM traffic linearly — 2048 keeps VMEM ~4 MB while making
# the backward MXU-bound like the forward.
O_BWD = 2048
N_ALIGN = GROUP
# Widest feature block one kernel call may carry: the fwd out block is
# (d, GROUP) f32 and the bwd operand block is (GROUP, d) bf16, both double-
# buffered — beyond 256 they blow the ~16 MB scoped VMEM (seen at d=608 on
# the SAGE config). Wider products are split into D_MAX chunks; the pattern
# is re-streamed per chunk but the MXU time (the bound) is unchanged.
D_MAX = 256


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pack_csr_bits(csr: CSRData, n_pad: int) -> np.ndarray:
    """Pack the CSR pattern into the strided uint32 layout:
    P[i, j] -> bit (j%4096)//128 of word pack[i, (j//4096)*128 + j%128].
    Vectorized via sorted positions + bitwise_or.reduceat."""
    n = csr.nrows
    words = n_pad // 32
    counts = np.diff(csr.indptr).astype(np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), counts)
    cols = csr.indices.astype(np.int64)
    word = (cols // GROUP) * 128 + (cols % 128)
    bitpos = (cols % GROUP) // 128
    pos = rows * words + word
    # For a fixed bit index b every edge has a distinct word position (same
    # pos + same b would mean a duplicate edge), so each of the 32 bit-planes
    # can be written with a plain unique-index fancy OR — no sort over the
    # full position keys, only a radix sort over the 5-bit plane index.
    flat = np.zeros(n_pad * words, dtype=np.uint32)
    order = np.argsort(bitpos, kind="stable")  # radix sort on small ints
    pos_s = pos[order]
    bounds = np.searchsorted(bitpos[order], np.arange(33))
    for b in range(32):
        seg = pos_s[bounds[b] : bounds[b + 1]]
        if seg.size:
            flat[seg] |= np.uint32(1 << b)
    return flat.reshape(n_pad, words)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["pack", "scale"],
    meta_fields=["n", "n_pad", "nnz", "orientation", "scale_side", "dtype_name"],
)
@dataclass(frozen=True)
class PatternMat:
    """One aggregation direction over a shared bit-packed pattern.

    orientation "PT": C = scale ⊙ (Pᵀ B)   (GCN forward, scale_side="post")
    orientation "P":  C = P (scale ⊙ B)     (GCN backward, scale_side="pre")
    """

    pack: jax.Array  # u32[n_pad, n_pad//32], strided layout
    scale: jax.Array  # f32[n_pad]
    n: int
    n_pad: int
    nnz: int
    orientation: str  # "PT" | "P"
    scale_side: str  # "pre" | "post" | "none"
    dtype_name: str = "bfloat16"  # MXU input dtype

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype_name)


def is_binary(csr: CSRData) -> bool:
    return bool(np.all(csr.data == 1.0))


MEM_BUDGET = 9e9  # bytes of HBM a packed pattern may occupy (v5e has 16 GB)


def pattern_feasible(csr: CSRData, budget: float = MEM_BUDGET, parts: int = 1) -> bool:
    """True when the bit-pattern kernels apply: TPU backend, binary
    adjacency, and n_pad²/8 (per part) within the HBM budget. The single
    auto-selection predicate shared by train/sage/pagerank."""
    n_pad = round_up(csr.nrows, N_ALIGN)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    return on_tpu and is_binary(csr) and n_pad * n_pad / 8 / parts <= budget


def row_scale(csr: CSRData, n_pad: int) -> np.ndarray:
    """Padded 1/out-degree vector: row-normalized M factors as diag(r)·P
    (mean aggregation; matrix.hpp:341-349 normalize(false) semantics)."""
    outdeg = np.diff(csr.indptr).astype(np.float64)
    r = np.zeros(n_pad, np.float32)
    with np.errstate(divide="ignore"):
        r[: csr.nrows] = np.where(outdeg > 0, 1.0 / outdeg, 0.0)
    return r


def pack_bits_on_device(csr: CSRData, n_pad: int, row_chunks: int = 8) -> jax.Array:
    """Build the packed pattern on the accelerator.

    The host ships only 3 bytes per edge (column index split uint16 lo +
    uint8 hi) plus the tiny indptr; rows, word positions and bit indices are
    derived on device, and the n²/8-scale bit array is materialized by one
    int32 segment-sum of power-of-two values per chunk (exact: every
    (position, bit) pair is unique, so wraparound int32 addition equals the
    bitwise OR). Chunks are written in place into a donated output buffer.
    This sidesteps both the slow first-touch host memory of the sandbox VM
    and a multi-minute n²/8-byte host->device transfer.
    """
    n = csr.nrows
    words = n_pad // 32
    if csr.shape[1] > 1 << 24:
        raise ValueError("pattern packing supports column indices < 2^24")
    rows_per = n_pad // row_chunks
    if n_pad % row_chunks:
        raise ValueError("row_chunks must divide n_pad")
    seg_count = rows_per * words
    indptr = csr.indptr.astype(np.int64, copy=False)
    chunk_e = [
        (int(indptr[min(c * rows_per, n)]), int(indptr[min((c + 1) * rows_per, n)]))
        for c in range(row_chunks)
    ]
    emax = max(max(e1 - e0 for e0, e1 in chunk_e), 1)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def add_chunk(pack, lo, hi, ptr, ne, c):
        idx = jnp.arange(emax, dtype=jnp.int32)
        valid = idx < ne
        cols = lo.astype(jnp.int32) | (hi.astype(jnp.int32) << 16)
        # row index of each edge: +1 marker at every row-start edge position
        marker = jnp.zeros(emax, jnp.int32).at[ptr[:-1]].add(1, mode="drop")
        rows = jnp.cumsum(marker) - 1
        word = ((cols >> 12) << 7) | (cols & 127)  # GROUP=4096 strided layout
        bit = (cols >> 7) & 31
        pos = jnp.where(valid, rows * words + word, seg_count - 1)
        val = jnp.where(valid, jnp.int32(1) << bit, 0)
        part = jax.ops.segment_sum(val, pos, num_segments=seg_count)
        return jax.lax.dynamic_update_slice(
            pack, part.reshape(rows_per, words), (c * rows_per, 0)
        )

    # enqueue all host->device transfers up front so they overlap the scatters
    staged = []
    for c in range(row_chunks):
        r0 = min(c * rows_per, n)
        e0, e1 = chunk_e[c]
        ne = e1 - e0
        cols = csr.indices[e0:e1].astype(np.int32, copy=False)
        lo = np.zeros(emax, np.uint16)
        hi = np.zeros(emax, np.uint8)
        lo[:ne] = cols.astype(np.uint16)
        hi[:ne] = (cols >> 16).astype(np.uint8)
        r1 = min(r0 + rows_per, n)
        ptr = np.full(rows_per + 1, ne, np.int32)
        ptr[: r1 - r0 + 1] = (indptr[r0 : r1 + 1] - e0).astype(np.int32)
        staged.append(
            (jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(ptr), jnp.int32(ne))
        )
    pack = jnp.zeros((n_pad, words), jnp.int32)
    for c, (lo, hi, ptr, ne) in enumerate(staged):
        pack = add_chunk(pack, lo, hi, ptr, ne, jnp.int32(c))
    return pack


def pattern_pair_from_binary_csr(
    csr: CSRData, dtype: str = "bfloat16", device=None, pack_on_device: bool = True
) -> tuple[PatternMat, PatternMat]:
    """Build the (forward Âᵀ·, backward Â·) pair from a *binary* adjacency.

    Mirrors gcn ctor semantics (gcn.hpp:946-954): Â = column-normalized A;
    forward aggregates with Âᵀ, backward with Â — one shared packed pattern.
    """
    if not is_binary(csr):
        raise ValueError("pattern SpMM needs a binary adjacency (data == 1)")
    n = csr.nrows
    n_pad = round_up(n, N_ALIGN)
    put = lambda x: jax.device_put(x, device) if device is not None else jnp.asarray(x)
    if pack_on_device:
        pack = pack_bits_on_device(csr, n_pad)
    else:
        pack = put(pack_csr_bits(csr, n_pad).view(np.int32))
    indeg = np.bincount(csr.indices, minlength=n_pad).astype(np.float64)
    with np.errstate(divide="ignore"):
        s = np.where(indeg > 0, 1.0 / indeg, 0.0).astype(np.float32)
    scale = put(s)
    fwd = PatternMat(pack, scale, n, n_pad, csr.nnz, "PT", "post", dtype)
    bwd = PatternMat(pack, scale, n, n_pad, csr.nnz, "P", "pre", dtype)
    return fwd, bwd


def _unpack_plane(pack_i32: jax.Array, b: int, cdtype):
    """Bit-plane b of an i32 word block as a 0/1 matrix in the MXU dtype.

    Arithmetic >> then &1 reads the same bit as a logical shift; i32->f32 is
    the cast Mosaic supports (u32->bf16 is not implemented). For int8 mode
    the 0/1 plane is truncated directly to int8.
    """
    plane = (pack_i32 >> b) & jnp.int32(1)
    if cdtype == jnp.int8:
        return plane.astype(jnp.int8)
    return plane.astype(jnp.float32).astype(cdtype)


def _planes(pack_i32: jax.Array, cdtype):
    """Yield (b, plane) for the 32 bit-planes of an i32 block."""
    for b in range(32):
        yield b, _unpack_plane(pack_i32, b, cdtype)


def _acc_dtype(cdtype):
    return jnp.int32 if cdtype == jnp.int8 else jnp.float32


def _fwd_kernel(b_ref, pack_ref, out_ref, *, cdtype):
    """Feature-major: Cf[:, g*4096 + b*128 : +128] += Bf(d, J) @ plane_b(J, 128)."""
    cb = pl.program_id(1)

    @pl.when(cb == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    bf = b_ref[:] if b_ref.dtype == cdtype else b_ref[:].astype(cdtype)
    pack = pack_ref[:].astype(jnp.int32)
    for b, plane in _planes(pack, cdtype):
        sl = slice(b * 128, (b + 1) * 128)
        out_ref[:, sl] += jnp.dot(bf, plane, preferred_element_type=_acc_dtype(cdtype))


def _bwd_kernel(b_ref, pack_ref, out_ref, *, cdtype):
    """Row-major: C(O, d) += plane_b(O, 128) @ B[g*4096 + b*128 : +128, :]."""
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    pack = pack_ref[:].astype(jnp.int32)
    acc = out_ref[:]
    for b, plane in _planes(pack, cdtype):
        blk = b_ref[b * 128 : (b + 1) * 128, :]
        if blk.dtype != cdtype:
            blk = blk.astype(cdtype)
        acc += jnp.dot(plane, blk, preferred_element_type=_acc_dtype(cdtype))
    out_ref[:] = acc


def apply_pattern_calls(mat, b: jax.Array, call_fwd, call_bwd) -> jax.Array:
    """Shared pre/post-scale, pad/transpose and int8 quantize/dequant wrapper
    around a (call_fwd, call_bwd) kernel pair — used by both the dense
    (:func:`spmm_pattern`) and block-sparse (spmm_pattern_sparse) kernels so
    the quantization/layout logic cannot drift between them.

    In int8 mode the dense operand is quantized per feature (symmetric,
    scale = max|column|/127); the pattern side is exact 0/1 and the int32
    accumulation is exact over the quantized values, so the only error is
    the 8-bit input rounding. v5e int8 MXU runs at 2x the bf16 rate.
    """
    n, d = b.shape
    if n != mat.n:
        raise ValueError(f"B has {n} rows, pattern expects {mat.n}")
    n_pad = mat.n_pad
    int8_mode = mat.compute_dtype == jnp.int8
    b = b.astype(jnp.float32)
    if mat.scale_side == "pre":
        b = b * mat.scale[:n, None]
    d_pad = round_up(max(d, 8), 8)
    if int8_mode:
        # per-feature symmetric quantization (exact dequant per row/col)
        qscale = jnp.maximum(jnp.max(jnp.abs(b), axis=0), 1e-30) / 127.0  # (d,)
        bq = jnp.clip(jnp.round(b / qscale[None, :]), -127, 127).astype(jnp.int8)
        if mat.orientation == "PT":
            bf = jnp.zeros((d_pad, n_pad), jnp.int8).at[:d, :n].set(bq.T)
            cf = call_fwd(mat, bf).astype(jnp.float32)
            c = (cf[:d, :n] * qscale[:, None]).T
        else:
            bm = jnp.zeros((n_pad, d_pad), jnp.int8).at[:n, :d].set(bq)
            cm = call_bwd(mat, bm).astype(jnp.float32)
            c = cm[:n, :d] * qscale[None, :]
    elif mat.orientation == "PT":
        # cast once here: casting inside the kernel would re-convert the
        # operand on every outer grid iteration, and bf16 halves streaming
        op_dt = mat.compute_dtype if mat.compute_dtype == jnp.bfloat16 else jnp.float32
        bf = jnp.zeros((d_pad, n_pad), op_dt)
        bf = bf.at[:d, :n].set(b.T.astype(op_dt))
        cf = call_fwd(mat, bf)
        c = cf[:d, :n].T
    else:
        op_dt = mat.compute_dtype if mat.compute_dtype == jnp.bfloat16 else jnp.float32
        bm = jnp.zeros((n_pad, d_pad), op_dt)
        bm = bm.at[:n, :d].set(b.astype(op_dt))
        cm = call_bwd(mat, bm)
        c = cm[:n, :d]
    if mat.scale_side == "post":
        c = c * mat.scale[:n, None]
    return c


def spmm_pattern(mat: PatternMat, b: jax.Array) -> jax.Array:
    """``C = M @ B`` for row-major B (n, d); returns (n, d) float32.
    See :func:`apply_pattern_calls` for the int8 quantization semantics."""
    return apply_pattern_calls(mat, b, _pattern_call_fwd, _pattern_call_bwd)


def _pattern_call_fwd(mat: PatternMat, bf: jax.Array) -> jax.Array:
    if bf.shape[0] > D_MAX:
        return jnp.concatenate(
            [
                _pattern_call_fwd(mat, bf[i : i + D_MAX])
                for i in range(0, bf.shape[0], D_MAX)
            ],
            axis=0,
        )
    d_pad, n_pad = bf.shape
    n_g = n_pad // GROUP
    n_cb = n_pad // J_FWD
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cdtype=mat.compute_dtype),
        grid=(n_g, n_cb),
        in_specs=[
            pl.BlockSpec((d_pad, J_FWD), lambda g, cb: (0, cb), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (J_FWD, 128), lambda g, cb: (cb, g), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (d_pad, GROUP), lambda g, cb: (0, g), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((d_pad, n_pad), _acc_dtype(mat.compute_dtype)),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * n_pad * d_pad,
            bytes_accessed=mat.pack.size * 4 + bf.size * 4 * n_g + bf.size * 4,
            transcendentals=0,
        ),
    )(bf, mat.pack)


def _pattern_call_bwd(mat: PatternMat, bm: jax.Array) -> jax.Array:
    if bm.shape[1] > D_MAX:
        return jnp.concatenate(
            [
                _pattern_call_bwd(mat, bm[:, i : i + D_MAX])
                for i in range(0, bm.shape[1], D_MAX)
            ],
            axis=1,
        )
    n_pad, d_pad = bm.shape
    n_rb = n_pad // O_BWD
    n_g = n_pad // GROUP
    return pl.pallas_call(
        functools.partial(_bwd_kernel, cdtype=mat.compute_dtype),
        grid=(n_rb, n_g),
        in_specs=[
            pl.BlockSpec((GROUP, d_pad), lambda rb, g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (O_BWD, 128), lambda rb, g: (rb, g), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (O_BWD, d_pad), lambda rb, g: (rb, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, d_pad), _acc_dtype(mat.compute_dtype)),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * n_pad * d_pad,
            bytes_accessed=mat.pack.size * 4 + bm.size * 4 * n_rb + bm.size * 4,
            transcendentals=0,
        ),
    )(bm, mat.pack)
