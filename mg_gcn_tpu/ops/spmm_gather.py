"""Windowed serial-gather SpMM — ultra-sparse graphs on a single chip.

The framework's kernel ladder by density (PERF.md):

* dense-pattern / block-pattern (n²/8 bit store) — density ≳ 1e-3 and the
  store fits HBM;
* edge-tile one-hot MXU kernel (:mod:`.spmm_edges`) — O(nnz), but its
  (br × 128) sub-tiles need ``br·128·density ≳ 100`` for slot fill, which
  collapses below density ~1e-4 (ogbn-products scale: density 2e-5, fill 4%);
* **this kernel** — density-independent O(nnz) work: the ultra-sparse
  regime where the reference leans on cuSPARSE's row-based SpMM
  (``cuda_utils.hpp:27-32,94-102``) and XLA's gather lowering runs at
  ~40–90 ns/edge.

Design. v5e has no cross-vreg vector gather, but Mosaic allows *dynamic
single-row slices of f32 VMEM* (load and store) with a scalar index — a
1-row gather/scatter at VPU speed. The kernel exploits that directly:

1. Edges are grouped host-side by ``(row super-tile of R rows, operand
   window of W rows)`` and padded into fixed blocks of E_BLK slots; blocks
   of one super-tile are consecutive (the output block accumulates across
   grid steps, zero-initialized on a per-super-tile ``first`` flag, exactly
   like the edge-tile schedule).
2. Within each (super-tile, window) group, edges arrive in CSR row order,
   so consecutive edges sharing an output row form *runs*. The schedule
   packs each run's edges two-per-entry (**pairs**) at the front of the
   group, leftover odd edges (**singles**) behind them: a pair costs one
   output read-modify-write for two operand gathers, and its two slot
   words carry (c1 | c2 << 14) and the shared row — same slots per edge,
   strictly fewer serial VPU ops. On clustered graphs (real-world degree
   locality, RCM/community orderings) most edges pair; on uniform random
   ultra-sparse graphs runs are rare and the schedule degenerates to the
   singles walk with zero overhead.
3. Per step, the scalar core walks the pair region then the single region
   from SMEM (exact trip counts from ``meta2``, so no padding slots are
   ever dereferenced). Weighted entries read an f32 weight per edge from
   the w block; **binary** schedules (all edge values 1 — every
   degree-normalized GCN/PageRank operator factors into diagonal scales
   around a binary core, applied in the wrapper) skip the w block
   entirely, halving SMEM traffic.
4. ``bwin`` is the (W, d) slice of B selected by the step's window id
   (scalar-prefetch index_map); the accumulator is the (R, d) f32 output
   block selected by the super-tile id. Total B traffic is
   ``(n_out_pad / R) · bytes(B)`` — the price of output-stationary order.
   At products scale that re-streaming, not the walk, bounds the kernel
   (PERF.md round 4), so (a) graphs past R_BIG_THRESHOLD rows build with
   32k-row super-tiles (halving n_st; the second accumulator bank is
   dropped when the doubled blocks would blow the VMEM scope), and (b)
   ``spmm_gather(..., stream_bf16=True)`` ships B in bf16 and casts each
   window once into an f32 VMEM scratch the walk reads — half the traffic,
   bf16-rounded operands, the walk itself stays f32.

Everything dynamic rides in i32/f32 (Mosaic v5e rejects single-row dynamic
slices of 16-bit dtypes), so B is staged to f32 on device. Cost is
~constant cycles per edge regardless of density — measured numbers live in
PERF.md ("windowed serial-gather SpMM").
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats import CSRData
from .spmm_edges import interpret_default
from .spmm_pattern import round_up

R_ROWS = 16_384  # default rows per output super-tile (acc block, f32)
# Big graphs get taller super-tiles: total operand traffic is
# (n_out_pad / r_rows) x bytes(B) (output-stationary order), and at
# products scale (n=2.45M, d=256) that re-streaming — not the serial walk —
# bounds the kernel (measured 534 ms of the 802 ms d=128 SpMM). 32k-row
# accumulators double the VMEM (2 banks x 32 MB at d=256 + 2 x 16 MB bwin
# = 96 MB, inside the 100 MB scoped budget) and halve the traffic.
R_ROWS_BIG = 32_768
R_BIG_THRESHOLD = 1_000_000  # n_out above this picks R_ROWS_BIG
W_ROWS = 16_384  # operand rows per window (bwin block, f32)
W_BITS = 14  # log2(W_ROWS): col_local fits 14 bits in the packed word
E_BLK = 2048  # edge slots per grid step (SMEM-blocked, 8 steps per fetch)
LIVE_BITS = 12  # total live slot count per step (<= E_BLK) packed into meta
D_MAX_G = 256  # feature columns per kernel call (VMEM: acc 16 MB + bwin 2x16 MB)
MAX_STEPS_G = 150_000  # scalar-prefetch budget: two i32 per step (~1.2 MB SMEM)
LP_BITS = 11  # meta2: live pair count (<= E_BLK/2)
# Bump on ANY schedule-builder change: disk caches of built gather
# schedules key on this (see spmm_edges.SCHED_VERSION for the round-3
# stale-cache incident this guards against).
SCHED_VERSION = 3


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["idx", "w", "meta", "meta2", "scale"],
    meta_fields=[
        "n_out",
        "n_in",
        "n_out_pad",
        "n_in_pad",
        "nnz",
        "win_bits",
        "fill",
        "scale_side",
        "pairfrac",
        "r_rows",
        "stream_bf16",
    ],
)
@dataclass(frozen=True)
class GatherMat:
    """A sparse matrix as serial-gather edge blocks (C = M @ B).

    Pair region (slots ``[0, 2·lp)`` of step s): entry k's even word packs
    the two operand columns ``c1 | (c2 << 14)`` and its odd word the shared
    output row; weights (if any) sit at the same slots of ``w``. Single
    region (slots ``[2·lp, 2·lp + ls)``): ``(row_local << W_BITS) |
    col_local`` as one word per edge. ``meta[s]`` packs ``(st <<
    (win_bits + 1 + LIVE_BITS)) | (win << (1 + LIVE_BITS)) | (first <<
    LIVE_BITS) | live_total``; ``meta2[s]`` packs ``lp | (ls << LP_BITS)``
    — the exact trip counts (padding slots are never walked).

    ``w`` is None for binary schedules (all edge values 1); ``scale`` +
    ``scale_side`` optionally fold a diagonal back in: "pre" scales B rows
    (length n_in), "post" scales output rows (length n_out) — how the
    degree-normalized GCN/PageRank operators ride the binary walk.
    """

    idx: jax.Array  # i32[S, E_BLK]
    w: jax.Array | None  # f32[S, E_BLK]; None when binary
    meta: jax.Array  # i32[S]
    meta2: jax.Array  # i32[S]
    scale: jax.Array | None  # f32[n_in] (pre) or f32[n_out] (post)
    n_out: int
    n_in: int
    n_out_pad: int
    n_in_pad: int
    nnz: int
    win_bits: int
    fill: float = 1.0  # nnz / slot count (diagnostic)
    scale_side: str = "none"  # "none" | "pre" | "post"
    pairfrac: float = 0.0  # fraction of edges walked in pair entries (diag)
    r_rows: int = R_ROWS  # output super-tile height (R_ROWS_BIG on big graphs)
    # bf16 operand streaming as a property of the MATRIX (set at build or
    # via dataclasses.replace), not an env var read at trace time — a
    # retrace after an env flip must not silently change precision
    # (ADVICE r4 #5); the env var remains an ad-hoc probe default only.
    stream_bf16: bool = False

    @property
    def num_steps(self) -> int:
        return self.meta.shape[0]

    @property
    def has_w(self) -> bool:
        return self.w is not None


def gather_mat_from_csr(
    csr: CSRData,
    device=None,
    scale: np.ndarray | None = None,
    scale_side: str = "none",
) -> GatherMat:
    """Host-side grouping/pairing of a sparse matrix into the serial-gather
    schedule, uploaded to the device. Any edge values; all-ones values are
    detected and build a binary (w-less) schedule — pass ``scale`` /
    ``scale_side`` to fold a diagonal normalization around it."""
    return gather_mat_from_host(
        gather_schedule_host(csr), device=device, scale=scale, scale_side=scale_side
    )


def gather_schedule_host(
    csr: CSRData,
    pad_steps_to: int | None = None,
    binary: bool | None = None,
    pair: bool = True,
    r_rows: int | None = None,
) -> dict:
    """The pure-host build: group edges by (super-tile, window), pack
    same-row runs into pair entries, pad into E_BLK-slot steps, pack the
    per-step metadata. Vectorized numpy. ``pad_steps_to`` extends the no-op
    step padding to a fixed count so schedules of different blocks stack
    (the distributed pair). ``binary=None`` auto-detects all-ones values
    (w-less schedule); pass False when schedules of several blocks must
    stack (a coincidentally-all-ones block would otherwise drop its w
    array and break the stack), True to assert values are ones."""
    n_out, n_in = csr.shape
    if r_rows is None:
        r_rows = R_ROWS_BIG if n_out > R_BIG_THRESHOLD else R_ROWS
    if r_rows & (r_rows - 1) or r_rows < W_ROWS:
        raise ValueError(f"r_rows ({r_rows}) must be a power of two >= {W_ROWS}")
    r_bits = r_rows.bit_length() - 1
    n_out_pad = round_up(max(n_out, r_rows), r_rows)
    n_in_pad = round_up(max(n_in, W_ROWS), W_ROWS)
    n_st = n_out_pad // r_rows
    n_win = n_in_pad // W_ROWS
    if csr.nnz >= 2**31:
        raise ValueError("graph too large for the single-chip gather build")

    data32 = csr.data.astype(np.float32, copy=False)
    if binary is None:
        binary = bool(csr.nnz == 0 or (data32 == 1.0).all())
    elif binary and csr.nnz and not (data32 == 1.0).all():
        raise ValueError("binary=True but the matrix has non-unit values")
    native_lib = None
    try:
        from .. import native as native_lib  # C++/OpenMP fast path

        if not native_lib.available():
            native_lib = None
    except ImportError:
        native_lib = None
    if native_lib is not None and csr.nnz:
        # fused expand + two stable counting sorts + run pairing — bit-
        # identical to the numpy double argsort (csrc/mggcn_host.cpp)
        rows_s, cols_s, data_s, groups, gcounts, g_pair_edges = (
            native_lib.gather_sort_pair(csr, n_win, n_st, pair, r_bits)
        )
        gkey_s = np.empty(0, np.int64)  # unused on the native path
    else:
        native_lib = None
        counts = np.diff(csr.indptr).astype(np.int64)
        rows = np.repeat(np.arange(n_out, dtype=np.int32), counts)
        cols = csr.indices.astype(np.int32, copy=False)
        gkey = (rows >> r_bits).astype(np.int64) * n_win + (cols >> 14)
        order = np.argsort(gkey, kind="stable")  # keeps CSR row order per group
        rows_s = rows[order]
        cols_s = cols[order]
        data_s = data32[order]
        gkey_s = gkey[order]

    # same-row runs within each group -> pair the even prefix of each run,
    # then stable-reorder each group to [pair edges..., single edges...]
    # (pair mates stay adjacent under the stable sort)
    if native_lib is not None:
        pass  # groups/gcounts/g_pair_edges already built natively
    elif gkey_s.size:
        brk = np.concatenate(
            [[True], (gkey_s[1:] != gkey_s[:-1]) | (rows_s[1:] != rows_s[:-1])]
        )
        run_id = np.cumsum(brk) - 1
        run_len = np.bincount(run_id)
        run_start = np.concatenate([[0], np.cumsum(run_len)])[:-1]
        rr = np.arange(gkey_s.size) - run_start[run_id]
        is_single = rr >= (run_len - (run_len & 1))[run_id]
        if not pair:  # all-singles layout (isolation probes / A-B tests)
            is_single = np.ones_like(is_single)
        order2 = np.argsort(gkey_s * 2 + is_single, kind="stable")
        rows_s = rows_s[order2]
        cols_s = cols_s[order2]
        data_s = data_s[order2]
        gkey_s = gkey_s[order2]
        # unique-on-sorted (no re-sort of the full edge set)
        change = np.flatnonzero(
            np.concatenate([[True], gkey_s[1:] != gkey_s[:-1]])
        )
        groups = gkey_s[change]
        gcounts = np.diff(np.concatenate([change, [gkey_s.size]]))
        g_singles = np.bincount(
            np.repeat(np.arange(groups.size), gcounts)[is_single[order2]],
            minlength=groups.size,
        )
        g_pair_edges = gcounts - g_singles  # even by construction
    else:
        groups = np.empty(0, np.int64)
        gcounts = np.empty(0, np.int64)
        g_pair_edges = np.empty(0, np.int64)
    gstart = np.concatenate([[0], np.cumsum(gcounts)])[:-1]
    steps_of = -(-gcounts // E_BLK)

    # per-step arrays (groups sorted by (st, win) => steps of one st are
    # consecutive)
    s_group = np.repeat(np.arange(groups.size), steps_of)
    s_rank = np.arange(s_group.size) - np.repeat(
        np.cumsum(steps_of) - steps_of, steps_of
    )
    s_e0 = gstart[s_group] + s_rank * E_BLK
    s_e1 = np.minimum(s_e0 + E_BLK, gstart[s_group] + gcounts[s_group])
    # pair/single split point of the step's edge range: pairs occupy the
    # group-relative prefix [0, g_pair_edges); E_BLK is even, so the pair
    # region always starts at an even in-step slot
    s_pe = np.minimum(s_e1, gstart[s_group] + g_pair_edges[s_group])
    s_lp = np.maximum(s_pe - s_e0, 0) // 2
    s_ls = s_e1 - np.maximum(s_e0, s_pe)
    s_st = groups[s_group] // n_win
    s_win = groups[s_group] % n_win

    # dummy steps for super-tiles with no edges (their output blocks must
    # still be zero-initialized exactly once)
    present = np.unique(s_st) if s_st.size else np.empty(0, np.int64)
    missing = np.setdiff1d(np.arange(n_st, dtype=np.int64), present)
    if missing.size:
        s_st = np.concatenate([s_st, missing])
        s_win = np.concatenate([s_win, np.zeros(missing.size, np.int64)])
        s_e0 = np.concatenate([s_e0, np.zeros(missing.size, np.int64)])
        s_e1 = np.concatenate([s_e1, np.zeros(missing.size, np.int64)])
        s_lp = np.concatenate([s_lp, np.zeros(missing.size, np.int64)])
        s_ls = np.concatenate([s_ls, np.zeros(missing.size, np.int64)])
        reorder = np.argsort(s_st, kind="stable")
        s_st, s_win = s_st[reorder], s_win[reorder]
        s_e0, s_e1 = s_e0[reorder], s_e1[reorder]
        s_lp, s_ls = s_lp[reorder], s_ls[reorder]

    if s_st.size == 0:  # empty matrix: one dummy zero-init step
        s_st = np.zeros(1, np.int64)
        s_win = np.zeros(1, np.int64)
        s_e0 = s_e1 = s_lp = s_ls = np.zeros(1, np.int64)
    # pad the step count to a multiple of 8 (the SMEM edge blocks ship 8
    # steps per fetch) with no-op steps: revisit the last super-tile with
    # zero trip counts and first=0
    S_real = int(s_st.size)
    S = round_up(S_real, 8)
    if pad_steps_to is not None:
        if pad_steps_to % 8 or pad_steps_to < S:
            raise ValueError(
                f"pad_steps_to ({pad_steps_to}) must be a multiple of 8 and "
                f">= the natural step count ({S})"
            )
        S = pad_steps_to
    if S > S_real:
        pad = S - S_real
        s_st = np.concatenate([s_st, np.full(pad, s_st[-1], np.int64)])
        s_win = np.concatenate([s_win, np.zeros(pad, np.int64)])
        s_e0 = np.concatenate([s_e0, np.zeros(pad, np.int64)])
        s_e1 = np.concatenate([s_e1, np.zeros(pad, np.int64)])
        s_lp = np.concatenate([s_lp, np.zeros(pad, np.int64)])
        s_ls = np.concatenate([s_ls, np.zeros(pad, np.int64)])
    if S > MAX_STEPS_G:
        raise ValueError(
            f"gather schedule has {S} steps (> {MAX_STEPS_G}, the SMEM "
            "prefetch budget); shard the graph (parallel.dist / dist_halo)"
        )
    win_bits = max(int(np.ceil(np.log2(max(n_win, 2)))), 1)
    st_bits = max(int(np.ceil(np.log2(max(n_st, 2)))), 1)
    if st_bits + win_bits + 1 + LIVE_BITS > 31:
        raise ValueError(
            "graph too large for the single-chip gather schedule "
            f"({n_st} super-tiles x {n_win} windows); shard it first "
            "(parallel.dist / dist_halo)"
        )
    first = np.ones(S, np.int32)
    if S > 1:
        first[1:] = (s_st[1:] != s_st[:-1]).astype(np.int32)
    first[S_real:] = 0
    live = (s_e1 - s_e0).astype(np.int64)
    meta = (
        (s_st << (win_bits + 1 + LIVE_BITS))
        | (s_win << (1 + LIVE_BITS))
        | (first.astype(np.int64) << LIVE_BITS)
        | live
    ).astype(np.int32)
    meta2 = (s_lp | (s_ls << LP_BITS)).astype(np.int32)
    # fraction of edges walked via pair entries (one output RMW per two
    # gathers) — the bench records it so "coalescing engaged" is checkable
    pairfrac = float(2 * int(s_lp.sum()) / max(csr.nnz, 1))

    if native_lib is not None:
        idx, w = native_lib.gather_fill(
            s_e0, s_e1, s_st, s_win, s_lp, rows_s, cols_s, data_s,
            E_BLK, W_BITS, binary, r_bits,
        )
        return dict(
            idx=idx,
            w=w,
            meta=meta,
            meta2=meta2,
            n_out=n_out,
            n_in=n_in,
            n_out_pad=n_out_pad,
            n_in_pad=n_in_pad,
            nnz=csr.nnz,
            win_bits=win_bits,
            fill=float(csr.nnz) / max(S * E_BLK, 1),
            binary=binary,
            pairfrac=pairfrac,
            r_rows=r_rows,
        )
    idx = np.zeros((S, E_BLK), np.int32)
    w = np.zeros((S, E_BLK) if not binary else (0,), np.float32)
    lane = np.arange(E_BLK, dtype=np.int64)[None, :]
    step_batch = max(1, (1 << 25) // E_BLK)
    for b0 in range(0, S if csr.nnz else 0, step_batch):
        b1 = min(b0 + step_batch, S)
        pos = s_e0[b0:b1, None] + lane
        valid = pos < s_e1[b0:b1, None]
        src = np.where(valid, pos, 0)
        rl = rows_s[src] - (s_st[b0:b1, None] << r_bits).astype(np.int32)
        cl = cols_s[src] - (s_win[b0:b1, None] << 14).astype(np.int32)
        # pair region: even slot -> c1 | (c2 << 14); odd slot -> shared row
        in_pair = (pos - s_e0[b0:b1, None]) < 2 * s_lp[b0:b1, None]
        even = (lane % 2) == 0
        src_next = np.minimum(src + 1, max(gkey_s.size - 1, 0))
        cl_next = cols_s[src_next] - (s_win[b0:b1, None] << 14).astype(np.int32)
        pair_word = np.where(even, cl | (cl_next.astype(np.int64) << 14), rl)
        idx[b0:b1] = np.where(
            valid, np.where(in_pair, pair_word, (rl << W_BITS) | cl), 0
        ).astype(np.int32)
        if not binary:
            w[b0:b1] = np.where(valid, data_s[src], 0.0)

    return dict(
        idx=idx,
        w=w,
        meta=meta,
        meta2=meta2,
        n_out=n_out,
        n_in=n_in,
        n_out_pad=n_out_pad,
        n_in_pad=n_in_pad,
        nnz=csr.nnz,
        win_bits=win_bits,
        fill=float(csr.nnz) / max(S * E_BLK, 1),
        binary=binary,
        pairfrac=pairfrac,
        r_rows=r_rows,
    )


def pad_schedule_steps(sched: dict, s_target: int) -> dict:
    """Append no-op steps (revisit the last super-tile, first=0, zero trip
    counts) to a host schedule — O(pad) step-count equalization for stacking
    block schedules, instead of rebuilding the whole schedule."""
    S = int(sched["meta"].shape[0])
    if s_target == S:
        return sched
    if s_target < S or s_target % 8:
        raise ValueError(f"s_target ({s_target}) must be a multiple of 8 >= {S}")
    pad = s_target - S
    win_bits = int(sched["win_bits"])
    last_st = int(sched["meta"][-1]) >> (win_bits + 1 + LIVE_BITS)
    pad_meta = np.full(pad, last_st << (win_bits + 1 + LIVE_BITS), np.int32)
    w = np.asarray(sched["w"])
    if w.size:  # binary schedules carry no weight array
        w = np.concatenate([w, np.zeros((pad, E_BLK), np.float32)])
    return {
        **sched,
        "idx": np.concatenate([sched["idx"], np.zeros((pad, E_BLK), np.int32)]),
        "w": w,
        "meta": np.concatenate([np.asarray(sched["meta"]), pad_meta]),
        "meta2": np.concatenate(
            [np.asarray(sched["meta2"]), np.zeros(pad, np.int32)]
        ),
        "fill": float(sched["nnz"]) / max(s_target * E_BLK, 1),
    }


def gather_mat_from_host(
    sched: dict,
    device=None,
    scale: np.ndarray | None = None,
    scale_side: str = "none",
) -> GatherMat:
    """Device upload of a host schedule (``gather_schedule_host`` output or
    an npz round-trip of it — the build is pure host work, so callers at
    products scale cache it on disk)."""
    put = lambda x: jax.device_put(x, device) if device is not None else jnp.asarray(x)
    binary = bool(sched.get("binary", False)) or np.asarray(sched["w"]).size == 0
    if scale is not None and scale_side not in ("pre", "post"):
        raise ValueError("scale requires scale_side 'pre' or 'post'")
    return GatherMat(
        idx=put(np.asarray(sched["idx"])),
        w=None if binary else put(np.asarray(sched["w"])),
        meta=put(np.asarray(sched["meta"])),
        meta2=put(np.asarray(sched["meta2"])),
        scale=put(np.asarray(scale, np.float32)) if scale is not None else None,
        n_out=int(sched["n_out"]),
        n_in=int(sched["n_in"]),
        n_out_pad=int(sched["n_out_pad"]),
        n_in_pad=int(sched["n_in_pad"]),
        nnz=int(sched["nnz"]),
        win_bits=int(sched["win_bits"]),
        fill=float(sched["fill"]),
        scale_side=scale_side if scale is not None else "none",
        pairfrac=float(sched.get("pairfrac", 0.0)),
        r_rows=int(sched.get("r_rows", R_ROWS)),
    )


UNROLL = 16  # singles: measured u16 halves the per-edge loop overhead vs u1
UNROLL_P = 8  # pairs per unrolled iteration (16 edges)
CMASK = W_ROWS - 1
# Two-bank accumulation (second (R, d) VMEM scratch block, drained on each
# super-tile's last step): breaks the serial RMW dependency chain on the
# output block — consecutive entries alternate target refs. Disable via
# env for A/B probes.
BANKED = os.environ.get("MG_GCN_GATHER_BANKED", "1") != "0"
def STREAM_BF16():
    """bf16 operand streaming default — read at trace time so callers
    (e.g. the bench's products section) can scope it per jitted step."""
    return os.environ.get("MG_GCN_GATHER_STREAM_BF16", "0") == "1"


def _gather_kernel(
    meta_ref, meta2_ref, idx_ref, *rest, has_w, banked, stream, n_steps, rmask
):
    if stream:
        *rest, cast_ref = rest
    else:
        cast_ref = None
    if banked:
        *rest, bank_ref = rest
    else:
        bank_ref = None
    if has_w:
        w_ref, b_ref, out_ref = rest
    else:
        b_ref, out_ref = rest
        w_ref = None
    s = pl.program_id(0)
    m = meta_ref[s]

    @pl.when(((m >> LIVE_BITS) & 1) == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        if banked:
            bank_ref[:] = jnp.zeros_like(bank_ref)

    if stream:
        # bf16 window streaming: B rides HBM->VMEM in bf16 (half the
        # operand traffic — the measured bound at products scale) and is
        # cast once per (super-tile, window) block into an f32 scratch the
        # serial walk reads (Mosaic rejects 16-bit single-row dynamic
        # slices; a full-block cast is ~2k cycles, amortized over the
        # block's edges). Block change = the st||win meta fields changed.
        m_prev = meta_ref[jnp.maximum(s - 1, 0)]
        blk_changed = jnp.logical_or(
            s == 0,
            (m >> (1 + LIVE_BITS)) != (m_prev >> (1 + LIVE_BITS)),
        )

        @pl.when(blk_changed)
        def _():
            cast_ref[:] = b_ref[:].astype(jnp.float32)

        b_ref = cast_ref

    row8 = s % 8  # the SMEM edge blocks ship 8 steps per fetch
    m2 = meta2_ref[s]
    lp = m2 & ((1 << LP_BITS) - 1)
    ls = (m2 >> LP_BITS) & ((1 << LIVE_BITS) - 1)

    def pair(k, acc_ref):
        v0 = idx_ref[row8, 2 * k]
        v1 = idx_ref[row8, 2 * k + 1]
        c1 = v0 & CMASK
        c2 = (v0 >> W_BITS) & CMASK
        r = v1 & rmask  # odd pair word holds the shared row-local id
        g1 = b_ref[pl.ds(c1, 1), :]
        g2 = b_ref[pl.ds(c2, 1), :]
        if has_w:
            upd = w_ref[row8, 2 * k] * g1 + w_ref[row8, 2 * k + 1] * g2
        else:
            upd = g1 + g2
        acc = acc_ref[pl.ds(r, 1), :]
        acc_ref[pl.ds(r, 1), :] = acc + upd

    def single(i, acc_ref):
        v = idx_ref[row8, i]
        r = v >> W_BITS
        c = v & CMASK
        row = b_ref[pl.ds(c, 1), :]
        upd = w_ref[row8, i] * row if has_w else row
        acc = acc_ref[pl.ds(r, 1), :]
        acc_ref[pl.ds(r, 1), :] = acc + upd

    def bank_of(k):
        # two-bank accumulation: alternate the target block per entry so
        # consecutive read-modify-writes hit different refs — Mosaic cannot
        # disambiguate successive dynamic-row RMWs on one ref and orders
        # them; splitting the chain in two lets them overlap (VERDICT r3
        # #3: the RMW dependency chain was the gap to the 4.1 cyc/edge
        # SMEM floor)
        if not banked:
            return out_ref
        return bank_ref if k % 2 else out_ref

    # pairs: unrolled main loop + exact-trip remainder (trip counts are
    # exact, so padding slots are never dereferenced — required by the
    # binary mode, which has no zero weight to neutralize them)
    def pbody(i, _):
        for k in range(UNROLL_P):
            pair(i * UNROLL_P + k, bank_of(k))
        return 0

    jax.lax.fori_loop(0, lp // UNROLL_P, pbody, 0)
    jax.lax.fori_loop(
        (lp // UNROLL_P) * UNROLL_P, lp, lambda k, _: (pair(k, out_ref), 0)[1], 0
    )

    base = 2 * lp  # singles start right after the pair region

    def sbody(i, _):
        for k in range(UNROLL):
            single(base + i * UNROLL + k, bank_of(k))
        return 0

    jax.lax.fori_loop(0, ls // UNROLL, sbody, 0)
    jax.lax.fori_loop(
        base + (ls // UNROLL) * UNROLL,
        base + ls,
        lambda i, _: (single(i, out_ref), 0)[1],
        0,
    )

    if banked:
        # drain the second bank into the output on this super-tile's last
        # step (the meta array is fully prefetched, so peeking at s+1 is a
        # scalar read; the next step's `first` flag marks this one as last)
        nxt = meta_ref[jnp.minimum(s + 1, n_steps - 1)]
        is_last = jnp.logical_or(
            s == n_steps - 1, ((nxt >> LIVE_BITS) & 1) == 1
        )

        @pl.when(is_last)
        def _():
            out_ref[:] = out_ref[:] + bank_ref[:]


def _gather_call(
    mat: GatherMat, b_pad: jax.Array, banked: bool | None = None
) -> jax.Array:
    """out(n_out_pad, d_pad) f32 = M @ b_pad for f32 b_pad (n_in_pad, d_pad)."""
    if banked is None:
        banked = BANKED
    if b_pad.shape[1] > D_MAX_G:
        return jnp.concatenate(
            [
                _gather_call(mat, b_pad[:, i : i + D_MAX_G], banked)
                for i in range(0, b_pad.shape[1], D_MAX_G)
            ],
            axis=1,
        )
    n_in_pad, d_pad = b_pad.shape
    # scoped-VMEM budget: the pipeline double-buffers the revisited out
    # block and the bwin input (measured: 3 x out + 2 x bwin at the 32k
    # super-tiles OOMed the 100 MB scope at d=256) — drop the second bank
    # when it would not fit; correctness is unaffected
    stream = b_pad.dtype == jnp.bfloat16  # bf16 window streaming (opt-in)
    bwin_bytes = 2 * W_ROWS * d_pad * b_pad.dtype.itemsize + (
        W_ROWS * d_pad * 4 if stream else 0  # + the f32 cast scratch
    )
    banked = (
        banked
        and 3 * mat.r_rows * d_pad * 4 + bwin_bytes <= 100 * 1024 * 1024
    )
    S = mat.num_steps
    win_bits = mat.win_bits
    win_mask = (1 << win_bits) - 1
    has_w = mat.has_w
    in_specs = [
        pl.BlockSpec(
            (8, E_BLK), lambda s, meta, m2: (s // 8, 0), memory_space=pltpu.SMEM
        ),
    ]
    if has_w:
        in_specs.append(
            pl.BlockSpec(
                (8, E_BLK), lambda s, meta, m2: (s // 8, 0), memory_space=pltpu.SMEM
            )
        )
    in_specs.append(
        pl.BlockSpec(
            (W_ROWS, d_pad),
            lambda s, meta, m2: ((meta[s] >> (1 + LIVE_BITS)) & win_mask, 0),
            memory_space=pltpu.VMEM,
        )
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # meta, meta2
        grid=(S,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (mat.r_rows, d_pad),
            lambda s, meta, m2: (meta[s] >> (win_bits + 1 + LIVE_BITS), 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=(
            [pltpu.VMEM((mat.r_rows, d_pad), jnp.float32)] if banked else []
        )
        + ([pltpu.VMEM((W_ROWS, d_pad), jnp.float32)] if stream else []),
    )
    operands = (mat.meta, mat.meta2, mat.idx) + (
        (mat.w, b_pad) if has_w else (b_pad,)
    )
    return pl.pallas_call(
        functools.partial(
            _gather_kernel, has_w=has_w, banked=banked, stream=stream,
            n_steps=S, rmask=mat.r_rows - 1,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mat.n_out_pad, d_pad), jnp.float32),
        # the big (W, d)/(R, d) f32 blocks blow the default 16 MB scoped-
        # VMEM budget; v5e has 128 MB physical
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret_default(),
        cost_estimate=pl.CostEstimate(
            # the serial walk is ~VPU-bound: count one (1, d) FMA per slot
            flops=2 * S * E_BLK * d_pad,
            bytes_accessed=mat.idx.size * (8 if has_w else 4)
            + S * W_ROWS * d_pad * 4
            + mat.n_out_pad * d_pad * 4,
            transcendentals=0,
        ),
    )(*operands)


def spmm_gather(
    mat: GatherMat, b: jax.Array, stream_bf16: bool | None = None
) -> jax.Array:
    """``C = M @ B`` for row-major B (n_in, d); returns (n_out, d) float32.

    ``stream_bf16`` rounds the operand to bf16 on the wire (HBM->VMEM) and
    casts each window back to f32 in VMEM before the serial walk — half the
    operand traffic, which is the measured bound at products scale
    (PERF.md round 4). Default: the matrix's own ``stream_bf16`` flag
    (set at build / ``dataclasses.replace``; the engine's exact-f32
    contract keeps it off), overridable per call. The
    MG_GCN_GATHER_STREAM_BF16 env var only seeds ad-hoc probes.
    """
    if stream_bf16 is None:
        stream_bf16 = mat.stream_bf16 or STREAM_BF16()
    n, d = b.shape
    if n != mat.n_in:
        raise ValueError(f"B has {n} rows, gather matrix expects {mat.n_in}")
    b = b.astype(jnp.float32)
    if mat.scale_side == "pre":
        b = b * mat.scale[:n, None]
    d_pad = round_up(max(d, 128), 128)
    wire_t = jnp.bfloat16 if stream_bf16 else jnp.float32
    b_pad = jnp.zeros((mat.n_in_pad, d_pad), wire_t)
    b_pad = b_pad.at[:n, :d].set(b.astype(wire_t))
    out = _gather_call(mat, b_pad)[: mat.n_out, :d]
    if mat.scale_side == "post":
        out = out * mat.scale[: mat.n_out, None]
    return out


def gather_pair_from_csr_pair(
    csr_fwd: CSRData, csr_bwd: CSRData, **kw
) -> tuple[GatherMat, GatherMat]:
    """(forward Â_T @, backward Â @) pair for already-normalized weighted
    matrices — the gather-kernel analogue of sparse_linear's (A_T, A)
    members (gcn.hpp:13-48). For binary adjacencies prefer
    :func:`gather_pair_from_binary_csr` (w-less walk + diagonal scales)."""
    return gather_mat_from_csr(csr_fwd, **kw), gather_mat_from_csr(csr_bwd, **kw)


def gather_pair_from_binary_csr(graph: CSRData) -> tuple[GatherMat, GatherMat]:
    """(Âᵀ, Â) gather pair for a *binary* adjacency, with the GCN in-degree
    normalization (``normalize(axis=True)``, matrix.hpp:340-390 semantics)
    factored into diagonal scales around binary walks:

        Â   = A / colsum  ⇒  Â @ B  = A @ (B / colsum_rows)   (pre-scale)
        Âᵀ  = diag(1/colsum) @ Aᵀ ⇒ Âᵀ @ B = (Aᵀ @ B) / colsum (post-scale)

    Halves the schedule's SMEM traffic (no weight words) and transfer size.
    """
    from .. import sparse as host_sparse

    if graph.nnz and not bool((graph.data == 1).all()):
        raise ValueError("gather_pair_from_binary_csr needs an all-ones adjacency")
    cs = np.bincount(
        graph.indices.astype(np.int64), minlength=graph.ncols
    ).astype(np.float32)
    inv_cs = 1.0 / np.maximum(cs, 1.0)
    g_t = host_sparse.transpose(graph)
    fwd = gather_mat_from_csr(g_t, scale=inv_cs, scale_side="post")
    bwd = gather_mat_from_csr(graph, scale=inv_cs, scale_side="pre")
    return fwd, bwd
