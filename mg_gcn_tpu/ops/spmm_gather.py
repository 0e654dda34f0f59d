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
2. Per step, the scalar core walks the block's slots from SMEM: packed
   ``(row_local << W_BITS) | col_local`` words plus an f32 weight. For each
   real slot it issues

       acc[row_local, :] += w · bwin[col_local, :]

   — a dynamic-row read of the VMEM-resident operand window, an FMA on the
   VPU, and a dynamic-row read-modify-write of the f32 accumulator block.
   Padding slots are skipped via a per-step live count (also SMEM).
3. ``bwin`` is the (W, d) f32 slice of B selected by the step's window id
   (scalar-prefetch index_map); the accumulator is the (R, d) f32 output
   block selected by the super-tile id. Total B traffic is
   ``(n_out_pad / R) · bytes(B)`` — the price of output-stationary order —
   and edge traffic is 8 B/slot, both tiny next to the serial VPU walk.

Everything dynamic rides in i32/f32 (Mosaic v5e rejects single-row dynamic
slices of 16-bit dtypes), so B is staged to f32 on device. Cost is
~constant cycles per edge regardless of density — measured numbers live in
PERF.md ("Round 2: windowed serial-gather SpMM").
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
from .spmm_edges import interpret_default
from .spmm_pattern import round_up

R_ROWS = 16_384  # rows per output super-tile (acc block, f32)
W_ROWS = 16_384  # operand rows per window (bwin block, f32)
W_BITS = 14  # log2(W_ROWS): col_local fits 14 bits in the packed word
E_BLK = 2048  # edge slots per grid step (SMEM-blocked, 8 steps per fetch)
LIVE_BITS = 12  # live slot count per step (<= E_BLK) packed into meta
D_MAX_G = 256  # feature columns per kernel call (VMEM: acc 16 MB + bwin 2x16 MB)
MAX_STEPS_G = 150_000  # scalar-prefetch budget: one i32 per step (~0.6 MB SMEM)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["idx", "w", "meta"],
    meta_fields=["n_out", "n_in", "n_out_pad", "n_in_pad", "nnz", "win_bits", "fill"],
)
@dataclass(frozen=True)
class GatherMat:
    """A weighted sparse matrix as serial-gather edge blocks (C = M @ B).

    ``idx[s, e]`` packs slot e of step s as ``(row_local << W_BITS) |
    col_local`` (row_local < R_ROWS, col_local < W_ROWS); ``w[s, e]`` is the
    edge value. ``meta[s]`` packs ``(st << (win_bits + 1 + LIVE_BITS)) |
    (win << (1 + LIVE_BITS)) | (first << LIVE_BITS) | live`` where ``live``
    is the number of real slots in step s (the serial walk's trip count).
    """

    idx: jax.Array  # i32[S, E_BLK]
    w: jax.Array  # f32[S, E_BLK]
    meta: jax.Array  # i32[S]
    n_out: int
    n_in: int
    n_out_pad: int
    n_in_pad: int
    nnz: int
    win_bits: int
    fill: float = 1.0  # nnz / slot count (diagnostic)

    @property
    def num_steps(self) -> int:
        return self.meta.shape[0]


def gather_mat_from_csr(csr: CSRData, device=None) -> GatherMat:
    """Host-side grouping/padding of a weighted CSR matrix into the
    serial-gather schedule, uploaded to the device. Any edge values."""
    return gather_mat_from_host(gather_schedule_host(csr), device=device)


def gather_schedule_host(csr: CSRData, pad_steps_to: int | None = None) -> dict:
    """The pure-host build: group edges by (super-tile, window), pad into
    E_BLK-slot steps, pack the per-step metadata. Vectorized numpy.
    ``pad_steps_to`` extends the no-op step padding to a fixed count so
    schedules of different blocks stack (the distributed pair)."""
    n_out, n_in = csr.shape
    n_out_pad = round_up(max(n_out, R_ROWS), R_ROWS)
    n_in_pad = round_up(max(n_in, W_ROWS), W_ROWS)
    n_st = n_out_pad // R_ROWS
    n_win = n_in_pad // W_ROWS
    if csr.nnz >= 2**31:
        raise ValueError("graph too large for the single-chip gather build")

    counts = np.diff(csr.indptr).astype(np.int64)
    rows = np.repeat(np.arange(n_out, dtype=np.int32), counts)
    cols = csr.indices.astype(np.int32, copy=False)
    gkey = (rows >> 14).astype(np.int64) * n_win + (cols >> 14)  # R=W=2^14
    gkey = gkey.astype(np.int64)
    order = np.argsort(gkey, kind="stable")  # keeps CSR row order per group
    rows_s = rows[order]
    cols_s = cols[order]
    data_s = csr.data[order].astype(np.float32)
    gkey_s = gkey[order]

    # unique-on-sorted (no re-sort of the full edge set)
    if gkey_s.size:
        change = np.flatnonzero(
            np.concatenate([[True], gkey_s[1:] != gkey_s[:-1]])
        )
        groups = gkey_s[change]
        gcounts = np.diff(np.concatenate([change, [gkey_s.size]]))
    else:
        groups = np.empty(0, np.int64)
        gcounts = np.empty(0, np.int64)
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
        reorder = np.argsort(s_st, kind="stable")
        s_st, s_win = s_st[reorder], s_win[reorder]
        s_e0, s_e1 = s_e0[reorder], s_e1[reorder]

    if s_st.size == 0:  # empty matrix: one dummy zero-init step
        s_st = np.zeros(1, np.int64)
        s_win = np.zeros(1, np.int64)
        s_e0 = s_e1 = np.zeros(1, np.int64)
    # pad the step count to a multiple of 8 (the SMEM edge blocks ship 8
    # steps per fetch) with no-op steps: revisit the last super-tile with
    # live=0 and first=0
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

    idx = np.zeros((S, E_BLK), np.int32)
    w = np.zeros((S, E_BLK), np.float32)
    lane = np.arange(E_BLK, dtype=np.int64)[None, :]
    step_batch = max(1, (1 << 25) // E_BLK)
    for b0 in range(0, S if csr.nnz else 0, step_batch):
        b1 = min(b0 + step_batch, S)
        pos = s_e0[b0:b1, None] + lane
        valid = pos < s_e1[b0:b1, None]
        src = np.where(valid, pos, 0)
        rl = rows_s[src] - (s_st[b0:b1, None] << 14).astype(np.int32)
        cl = cols_s[src] - (s_win[b0:b1, None] << 14).astype(np.int32)
        idx[b0:b1] = np.where(valid, (rl << W_BITS) | cl, 0).astype(np.int32)
        w[b0:b1] = np.where(valid, data_s[src], 0.0)

    return dict(
        idx=idx,
        w=w,
        meta=meta,
        n_out=n_out,
        n_in=n_in,
        n_out_pad=n_out_pad,
        n_in_pad=n_in_pad,
        nnz=csr.nnz,
        win_bits=win_bits,
        fill=float(csr.nnz) / max(S * E_BLK, 1),
    )


def pad_schedule_steps(sched: dict, s_target: int) -> dict:
    """Append no-op steps (revisit the last super-tile, first=0, live=0) to
    a host schedule — O(pad) step-count equalization for stacking block
    schedules, instead of rebuilding the whole schedule."""
    S = int(sched["meta"].shape[0])
    if s_target == S:
        return sched
    if s_target < S or s_target % 8:
        raise ValueError(f"s_target ({s_target}) must be a multiple of 8 >= {S}")
    pad = s_target - S
    win_bits = int(sched["win_bits"])
    last_st = int(sched["meta"][-1]) >> (win_bits + 1 + LIVE_BITS)
    pad_meta = np.full(pad, last_st << (win_bits + 1 + LIVE_BITS), np.int32)
    return {
        **sched,
        "idx": np.concatenate([sched["idx"], np.zeros((pad, E_BLK), np.int32)]),
        "w": np.concatenate([sched["w"], np.zeros((pad, E_BLK), np.float32)]),
        "meta": np.concatenate([np.asarray(sched["meta"]), pad_meta]),
        "fill": float(sched["nnz"]) / max(s_target * E_BLK, 1),
    }


def gather_mat_from_host(sched: dict, device=None) -> GatherMat:
    """Device upload of a host schedule (``gather_schedule_host`` output or
    an npz round-trip of it — the build is pure host work, so callers at
    products scale cache it on disk)."""
    put = lambda x: jax.device_put(x, device) if device is not None else jnp.asarray(x)
    return GatherMat(
        idx=put(np.asarray(sched["idx"])),
        w=put(np.asarray(sched["w"])),
        meta=put(np.asarray(sched["meta"])),
        n_out=int(sched["n_out"]),
        n_in=int(sched["n_in"]),
        n_out_pad=int(sched["n_out_pad"]),
        n_in_pad=int(sched["n_in_pad"]),
        nnz=int(sched["nnz"]),
        win_bits=int(sched["win_bits"]),
        fill=float(sched["fill"]),
    )


UNROLL = 16  # measured: u16 halves the per-edge loop overhead vs u1


def _gather_kernel(meta_ref, idx_ref, w_ref, b_ref, out_ref):
    s = pl.program_id(0)
    m = meta_ref[s]

    @pl.when(((m >> LIVE_BITS) & 1) == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    row8 = s % 8  # the SMEM edge blocks ship 8 steps per fetch

    def slot(i):
        v = idx_ref[row8, i]
        r = v >> W_BITS
        c = v & (W_ROWS - 1)
        wv = w_ref[row8, i]
        row = b_ref[pl.ds(c, 1), :]
        acc = out_ref[pl.ds(r, 1), :]
        out_ref[pl.ds(r, 1), :] = acc + wv * row

    def body(i, _):
        # the over-walked tail slots carry w=0 and (r, c) = (0, 0): harmless
        for k in range(UNROLL):
            slot(i * UNROLL + k)
        return 0

    live = m & ((1 << LIVE_BITS) - 1)
    jax.lax.fori_loop(0, (live + UNROLL - 1) // UNROLL, body, 0)


def _gather_call(mat: GatherMat, b_pad: jax.Array) -> jax.Array:
    """out(n_out_pad, d_pad) f32 = M @ b_pad for f32 b_pad (n_in_pad, d_pad)."""
    if b_pad.shape[1] > D_MAX_G:
        return jnp.concatenate(
            [
                _gather_call(mat, b_pad[:, i : i + D_MAX_G])
                for i in range(0, b_pad.shape[1], D_MAX_G)
            ],
            axis=1,
        )
    n_in_pad, d_pad = b_pad.shape
    S = mat.num_steps
    win_bits = mat.win_bits
    win_mask = (1 << win_bits) - 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # meta
        grid=(S,),
        in_specs=[
            pl.BlockSpec(
                (8, E_BLK), lambda s, meta: (s // 8, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (8, E_BLK), lambda s, meta: (s // 8, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (W_ROWS, d_pad),
                lambda s, meta: ((meta[s] >> (1 + LIVE_BITS)) & win_mask, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (R_ROWS, d_pad),
            lambda s, meta: (meta[s] >> (win_bits + 1 + LIVE_BITS), 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        _gather_kernel,
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
            bytes_accessed=mat.idx.size * 8
            + S * W_ROWS * d_pad * 4
            + mat.n_out_pad * d_pad * 4,
            transcendentals=0,
        ),
    )(mat.meta, mat.idx, mat.w, b_pad)


def spmm_gather(mat: GatherMat, b: jax.Array) -> jax.Array:
    """``C = M @ B`` for row-major B (n_in, d); returns (n_out, d) float32."""
    n, d = b.shape
    if n != mat.n_in:
        raise ValueError(f"B has {n} rows, gather matrix expects {mat.n_in}")
    d_pad = round_up(max(d, 128), 128)
    b_pad = jnp.zeros((mat.n_in_pad, d_pad), jnp.float32)
    b_pad = b_pad.at[:n, :d].set(b.astype(jnp.float32))
    out = _gather_call(mat, b_pad)
    return out[: mat.n_out, :d]


def gather_pair_from_csr_pair(
    csr_fwd: CSRData, csr_bwd: CSRData, **kw
) -> tuple[GatherMat, GatherMat]:
    """(forward Â_T @, backward Â @) pair for already-normalized weighted
    matrices — the gather-kernel analogue of sparse_linear's (A_T, A)
    members (gcn.hpp:13-48)."""
    return gather_mat_from_csr(csr_fwd, **kw), gather_mat_from_csr(csr_bwd, **kw)
