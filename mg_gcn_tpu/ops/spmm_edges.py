"""Edge-tile one-hot SpMM — fast *weighted*-CSR aggregation on the MXU.

This closes the one capability gap vs the reference: cuSPARSE SpMM takes
arbitrary edge values (``cuda_utils.hpp:27-32,94-102``), while the bit-packed
pattern kernels (:mod:`.spmm_pattern`) require a binary adjacency. TPU v5e
has no cross-vreg gather, so a classic gather/scatter SpMM runs at VPU
per-edge speed; this kernel instead routes *everything* through iota
compares and MXU matmuls:

1. Edges are sorted by (output row-tile of height ``br``, 128-column
   operand window) and padded into chunks of K=128 slots per (br x 128)
   sub-tile (padding slots carry weight 0). A grid step processes CPS=8
   chunks of one *outer* tile (br x BCW=4096 operand columns); each chunk
   records which 128-column sub-window of the outer tile it belongs to.
2. Per chunk, two one-hot factors are built with lane-aligned iota
   compares (no transposes, no gathers):

       Hr[r, e] = [row_e == r]          (br, K)
       Hg[c, e] = w_e * [col_e == c]    (128, K)

   and contracted over the edge-slot axis on the MXU:

       M = Hr @ Hgᵀ                     (br, 128) — the dense-materialized
                                        sparse sub-tile, f32 accumulation.
3. One dense matmul applies the chunk: acc += M @ B[chi*128 : +128, :]
   where ``chi`` is the chunk's sub-window index (a scalar read from an
   SMEM-blocked metadata input — Mosaic's scalar core slices the VMEM
   operand block at chi*128, the same dynamic-sublane pattern the
   block-sparse kernel uses).

Cost is O(nnz) compute and memory — no n² term — so this kernel also serves
*binary* graphs too large for the n²/8 pattern store. Measured numbers live
in PERF.md. Design constraints this layout satisfies:

* SMEM holds ~1 MB of scalar-prefetch data: the per-*step* schedule packs
  (row-tile, column-window, first-visit) into ONE i32; outer 4096-wide
  windows keep the step count ~nnz/1000.
* Per-chunk metadata (the sub-window index) would not fit SMEM prefetch;
  it rides as a (S, CPS) SMEM-*blocked* input instead.
* Slot blocks are (CPS, K) per step, statically row-indexed by the
  unrolled chunk loop — legal for 16-bit dtypes (dynamic sublane slicing
  of bf16 at row granularity is not).
* ``br`` is auto-tuned per graph: fill = nnz over padded slots is governed
  by ceil(lambda/K) quantization of the sub-tile edge count lambda =
  br*128*density, so the builder picks the br that maximizes fill per unit
  of per-chunk VPU+MXU cost.
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
from .spmm_pattern import round_up

BC = 128  # operand rows per sub-tile / one-hot width (one lane group)
K = 128  # edge slots per chunk (one lane row)
VALID_BIT = 1 << 30  # slot-word flag: real edge (vs padding)
IDX_MASK = VALID_BIT - 1
RL_MASK = 2047  # row_local bits 7..17 (br <= 2048 == max BR_CANDIDATES)
WQ_SHIFT = 18  # int8 mode: quantized weight rides in idx bits 18..25
WQ_MASK = 255
WQ_BIAS = 128  # stored as wq + 128 (offset-binary; padding decodes to 0)
CPS = 8  # chunks per grid step
BCW = 4096  # operand columns per outer tile (B block height)
D_MAX_E = 256  # feature columns per kernel call (VMEM bound)
MAX_STEPS = 220_000  # SMEM budget: one packed i32 per step, ~1 MB total
BR_CANDIDATES = (512, 640, 768, 896, 1024, 1280, 1536, 2048)
# Bump on ANY change to the schedule builder or the auto-(br, paired)
# picker: disk caches of built schedules key on this. Round 3's bench
# regression (BENCH_r03 weighted 2.13 s vs r02 1.74 s) was a stale cached
# schedule built by the pre-`_pick_br_exact` picker — the cache name held
# only layout constants, so the picker fix never reached the bench.
SCHED_VERSION = 4


def interpret_default() -> bool:
    """Pallas interpret mode off TPU — lets the edge-tile/attention stack
    (and models built on it, e.g. GAT) run on CPU for tests/dryruns."""
    return jax.default_backend() not in ("tpu", "axon")


def slot_valid_mask(idx: jax.Array, dtype=jnp.float32) -> jax.Array:
    """1 on real edge slots, 0 on padding — THE mask for user-supplied
    slot weights (the kernels assume padding slots carry weight 0)."""
    return ((idx >> 30) & 1).astype(dtype)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["idx", "w", "meta", "chi", "row_scale"],
    meta_fields=[
        "n_out",
        "n_in",
        "n_out_pad",
        "n_in_pad",
        "nnz",
        "br",
        "tcw_bits",
        "dtype_name",
        "fill",
        "paired",
    ],
)
@dataclass(frozen=True)
class EdgeTileMat:
    """A weighted sparse matrix as scheduled edge-slot chunks (C = M @ B).

    ``idx[s*CPS + c, e]`` holds slot e of chunk c of step s as
    ``row_local * BC + col_local`` (row_local < br, col_local < 128 within
    the chunk's sub-window); ``w`` holds the edge value (0 for padding
    slots). ``meta[s]`` packs the per-step schedule
    ``(tr << (tcw_bits+1)) | (tcw << 1) | first``; ``chi[s, c]`` is chunk
    c's 128-column sub-window within the outer tile (0..BCW/128-1).

    int8 mode (``dtype_name="int8"``): edge weights are quantized per
    output row (symmetric, scale = max|row|/127) and the quantized value
    rides inside the idx word (bits 18..25, offset-binary) — ``w`` is None
    and ``row_scale`` carries the (n_out,) f32 dequant scales. Both MXU
    matmuls then run at the 2× int8 rate; the only approximation is the
    8-bit rounding of weights and of the per-feature-quantized operand.
    """

    idx: jax.Array  # i32[S*CPS, K]
    w: jax.Array | None  # cdtype[S*CPS, K]; None in int8 mode
    meta: jax.Array  # i32[S]
    chi: jax.Array  # i32[S, CPS]
    n_out: int
    n_in: int
    n_out_pad: int
    n_in_pad: int
    nnz: int
    br: int
    tcw_bits: int
    dtype_name: str = "bfloat16"
    fill: float = 1.0  # nnz / slot count (diagnostic)
    paired: bool = False  # chunk pairs share chi -> one apply per pair
    row_scale: jax.Array | None = None  # f32[n_out], int8 mode only

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype_name)

    @property
    def num_steps(self) -> int:
        return self.meta.shape[0]


def _pick_br(n_out: int, n_in: int, nnz: int) -> tuple[int, bool]:
    """Choose (row-tile height, chunk pairing): maximize slot fill per
    per-chunk cost.

    fill(br) = lam / (ceil(lam/K)*K) with lam = br*BC*density (the mean
    sub-tile edge count); per-slot cost grows ~linearly in br (Hr compare +
    two (br,128)-shaped matmuls). ``paired`` rounds each sub-tile's chunk
    count up to even so chunk pairs share their apply sub-window — one M@B
    per pair (~25% less MXU at d=128) for a little fill. The score
    constants reproduce the measured cost slope (PERF.md)."""
    density = nnz / max(n_out * n_in, 1)
    best, best_score = (BR_CANDIDATES[0], False), -1.0
    for br in BR_CANDIDATES:
        lam = br * BC * density
        chunks = np.ceil(max(lam, 1e-9) / K)
        for paired in (False, True):
            eff_chunks = chunks + (chunks % 2) if paired else chunks
            fill = lam / (eff_chunks * K)
            # per-slot: ~1 VPU+Mmm unit scaling with br, apply halved when
            # paired (measured slope: 2.12 cyc/slot at br=640 unpaired)
            cost = (0.75 + br / 512.0) + (0.125 if paired else 0.25) * br / 512.0
            score = fill / cost
            if score > best_score + 1e-9:
                best, best_score = (br, paired), score
    return best


def _pick_br_exact(rows: np.ndarray, cols: np.ndarray, n_in: int) -> tuple[int, bool]:
    """Measured-fill variant of :func:`_pick_br`: scores every candidate by
    the TRUE chunk count (bincount of the sub-tile key) instead of the
    mean-density Poisson model — the model picks badly on clustered graphs
    whose cell counts are bimodal (the planted-community bench graph filled
    0.62 at the modeled br=896 vs 0.85 at the exact-picked br=1536)."""
    n_in_pad = round_up(max(n_in, BCW), BCW)
    n_sub = n_in_pad // BC
    csub = (cols >> 7).astype(np.int64)
    best, best_score = (BR_CANDIDATES[0], False), -1.0
    for br in BR_CANDIDATES:
        skey = (rows // br).astype(np.int64) * n_sub + csub
        counts = np.bincount(skey)
        chunks = -(-counts[counts > 0] // K)
        nnz = rows.size
        for paired in (False, True):
            eff = int(chunks.sum() + (chunks % 2).sum()) if paired else int(chunks.sum())
            fill = nnz / max(eff * K, 1)
            cost = (0.75 + br / 512.0) + (0.125 if paired else 0.25) * br / 512.0
            score = fill / cost
            if score > best_score + 1e-9:
                best, best_score = (br, paired), score
    return best


def expected_fill(n_out: int, n_in: int, nnz: int) -> float:
    """Mean slot fill the auto-tuned schedule would reach — the dispatch
    signal between this kernel and the serial-gather one (spmm_gather):
    measured crossover is ~2.3/fill vs ~7.8 cyc/edge, i.e. fill ~0.3."""
    br, paired = _pick_br(n_out, n_in, nnz)
    density = nnz / max(n_out * n_in, 1)
    lam = br * BC * density
    chunks = np.ceil(max(lam, 1e-9) / K)
    if paired:
        chunks += chunks % 2
    return float(lam / (chunks * K))


def edge_tile_mat_from_csr(
    csr: CSRData,
    dtype: str = "bfloat16",
    br: int | None = None,
    paired: bool | None = None,
    device=None,
    pad_steps_to: int | None = None,
) -> EdgeTileMat:
    """Host-side tiling/chunking/padding of a weighted CSR matrix, uploaded
    to the device. Works for any edge values (the cuSPARSE-generality parity
    path)."""
    return edge_tile_mat_from_host(
        edge_tile_schedule_host(
            csr, dtype=dtype, br=br, paired=paired, pad_steps_to=pad_steps_to
        ),
        device=device,
    )


def edge_tile_schedule_host(
    csr: CSRData,
    dtype: str = "bfloat16",
    br: int | None = None,
    paired: bool | None = None,
    pad_steps_to: int | None = None,
) -> dict:
    """The pure-host build (vectorized numpy; edges radix-sorted by sub-tile
    id) — cacheable on disk and uploaded via ``edge_tile_mat_from_host``."""
    n_out, n_in = csr.shape
    if br is None or paired is None:
        if csr.nnz:
            # exact fill per candidate (two cheap passes each) — the mean-
            # density model misjudges clustered graphs (see _pick_br_exact)
            _rows = np.repeat(
                np.arange(n_out, dtype=np.int32),
                np.diff(csr.indptr).astype(np.int64),
            )
            auto_br, auto_paired = _pick_br_exact(_rows, csr.indices, n_in)
            del _rows
        else:
            auto_br, auto_paired = _pick_br(n_out, n_in, csr.nnz)
        br = auto_br if br is None else br
        paired = auto_paired if paired is None else paired
    if br % 8 or br <= 0:
        raise ValueError("br must be a positive multiple of 8")
    if br > RL_MASK + 1:
        raise ValueError(
            f"br ({br}) exceeds {RL_MASK + 1}: row_local must fit idx bits "
            "7..17 (the int8 mode packs quantized weights above them)"
        )
    n_out_pad = round_up(max(n_out, br), br)
    n_in_pad = round_up(max(n_in, BCW), BCW)
    n_tr = n_out_pad // br
    n_sub = n_in_pad // BC  # global 128-col sub-windows
    n_tcw = n_in_pad // BCW
    wsub = BCW // BC  # sub-windows per outer tile

    # int32 edge temporaries: single-chip schedules cap n and nnz well
    # below 2^31, and this host first-touches memory slowly (NOTES.md)
    if csr.nnz >= 2**31 or n_tr * n_sub >= 2**31:
        raise ValueError("graph too large for the single-chip edge-tile build")
    counts = np.diff(csr.indptr).astype(np.int64)
    rows = np.repeat(np.arange(n_out, dtype=np.int32), counts)
    cols = csr.indices.astype(np.int32, copy=False)
    int8_mode = dtype == "int8"
    row_scale = None
    wq = None
    if int8_mode:
        # per-output-row symmetric scale: max|w| over the row's edges
        # (empty rows keep scale 1; reduceat over nonzero-row starts is
        # exact because empty rows add nothing between consecutive starts)
        absd = np.abs(csr.data.astype(np.float32))
        row_scale = np.ones(n_out, np.float32)
        nz = counts > 0
        if absd.size and nz.any():
            row_scale[nz] = np.maximum.reduceat(absd, csr.indptr[:-1][nz])
        row_scale = np.maximum(row_scale, 1e-30)
        wq = np.clip(
            np.rint(csr.data.astype(np.float32) / row_scale[rows] * 127.0),
            -127,
            127,
        ).astype(np.int32)
    native_lib = None
    try:
        from .. import native as native_lib  # C++/OpenMP fast path

        if not native_lib.available():
            native_lib = None
    except ImportError:
        native_lib = None
    if native_lib is not None:
        # single fused expand+key+stable-counting-sort pass — bit-identical
        # to the numpy argsort(kind="stable") path (csrc/mggcn_host.cpp)
        rows_s, cols_s, data_s, wq_s, skey_s = native_lib.edge_sort(
            csr, wq, br, n_sub, n_tr
        )
    else:
        skey = (rows // br).astype(np.int64) * n_sub + (cols // BC)
        skey = skey.astype(np.int32)  # < n_tr * n_sub < 2^31
        order = np.argsort(skey, kind="stable")
        rows_s = rows[order]
        cols_s = cols[order]
        data_s = csr.data[order].astype(np.float32)
        wq_s = wq[order] if int8_mode else None
        skey_s = skey[order]

    # unique-on-sorted without np.unique's internal re-sort of 10^8 keys
    if skey_s.size:
        change = np.flatnonzero(
            np.concatenate([[True], skey_s[1:] != skey_s[:-1]])
        )
        subs = skey_s[change].astype(np.int64)
        scounts = np.diff(np.concatenate([change, [skey_s.size]]))
    else:
        subs = np.empty(0, np.int64)
        scounts = np.empty(0, np.int64)
    sstart = np.concatenate([[0], np.cumsum(scounts)])[:-1]
    chunks_of = -(-scounts // K)  # ceil: chunks per sub-tile
    if paired:
        # even chunk count per sub-tile: pairs (2k, 2k+1) then share chi
        # everywhere (the outer-tile CPS=8 padding is even too)
        chunks_of = chunks_of + (chunks_of % 2)
    # per-chunk arrays (sorted by (tr, tcw, chi) because subs is sorted)
    c_sub = np.repeat(subs, chunks_of)
    c_rank = np.arange(c_sub.size) - np.repeat(
        np.cumsum(chunks_of) - chunks_of, chunks_of
    )
    c_e0 = np.repeat(sstart, chunks_of) + c_rank * K
    c_e1 = np.minimum(c_e0 + K, np.repeat(sstart + scounts, chunks_of))
    c_tr = c_sub // n_sub
    c_gsub = c_sub % n_sub
    c_tcw = c_gsub // wsub
    c_chi = c_gsub % wsub

    # group chunks into steps of CPS within each (tr, tcw) outer tile:
    # pad each outer tile's chunk list to a multiple of CPS with empty
    # chunks (chi=0, w=0)
    okey = c_tr * n_tcw + c_tcw
    outers, ocounts = np.unique(okey, return_counts=True)
    steps_of = -(-ocounts // CPS)
    ostart = np.concatenate([[0], np.cumsum(ocounts)])[:-1]
    # chunk slot grid: for outer tile o, steps_of[o]*CPS chunk slots
    cs_outer = np.repeat(np.arange(outers.size), steps_of * CPS)
    cs_rank = np.arange(cs_outer.size) - np.repeat(
        np.cumsum(steps_of * CPS) - steps_of * CPS, steps_of * CPS
    )
    cs_src = ostart[cs_outer] + np.minimum(cs_rank, ocounts[cs_outer] - 1)
    cs_valid = cs_rank < ocounts[cs_outer]

    # per-step schedule (+ dummy steps for row-tiles with no edges, whose
    # output blocks must still be zero-initialized exactly once)
    s_outer = np.repeat(outers, steps_of)
    s_tr = s_outer // n_tcw
    s_tcw = s_outer % n_tcw
    present_tr = np.unique(s_tr) if s_tr.size else np.empty(0, np.int64)
    missing_tr = np.setdiff1d(np.arange(n_tr, dtype=np.int64), present_tr)
    if missing_tr.size:
        n_real = s_tr.size
        s_tr = np.concatenate([s_tr, missing_tr])
        s_tcw = np.concatenate([s_tcw, np.zeros(missing_tr.size, np.int64)])
        reorder = np.argsort(s_tr, kind="stable")
        s_tr, s_tcw = s_tr[reorder], s_tcw[reorder]
        # dummy steps carry all-invalid chunk slots; splice the real steps'
        # chunk-slot rows into their new positions
        real = reorder < n_real  # position -> was a real step
        cs_valid2 = np.zeros((s_tr.size, CPS), bool)
        cs_src2 = np.zeros((s_tr.size, CPS), np.int64)
        cs_valid2[real] = cs_valid.reshape(-1, CPS)[reorder[real]]
        cs_src2[real] = cs_src.reshape(-1, CPS)[reorder[real]]
        cs_src, cs_valid = cs_src2.reshape(-1), cs_valid2.reshape(-1)
    # pad the step count to a multiple of 8 with no-op steps (the chi SMEM
    # block ships 8 steps per fetch); no-ops revisit the last row-tile with
    # zero-weight slots and first=0
    S_real = s_tr.size
    S = round_up(max(S_real, 1), 8)
    if pad_steps_to is not None:
        if pad_steps_to % 8 or pad_steps_to < S:
            raise ValueError(
                f"pad_steps_to ({pad_steps_to}) must be a multiple of 8 and "
                f">= the natural step count ({S})"
            )
        S = pad_steps_to
    if S > S_real:
        pad = S - S_real
        pad_tr = s_tr[-1] if S_real else 0
        s_tr = np.concatenate([s_tr, np.full(pad, pad_tr, np.int64)])
        s_tcw = np.concatenate([s_tcw, np.zeros(pad, np.int64)])
        cs_src = np.concatenate([cs_src, np.zeros(pad * CPS, np.int64)])
        cs_valid = np.concatenate([cs_valid, np.zeros(pad * CPS, bool)])
    first = np.ones(S, np.int32)
    if S > 1:
        first[1:] = (s_tr[1:] != s_tr[:-1]).astype(np.int32)

    tcw_bits = max(int(np.ceil(np.log2(max(n_tcw, 2)))), 1)
    tr_bits = max(int(np.ceil(np.log2(max(n_tr, 2)))), 1)
    if tr_bits + tcw_bits + 1 > 31:
        raise ValueError(
            f"graph too large for the single-chip edge-tile schedule "
            f"({n_tr} row-tiles x {n_tcw} column windows); shard it first "
            "(parallel.dist / dist_halo)"
        )
    if S > MAX_STEPS:
        raise ValueError(
            f"edge-tile schedule has {S} steps (> {MAX_STEPS}, the ~1 MB "
            "SMEM prefetch budget); increase br or shard the graph"
        )
    meta = ((s_tr.astype(np.int64) << (tcw_bits + 1)) | (s_tcw << 1) | first).astype(
        np.int32
    )

    # per-chunk chi (sub-window) + slot arrays
    chi = np.zeros(S * CPS, np.int32)
    if c_e0.size:
        valid_chunk = cs_valid
        chi[valid_chunk] = c_chi[cs_src[valid_chunk]]
        chunk_e0 = np.where(valid_chunk, c_e0[cs_src], 0)
        chunk_e1 = np.where(valid_chunk, c_e1[cs_src], 0)
        chunk_tr = np.where(valid_chunk, c_tr[cs_src], 0)
        chunk_gsub = np.where(valid_chunk, c_gsub[cs_src], 0)
    else:
        chunk_e0 = chunk_e1 = chunk_tr = chunk_gsub = np.zeros(S * CPS, np.int64)

    if native_lib is not None and csr.nnz:
        idx16, w32 = native_lib.edge_fill(
            chunk_e0, chunk_e1, chunk_tr, chunk_gsub,
            rows_s, cols_s, data_s, wq_s if int8_mode else None,
            K, BC, br, VALID_BIT, WQ_SHIFT, WQ_BIAS,
        )
        return dict(
            idx=idx16,
            w=w32,
            meta=meta,
            chi=chi.reshape(S, CPS),
            n_out=n_out,
            n_in=n_in,
            n_out_pad=n_out_pad,
            n_in_pad=n_in_pad,
            nnz=csr.nnz,
            br=br,
            tcw_bits=tcw_bits,
            dtype_name=dtype,
            fill=float(csr.nnz) / max(S * CPS * K, 1),
            paired=paired,
            row_scale=row_scale,
        )
    idx16 = np.zeros((S * CPS, K), np.int32)
    w32 = np.zeros((S * CPS, K) if not int8_mode else (0,), np.float32)
    total_chunks = S * CPS
    chunk_batch = max(1, (1 << 25) // K)
    lane = np.arange(K, dtype=np.int64)[None, :]
    for b0 in range(0, total_chunks if csr.nnz else 0, chunk_batch):
        b1 = min(b0 + chunk_batch, total_chunks)
        pos = chunk_e0[b0:b1, None] + lane
        valid = pos < chunk_e1[b0:b1, None]
        src = np.where(valid, pos, 0)
        rl = rows_s[src] - chunk_tr[b0:b1, None] * br
        cl = cols_s[src] - chunk_gsub[b0:b1, None] * BC
        # bit 30 marks real (non-padding) slots — the SpMM ignores it (its
        # padding weight is 0 anyway) but SDDMM masks its outputs with it
        base = (rl * BC + cl) | VALID_BIT
        if int8_mode:
            # the quantized weight rides in the idx word; the kernel
            # decodes it offset-binary and masks by the valid bit, so
            # padding words stay all-zero
            base = base | ((wq_s[src] + WQ_BIAS) << WQ_SHIFT)
        idx16[b0:b1] = np.where(valid, base, 0).astype(np.int32)
        if not int8_mode:
            w32[b0:b1] = np.where(valid, data_s[src], 0.0)

    return dict(
            idx=idx16,
            w=w32,
            meta=meta,
            chi=chi.reshape(S, CPS),
            n_out=n_out,
            n_in=n_in,
            n_out_pad=n_out_pad,
            n_in_pad=n_in_pad,
            nnz=csr.nnz,
            br=br,
            tcw_bits=tcw_bits,
            dtype_name=dtype,
            fill=float(csr.nnz) / max(S * CPS * K, 1),
            paired=paired,
            row_scale=row_scale,
    )


def edge_tile_mat_from_host(sched: dict, device=None) -> EdgeTileMat:
    """Device upload of a host-built schedule (the dict the builder makes —
    or an npz round-trip of it; the tiling is pure host work, so callers at
    Reddit scale can cache it on disk). ``w`` is f32 on the host and cast to
    the schedule's compute dtype on upload."""
    put = lambda x: jax.device_put(x, device) if device is not None else jnp.asarray(x)
    dtype = str(sched["dtype_name"])
    row_scale = None
    if dtype == "int8":
        w_dev = None  # quantized weights ride inside the idx words
        row_scale = put(np.asarray(sched["row_scale"], np.float32))
    else:
        cdtype = jnp.dtype(dtype)
        w32 = np.asarray(sched["w"])
        if cdtype == jnp.bfloat16:
            import ml_dtypes

            w_dev = put(w32.astype(ml_dtypes.bfloat16))
        elif cdtype == jnp.float32:
            w_dev = put(w32)
        else:
            raise ValueError(f"unsupported edge-tile dtype {dtype!r}")
    return EdgeTileMat(
        idx=put(np.asarray(sched["idx"])),
        w=w_dev,
        meta=put(np.asarray(sched["meta"])),
        chi=put(np.asarray(sched["chi"])),
        n_out=int(sched["n_out"]),
        n_in=int(sched["n_in"]),
        n_out_pad=int(sched["n_out_pad"]),
        n_in_pad=int(sched["n_in_pad"]),
        nnz=int(sched["nnz"]),
        br=int(sched["br"]),
        tcw_bits=int(sched["tcw_bits"]),
        dtype_name=dtype,
        fill=float(sched["fill"]),
        paired=bool(sched["paired"]),
        row_scale=row_scale,
    )


def _edge_kernel(
    meta_ref, chi_ref, idx_ref, w_ref, b_ref, out_ref, *, br, cdtype, paired
):
    s = pl.program_id(0)

    @pl.when((meta_ref[s] & 1) == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # f32 mode is the exact path: force full-precision MXU passes (the
    # default lets XLA run f32 matmuls as single bf16 passes)
    prec = jax.lax.Precision.HIGHEST if cdtype == jnp.float32 else None
    acc = out_ref[:]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (br, K), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (BC, K), 0)

    def chunk_m(c):
        v = idx_ref[c : c + 1, :] & IDX_MASK  # (1, K) i32: rl*BC + cl
        rl = v >> 7  # BC = 128
        cl = v & (BC - 1)
        wv = w_ref[c : c + 1, :]
        if wv.dtype != jnp.float32:
            wv = wv.astype(jnp.float32)
        # compares/selects stay in i32/f32 (Mosaic v5e cannot relayout the
        # i1 mask to 16-bit tiling); cast to the MXU dtype afterwards
        hr = (iota_r == rl).astype(jnp.float32).astype(cdtype)  # (br, K)
        hg = jnp.where(iota_c == cl, wv, 0.0).astype(cdtype)  # (BC, K)
        # contract the edge-slot axis: M[r, c] = sum_e Hr[r,e]*Hg[c,e]
        return jax.lax.dot_general(
            hr,
            hg,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    def apply(m, c):
        bsub = b_ref[pl.ds(chi_ref[s % 8, c] * BC, BC), :]
        return jnp.dot(
            m.astype(cdtype), bsub, preferred_element_type=jnp.float32, precision=prec
        )

    if paired:
        # chunk pairs share their apply sub-window (host-enforced even
        # chunk counts per sub-tile): one M@B per pair
        for p in range(CPS // 2):
            m = chunk_m(2 * p) + chunk_m(2 * p + 1)
            acc += apply(m, 2 * p)
    else:
        for c in range(CPS):
            acc += apply(chunk_m(c), c)
    out_ref[:] = acc


def _edge_kernel_i8(meta_ref, chi_ref, idx_ref, b_ref, out_ref, *, br, paired):
    """int8 variant: quantized weights decoded from the idx words; both
    matmuls run int8×int8→int32 (2× the bf16 MXU rate). The materialized
    sub-tile is exact in quantized units (one edge per cell — duplicate
    CSR entries would sum and clip at ±127)."""
    s = pl.program_id(0)

    @pl.when((meta_ref[s] & 1) == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    acc = out_ref[:]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (br, K), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (BC, K), 0)

    def chunk_m(c):
        v = idx_ref[c : c + 1, :]  # (1, K) i32
        rl = (v >> 7) & RL_MASK
        cl = v & (BC - 1)
        # offset-binary weight, masked by the valid bit so any padding
        # word (all-zero included) decodes to weight 0
        wq = (((v >> WQ_SHIFT) & WQ_MASK) - WQ_BIAS) * ((v >> 30) & 1)
        hr = jnp.where(iota_r == rl, 1, 0).astype(jnp.int8)  # (br, K)
        hg = jnp.where(iota_c == cl, wq, 0).astype(jnp.int8)  # (BC, K)
        return jax.lax.dot_general(
            hr, hg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )  # (br, BC) i32 == quantized sub-tile

    def apply(m, c):
        bsub = b_ref[pl.ds(chi_ref[s % 8, c] * BC, BC), :]
        m8 = jnp.clip(m, -127, 127).astype(jnp.int8)
        return jnp.dot(m8, bsub, preferred_element_type=jnp.int32)

    if paired:
        for p in range(CPS // 2):
            acc += apply(chunk_m(2 * p) + chunk_m(2 * p + 1), 2 * p)
    else:
        for c in range(CPS):
            acc += apply(chunk_m(c), c)
    out_ref[:] = acc


def _edge_call(mat: EdgeTileMat, b_pad: jax.Array) -> jax.Array:
    """out(n_out_pad, d_pad) = M @ b_pad for b_pad (n_in_pad, d_pad)
    already in compute dtype (f32 out; i32 in int8 mode — the wrapper
    dequants)."""
    if b_pad.shape[1] > D_MAX_E:
        return jnp.concatenate(
            [
                _edge_call(mat, b_pad[:, i : i + D_MAX_E])
                for i in range(0, b_pad.shape[1], D_MAX_E)
            ],
            axis=1,
        )
    n_in_pad, d_pad = b_pad.shape
    S = mat.num_steps
    br = mat.br
    tcw_bits = mat.tcw_bits
    tcw_mask = (1 << tcw_bits) - 1
    int8_mode = mat.compute_dtype == jnp.int8
    in_specs = [
        pl.BlockSpec(
            (8, CPS), lambda s, meta: (s // 8, 0), memory_space=pltpu.SMEM
        ),
        pl.BlockSpec((CPS, K), lambda s, meta: (s, 0), memory_space=pltpu.VMEM),
    ]
    if not int8_mode:
        in_specs.append(
            pl.BlockSpec((CPS, K), lambda s, meta: (s, 0), memory_space=pltpu.VMEM)
        )
    in_specs.append(
        pl.BlockSpec(
            (BCW, d_pad),
            lambda s, meta: ((meta[s] >> 1) & tcw_mask, 0),
            memory_space=pltpu.VMEM,
        )
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (br, d_pad),
            lambda s, meta: (meta[s] >> (tcw_bits + 1), 0),
            memory_space=pltpu.VMEM,
        ),
    )
    if int8_mode:
        kernel = functools.partial(_edge_kernel_i8, br=br, paired=mat.paired)
        operands = (mat.meta, mat.chi, mat.idx, b_pad)
        out_dtype = jnp.int32
        w_bytes = 0
    else:
        kernel = functools.partial(
            _edge_kernel, br=br, cdtype=mat.compute_dtype, paired=mat.paired
        )
        operands = (mat.meta, mat.chi, mat.idx, mat.w, b_pad)
        out_dtype = jnp.float32
        w_bytes = mat.w.size * mat.w.dtype.itemsize
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mat.n_out_pad, d_pad), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * S * CPS * (br * BC * K + br * BC * d_pad),
            bytes_accessed=mat.idx.size * 4
            + w_bytes
            + S * BCW * d_pad * b_pad.dtype.itemsize
            + mat.n_out_pad * d_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret_default(),
    )(*operands)


def spmm_edge_tiles(mat: EdgeTileMat, b: jax.Array) -> jax.Array:
    """``C = M @ B`` for row-major B (n_in, d); returns (n_out, d) float32.

    int8 mode quantizes B per feature on device (symmetric, scale =
    max|column|/127, the pattern-kernel convention) and dequants the int32
    accumulator with ``row_scale[r] · col_scale[j] / 127`` — error is the
    8-bit rounding of weights and operand only."""
    n, d = b.shape
    if n != mat.n_in:
        raise ValueError(f"B has {n} rows, edge-tile matrix expects {mat.n_in}")
    cdtype = mat.compute_dtype
    d_pad = round_up(max(d, 128), 128)
    if cdtype == jnp.int8:
        b32 = b.astype(jnp.float32)
        qscale = jnp.maximum(jnp.max(jnp.abs(b32), axis=0), 1e-30) / 127.0
        bq = jnp.clip(jnp.round(b32 / qscale[None, :]), -127, 127).astype(jnp.int8)
        b_pad = jnp.zeros((mat.n_in_pad, d_pad), jnp.int8).at[:n, :d].set(bq)
        out = _edge_call(mat, b_pad).astype(jnp.float32)
        return (
            out[: mat.n_out, :d]
            * (mat.row_scale[:, None] / 127.0)
            * qscale[None, :]
        )
    b_pad = jnp.zeros((mat.n_in_pad, d_pad), cdtype)
    b_pad = b_pad.at[:n, :d].set(b.astype(cdtype))
    out = _edge_call(mat, b_pad)
    return out[: mat.n_out, :d]


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["s0", "tmeta"],
    meta_fields=["tcw0", "n_win"],
)
@dataclass(frozen=True)
class TSched:
    """Transposed step schedule over an :class:`EdgeTileMat`'s slot arrays.

    Reorders the matrix's grid steps by (column window, row-tile) so the
    *transposed* product ``C = Mᵀ @ X`` accumulates output blocks (indexed
    by column window) across consecutive steps — the same slot data, a
    different visit order. ``s0[s]`` is the original step id (indexes the
    idx/w/chi blocks); ``tmeta[s]`` packs ``(tr << (tcw_bits + 2)) |
    (tcw << 2) | (first << 1) | dummy`` (dummy steps zero-init windows no
    edge touches).

    ``tcw0``/``n_win`` restrict the schedule to the column-window range
    ``[tcw0, tcw0 + n_win)`` — one part of a SPLIT transposed schedule
    (``transposed_schedule(..., auto_split=True)``), whose kernel call
    emits only that range's ``n_win · BCW`` output rows. ``n_win = 0``
    means the full range (a whole-matrix schedule). Splitting is what fits
    headline-scale attention in the per-call SMEM prefetch budget: each
    part carries its own two prefetch words per step.
    """

    s0: jax.Array  # i32[S2]
    tmeta: jax.Array  # i32[S2]
    tcw0: int = 0
    n_win: int = 0  # 0 = all column windows

    @property
    def num_steps(self) -> int:
        return self.s0.shape[0]


def pad_edge_schedule(sched: dict, s_target: int) -> dict:
    """Append no-op steps (revisit the last row-tile with zero-weight
    slots, first=0) to a host edge-tile schedule — O(pad) step-count
    equalization for stacking block schedules."""
    S = int(sched["meta"].shape[0])
    if s_target == S:
        return sched
    if s_target < S or s_target % 8:
        raise ValueError(f"s_target ({s_target}) must be a multiple of 8 >= {S}")
    pad = s_target - S
    tcw_bits = int(sched["tcw_bits"])
    last_tr = int(sched["meta"][-1]) >> (tcw_bits + 1)
    pad_meta = np.full(pad, last_tr << (tcw_bits + 1), np.int32)
    w = np.asarray(sched["w"])
    if w.size:  # int8 schedules carry no slot-weight array
        w = np.concatenate([w, np.zeros((pad * CPS, K), np.float32)])
    return {
        **sched,
        "idx": np.concatenate(
            [sched["idx"], np.zeros((pad * CPS, K), np.int32)]
        ),
        "w": w,
        "meta": np.concatenate([np.asarray(sched["meta"]), pad_meta]),
        "chi": np.concatenate([sched["chi"], np.zeros((pad, CPS), np.int32)]),
        "fill": float(sched["nnz"]) / max(s_target * CPS * K, 1),
    }


def transposed_schedule_host(
    sched: dict, pad_steps_to: int | None = None
) -> dict:
    """Host core of :func:`transposed_schedule`, from a host schedule dict;
    returns {"s0", "tmeta"} numpy arrays."""
    return _transposed_core(
        np.asarray(sched["meta"]),
        int(sched["tcw_bits"]),
        int(sched["n_in_pad"]),
        int(sched["n_out_pad"]),
        int(sched["br"]),
        pad_steps_to,
    )


def transposed_step_words(meta: np.ndarray, tcw_bits: int, n_in_pad: int) -> int:
    """Host-side SMEM cost of the whole-matrix transposed schedule: two
    prefetch words per step, including the dummy zero-init steps for
    edge-free column windows — the quantity checked against ``MAX_STEPS``.
    Lets callers (bench/dispatch) decide deterministically whether a
    single-call transposed schedule fits BEFORE building anything
    (VERDICT r4 weak #6: the cap must be arithmetic, not an exception
    string)."""
    meta = np.asarray(meta)
    tcw = (meta >> 1) & ((1 << tcw_bits) - 1)
    n_tcw = n_in_pad // BCW
    missing = n_tcw - np.unique(tcw).size
    return 2 * (meta.shape[0] + missing)


def transposed_schedule(
    mat: EdgeTileMat,
    device=None,
    pad_steps_to: int | None = None,
    auto_split: bool = False,
) -> "TSched | tuple[TSched, ...]":
    """Build the (tcw-major) step reorder for ``spmm_edge_tiles_t``.

    The transposed product writes (BCW, d) output blocks per column window;
    grouping steps by tcw makes those revisits consecutive (Pallas
    accumulation semantics). Host cost is one argsort of S step ids.

    ``auto_split=True``: when the single-call schedule would exceed the
    per-call SMEM prefetch budget (2 words/step vs ``MAX_STEPS``), split
    the column-window space into the fewest contiguous ranges whose parts
    each fit, and return a tuple of range-restricted TScheds —
    ``spmm_edge_tiles_t`` runs one kernel call per part and concatenates
    the output rows. Each step of the original schedule appears in exactly
    one part (steps are partitioned by their column window), so the split
    does no extra slot work — it only re-pays the per-call fixed cost.
    Headline-scale attention (2·S ≈ 330k words > 220k at Reddit scale,
    BENCH_r04's recorded cap) runs in 2 parts."""
    meta_h = np.asarray(mat.meta)
    put = lambda x: jax.device_put(x, device) if device is not None else jnp.asarray(x)
    n_tcw = mat.n_in_pad // BCW
    words = transposed_step_words(meta_h, mat.tcw_bits, mat.n_in_pad)
    if not auto_split or words <= MAX_STEPS:
        core = _transposed_core(
            meta_h, mat.tcw_bits, mat.n_in_pad, mat.n_out_pad,
            mat.br, pad_steps_to,
        )
        return TSched(s0=put(core["s0"]), tmeta=put(core["tmeta"]))
    if pad_steps_to is not None:
        raise ValueError("pad_steps_to is incompatible with auto_split parts")
    # greedy window partition: accumulate windows until the part's word
    # count (2 per step, +1 dummy step per window worst case) would exceed
    # the budget — every emitted part fits by construction; a single window
    # larger than the budget is a genuine "shard the graph" condition and
    # raises below
    tcw = (meta_h >> 1) & ((1 << mat.tcw_bits) - 1)
    per_win_words = 2 * (np.bincount(tcw, minlength=n_tcw).astype(np.int64) + 1)
    budget = int(MAX_STEPS * 0.98)
    bounds = [0]
    acc = 0
    for w in range(n_tcw):
        if acc and acc + per_win_words[w] > budget:
            bounds.append(w)
            acc = 0
        acc += int(per_win_words[w])
    bounds.append(n_tcw)
    out = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        core = _transposed_core(
            meta_h, mat.tcw_bits, mat.n_in_pad, mat.n_out_pad,
            mat.br, None, tcw_range=(lo, hi),
        )
        out.append(
            TSched(
                s0=put(core["s0"]), tmeta=put(core["tmeta"]),
                tcw0=lo, n_win=hi - lo,
            )
        )
    return tuple(out)


def _transposed_core(
    meta: np.ndarray,
    tcw_bits: int,
    n_in_pad: int,
    n_out_pad: int,
    br: int,
    pad_steps_to: int | None,
    tcw_range: tuple[int, int] | None = None,
) -> dict:
    tcw_all = (meta >> 1) & ((1 << tcw_bits) - 1)
    tr_all = meta.astype(np.int64) >> (tcw_bits + 1)
    if tcw_range is not None:
        # one part of a split schedule: only the steps whose column window
        # falls in [lo, hi); s0 keeps GLOBAL step ids (the idx/w/chi blocks
        # are shared), tmeta keeps the GLOBAL tcw (the kernel's out index
        # map subtracts tcw0)
        lo, hi = tcw_range
        keep = np.flatnonzero((tcw_all >= lo) & (tcw_all < hi))
        tcw = tcw_all[keep]
        tr = tr_all[keep]
        win_lo, win_hi = lo, hi
    else:
        keep = None
        tcw, tr = tcw_all, tr_all
        win_lo, win_hi = 0, n_in_pad // BCW
    order = np.argsort(tcw, kind="stable")  # steps already tr-major
    s0 = (keep[order] if keep is not None else order).astype(np.int64)
    t_tcw = tcw[order].astype(np.int64)
    t_tr = tr[order]
    dummy = np.zeros(s0.size, np.int64)
    # dummy zero-init steps for column windows with no edges
    missing = np.setdiff1d(
        np.arange(win_lo, win_hi, dtype=np.int64), np.unique(t_tcw)
    )
    if missing.size:
        s0 = np.concatenate([s0, np.zeros(missing.size, np.int64)])
        t_tcw = np.concatenate([t_tcw, missing])
        t_tr = np.concatenate([t_tr, np.zeros(missing.size, np.int64)])
        dummy = np.concatenate([dummy, np.ones(missing.size, np.int64)])
        reorder = np.argsort(t_tcw, kind="stable")
        s0, t_tcw, t_tr, dummy = s0[reorder], t_tcw[reorder], t_tr[reorder], dummy[reorder]
    first = np.ones(t_tcw.size, np.int64)
    if t_tcw.size > 1:
        first[1:] = (t_tcw[1:] != t_tcw[:-1]).astype(np.int64)
    if pad_steps_to is not None:
        if pad_steps_to < t_tcw.size:
            raise ValueError(
                f"pad_steps_to ({pad_steps_to}) < natural transposed step "
                f"count ({t_tcw.size})"
            )
        pad = pad_steps_to - t_tcw.size
        if pad:
            # no-op steps: dummy=1 with first=0 (no zero-init, no compute)
            s0 = np.concatenate([s0, np.zeros(pad, np.int64)])
            t_tcw = np.concatenate([t_tcw, np.full(pad, t_tcw[-1], np.int64)])
            t_tr = np.concatenate([t_tr, np.zeros(pad, np.int64)])
            dummy = np.concatenate([dummy, np.ones(pad, np.int64)])
            first = np.concatenate([first, np.zeros(pad, np.int64)])
    tr_bits = max(int(np.ceil(np.log2(max(n_out_pad // br, 2)))), 1)
    if tr_bits + tcw_bits + 2 > 31:
        raise ValueError("graph too large for the transposed edge-tile schedule")
    # two scalar-prefetch words per step: keep within the ~1 MB SMEM budget
    if 2 * t_tcw.size > MAX_STEPS:
        raise ValueError(
            f"transposed schedule needs {2 * t_tcw.size} prefetch words "
            f"(> {MAX_STEPS}); shard the graph first"
        )
    tmeta = ((t_tr << (tcw_bits + 2)) | (t_tcw << 2) | (first << 1) | dummy).astype(
        np.int32
    )
    return dict(s0=s0.astype(np.int32), tmeta=tmeta)


def _edge_t_kernel(
    s0_ref, tmeta_ref, chi_ref, idx_ref, w_ref, a_ref, out_ref, *, br, cdtype, paired
):
    s = pl.program_id(0)
    tm = tmeta_ref[s]

    @pl.when(((tm >> 1) & 1) == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when((tm & 1) == 0)  # real step (not a zero-init dummy)
    def _():
        prec = jax.lax.Precision.HIGHEST if cdtype == jnp.float32 else None
        chirow = s0_ref[s] % 8  # chi blocks ship 8 original steps per fetch
        a_blk = a_ref[:]
        if a_blk.dtype != cdtype:
            a_blk = a_blk.astype(cdtype)
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (br, K), 0)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (BC, K), 0)

        def chunk_mt(c):
            v = idx_ref[c : c + 1, :] & IDX_MASK
            rl = v >> 7  # BC = 128
            cl = v & (BC - 1)
            wv = w_ref[c : c + 1, :]
            if wv.dtype != jnp.float32:
                wv = wv.astype(jnp.float32)
            hr = (iota_r == rl).astype(jnp.float32).astype(cdtype)  # (br, K)
            hg = jnp.where(iota_c == cl, wv, 0.0).astype(cdtype)  # (BC, K)
            # Mᵀ[c, r] = sum_e Hg[c,e]*Hr[r,e]
            return jax.lax.dot_general(
                hg,
                hr,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )  # (BC, br)

        def apply_t(mt, c):
            sub0 = chi_ref[chirow, c] * BC
            acc = out_ref[pl.ds(sub0, BC), :]
            out_ref[pl.ds(sub0, BC), :] = acc + jnp.dot(
                mt.astype(cdtype),
                a_blk,
                preferred_element_type=jnp.float32,
                precision=prec,
            )

        if paired:
            for p in range(CPS // 2):
                apply_t(chunk_mt(2 * p) + chunk_mt(2 * p + 1), 2 * p)
        else:
            for c in range(CPS):
                apply_t(chunk_mt(c), c)


def _edge_t_call(
    mat: EdgeTileMat, sched: TSched, w_slots: jax.Array, a_pad: jax.Array
) -> jax.Array:
    """out(n_in_pad, d_pad) f32 = Mᵀ(w_slots) @ a_pad for a_pad
    (n_out_pad, d_pad) in compute dtype."""
    if a_pad.shape[1] > D_MAX_E:
        return jnp.concatenate(
            [
                _edge_t_call(mat, sched, w_slots, a_pad[:, i : i + D_MAX_E])
                for i in range(0, a_pad.shape[1], D_MAX_E)
            ],
            axis=1,
        )
    d_pad = a_pad.shape[1]
    S2 = sched.num_steps
    br = mat.br
    tcw_bits = mat.tcw_bits
    tcw_mask = (1 << tcw_bits) - 1
    # a split-schedule part emits only its column-window range's rows
    tcw0 = sched.tcw0
    n_win = sched.n_win or (mat.n_in_pad // BCW)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # s0, tmeta
        grid=(S2,),
        in_specs=[
            pl.BlockSpec(
                (8, CPS), lambda s, s0, tm: (s0[s] // 8, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((CPS, K), lambda s, s0, tm: (s0[s], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CPS, K), lambda s, s0, tm: (s0[s], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (br, d_pad),
                lambda s, s0, tm: (tm[s] >> (tcw_bits + 2), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (BCW, d_pad),
            lambda s, s0, tm: (((tm[s] >> 2) & tcw_mask) - tcw0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(
            _edge_t_kernel, br=br, cdtype=mat.compute_dtype, paired=mat.paired
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_win * BCW, d_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * S2 * CPS * (br * BC * K + br * BC * d_pad),
            bytes_accessed=mat.idx.size * 4
            + w_slots.size * w_slots.dtype.itemsize
            + S2 * br * d_pad * a_pad.dtype.itemsize
            + n_win * BCW * d_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret_default(),
    )(sched.s0, sched.tmeta, mat.chi, mat.idx, w_slots, a_pad)


def spmm_edge_tiles_t(
    mat: EdgeTileMat,
    sched: "TSched | tuple[TSched, ...]",
    a: jax.Array,
    w_slots: jax.Array | None = None,
) -> jax.Array:
    """``C = Mᵀ @ A`` for row-major A (n_out, d); returns (n_in, d) f32.

    ``w_slots`` optionally overrides the matrix's slot weights (same
    (S*CPS, K) layout) — the backward-B path of SDDMM / weighted SpMM.
    ``sched`` may be a tuple of split-schedule parts (contiguous
    column-window ranges, ``transposed_schedule(..., auto_split=True)``):
    one kernel call per part, output rows concatenated in range order."""
    n, d = a.shape
    if n != mat.n_out:
        raise ValueError(f"A has {n} rows, transposed edge-tile expects {mat.n_out}")
    cdtype = mat.compute_dtype
    if cdtype == jnp.int8:
        raise ValueError(
            "the transposed edge-tile kernel has no int8 mode — build the "
            "pair in bfloat16 for attention/gradient paths"
        )
    if w_slots is None:
        w = mat.w  # builder weights are already zero on padding slots
    else:
        w = (w_slots * slot_valid_mask(mat.idx, w_slots.dtype)).astype(cdtype)
    d_pad = round_up(max(d, 128), 128)
    a_pad = jnp.zeros((mat.n_out_pad, d_pad), cdtype)
    a_pad = a_pad.at[:n, :d].set(a.astype(cdtype))
    if isinstance(sched, (tuple, list)):
        out = jnp.concatenate(
            [_edge_t_call(mat, part, w, a_pad) for part in sched], axis=0
        )
    else:
        out = _edge_t_call(mat, sched, w, a_pad)
    return out[: mat.n_in, :d]


def edge_pair_from_csr_pair(
    csr_fwd: CSRData, csr_bwd: CSRData, dtype: str = "bfloat16", **kw
) -> tuple[EdgeTileMat, EdgeTileMat]:
    """(forward A_hat_T @, backward A_hat @) pair for already-normalized
    weighted matrices — the edge-tile analogue of sparse_linear's (A_T, A)
    members (gcn.hpp:13-48)."""
    return (
        edge_tile_mat_from_csr(csr_fwd, dtype=dtype, **kw),
        edge_tile_mat_from_csr(csr_bwd, dtype=dtype, **kw),
    )
