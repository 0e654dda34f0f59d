"""SDDMM — sampled dense-dense matmul on the edge-tile layout (MXU).

``scores = P ⊙ (A @ Bᵀ)``: for every edge (r, c) of a sparse pattern,
the dot product <A[r, :], B[c, :]> — the edge-score primitive of
attention-style GNNs (GAT/transformer-conv) and the second kernel the
BASELINE north star names alongside SpMM. The reference framework has no
SDDMM (its models are attention-free); this op extends the framework's
edge-tile machinery (:mod:`.spmm_edges`) to produce per-edge values *in the
same slot layout the weighted SpMM consumes*, so the attention pipeline
composes without any gather/scatter:

    mat   = edge_tile_mat_from_csr(adjacency)         # structure + schedule
    s     = sddmm_edge_tiles(mat, A, B)               # per-slot edge scores
    alpha = f(s)                                      # softmax etc. (slotwise)
    out   = spmm_edge_tiles(replace(mat, w=alpha), B) # weighted aggregation

Kernel, per 128-slot chunk of a (br x 128) sub-tile (all MXU + lane-aligned
VPU, no gathers — v5e has no cross-vreg gather). Selection formulation: the
d-contraction is deferred past the row/column selects, so the two MXU
products are *selection* matmuls whose cost is K·(br+BC)·d instead of the
round-2 dense-tile form's br·BC·(d/2 + K) — measured 1.3× in bf16 and,
because selections of int8 values are exact, it admits an int8 mode (both
matmuls at the 2× MXU rate, ~2.6× total):

    Ar  = Hrᵀ @ A_blk            (K, d)    slot-row select   [masked by valid]
    Bc  = Hgᵀ @ B_sub            (K, d)    slot-column select
    s_e = Σ_d Ar[e, :]·Bc[e, :]·g[:]       lane-wise product + reduce (VPU)

``g`` is all-ones in f32/bf16 and the per-feature dequant product
``qa_d·qb_d`` in int8 mode (per-feature quantization commutes with this
form because the d-index survives until the final reduce — it does NOT
commute with the dense-tile form, whose contraction crosses features).
Padding slots yield exactly 0 (their one-hot column in Hr is zeroed).

Step order (round 5): the kernel visits steps sorted by COLUMN WINDOW so
each (BCW, d) operand window stays VMEM-resident across its consecutive
steps — the schedule's natural (row-tile, window) order re-fetched a fresh
window nearly every step, ~165 GB per Reddit-scale SDDMM and the measured
kernel bound. Legal because SDDMM has no cross-step accumulation; the
grid-sequential scores are un-permuted back to the slot layout with one
row gather after the call (PERF.md round 5).

Gradients: see :mod:`.edge_attention` — ``dA = M(g) @ B`` rides the
weighted SpMM and ``dB = Mᵀ(g) @ A`` the transposed-schedule kernel
(``spmm_edge_tiles_t``), both in this same slot layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spmm_pattern import round_up
from .spmm_edges import BC, CPS, IDX_MASK, K, RL_MASK, EdgeTileMat, interpret_default


def _sddmm_kernel_qskip(
    meta_ref, qr_ref, chi_ref, idx_ref, a_ref, b_ref, g_ref, out_ref, *, br, cdtype
):
    """q-range row select (round-5): slots are CSR-row-sorted within each
    sub-tile, so a chunk's live sub-blocks span a contiguous [q0, q1] —
    fed per chunk from SMEM (``qr``, packed q0 | q1<<8, precomputed from
    the idx words) and walked with a ``fori_loop(q0, q1+1)``. This is the
    static-trip-skip lever PERF.md round 4 named: the round-4 6.7× failure
    came from computing the bounds with in-kernel vector reduces (a
    vector→scalar sync per chunk), NOT from the dynamic trip count itself —
    with SMEM-fed bounds the loop body is one dynamic-offset selection
    matmul, and dead sub-blocks are never touched. Empty chunks have
    q0=127 > q1=0, so the loop body never runs and the (1, K) output row
    still writes zeros (ar starts at 0)."""
    s = pl.program_id(0)
    prec = jax.lax.Precision.HIGHEST if cdtype == jnp.float32 else None
    int8 = cdtype == jnp.int8
    acc_t = jnp.int32 if int8 else jnp.float32
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (BC, K), 0)
    g_col = g_ref[:, 0:1]
    d_pad = a_ref.shape[1]

    for c in range(CPS):
        vraw = idx_ref[c : c + 1, :]
        v = vraw & IDX_MASK
        rl = (v >> 7) & RL_MASK
        cl = v & (BC - 1)
        valid = (vraw >> 30) & 1
        bsub = b_ref[pl.ds(chi_ref[s % 8, c] * BC, BC), :]
        if bsub.dtype != cdtype:
            bsub = bsub.astype(cdtype)
        hg = (iota_l == cl).astype(cdtype)
        bc = jax.lax.dot_general(
            bsub, hg, (((0,), (0,)), ((), ())),
            preferred_element_type=acc_t, precision=prec,
        )
        m_adj = jnp.where(valid != 0, rl & (BC - 1), 2 * BC)
        qv = rl >> 7
        sel = (iota_l == m_adj).astype(cdtype)
        qw = qr_ref[s % 8, c]
        q0 = qw & 0xFF
        q1 = (qw >> 8) & 0xFF

        def qbody(qq, ar):
            mq = qv == qq
            # int8 vector multiplies do not legalize on v5e — select instead
            sel_q = jnp.where(mq, sel, 0) if int8 else sel * mq.astype(cdtype)
            a_sub = a_ref[pl.ds(qq * BC, BC), :]
            if a_sub.dtype != cdtype:
                a_sub = a_sub.astype(cdtype)
            return ar + jax.lax.dot_general(
                a_sub, sel_q, (((0,), (0,)), ((), ())),
                preferred_element_type=acc_t, precision=prec,
            )

        ar = jax.lax.fori_loop(
            q0, q1 + 1, qbody, jnp.zeros((d_pad, K), acc_t)
        )
        prod = (ar * bc).astype(jnp.float32) * g_col
        out_ref[c : c + 1, :] = jnp.sum(prod, axis=0, keepdims=True)


def _sddmm_kernel(
    meta_ref, chi_ref, idx_ref, a_ref, b_ref, g_ref, out_ref, *, br,
    cdtype, onelevel=False,
):
    """Selections are computed (d, K)-oriented so each chunk's scores land
    as a (1, K) ROW of the (CPS, K) output block: the emitted array is the
    slot layout directly — no 16×-padded (·, CPS)-minor intermediate in
    HBM and no post-kernel transpose (the round-3 layout allocated
    S·K×CPS f32 padded 8→128 lanes, ~11 GB at Reddit scale)."""
    s = pl.program_id(0)
    row8 = s % 8  # chi rows are pre-reordered to grid order (8 per fetch)
    prec = jax.lax.Precision.HIGHEST if cdtype == jnp.float32 else None
    int8 = cdtype == jnp.int8
    acc_t = jnp.int32 if int8 else jnp.float32
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (BC, K), 0)  # BC == 128
    a_blk = a_ref[:]
    if a_blk.dtype != cdtype:
        a_blk = a_blk.astype(cdtype)
    g_col = g_ref[:, 0:1]  # (d, 1) f32 per-feature dequant (int8 mode only)
    nq = br // BC  # row sub-blocks (br is a multiple of 8; >=128 in practice)

    # hoisted slot-word decode: one batch of (CPS, K) VPU ops instead of
    # CPS separate single-vreg passes (the kernel is partly VPU-bound —
    # round-5 probe; every (1, K) op costs a full vreg pass anyway)
    vraw_all = idx_ref[:]  # (CPS, K) i32
    v_all = vraw_all & IDX_MASK
    rl_all = (v_all >> 7) & RL_MASK  # int8-packed words carry wq above bit 17
    cl_all = v_all & (BC - 1)
    valid_all = (vraw_all >> 30) & 1
    qv_all = rl_all >> 7
    # padding slots keyed out of range so their one-hot column is all-zero
    m_adj_all = jnp.where(valid_all != 0, rl_all & (BC - 1), 2 * BC)

    for c in range(CPS):
        rl = rl_all[c : c + 1, :]
        cl = cl_all[c : c + 1, :]
        valid = valid_all[c : c + 1, :]
        bsub = b_ref[pl.ds(chi_ref[row8, c] * BC, BC), :]
        if bsub.dtype != cdtype:
            bsub = bsub.astype(cdtype)
        hg = (iota_l == cl).astype(cdtype)  # (BC, K)
        bc = jax.lax.dot_general(
            bsub,
            hg,
            (((0,), (0,)), ((), ())),
            preferred_element_type=acc_t,
            precision=prec,
        )  # (d, K): B_sub[cl_e, :] per slot column
        if onelevel and br % BC == 0:
            # single full-height (br, K) one-hot -> ONE selection matmul:
            # trades nq-1 matmul issues + nq lane-mask multiplies + nq-1
            # (d, K) accumulate adds for nq-times-taller compare/cast
            # passes (round-5 A/B experiment vs the two-level select)
            iota_r = jax.lax.broadcasted_iota(jnp.int32, (br, K), 0)
            rl_key = jnp.where(valid != 0, rl, 2 * br)  # (1, K)
            hr = (iota_r == rl_key).astype(cdtype)  # (br, K)
            ar = jax.lax.dot_general(
                a_blk, hr, (((0,), (0,)), ((), ())),
                preferred_element_type=acc_t, precision=prec,
            )  # (d, K)
        elif nq >= 1 and br % BC == 0:
            # two-level row select (VERDICT r3 #2): ONE shared (128, K)
            # one-hot keyed on the lane-local row (padding slots pushed to
            # the out-of-range key 2·BC so their column is all-zero), then
            # one cheap (1, K) lane mask per 128-row sub-block — the VPU
            # work no longer scales with br (the old (br, K) compare was
            # what made br=896 VPU-bound, PERF.md round-3 notes)
            qv = qv_all[c : c + 1, :]  # sub-block of each slot
            sel = (iota_l == m_adj_all[c : c + 1, :]).astype(cdtype)
            ar = None
            for qq in range(nq):
                mq = qv == qq  # (1, K) lane mask
                if int8:
                    # v5e Mosaic cannot legalize an int8×int8 vector
                    # multiply (arith.muli on i8 — found round 5 when the
                    # bench first ran int8 SDDMM through the two-level
                    # select on hardware); a lane select legalizes fine
                    sel_q = jnp.where(mq, sel, 0)
                else:
                    sel_q = sel * mq.astype(cdtype)
                part = jax.lax.dot_general(
                    a_blk[qq * BC : (qq + 1) * BC, :],
                    sel_q,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=acc_t,
                    precision=prec,
                )  # (d, K)
                ar = part if ar is None else ar + part
        else:  # pragma: no cover - br < 128 only in synthetic tiny configs
            iota_r = jax.lax.broadcasted_iota(jnp.int32, (br, K), 0)
            hr = ((iota_r == rl) & (valid != 0)).astype(cdtype)
            ar = jax.lax.dot_general(
                a_blk,
                hr,
                (((0,), (0,)), ((), ())),
                preferred_element_type=acc_t,
                precision=prec,
            )  # (d, K)
        # products <= 127²·d < 2³¹ in int8 mode: the i32 product is exact.
        # g_col is identically 1 outside int8 mode — skip the (d, K)
        # broadcast multiply there (a full VPU pass per chunk)
        prod = (ar * bc).astype(jnp.float32)  # (d, K)
        if int8:
            prod = prod * g_col
        out_ref[c : c + 1, :] = jnp.sum(prod, axis=0, keepdims=True)


def _chunk_q_ranges(mat: EdgeTileMat) -> jax.Array:
    """Per-chunk live sub-block range (q0 | q1<<8, i32[S, CPS]) from the
    idx words — device-side, O(slots) vectorized, fused by XLA into the
    reduces (no (S, CPS, K) i32 temporaries in HBM). Empty chunks get
    q0=127 > q1=0 so the q-loop body never runs."""
    S = mat.num_steps
    idx3 = mat.idx.reshape(S, CPS, K)
    v = idx3 & IDX_MASK
    qv = ((v >> 7) & RL_MASK) >> 7
    valid = (idx3 >> 30) & 1
    q0 = jnp.min(jnp.where(valid == 1, qv, 127), axis=2)
    q1 = jnp.max(jnp.where(valid == 1, qv, 0), axis=2)
    return (q0 | (q1 << 8)).astype(jnp.int32)


def sddmm_edge_tiles(
    mat: EdgeTileMat,
    a: jax.Array,
    b: jax.Array,
    qskip: bool | None = None,
    select: str = "two",
) -> jax.Array:
    """Per-slot edge scores ``<A[row_e], B[col_e]>`` for the edges of
    ``mat`` (structure/schedule only; ``mat.w`` is not read). Returns an
    f32 array shaped like ``mat.w`` — feed it (or any slotwise transform)
    back through ``dataclasses.replace(mat, w=...)`` for weighted
    aggregation. A must be (n_out, d), B (n_in, d).

    When ``mat`` is an int8-mode matrix the scores run on the 2× int8 MXU
    path: A and B are quantized per feature on device (the spmm_edges
    convention) and the per-feature dequant product rides the final VPU
    reduce — error is the 8-bit rounding of the operands (~1% relative),
    the same budget as int8 weighted SpMM."""
    if a.shape[0] != mat.n_out or b.shape[0] != mat.n_in:
        raise ValueError(
            f"A/B have {a.shape[0]}/{b.shape[0]} rows; mat expects "
            f"{mat.n_out}/{mat.n_in}"
        )
    if a.shape[1] != b.shape[1]:
        raise ValueError("A and B must share the feature dimension")
    d = a.shape[1]
    if d > 512:
        # VMEM bounds the operand blocks; scores are additive over feature
        # chunks (the d-contraction lives past the selects)
        return sum(
            sddmm_edge_tiles(mat, a[:, i : i + 512], b[:, i : i + 512])
            for i in range(0, d, 512)
        )
    cdtype = mat.compute_dtype
    d_pad = round_up(max(d, 128), 128)
    if cdtype == jnp.int8:
        a32 = a.astype(jnp.float32)
        b32 = b.astype(jnp.float32)
        qa = jnp.maximum(jnp.max(jnp.abs(a32), axis=0), 1e-30) / 127.0
        qb = jnp.maximum(jnp.max(jnp.abs(b32), axis=0), 1e-30) / 127.0
        aq = jnp.clip(jnp.round(a32 / qa[None, :]), -127, 127).astype(jnp.int8)
        bq = jnp.clip(jnp.round(b32 / qb[None, :]), -127, 127).astype(jnp.int8)
        a_pad = jnp.zeros((mat.n_out_pad, d_pad), jnp.int8).at[: mat.n_out, :d].set(aq)
        b_pad = jnp.zeros((mat.n_in_pad, d_pad), jnp.int8).at[: mat.n_in, :d].set(bq)
        g = jnp.zeros((d_pad, 8), jnp.float32).at[:d, 0].set(qa * qb)
    else:
        a_pad = jnp.zeros((mat.n_out_pad, d_pad), cdtype).at[: mat.n_out, :d].set(
            a.astype(cdtype)
        )
        b_pad = jnp.zeros((mat.n_in_pad, d_pad), cdtype).at[: mat.n_in, :d].set(
            b.astype(cdtype)
        )
        g = jnp.ones((d_pad, 8), jnp.float32)
    S = mat.num_steps
    br = mat.br
    tcw_bits = mat.tcw_bits
    tcw_mask = (1 << tcw_bits) - 1
    from .spmm_edges import BCW

    if qskip is None:
        # MEASURED NEGATIVE (round 5, real v5e, Reddit-scale br=512):
        # 0.075 vs 0.508 Gedge/s — a dynamic trip count defeats Mosaic's
        # static scheduling even with SMEM-fed bounds (settles the round-4
        # hypothesis that blamed the in-kernel bound reduce; PERF.md).
        # The q-range kernel stays available for the record/tests only.
        qskip = False
    if qskip:
        # legacy original-order path (q-range record kernel)
        in_specs = [
            pl.BlockSpec(
                (8, CPS), lambda s, meta: (s // 8, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (8, CPS), lambda s, meta: (s // 8, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((CPS, K), lambda s, meta: (s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (br, d_pad),
                lambda s, meta: (meta[s] >> (tcw_bits + 1), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (BCW, d_pad),
                lambda s, meta: ((meta[s] >> 1) & tcw_mask, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((d_pad, 8), lambda s, meta: (0, 0), memory_space=pltpu.VMEM),
        ]
        operands = [_chunk_q_ranges(mat), mat.chi, mat.idx, a_pad, b_pad, g]
        kernel = functools.partial(_sddmm_kernel_qskip, br=br, cdtype=cdtype)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(S,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (CPS, K), lambda s, meta: (s, 0), memory_space=pltpu.VMEM
            ),
        )
        prefetch = (mat.meta,)
        reorder = None
    else:
        # COLUMN-WINDOW-MAJOR step order (round 5): the schedule's natural
        # (row-tile, window) order touches a fresh (BCW, d) operand window
        # nearly every step — S × BCW·d·2 bytes ≈ 165 GB ≈ 200 ms at
        # Reddit scale, the MEASURED kernel bound (one-level == two-level
        # == VPU-trimmed all at ~222 ms). Visiting steps sorted by column
        # window keeps each window block resident across its ~S/n_tcw
        # consecutive steps (window traffic drops ~2900×; the (br, d)
        # A-blocks now re-stream per step instead, a 8× smaller block).
        # Scores are emitted grid-sequentially and un-permuted to the slot
        # layout with one row gather (~2 ms) after the call. SDDMM needs no
        # cross-step accumulation, so any step order is legal.
        tcw_of = (mat.meta >> 1) & tcw_mask
        order = jnp.argsort(tcw_of, stable=True).astype(jnp.int32)
        # the slot/step arrays are re-ordered ON DEVICE (one ~2 ms row
        # gather each) instead of double-indexing via a second prefetch
        # array — meta + order together would blow the ~1 MB SMEM budget
        # at Reddit scale (measured: 1.27 MB requested)
        rmeta = jnp.take(mat.meta, order)
        idx_r = jnp.take(
            mat.idx.reshape(S, CPS, K), order, axis=0
        ).reshape(S * CPS, K)
        chi_r = jnp.take(mat.chi, order, axis=0)
        in_specs = [
            pl.BlockSpec(
                (8, CPS), lambda s, meta: (s // 8, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (CPS, K), lambda s, meta: (s, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (br, d_pad),
                lambda s, meta: (meta[s] >> (tcw_bits + 1), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (BCW, d_pad),
                lambda s, meta: ((meta[s] >> 1) & tcw_mask, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (d_pad, 8), lambda s, meta: (0, 0), memory_space=pltpu.VMEM
            ),
        ]
        operands = [chi_r, idx_r, a_pad, b_pad, g]
        kernel = functools.partial(
            _sddmm_kernel, br=br, cdtype=cdtype, onelevel=select == "one"
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # reordered meta
            grid=(S,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (CPS, K), lambda s, meta: (s, 0), memory_space=pltpu.VMEM
            ),
        )
        prefetch = (rmeta,)
        reorder = order
    itemsize = 1 if cdtype == jnp.int8 else 2
    n_tcw = max(mat.n_in_pad // BCW, 1)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S * CPS, K), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * S * CPS * K * (br + BC) * d_pad
            // (2 if cdtype == jnp.int8 else 1),
            bytes_accessed=mat.idx.size * 4
            + S * br * d_pad * itemsize
            + (S if reorder is None else n_tcw) * BCW * d_pad * itemsize
            + S * CPS * K * 4,
            transcendentals=0,
        ),
        interpret=interpret_default(),
    )(*prefetch, *operands)
    if reorder is not None:
        # un-permute grid-sequential rows back to the slot layout: row
        # block i holds original step order[i]'s chunks
        inv = jnp.zeros((S,), jnp.int32).at[reorder].set(
            jnp.arange(S, dtype=jnp.int32)
        )
        out = out.reshape(S, CPS, K)[inv].reshape(S * CPS, K)
    # the (CPS, K) output blocks ARE the (S·CPS, K) slot layout mat.w uses
    return out
