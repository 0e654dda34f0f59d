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
VPU, no gathers — v5e has no cross-vreg gather):

    T  = A_blk @ B_subᵀ          (br, BC)   dense tile of candidate scores
    W2 = T @ Hg                  (br, K)    column-select per slot
    s_e = Σ_r Hr[r, e] · W2[r, e]           row-select + reduce (VPU)

Chunk pairs share their B sub-window when ``mat.paired`` (T amortized).
Padding slots yield exactly 0 (the VALID_BIT mask in the slot words).

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


def _sddmm_kernel(meta_ref, chi_ref, idx_ref, a_ref, b_ref, out_ref, *, br, cdtype, paired):
    s = pl.program_id(0)
    prec = jax.lax.Precision.HIGHEST if cdtype == jnp.float32 else None
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (br, K), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (BC, K), 0)
    a_blk = a_ref[:]
    if a_blk.dtype != cdtype:
        a_blk = a_blk.astype(cdtype)

    def tile(c):
        """T = A_blk @ B_subᵀ for chunk c's sub-window."""
        bsub = b_ref[pl.ds(chi_ref[s % 8, c] * BC, BC), :]
        if bsub.dtype != cdtype:
            bsub = bsub.astype(cdtype)
        return jax.lax.dot_general(
            a_blk,
            bsub,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # (br, BC)

    def chunk_scores(c, t):
        vraw = idx_ref[c : c + 1, :]  # (1, K) i32
        v = vraw & IDX_MASK
        rl = (v >> 7) & RL_MASK  # int8-packed idx words carry wq above bit 17
        cl = v & (BC - 1)
        hg = (iota_c == cl).astype(jnp.float32).astype(cdtype)  # (BC, K)
        w2 = jnp.dot(
            t.astype(cdtype), hg, preferred_element_type=jnp.float32, precision=prec
        )  # (br, K): w2[r, e] = T[r, cl_e]
        hr = (iota_r == rl).astype(jnp.float32)  # (br, K)
        score = jnp.sum(hr * w2, axis=0, keepdims=True)  # (1, K): T[rl_e, cl_e]
        valid = ((vraw >> 30) & 1).astype(jnp.float32)
        out_ref[c : c + 1, :] = score * valid

    if paired:
        for p in range(CPS // 2):
            t = tile(2 * p)
            chunk_scores(2 * p, t)
            chunk_scores(2 * p + 1, t)
    else:
        for c in range(CPS):
            chunk_scores(c, tile(c))


def sddmm_edge_tiles(mat: EdgeTileMat, a: jax.Array, b: jax.Array) -> jax.Array:
    """Per-slot edge scores ``<A[row_e], B[col_e]>`` for the edges of
    ``mat`` (structure/schedule only; ``mat.w`` is not read). Returns an
    f32 array shaped like ``mat.w`` — feed it (or any slotwise transform)
    back through ``dataclasses.replace(mat, w=...)`` for weighted
    aggregation. A must be (n_out, d), B (n_in, d)."""
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
        # chunks (the d-contraction lives inside T)
        return sum(
            sddmm_edge_tiles(mat, a[:, i : i + 512], b[:, i : i + 512])
            for i in range(0, d, 512)
        )
    cdtype = mat.compute_dtype
    if cdtype == jnp.int8:
        # int8 mats share structure with the dense compute here; scores are
        # activations-only math, so run them in bf16 (the int8 payload in
        # the idx words is masked off by RL_MASK / IDX_MASK)
        cdtype = jnp.bfloat16
    d_pad = round_up(max(d, 128), 128)
    a_pad = jnp.zeros((mat.n_out_pad, d_pad), cdtype).at[: mat.n_out, :d].set(
        a.astype(cdtype)
    )
    b_pad = jnp.zeros((mat.n_in_pad, d_pad), cdtype).at[: mat.n_in, :d].set(
        b.astype(cdtype)
    )
    S = mat.num_steps
    br = mat.br
    tcw_bits = mat.tcw_bits
    tcw_mask = (1 << tcw_bits) - 1
    from .spmm_edges import BCW

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((8, CPS), lambda s, meta: (s // 8, 0), memory_space=pltpu.SMEM),
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
        ],
        out_specs=pl.BlockSpec(
            (CPS, K), lambda s, meta: (s, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        functools.partial(
            _sddmm_kernel, br=br, cdtype=cdtype, paired=mat.paired
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S * CPS, K), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * S * CPS * (br * BC * d_pad // (2 if mat.paired else 1) + 2 * br * BC * K),
            bytes_accessed=mat.idx.size * 4
            + S * (br + BCW) * d_pad * 2
            + S * CPS * K * 4,
            transcendentals=0,
        ),
        interpret=interpret_default(),
    )(mat.meta, mat.chi, mat.idx, a_pad, b_pad)
