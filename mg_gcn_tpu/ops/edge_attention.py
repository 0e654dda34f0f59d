"""Differentiable edge-attention ops on the edge-tile slot layout.

The composition layer over the three structure-sharing kernels —
``spmm_edge_tiles`` (M(w) @ B), ``sddmm_edge_tiles`` (per-edge <A[r], B[c]>)
and ``spmm_edge_tiles_t`` (Mᵀ(w) @ X) — wired into ``jax.custom_vjp`` so
attention-style GNN layers (GAT) train end-to-end with zero gathers or
scatters. The reference framework has no attention models; this extends the
framework beyond parity while exercising exactly the SpMM/SDDMM pair the
BASELINE north star names.

Gradient algebra (all in the same (S·CPS, K) slot layout):

    scores = sddmm(M, A, B):   dA = M(g) @ B          (weighted SpMM)
                               dB = Mᵀ(g) @ A          (transposed SpMM)
    out = spmm(M(w), B):       dw = sddmm(M, g, B)     (per-edge dots)
                               dB = Mᵀ(w) @ g          (transposed SpMM)

Padding slots (VALID_BIT clear) are masked out of every cotangent, so the
schedule's slack never leaks into gradients.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .sddmm import sddmm_edge_tiles
from .spmm import _zero_cotangent
from .spmm_edges import (
    EdgeTileMat,
    TSched,
    slot_valid_mask,
    spmm_edge_tiles,
    spmm_edge_tiles_t,
    transposed_schedule,
)


def build_attention_graph(csr, dtype: str = "bfloat16", **kw):
    """(EdgeTileMat, TSched) for a graph adjacency — the structural pair
    every op below shares. Edge values in ``csr`` are stored on the slots
    and consumed when ``GATConfig.edge_weighted`` is set (they must then be
    positive — the bias is ``log w``, see models/gat.py); plain attention
    recomputes slot weights per layer and never reads them. Self-loops
    should already be present (data/prep.py adds them)."""
    from .spmm_edges import edge_tile_mat_from_csr

    m = edge_tile_mat_from_csr(csr, dtype=dtype, **kw)
    # auto_split: at headline scale the single-call transposed schedule
    # exceeds the per-call SMEM prefetch budget; a tuple of column-window
    # range parts runs as one kernel call each (spmm_edge_tiles_t)
    return m, transposed_schedule(m, auto_split=True)


def valid_mask(mat: EdgeTileMat) -> jax.Array:
    """f32 (S·CPS, K): 1 on real edge slots, 0 on padding."""
    return slot_valid_mask(mat.idx)


def _with_w(mat: EdgeTileMat, w_slots: jax.Array) -> EdgeTileMat:
    if mat.compute_dtype == jnp.int8:
        raise ValueError(
            "attention ops need dynamic slot weights — build the edge-tile "
            "mat in bfloat16 (int8 mode packs static quantized weights)"
        )
    # the kernels assume padding slots carry weight 0; mask user weights
    w = w_slots * slot_valid_mask(mat.idx, w_slots.dtype)
    return dataclasses.replace(mat, w=w.astype(mat.compute_dtype))


def _zeros_like_tree(t):
    return jax.tree.map(_zero_cotangent, t)


@jax.custom_vjp
def sddmm(mat: EdgeTileMat, sched: TSched, a: jax.Array, b: jax.Array) -> jax.Array:
    """Per-slot edge scores ``<A[r_e], B[c_e]>`` (f32, slot layout);
    differentiable in A and B."""
    return sddmm_edge_tiles(mat, a, b)


def _sddmm_fwd(mat, sched, a, b):
    return sddmm_edge_tiles(mat, a, b), (mat, sched, a, b)


def _sddmm_bwd(res, g):
    mat, sched, a, b = res
    gm = g * valid_mask(mat)
    da = spmm_edge_tiles(_with_w(mat, gm), b)[:, : a.shape[1]]
    db = spmm_edge_tiles_t(mat, sched, a, w_slots=gm)[:, : b.shape[1]]
    return _zeros_like_tree(mat), _zeros_like_tree(sched), da.astype(a.dtype), db.astype(b.dtype)


sddmm.defvjp(_sddmm_fwd, _sddmm_bwd)


@jax.custom_vjp
def spmm_attn(
    mat: EdgeTileMat, sched: TSched, w_slots: jax.Array, b: jax.Array
) -> jax.Array:
    """``C = M(w_slots) @ B`` (n_out, d); differentiable in the slot
    weights and in B — the weighted-aggregation half of an attention
    layer."""
    return spmm_edge_tiles(_with_w(mat, w_slots), b)


def _spmm_attn_fwd(mat, sched, w_slots, b):
    return spmm_edge_tiles(_with_w(mat, w_slots), b), (mat, sched, w_slots, b)


def _spmm_attn_bwd(res, g):
    mat, sched, w_slots, b = res
    dw = sddmm_edge_tiles(mat, g, b) * valid_mask(mat)
    db = spmm_edge_tiles_t(mat, sched, g, w_slots=w_slots)[:, : b.shape[1]]
    return (
        _zeros_like_tree(mat),
        _zeros_like_tree(sched),
        dw.astype(w_slots.dtype),
        db.astype(b.dtype),
    )


spmm_attn.defvjp(_spmm_attn_fwd, _spmm_attn_bwd)


def slot_softmax(mat: EdgeTileMat, sched: TSched, scores: jax.Array) -> jax.Array:
    """Row-wise softmax over each output row's edge slots.

    Stabilized by a **per-row** shift computed in two MXU passes (the slot
    layout has no segment-max, but a clipped global-shift pass estimates
    each row's log-sum-exp): pass 1 exponentiates ``clip(s − smax, −80, 0)``
    — the clip floor keeps rows far below the global max from flushing to
    zero — and its row sums give ``lse₁[r] ≥ rowmax[r]``; pass 2 uses
    ``lse₁[r_e]`` as the per-slot shift, so every row whose score range is
    within ~80 of its *own* pass-1 estimate (i.e. any row ≲165 below the
    global max, for any row width) normalizes exactly. The per-row sums
    ride the weighted SpMM against a ones column and return to slot space
    via a d=1 SDDMM — all MXU work, no gathers. Computed in log form —
    ``exp(s − shift − log Σ)`` — because a slotwise reciprocal's backward
    (−1/x²) overflows f32 on padding slots and NaNs the cotangent chain
    (0·inf). Padding slots get exactly 0. All shifts are stop-gradient
    per-row constants (softmax is row-shift invariant), so gradients flow
    only through pass 2 — identical algebra to the plain stabilized form.

    Residual caveat: a row whose entire range sits ≳165 below the global
    max still underflows to alpha ≈ 0; the edge-weighted GAT bias is
    clamped to ±30 (models/gat.py) so composed scores stay far inside
    that window."""
    v = valid_mask(mat)
    ones = jnp.ones((mat.n_in, 1), jnp.float32)
    sg = jax.lax.stop_gradient(scores)
    smax = jnp.max(jnp.where(v > 0, sg, -jnp.inf))
    smax = jnp.where(jnp.isfinite(smax), smax, 0.0)  # all-padding guard
    # pass 1: clipped global shift -> per-row LSE estimate (>= row max)
    e1 = jnp.where(v > 0, jnp.exp(jnp.clip(sg - smax, -80.0, 0.0)), 0.0)
    rs1 = spmm_attn(mat, sched, e1, ones)  # (n_out, 1)
    lse1 = smax + jnp.log(jnp.maximum(rs1, 1e-30))
    shift = jax.lax.stop_gradient(sddmm(mat, sched, lse1, ones))
    # pass 2: exact per-row normalization under the per-row shift
    e = jnp.where(v > 0, jnp.exp(scores - shift), 0.0)
    rowsum = spmm_attn(mat, sched, e, ones)  # (n_out, 1)
    log_rs = jnp.log(jnp.maximum(rowsum, 1e-30))
    slot_log_rs = sddmm(mat, sched, log_rs, ones)  # log rowsum[r_e] per slot
    return jnp.where(v > 0, jnp.exp(scores - shift - slot_log_rs), 0.0)
