"""Distributed GAT — row-partitioned multi-head graph attention.

Extends the framework's 1-D row partition (SURVEY §2.7-1; the reference's
`-R 1` strategy, dist_matrix.hpp:170-260) to the attention family: each
device owns a row slab of the adjacency (as P ring-ordered edge-tile
blocks), its activation rows, and its labels. A GAT layer then runs as two
ring passes per head:

1. **Score pass** — ring-permute the per-node source terms ``e_src``; per
   round, a d=2 SDDMM on the local (row-slab × visiting-block) edge tiles
   produces that block's raw attention scores. Round scores are kept (the
   slot arrays are O(local nnz)); the global max (``pmax``) and the per-row
   ``log Σ exp`` close the softmax with the same log-form normalization as
   the single-chip slot softmax.
2. **Aggregate pass** — ring-permute the projected features ``z``; per
   round, the weighted SpMM applies that block's alphas.

Row softmax is exact under the row partition because every output row's
edges live on its owner (the same locality argument as the reference's
embarrassingly-local dist_row_softmax, gcn.hpp:738-766).

Gradients are exact autodiff: the slot ops carry custom VJPs
(ops/edge_attention.py) and ``ppermute`` transposes to the reverse ring, so
differentiating the *local* loss share and psum-ing afterwards (the
dist_loss_and_grad_exact pattern) yields the global gradient.

All P² blocks share one schedule geometry (forced ``br``/``paired``, steps
padded to the max over blocks), so the per-device slot arrays stack into
(P, P, ...) arrays sharded over the graph axis — the EdgeTileMat/TSched
pytrees are rebuilt per round inside the shard_map body from static config.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .. import sparse as host_sparse
from ..formats import CSRData
from ..models.gat import GATConfig
from ..nn import adam
from ..ops import elementwise as ew
from ..ops.edge_attention import sddmm, spmm_attn
from ..ops.spmm_edges import EdgeTileMat, TSched, _pick_br, slot_valid_mask
from .dist import GRAPH_AXIS, _local_xent_terms
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["idx", "meta", "chi", "ts0", "tmeta"],
    meta_fields=[
        "n",
        "parts",
        "m_loc",
        "n_out_pad",
        "n_in_pad",
        "br",
        "tcw_bits",
        "paired",
        "dtype_name",
        "nnz",
    ],
)
@dataclass(frozen=True)
class DistGatGraph:
    """Row-partitioned adjacency as P×P ring-ordered edge-tile blocks.

    Axis 0 = owning device (shard axis), axis 1 = ring round; entry [j, s]
    is the slot schedule of block A[j, (j+s) % P]. All blocks share one
    geometry (S, S2, br, paired) so the arrays stack. Edge *values* are not
    stored — attention recomputes per-edge weights every layer."""

    idx: jax.Array  # i32[P, P, S*CPS, K]
    meta: jax.Array  # i32[P, P, S]
    chi: jax.Array  # i32[P, P, S, CPS]
    ts0: jax.Array  # i32[P, P, S2]
    tmeta: jax.Array  # i32[P, P, S2]
    n: int
    parts: int
    m_loc: int
    n_out_pad: int
    n_in_pad: int
    br: int
    tcw_bits: int
    paired: bool
    dtype_name: str
    nnz: int

    def shardings(self, mesh: Mesh):
        row = NamedSharding(mesh, P(GRAPH_AXIS))
        return {k: row for k in ("idx", "meta", "chi", "ts0", "tmeta")}


def build_dist_gat_graph(
    csr: CSRData, parts: int, dtype: str = "bfloat16"
) -> DistGatGraph:
    """Host-side build: partition into P×P blocks, schedule each with a
    shared geometry, stack. Self-loops should be present (prep adds them)."""
    n = csr.nrows
    if n % parts:
        raise ValueError(
            f"n ({n}) must be divisible by the mesh size ({parts}); pad the "
            "dataset (dist_matrix.hpp:428 semantics)"
        )
    m_loc = n // parts
    part = host_sparse.uniform_partition(n, parts)
    blocks = host_sparse.partition_blocks(csr, part, part)
    # one geometry for every block: br/paired from the average block density
    br, paired = _pick_br(m_loc, m_loc, max(csr.nnz // (parts * parts), 1))

    from ..ops.spmm_edges import (
        edge_tile_schedule_host,
        pad_edge_schedule,
        transposed_schedule_host,
    )

    scheds = [
        [
            edge_tile_schedule_host(
                blocks[j][(j + s) % parts], dtype=dtype, br=br, paired=paired
            )
            for s in range(parts)
        ]
        for j in range(parts)
    ]
    S_max = max(s["meta"].shape[0] for row in scheds for s in row)
    scheds = [[pad_edge_schedule(s, S_max) for s in row] for row in scheds]
    tscheds = [[transposed_schedule_host(s) for s in row] for row in scheds]
    S2_max = max(t["tmeta"].shape[0] for row in tscheds for t in row)
    tscheds = [
        [
            t
            if t["tmeta"].shape[0] == S2_max
            else transposed_schedule_host(s, pad_steps_to=S2_max)
            for s, t in zip(srow, trow)
        ]
        for srow, trow in zip(scheds, tscheds)
    ]

    m00 = scheds[0][0]
    st = lambda key, src: jnp.stack(
        [jnp.stack([jnp.asarray(src[j][s][key]) for s in range(parts)]) for j in range(parts)]
    )
    return DistGatGraph(
        idx=st("idx", scheds),
        meta=st("meta", scheds),
        chi=st("chi", scheds),
        ts0=st("s0", tscheds),
        tmeta=st("tmeta", tscheds),
        n=n,
        parts=parts,
        m_loc=m_loc,
        n_out_pad=int(m00["n_out_pad"]),
        n_in_pad=int(m00["n_in_pad"]),
        br=int(m00["br"]),
        tcw_bits=int(m00["tcw_bits"]),
        paired=bool(m00["paired"]),
        dtype_name=dtype,
        nnz=csr.nnz,
    )


def _round_ops(g: DistGatGraph, local: dict, s: int):
    """(EdgeTileMat, TSched) of ring round s, rebuilt from the device-local
    stacked arrays (static config from the graph dataclass)."""
    cdtype = jnp.dtype(g.dtype_name)
    mat = EdgeTileMat(
        idx=local["idx"][s],
        w=jnp.zeros(local["idx"][s].shape, cdtype),  # unused (attention sets w)
        meta=local["meta"][s],
        chi=local["chi"][s],
        n_out=g.m_loc,
        n_in=g.m_loc,
        n_out_pad=g.n_out_pad,
        n_in_pad=g.n_in_pad,
        nnz=0,  # diagnostic only; kernels never read it
        br=g.br,
        tcw_bits=g.tcw_bits,
        dtype_name=g.dtype_name,
        fill=1.0,
        paired=g.paired,
    )
    sched = TSched(s0=local["ts0"][s], tmeta=local["tmeta"][s])
    return mat, sched


def _ring_perm(parts: int):
    return [(i, (i - 1) % parts) for i in range(parts)]


def _attend_head_dist(g: DistGatGraph, local, zh, e_dst, e_src, slope, parts):
    """Two-pass ring attention for one head (per-device body)."""
    m_loc = zh.shape[0]
    ones = jnp.ones((m_loc, 1), jnp.float32)
    perm = _ring_perm(parts)

    # pass 1: raw scores per round (kept), ring the source terms
    vis = e_src
    scores, valids = [], []
    for s in range(parts):
        mat, sched = _round_ops(g, local, s)
        sc = sddmm(
            mat,
            sched,
            jnp.concatenate([e_dst, ones], axis=1),
            jnp.concatenate([ones, vis], axis=1),
        )
        scores.append(ew.leaky_relu(sc, slope))
        valids.append(slot_valid_mask(mat.idx))
        if s + 1 < parts:
            vis = jax.lax.ppermute(vis, GRAPH_AXIS, perm=perm)

    # per-row stabilization, mirroring ops.edge_attention.slot_softmax:
    # a clipped global-shift pass estimates each (row-local) row's LSE,
    # then the real normalization shifts by that per-row constant. The
    # row sums are row-local (no extra comm beyond the d=1 slot passes).
    smax_loc = jnp.max(
        jnp.stack([jnp.max(jnp.where(v > 0, sc, -jnp.inf)) for sc, v in zip(scores, valids)])
    )
    # stop_gradient the operand: pmax itself has no differentiation rule
    smax = jax.lax.pmax(jax.lax.stop_gradient(smax_loc), GRAPH_AXIS)
    smax = jnp.where(jnp.isfinite(smax), smax, 0.0)

    rs1 = jnp.zeros((m_loc, 1), jnp.float32)
    for s in range(parts):
        mat, sched = _round_ops(g, local, s)
        sg = jax.lax.stop_gradient(scores[s])
        e1 = jnp.where(valids[s] > 0, jnp.exp(jnp.clip(sg - smax, -80.0, 0.0)), 0.0)
        rs1 = rs1 + spmm_attn(mat, sched, e1, ones)
    lse1 = jax.lax.stop_gradient(smax + jnp.log(jnp.maximum(rs1, 1e-30)))

    rowsum = jnp.zeros((m_loc, 1), jnp.float32)
    for s in range(parts):
        mat, sched = _round_ops(g, local, s)
        shift = jax.lax.stop_gradient(sddmm(mat, sched, lse1, ones))
        e = jnp.where(valids[s] > 0, jnp.exp(scores[s] - shift), 0.0)
        rowsum = rowsum + spmm_attn(mat, sched, e, ones)
    log_rs = jnp.log(jnp.maximum(rowsum, 1e-30))

    # pass 2: alpha-weighted aggregation, ring the projected features
    vis_z = zh
    out = jnp.zeros((m_loc, zh.shape[1]), jnp.float32)
    for s in range(parts):
        mat, sched = _round_ops(g, local, s)
        shift = jax.lax.stop_gradient(sddmm(mat, sched, lse1, ones))
        slot_lrs = sddmm(mat, sched, log_rs, ones)
        alpha = jnp.where(
            valids[s] > 0, jnp.exp(scores[s] - shift - slot_lrs), 0.0
        )
        out = out + spmm_attn(mat, sched, alpha, vis_z)
        if s + 1 < parts:
            vis_z = jax.lax.ppermute(vis_z, GRAPH_AXIS, perm=perm)
    return out


def dist_gat_forward(params, g: DistGatGraph, local, x, config: GATConfig, parts):
    h = x
    H = config.heads
    for i, layer in enumerate(params):
        out = config.sizes[i + 1]
        z = h @ layer["W"]
        heads = []
        for hd in range(H):
            zh = z[:, hd * out : (hd + 1) * out]
            e_dst = zh @ layer["a_dst"][hd][:, None]
            e_src = zh @ layer["a_src"][hd][:, None]
            heads.append(
                _attend_head_dist(
                    g, local, zh, e_dst, e_src, config.att_slope, parts
                )
            )
        if i + 1 < config.num_layers:
            h = jnp.concatenate(heads, axis=1) + layer["b"]
            h = ew.leaky_relu(h, config.leaky_slope)
        else:
            h = sum(heads) / H + layer["b"]
    return h


def make_dist_gat_train_step(
    config: GATConfig,
    mesh: Mesh,
    graph: DistGatGraph,
    hparams: dict | None = None,
    use_mask: bool = False,
    optimizer: str = "adam",
):
    """Jitted distributed GAT train step: (params, opt_state, graph_arrays,
    x, y[, mask]) -> (params, opt_state, loss, acc); x/y sharded by rows."""
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    if getattr(config, "edge_weighted", False):
        raise ValueError(
            "edge-weighted GAT is single-chip only (DistGatGraph stores no "
            "edge values); drop edge_weighted or use -P 1"
        )
    hp = dict(adam.DEFAULT_HPARAMS)
    if hparams:
        hp.update(hparams)
    parts = graph.parts
    n_total = graph.n

    repl = P()
    shard_rows = P(GRAPH_AXIS)
    arrays_spec = {k: shard_rows for k in ("idx", "meta", "chi", "ts0", "tmeta")}
    params_spec = [
        {k: repl for k in ("W", "a_dst", "a_src", "b")}
        for _ in range(config.num_layers)
    ]
    opt_spec = adam.AdamState(step=repl, m=params_spec, v=params_spec)
    in_specs = (params_spec, opt_spec, arrays_spec, shard_rows, shard_rows)
    if use_mask:
        in_specs = in_specs + (shard_rows,)
    out_specs = (params_spec, opt_spec, repl, repl)

    def step(params, opt_state, arrays, x, y, *maybe_mask):
        local = {k: v[0] for k, v in arrays.items()}  # drop the shard axis
        yv = y.reshape(-1)
        mask = maybe_mask[0] if maybe_mask else None
        if mask is None:
            m = None
            denom = jnp.asarray(n_total, jnp.float32)
        else:
            m = mask.astype(jnp.float32)
            denom = jnp.maximum(jax.lax.psum(jnp.sum(m), GRAPH_AXIS), 1.0)

        def loss_fn(p):
            logits = dist_gat_forward(p, graph, local, x, config, parts)
            return _local_xent_terms(logits, yv, m, denom)

        (loss_loc, acc_loc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        loss = jax.lax.psum(loss_loc, GRAPH_AXIS)
        acc = jax.lax.psum(acc_loc, GRAPH_AXIS)
        grads = jax.tree.map(lambda t: jax.lax.psum(t, GRAPH_AXIS), grads)
        if optimizer == "sgd":
            params = adam.sgd_update(params, grads, hp["lr"], hp["weight_decay"])
        else:
            params, opt_state = adam.adam_update(params, grads, opt_state, **hp)
        return params, opt_state, loss, acc

    smapped = shard_map(
        step, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )

    def wrapper(params, opt_state, graph_arrays, x, y, mask=None):
        args = (params, opt_state, graph_arrays, x, y)
        if use_mask:
            args = args + (mask,)
        return smapped(*args)

    return jax.jit(wrapper)


def graph_arrays(g: DistGatGraph) -> dict:
    """The sharded-array dict the step consumes (data fields only)."""
    return dict(idx=g.idx, meta=g.meta, chi=g.chi, ts0=g.ts0, tmeta=g.tmeta)
