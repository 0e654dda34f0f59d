"""PageRank power iteration (parity with the reference ``pagerank.hpp``).

The reference builds a 1-wide GCN layer with W=[damping], b=[1-damping] on
the transposed row-normalized adjacency and iterates until the L-inf change
drops below eps, then rescales to mean 1 (pagerank.hpp:13-42). Note its
teleport term rides *through* the aggregation (the layer adds the bias before
the SpMM), i.e. p' = Mᵀ(d·p + (1-d)·1) with M the row-stochastic matrix —
reproduced here exactly.

Unlike the reference, which synchronizes host<->device every iteration to
evaluate the stopping test on the CPU (pagerank.hpp:28-34), the TPU version
runs CHUNK iterations per dispatch inside ``lax.scan`` (collecting every
iterate's L-inf change) and evaluates the stopping test on the host between
chunks, then returns the exact first iterate whose change crossed eps — the
same stopping rule as the reference, ~CHUNK× fewer dispatches. (A fully
on-device ``lax.while_loop`` was measured at 1.2 s/iteration through the
axon tunnel — the data-dependent cond forces a host round-trip per
iteration on this platform — vs 30 ms/iteration for fixed-trip loops;
scripts/probe_pagerank.py.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import sparse as host_sparse
from ..formats import CSRData
from ..ops.spmm import COOMat, spmm


def _pagerank_mat(graph: CSRData, impl: str = "auto"):
    """The iteration matrix M = (row-normalized A)ᵀ as a device sparse op.

    For binary graphs on TPU this is the bit-packed pattern with a pre-scale:
    M p = Pᵀ (diag(1/outdeg) p) — one PatternMat in "PT" orientation.
    """
    from ..ops import spmm_pattern

    if impl == "auto":
        if spmm_pattern.pattern_feasible(graph):
            impl = "pattern"
        elif jax.default_backend() in ("tpu", "axon"):
            from ..train import _edge_or_gather

            impl = _edge_or_gather(graph)  # O(nnz) kernels by slot fill
        else:
            impl = "xla"
    if impl == "pattern":
        import jax.numpy as jnp

        n = graph.nrows
        n_pad = spmm_pattern.round_up(n, spmm_pattern.N_ALIGN)
        pack = spmm_pattern.pack_bits_on_device(graph, n_pad)
        r = spmm_pattern.row_scale(graph, n_pad)
        return spmm_pattern.PatternMat(
            pack, jnp.asarray(r), n, n_pad, graph.nnz, "PT", "pre", "float32"
        )
    if impl == "gather" and bool((graph.data == 1).all()):
        # binary adjacency: M = Aᵀ diag(1/outdeg) — a pre-scale around a
        # w-less binary walk (half the schedule bytes)
        from ..ops.spmm_gather import gather_mat_from_csr

        outdeg = np.diff(graph.indptr).astype(np.float32)
        try:
            return gather_mat_from_csr(
                host_sparse.transpose(graph),
                scale=1.0 / np.maximum(outdeg, 1.0),
                scale_side="pre",
            )
        except ValueError:
            pass  # schedule too large for single-chip SMEM; COO below
    a = host_sparse.normalize(graph, axis=False)  # row-stochastic
    a_t = host_sparse.transpose(a)
    if impl == "gather":
        from ..ops.spmm_gather import gather_mat_from_csr

        try:
            return gather_mat_from_csr(a_t)
        except ValueError:
            pass  # schedule too large for single-chip SMEM; COO below
    if impl == "edge":
        from ..ops.spmm_edges import edge_tile_mat_from_csr

        try:
            return edge_tile_mat_from_csr(a_t, dtype="float32")
        except ValueError:
            pass  # schedule too large for single-chip SMEM; COO below
    return COOMat.from_csr(a_t)


CHUNK = 8  # power iterations per dispatch


@jax.jit
def _pr_chunk(mat, p, damping):
    """CHUNK power iterations under one dispatch. Module-level jit (not a
    closure rebuilt per power_iterate call) so repeat calls on the same
    matrix hit the trace cache — the compile of the serial-gather kernel at
    products scale is tens of seconds and must not be paid per call."""

    def body(p, _):
        p_new = spmm(mat, damping * p + (1.0 - damping))
        err = jnp.max(jnp.abs(p_new - p))
        return p_new, (p_new[:, 0], err)

    p_last, (ps, errs) = jax.lax.scan(body, p, None, length=CHUNK)
    return p_last, ps, errs


def power_iterate(
    mat,
    n: int,
    damping: float = 0.85,
    eps: float = 1e-4,
    max_iters: int = 1000,
) -> tuple[np.ndarray, int]:
    """The chunked power iteration on any device sparse op ``mat`` with
    n rows/cols: returns ``(p, iters)`` where ``p`` is the EXACT iterate at
    which the reference's stopping rule (L∞ change < eps, do-while —
    pagerank.hpp:28-34) first fires. Each dispatch runs CHUNK iterations,
    stacking the iterates (CHUNK·n f32, a few MB) and their L∞ changes;
    the host picks the first crossing."""

    damping_t = jnp.float32(damping)  # traced arg: no retrace across calls
    p = jnp.ones((n, 1), jnp.float32)
    done_iters = 0
    while done_iters < max_iters:
        allowed = max_iters - done_iters  # cap at max_iters like it < max_iters
        p, ps, errs = _pr_chunk(mat, p, damping_t)
        errs_h = np.asarray(errs)
        hit = np.flatnonzero(errs_h[:allowed] < eps)
        if hit.size:
            k = int(hit[0])
            return np.asarray(ps[k]), done_iters + k + 1
        if allowed <= CHUNK:  # iteration budget exhausted mid-chunk
            return np.asarray(ps[allowed - 1]), max_iters
        done_iters += CHUNK
    return np.asarray(p).reshape(-1), done_iters


def pagerank(
    graph: CSRData,
    damping: float = 0.85,
    eps: float = 1e-4,
    max_iters: int = 1000,
    impl: str = "auto",
) -> np.ndarray:
    """Returns the mean-1-normalized PageRank vector (n,)."""
    mat = _pagerank_mat(graph, impl)
    n = graph.nrows
    p, _ = power_iterate(mat, n, damping, eps, max_iters)
    return p * (n / p.sum())


def pagerank_dist(
    graph: CSRData,
    mesh,
    damping: float = 0.85,
    eps: float = 1e-4,
    max_iters: int = 1000,
    strategy: str = "ring",
) -> np.ndarray:
    """Row-partitioned PageRank over a device mesh (BASELINE config 5).

    The power iteration runs inside shard_map: each device owns a row slab of
    M and p; per-iteration feature exchange uses the ring/all_gather SpMM and
    the stopping test is a psum'd... pmax'd L-inf norm.
    """
    from ..parallel import dist

    a = host_sparse.normalize(graph, axis=False)
    m = host_sparse.transpose(a)
    parts = mesh.devices.size
    dmat = dist.DistRowMat.from_csr(m, parts)
    n = graph.nrows
    spec = jax.sharding.PartitionSpec(dist.GRAPH_AXIS)

    def body_shard(mat):
        local = dict(rows=mat["rows"][0], cols=mat["cols"][0], vals=mat["vals"][0])
        m_loc = n // parts
        p0 = jnp.ones((m_loc, 1), jnp.float32)

        def cond(state):
            p, p_prev, it = state
            err = jax.lax.pmax(jnp.max(jnp.abs(p - p_prev)), dist.GRAPH_AXIS)
            return jnp.logical_and(err >= eps, it < max_iters)

        def body(state):
            p, _, it = state
            p_new = dist.dist_aggregate(local, damping * p + (1.0 - damping), parts, strategy)
            return p_new, p, it + 1

        p1 = dist.dist_aggregate(local, damping * p0 + (1.0 - damping), parts, strategy)
        p, _, _ = jax.lax.while_loop(cond, body, (p1, p0, jnp.int32(1)))
        total = jax.lax.psum(jnp.sum(p), dist.GRAPH_AXIS)
        return (p * (n / total)).reshape(-1)

    f = jax.jit(
        jax.shard_map(
            body_shard,
            mesh=mesh,
            in_specs=(dict(rows=spec, cols=spec, vals=spec),),
            out_specs=spec,
            check_vma=False,
        )
    )
    return np.asarray(f(dict(rows=dmat.rows, cols=dmat.cols, vals=dmat.vals)))
