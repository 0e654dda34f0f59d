"""PageRank tests vs a numpy oracle replicating the reference's exact
iteration (pagerank.hpp:13-42), plus the distributed variant."""

import numpy as np
import pytest

from mg_gcn_tpu import sparse
from mg_gcn_tpu.models.pagerank import pagerank, pagerank_dist


def oracle(graph, damping=0.85, eps=1e-4, max_iters=1000):
    """The reference's loop in numpy: p' = Mᵀ(d·p + (1-d)·1), M row-stochastic."""
    a = sparse.normalize(graph, axis=False).to_dense()
    m = a.T
    p = np.ones(graph.nrows, np.float32)
    for _ in range(max_iters):
        p_new = m @ (damping * p + (1 - damping))
        if np.max(np.abs(p_new - p)) < eps:
            p = p_new
            break
        p = p_new
    return p * (graph.nrows / p.sum())


def test_pagerank_matches_oracle():
    g = sparse.random_graph(96, 5, seed=11)
    got = pagerank(g)
    want = oracle(g)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_pagerank_pattern_impl_matches_xla():
    import jax.experimental.pallas as pl

    orig = pl.pallas_call
    from mg_gcn_tpu.ops import spmm_pattern as sp

    def patched(*args, **kw):
        kw.setdefault("interpret", True)
        return orig(*args, **kw)

    sp.pl.pallas_call = patched
    try:
        g = sparse.random_graph(80, 4, seed=15, weights="ones")
        got = pagerank(g, impl="pattern")
        want = pagerank(g, impl="xla")
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    finally:
        sp.pl.pallas_call = orig


def test_pagerank_sums_to_n():
    g = sparse.random_graph(64, 4, seed=2)
    p = pagerank(g)
    np.testing.assert_allclose(p.sum(), 64.0, rtol=1e-5)


def test_pagerank_dist_matches_single():
    from mg_gcn_tpu.parallel import dist

    g = sparse.random_graph(64, 5, seed=3)
    single = pagerank(g)
    mesh = dist.make_mesh(4)
    got = pagerank_dist(g, mesh)
    np.testing.assert_allclose(got, single, rtol=1e-4, atol=1e-5)


def test_pagerank_gather_impl_matches_xla():
    g = sparse.random_graph(300, 6, seed=13)
    got = pagerank(g, impl="gather")
    want = pagerank(g, impl="xla")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pagerank_edge_impl_matches_xla():
    g = sparse.random_graph(300, 6, seed=14)
    got = pagerank(g, impl="edge")
    want = pagerank(g, impl="xla")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
