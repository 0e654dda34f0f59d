"""Host graph-op tests: normalize / transpose / partition vs scipy oracles
(mirrors test/test_matrix.cpp:78-109 plus dist_matrix block construction)."""

import numpy as np
import pytest
import scipy.sparse as sp

from mg_gcn_tpu import sparse
from mg_gcn_tpu.formats import CSRData


def rand_csr(n=64, m=None, density=0.1, seed=0):
    m = m or n
    mat = sp.random(n, m, density=density, format="csr", random_state=seed, dtype=np.float32)
    mat.data = (mat.data + 0.5).astype(np.float32)
    return CSRData.from_scipy(mat)


def test_normalize_rows():
    csr = rand_csr(seed=1)
    out = sparse.normalize(csr, axis=False).to_dense()
    sums = out.sum(axis=1)
    nz = np.diff(csr.indptr) > 0
    np.testing.assert_allclose(sums[nz], 1.0, rtol=1e-5)


def test_normalize_rows_trailing_empty():
    # Regression (advisor r1): with trailing empty rows the reduceat
    # start-clamp truncated the last non-empty row's segment, so its sum
    # excluded data[nnz-1]. Row 0 = [1, 2] must become [1/3, 2/3].
    indptr = np.array([0, 2, 2, 2], np.int64)
    csr = CSRData(
        indptr=indptr,
        indices=np.array([0, 1], np.int32),
        data=np.array([1.0, 2.0], np.float32),
        shape=(3, 3),
    )
    out = sparse.normalize(csr, axis=False)
    np.testing.assert_allclose(out.data, [1 / 3, 2 / 3], rtol=1e-6)


def test_normalize_rows_numpy_fallback_trailing_empty(monkeypatch):
    # Same regression exercising the pure-numpy path even when the native
    # library is available.
    from mg_gcn_tpu import native

    monkeypatch.setattr(native, "available", lambda: False)
    indptr = np.array([0, 1, 3, 3, 3], np.int64)
    csr = CSRData(
        indptr=indptr,
        indices=np.array([2, 0, 1], np.int32),
        data=np.array([4.0, 1.0, 3.0], np.float32),
        shape=(4, 3),
    )
    out = sparse.normalize(csr, axis=False)
    np.testing.assert_allclose(out.data, [1.0, 0.25, 0.75], rtol=1e-6)


def test_normalize_cols():
    csr = rand_csr(seed=2)
    out = sparse.normalize(csr, axis=True).to_dense()
    sums = out.sum(axis=0)
    nz = sums != 0
    np.testing.assert_allclose(sums[nz], 1.0, rtol=1e-5)


def test_transpose_matches_dense():
    csr = rand_csr(n=40, m=70, seed=3)
    t = sparse.transpose(csr)
    np.testing.assert_allclose(t.to_dense(), csr.to_dense().T)
    # reference property: stable counting sort keeps row order within columns
    assert t.shape == (70, 40)
    tt = sparse.transpose(t)
    np.testing.assert_allclose(tt.to_dense(), csr.to_dense())


def test_partition_blocks_cover():
    csr = rand_csr(n=48, seed=4)
    p = sparse.uniform_partition(48, 4)
    np.testing.assert_array_equal(p, [0, 12, 24, 36, 48])
    blocks = sparse.partition_blocks(csr, p, p)
    dense = csr.to_dense()
    for i in range(4):
        for j in range(4):
            blk = blocks[i][j].to_dense()
            np.testing.assert_allclose(
                blk, dense[p[i] : p[i + 1], p[j] : p[j + 1]]
            )
    total_nnz = sum(blocks[i][j].nnz for i in range(4) for j in range(4))
    assert total_nnz == csr.nnz


def test_uniform_partition_reference_formula():
    # main.cpp:139-141: p[i] = i*n/P with integer division
    p = sparse.uniform_partition(10, 3)
    np.testing.assert_array_equal(p, [0, 3, 6, 10])


def test_comm_volume():
    dense = np.zeros((4, 4), np.float32)
    dense[0, 2] = 1  # partition 0 needs col 2 (owned by partition 1)
    dense[0, 3] = 1  # and col 3
    dense[3, 0] = 1  # partition 1 needs col 0
    csr = CSRData.from_scipy(sp.csr_matrix(dense))
    vol = sparse.comm_volume(csr, np.array([0, 2, 4]))
    np.testing.assert_array_equal(vol, [[0, 2], [1, 0]])


def test_permute_symmetric():
    csr = rand_csr(n=20, seed=5)
    perm = np.random.default_rng(9).permutation(20)
    out = sparse.permute_symmetric(csr, perm)
    dense = csr.to_dense()
    expected = dense[np.ix_(perm, perm)]
    np.testing.assert_allclose(out.to_dense(), expected)


def test_permuted_dataset_alignment():
    """graph and features/labels must use the SAME permutation convention:
    an edge (u, v) in the permuted graph must connect the same feature rows
    as the original edge."""
    from mg_gcn_tpu.data import prep
    from mg_gcn_tpu.formats import Dataset

    n = 16
    rng = np.random.default_rng(10)
    g = sparse.random_graph(n, 3, seed=11, weights="random")
    feats = np.arange(n, dtype=np.float32).reshape(-1, 1)  # feature == node id
    ds = Dataset(
        graph=g,
        features=feats,
        labels=np.arange(n, dtype=np.int32).reshape(-1, 1),
        sets=np.zeros((n, 1), np.int32),
    )
    out = prep.permuted_variant(ds, seed=5)
    orig = g.to_dense()
    newd = out.graph.to_dense()
    ids = out.features.reshape(-1).astype(int)  # new-index -> old node id
    for i in range(n):
        for j in range(n):
            assert newd[i, j] == orig[ids[i], ids[j]]


def test_cluster_order_improves_locality():
    # two hard communities shuffled; rcm/bfs should de-shuffle them
    rng = np.random.default_rng(12)
    n = 64
    dense = np.zeros((n, n), np.float32)
    comm = rng.permutation(np.repeat([0, 1], n // 2))
    for i in range(n):
        for j in range(n):
            if comm[i] == comm[j] and rng.random() < 0.3:
                dense[i, j] = 1
    np.fill_diagonal(dense, 1)
    csr = CSRData.from_scipy(sp.csr_matrix(dense))
    for method in ("rcm", "bfs", "degree"):
        order = sparse.cluster_order(csr, method)
        assert sorted(order) == list(range(n))
    order = sparse.cluster_order(csr, "bfs")
    reordered = dense[np.ix_(order, order)]
    # within the first half, nodes should now be from one community
    first = comm[order[: n // 2]]
    assert (first == first[0]).mean() > 0.9


def test_add_self_loops():
    csr = rand_csr(n=16, seed=6)
    out = sparse.add_self_loops(csr)
    d = out.to_dense()
    assert np.all(np.diag(d) != 0)


def test_random_graph():
    g = sparse.random_graph(100, avg_degree=8, seed=1)
    assert g.shape == (100, 100)
    assert np.all(np.diag(g.to_dense()) == 1)  # self loops
    assert g.nnz >= 100
