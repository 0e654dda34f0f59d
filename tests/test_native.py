"""Native C++ host-op tests: must match the numpy implementations exactly."""

import numpy as np
import pytest

from mg_gcn_tpu import native, sparse
from mg_gcn_tpu.formats import CSRData


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def rand_csr(n=200, m=None, deg=7, seed=0, weights="random"):
    return sparse.random_graph(n, deg, seed=seed, weights=weights)


def test_expand_rows():
    g = rand_csr()
    counts = np.diff(g.indptr)
    expected = np.repeat(np.arange(g.nrows), counts).astype(np.int32)
    np.testing.assert_array_equal(native.expand_rows(g), expected)


@pytest.mark.parametrize("axis", [False, True])
def test_normalize(axis):
    g = rand_csr(seed=1)
    got = native.normalize(g, axis)
    import os

    os.environ["MG_GCN_NO_NATIVE"] = "1"
    try:
        # bypass the native fast path inside sparse.normalize
        want = sparse.normalize(
            CSRData(g.indptr, g.indices, g.data, g.shape), axis
        ).data
    finally:
        del os.environ["MG_GCN_NO_NATIVE"]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_transpose():
    g = rand_csr(seed=2)
    t = native.transpose(g)
    np.testing.assert_allclose(t.to_dense(), g.to_dense().T)


def test_comm_volume_native_matches_numpy():
    g = rand_csr(n=64, seed=4)
    part = sparse.uniform_partition(64, 4)
    got = native.comm_volume(g, part)
    # numpy oracle (the body of sparse.comm_volume's fallback)
    counts = np.diff(g.indptr)
    rows = np.repeat(np.arange(64), counts)
    cols = g.indices.astype(np.int64)
    row_block = np.searchsorted(part[1:], rows, side="right")
    col_block = np.searchsorted(part[1:], cols, side="right")
    want = np.zeros((4, 4), np.int64)
    for i in range(4):
        sel = row_block == i
        for j in range(4):
            want[i, j] = np.unique(cols[sel & (col_block == j)]).size
    np.testing.assert_array_equal(got, want)


def test_sparse_module_uses_native():
    """sparse.normalize/transpose must produce identical results whether or
    not the native path is active (they dispatch internally)."""
    g = rand_csr(seed=5)
    a1 = sparse.normalize(g, axis=True)
    t1 = sparse.transpose(g)
    import os

    os.environ["MG_GCN_NO_NATIVE"] = "1"
    try:
        a2 = sparse.normalize(g, axis=True)
        t2 = sparse.transpose(g)
    finally:
        del os.environ["MG_GCN_NO_NATIVE"]
    np.testing.assert_allclose(a1.data, a2.data, rtol=1e-6)
    np.testing.assert_allclose(t1.to_dense(), t2.to_dense())


def test_native_transpose_deterministic_order():
    """Native transpose must match the stable numpy counting sort exactly
    (same within-column source-row order — float accumulation order
    downstream must be identical native-vs-numpy and run-to-run)."""
    import os

    from mg_gcn_tpu import sparse as hs

    g = rand_csr(n=800, seed=7, weights="random")
    t_native = native.transpose(g)
    os.environ["MG_GCN_NO_NATIVE"] = "1"
    try:
        t_numpy = hs.transpose(g)
    finally:
        del os.environ["MG_GCN_NO_NATIVE"]
    np.testing.assert_array_equal(t_native.indptr, t_numpy.indptr)
    np.testing.assert_array_equal(t_native.indices, t_numpy.indices)
    np.testing.assert_array_equal(t_native.data, t_numpy.data)
