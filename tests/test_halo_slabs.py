"""Per-process halo slab builds (VERDICT r3 missing #4).

``DistHaloMat.from_slabs`` + ``formats.read_pigo_csr_slab`` let each process
build only its row slab's halo schedule. Single-process it must be
bit-identical to the classic ``from_csr`` build; the slab reader must
round-trip any row window of a PIGO file. The true 2-process path is
exercised by tests/test_multiprocess.py.
"""

import os

import numpy as np
import pytest

from mg_gcn_tpu import sparse
from mg_gcn_tpu.formats import read_pigo_csr, read_pigo_csr_slab, write_pigo_csr
from mg_gcn_tpu.parallel import dist_halo


def _graph(n=256, deg=6, seed=9):
    g = sparse.random_graph(n, deg, seed=seed, weights="random")
    return sparse.normalize(g, axis=True)


def test_read_pigo_csr_slab_roundtrip(tmp_path):
    g = _graph()
    path = os.path.join(tmp_path, "graph.bin")
    write_pigo_csr(path, g)
    full = read_pigo_csr(path)
    for r0, r1 in [(0, 64), (64, 192), (192, 256), (0, 256), (100, 100)]:
        slab = read_pigo_csr_slab(path, r0, r1)
        assert slab.shape == (r1 - r0, g.ncols)
        e0, e1 = int(full.indptr[r0]), int(full.indptr[r1])
        np.testing.assert_array_equal(slab.indptr, full.indptr[r0 : r1 + 1] - e0)
        np.testing.assert_array_equal(slab.indices, full.indices[e0:e1])
        np.testing.assert_allclose(slab.data, full.data[e0:e1])


def test_read_pigo_csr_slab_bounds(tmp_path):
    g = _graph(n=64)
    path = os.path.join(tmp_path, "graph.bin")
    write_pigo_csr(path, g)
    with pytest.raises(ValueError, match="out of range"):
        read_pigo_csr_slab(path, 0, 65)


@pytest.mark.parametrize("parts", [2, 4])
def test_from_slabs_matches_from_csr(parts):
    g = _graph()
    m_loc = g.nrows // parts

    calls = []

    def slab_of(j):
        calls.append(j)
        r0, r1 = j * m_loc, (j + 1) * m_loc
        e0, e1 = int(g.indptr[r0]), int(g.indptr[r1])
        from mg_gcn_tpu.formats import CSRData

        return CSRData(
            indptr=g.indptr[r0 : r1 + 1] - e0,
            indices=g.indices[e0:e1],
            data=g.data[e0:e1],
            shape=(m_loc, g.ncols),
        )

    a = dist_halo.DistHaloMat.from_csr(g, parts)
    b = dist_halo.DistHaloMat.from_slabs(slab_of, g.nrows, parts)
    assert sorted(calls) == list(range(parts))
    assert a.n == b.n and a.parts == b.parts and a.nnz == b.nnz
    assert a.round_widths == b.round_widths
    assert a.halo_total == b.halo_total
    np.testing.assert_array_equal(np.asarray(a.loc_rows), np.asarray(b.loc_rows))
    np.testing.assert_array_equal(np.asarray(a.loc_cols), np.asarray(b.loc_cols))
    np.testing.assert_allclose(np.asarray(a.loc_vals), np.asarray(b.loc_vals))
    for s in range(parts - 1):
        np.testing.assert_array_equal(
            np.asarray(a.rem_rows[s]), np.asarray(b.rem_rows[s])
        )
        np.testing.assert_array_equal(
            np.asarray(a.rem_cols[s]), np.asarray(b.rem_cols[s])
        )
        np.testing.assert_allclose(
            np.asarray(a.rem_vals[s]), np.asarray(b.rem_vals[s])
        )
        np.testing.assert_array_equal(
            np.asarray(a.send_idx[s]), np.asarray(b.send_idx[s])
        )


def test_from_slabs_from_file(tmp_path):
    """End-to-end: slab-of-file build == whole-graph build."""
    g = _graph(n=128, deg=5)
    path = os.path.join(tmp_path, "graph.bin")
    write_pigo_csr(path, g)
    parts = 4
    m_loc = g.nrows // parts
    b = dist_halo.DistHaloMat.from_slabs(
        lambda j: read_pigo_csr_slab(path, j * m_loc, (j + 1) * m_loc),
        g.nrows,
        parts,
    )
    a = dist_halo.DistHaloMat.from_csr(g, parts)
    np.testing.assert_array_equal(np.asarray(a.loc_rows), np.asarray(b.loc_rows))
    for s in range(parts - 1):
        np.testing.assert_array_equal(
            np.asarray(a.send_idx[s]), np.asarray(b.send_idx[s])
        )
        np.testing.assert_allclose(
            np.asarray(a.rem_vals[s]), np.asarray(b.rem_vals[s])
        )


def _field_trees_match(a, b, rtol=1e-6):
    import jax

    la, ta = jax.tree.flatten(a)
    lb, tb = jax.tree.flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=rtol, atol=1e-7
        )


@pytest.mark.parametrize("engine", ["xla", "gather"])
def test_from_pigo_pair_matches_from_csr_pair(tmp_path, engine):
    """The production path (VERDICT r4 #2): the full normalized (Âᵀ, Â)
    halo pair from graph.bin + graph_t.bin slabs must match the in-memory
    normalize→transpose→from_csr_pair build for BOTH engines (values via
    float64 colsum division, so only rounding-order noise is tolerated)."""
    from mg_gcn_tpu.formats import ensure_pigo_transpose

    g = sparse.random_graph(192, 6, seed=11, weights="random")
    d = os.path.join(tmp_path, "ds")
    os.makedirs(d)
    write_pigo_csr(os.path.join(d, "graph.bin"), g)
    tpath = ensure_pigo_transpose(d)
    assert os.path.exists(tpath)

    parts = 4
    a = sparse.normalize(g, axis=True)
    a_t = sparse.transpose(a)
    want = dist_halo.DistHaloPair.from_csr_pair(a_t, a, parts, engine=engine)
    got = dist_halo.DistHaloPair.from_pigo(
        os.path.join(d, "graph.bin"), tpath, parts, engine=engine
    )
    assert got.fwd.round_widths == want.fwd.round_widths
    assert got.bwd.halo_total == want.bwd.halo_total
    assert got.fwd.nnz == want.fwd.nnz
    _field_trees_match(got, want)


def test_gather_from_slabs_matches_from_csr():
    """DistHaloGatherMat.from_slabs (the papers100M engine's slab build,
    VERDICT r4 #2a) is bit-identical to the monolithic build single-process."""
    g = _graph(n=256, deg=5, seed=13)
    parts = 4
    m_loc = g.nrows // parts
    from mg_gcn_tpu.formats import CSRData

    def slab_of(j):
        r0, r1 = j * m_loc, (j + 1) * m_loc
        e0, e1 = int(g.indptr[r0]), int(g.indptr[r1])
        return CSRData(
            indptr=g.indptr[r0 : r1 + 1] - e0,
            indices=g.indices[e0:e1],
            data=g.data[e0:e1],
            shape=(m_loc, g.ncols),
        )

    a = dist_halo.DistHaloGatherMat.from_csr(g, parts)
    b = dist_halo.DistHaloGatherMat.from_slabs(slab_of, g.nrows, parts)
    assert a.round_widths == b.round_widths and a.nnz == b.nnz
    for f in dist_halo.GATHER_HALO_FIELDS:
        va, vb = getattr(a, f), getattr(b, f)
        if isinstance(va, tuple):
            for s, (xa, xb) in enumerate(zip(va, vb)):
                np.testing.assert_array_equal(
                    np.asarray(xa), np.asarray(xb), err_msg=f"{f}[{s}]"
                )
        else:
            np.testing.assert_array_equal(
                np.asarray(va), np.asarray(vb), err_msg=f
            )


@pytest.mark.parametrize("engine", ["xla", "gather"])
def test_from_pigo_sage_norm_matches(tmp_path, engine):
    """norm="sage": the (M, Mᵀ) mean-aggregator pair from slabs must match
    normalize(axis=False) → transpose → from_csr_pair."""
    from mg_gcn_tpu.formats import ensure_pigo_transpose

    g = sparse.random_graph(192, 6, seed=23, weights="random")
    d = os.path.join(tmp_path, "ds")
    os.makedirs(d)
    write_pigo_csr(os.path.join(d, "graph.bin"), g)
    tpath = ensure_pigo_transpose(d)

    parts = 4
    m = sparse.normalize(g, axis=False)
    m_t = sparse.transpose(m)
    want = dist_halo.DistHaloPair.from_csr_pair(m, m_t, parts, engine=engine)
    got = dist_halo.DistHaloPair.from_pigo(
        os.path.join(d, "graph.bin"), tpath, parts, engine=engine, norm="sage"
    )
    assert got.fwd.round_widths == want.fwd.round_widths
    assert got.bwd.halo_total == want.bwd.halo_total
    _field_trees_match(got, want)
