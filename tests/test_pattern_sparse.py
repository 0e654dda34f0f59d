"""Block-sparse pattern SpMM tests (CPU interpret) vs dense oracles."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as ss

from mg_gcn_tpu import sparse
from mg_gcn_tpu.formats import CSRData
from mg_gcn_tpu.ops import spmm_pattern_sparse as sps


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kw):
        kw.setdefault("interpret", True)
        return orig(*args, **kw)

    monkeypatch.setattr(sps.pl, "pallas_call", patched)
    yield


def clustered_graph(n=9000, k=2, p_in=0.004, p_out=0.00005, seed=0):
    """Two-community graph: strongly block-diagonal pattern."""
    rng = np.random.default_rng(seed)
    comm = (np.arange(n) * k // n).astype(np.int64)
    src = rng.integers(0, n, n * 6)
    dst = rng.integers(0, n, n * 6)
    same = comm[src] == comm[dst]
    keep = same | (rng.random(n * 6) < 0.02)
    src, dst = src[keep], dst[keep]
    src = np.concatenate([src, np.arange(n)])
    dst = np.concatenate([dst, np.arange(n)])
    m = ss.csr_matrix((np.ones(src.size, np.float32), (src, dst)), shape=(n, n))
    m.data[:] = 1.0
    return CSRData.from_scipy(m)


def test_device_build_matches_host():
    g = clustered_graph(n=5000)
    f1, _ = sps.block_pattern_pair_from_binary_csr(g, build_on_device=True)
    f2, _ = sps.block_pattern_pair_from_binary_csr(g, build_on_device=False)
    np.testing.assert_array_equal(np.asarray(f1.tiles), np.asarray(f2.tiles))
    np.testing.assert_array_equal(np.asarray(f1.fwd_tile), np.asarray(f2.fwd_tile))


def test_block_pattern_forward_backward():
    g = clustered_graph()
    fwd, bwd = sps.block_pattern_pair_from_binary_csr(g, dtype="float32")
    assert fwd.occupancy < 0.8, f"expected skipping, occupancy {fwd.occupancy}"
    b = np.random.default_rng(1).random((g.nrows, 12)).astype(np.float32)
    a_hat = sparse.normalize(g, axis=True).to_dense()
    got_f = np.asarray(sps.spmm_block_pattern(fwd, jnp.asarray(b)))
    np.testing.assert_allclose(got_f, a_hat.T @ b, rtol=1e-5, atol=1e-5)
    got_b = np.asarray(sps.spmm_block_pattern(bwd, jnp.asarray(b)))
    np.testing.assert_allclose(got_b, a_hat @ b, rtol=1e-5, atol=1e-5)


def test_block_pattern_empty_blocks_zeroed():
    """Graph confined to the first community: later output blocks must be 0,
    not garbage (the dummy-tile initialization path)."""
    n = 9000
    rng = np.random.default_rng(2)
    src = rng.integers(0, 2000, 4000)
    dst = rng.integers(0, 2000, 4000)
    m = ss.csr_matrix((np.ones(src.size, np.float32), (src, dst)), shape=(n, n))
    m.data[:] = 1.0
    g = CSRData.from_scipy(m)
    fwd, bwd = sps.block_pattern_pair_from_binary_csr(g, dtype="float32")
    b = np.random.default_rng(3).random((n, 8)).astype(np.float32)
    a_hat = sparse.normalize(g, axis=True).to_dense()
    got_b = np.asarray(sps.spmm_block_pattern(bwd, jnp.asarray(b)))
    np.testing.assert_allclose(got_b, a_hat @ b, rtol=1e-5, atol=1e-5)
    assert np.abs(got_b[4096:]).max() == 0


@pytest.mark.slow
def test_block_pattern_in_model():
    from mg_gcn_tpu.models.gcn import GCNConfig, init_params, loss_and_grad
    from mg_gcn_tpu.ops.spmm import AggPair, COOMat

    g = clustered_graph(n=5000)
    fwd, bwd = sps.block_pattern_pair_from_binary_csr(g, dtype="float32")
    pair_bp = AggPair(fwd=fwd, bwd=bwd)
    a = sparse.normalize(g, axis=True)
    a_t = sparse.transpose(a)
    pair_coo = AggPair(COOMat.from_csr(a_t), COOMat.from_csr(a))
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((g.nrows, 6)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 3, g.nrows).astype(np.int32))
    config = GCNConfig(sizes=(6, 4, 3))
    params = init_params(config)
    l1, a1, g1 = loss_and_grad(params, pair_coo, x, y, config)
    l2, a2, g2 = loss_and_grad(params, pair_bp, x, y, config)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    for d1, d2 in zip(g1, g2):
        for k in d1:
            np.testing.assert_allclose(
                np.asarray(d2[k]), np.asarray(d1[k]), rtol=5e-4, atol=1e-5
            )


def test_plane_mask_banded_graph():
    """Banded graph: diagonal tiles are occupied but only 1-2 of their 32
    column planes contain edges — exercises the per-plane MXU skipping."""
    n = 9000
    rng = np.random.default_rng(5)
    src = np.arange(n).repeat(3)
    dst = np.clip(src + rng.integers(-60, 61, src.size), 0, n - 1)
    m = ss.csr_matrix((np.ones(src.size, np.float32), (src, dst)), shape=(n, n))
    m.data[:] = 1.0
    g = CSRData.from_scipy(m)
    fwd, bwd = sps.block_pattern_pair_from_binary_csr(g, dtype="float32")
    # plane occupancy must be well below tile occupancy for a band
    assert fwd.plane_occ < 0.25, f"plane occupancy {fwd.plane_occ}"
    assert fwd.fwd_planes.shape[0] == fwd.fwd_tile.shape[0] * sps.K_PLANES
    b = np.random.default_rng(6).random((n, 10)).astype(np.float32)
    a_hat = sparse.normalize(g, axis=True).to_dense()
    got_f = np.asarray(sps.spmm_block_pattern(fwd, jnp.asarray(b)))
    np.testing.assert_allclose(got_f, a_hat.T @ b, rtol=1e-5, atol=1e-5)
    got_b = np.asarray(sps.spmm_block_pattern(bwd, jnp.asarray(b)))
    np.testing.assert_allclose(got_b, a_hat @ b, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("tile_r", [256, 2048])
def test_block_pattern_tile_r_variants(tile_r):
    g = clustered_graph(n=5000)
    fwd, bwd = sps.block_pattern_pair_from_binary_csr(
        g, dtype="float32", tile_r=tile_r
    )
    assert fwd.tiles.shape[1] == tile_r
    b = np.random.default_rng(7).random((g.nrows, 9)).astype(np.float32)
    a_hat = sparse.normalize(g, axis=True).to_dense()
    got_f = np.asarray(sps.spmm_block_pattern(fwd, jnp.asarray(b)))
    np.testing.assert_allclose(got_f, a_hat.T @ b, rtol=1e-5, atol=1e-5)
    got_b = np.asarray(sps.spmm_block_pattern(bwd, jnp.asarray(b)))
    np.testing.assert_allclose(got_b, a_hat @ b, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_block_pattern_wide_features_chunked():
    """d > D_MAX exercises the feature-chunked block-kernel calls."""
    from mg_gcn_tpu.ops.spmm_pattern import D_MAX

    g = clustered_graph(n=5000)
    fwd, bwd = sps.block_pattern_pair_from_binary_csr(g, dtype="float32")
    d = D_MAX + 24
    b = np.random.default_rng(8).random((g.nrows, d)).astype(np.float32)
    a_hat = sparse.normalize(g, axis=True).to_dense()
    got_f = np.asarray(sps.spmm_block_pattern(fwd, jnp.asarray(b)))
    np.testing.assert_allclose(got_f, a_hat.T @ b, rtol=1e-5, atol=1e-5)
    got_b = np.asarray(sps.spmm_block_pattern(bwd, jnp.asarray(b)))
    np.testing.assert_allclose(got_b, a_hat @ b, rtol=1e-5, atol=1e-5)
