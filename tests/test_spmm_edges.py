"""Edge-tile weighted SpMM tests (CPU interpret) vs scipy/dense oracles.

Covers the cuSPARSE-generality capability (arbitrary edge values,
cuda_utils.hpp:27-32) the pattern kernels cannot: random weighted graphs,
rectangular shapes, empty rows/row-tiles, f32 and bf16 modes, and the
aggregate() custom-VJP integration.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from mg_gcn_tpu import sparse
from mg_gcn_tpu.formats import CSRData
from mg_gcn_tpu.ops import spmm_edges as se


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kw):
        kw.setdefault("interpret", True)
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", patched)
    monkeypatch.setattr(se.pl, "pallas_call", patched)
    yield


def weighted_csr(n, m=None, density=0.05, seed=0):
    m = m or n
    mat = sp.random(n, m, density=density, format="csr", random_state=seed, dtype=np.float32)
    mat.data = (mat.data * 2 - 0.5).astype(np.float32)  # signed values
    return CSRData.from_scipy(mat)


def run_case(csr, d, dtype="float32", seed=0, **kw):
    rng = np.random.default_rng(seed)
    b = rng.standard_normal((csr.ncols, d)).astype(np.float32)
    mat = se.edge_tile_mat_from_csr(csr, dtype=dtype, **kw)
    got = np.asarray(se.spmm_edge_tiles(mat, jnp.asarray(b)))
    want = csr.to_dense() @ b
    return got, want, mat


def test_square_weighted_f32():
    csr = weighted_csr(300, density=0.05, seed=1)
    got, want, mat = run_case(csr, 16)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert 0 < mat.fill <= 1


def test_rectangular_weighted():
    csr = weighted_csr(200, 450, density=0.04, seed=2)
    got, want, _ = run_case(csr, 24)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_bf16_mode_close():
    csr = weighted_csr(256, density=0.05, seed=3)
    got, want, _ = run_case(csr, 8, dtype="bfloat16")
    # bf16 inputs round to ~3 decimal digits
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_empty_row_tiles_zeroed():
    # rows in the second 512-row tile have no edges: their output block is
    # only touched by the dummy step and must come back exactly zero
    n = 1200
    dense = np.zeros((n, n), np.float32)
    dense[:100, :50] = np.arange(100 * 50, dtype=np.float32).reshape(100, 50) / 999
    dense[1100:, 600:700] = 1.5
    csr = CSRData.from_scipy(sp.csr_matrix(dense))
    rng = np.random.default_rng(0)
    b = rng.standard_normal((n, 8)).astype(np.float32)
    mat = se.edge_tile_mat_from_csr(csr, dtype="float32")
    got = np.asarray(se.spmm_edge_tiles(mat, jnp.asarray(b)))
    np.testing.assert_allclose(got, dense @ b, rtol=1e-5, atol=1e-5)
    assert np.all(got[512:1024] == 0)


def test_duplicate_free_dense_tile():
    # a tile-dense block exercises multi-step tiles (cnt > cps*K slots)
    n = 600
    dense = np.zeros((n, n), np.float32)
    dense[:80, :200] = np.random.default_rng(1).standard_normal((80, 200)).astype(np.float32)
    csr = CSRData.from_scipy(sp.csr_matrix(dense))
    b = np.random.default_rng(2).standard_normal((n, 12)).astype(np.float32)
    mat = se.edge_tile_mat_from_csr(csr, dtype="float32")
    got = np.asarray(se.spmm_edge_tiles(mat, jnp.asarray(b)))
    np.testing.assert_allclose(got, dense @ b, rtol=1e-4, atol=1e-4)


def test_wide_features_chunked():
    csr = weighted_csr(150, density=0.08, seed=4)
    got, want, _ = run_case(csr, se.D_MAX_E + 40)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_empty_matrix():
    csr = CSRData(
        indptr=np.zeros(41, np.int64),
        indices=np.zeros(0, np.int32),
        data=np.zeros(0, np.float32),
        shape=(40, 40),
    )
    b = np.ones((40, 8), np.float32)
    mat = se.edge_tile_mat_from_csr(csr, dtype="float32")
    got = np.asarray(se.spmm_edge_tiles(mat, jnp.asarray(b)))
    assert np.all(got == 0)


def test_aggregate_vjp_uses_bwd():
    from mg_gcn_tpu.ops.spmm import AggPair, aggregate

    csr = weighted_csr(220, density=0.05, seed=5)
    a = sparse.normalize(csr, axis=True)
    a_t = sparse.transpose(a)
    fwd, bwd = se.edge_pair_from_csr_pair(a_t, a, dtype="float32")
    pair = AggPair(fwd=fwd, bwd=bwd)
    b = jnp.asarray(
        np.random.default_rng(6).standard_normal((220, 8)).astype(np.float32)
    )

    out, vjp = jax.vjp(lambda x: aggregate(pair, x), b)
    np.testing.assert_allclose(
        np.asarray(out), a_t.to_dense() @ np.asarray(b), rtol=1e-5, atol=1e-5
    )
    g = jnp.ones_like(out)
    (gb,) = vjp(g)
    np.testing.assert_allclose(
        np.asarray(gb), a.to_dense() @ np.asarray(g), rtol=1e-5, atol=1e-5
    )


def test_large_random_weighted_bf16_vs_coo():
    # end-to-end agreement with the XLA COO path on a bigger graph
    from mg_gcn_tpu.ops.spmm import COOMat, spmm

    g = sparse.random_graph(2000, avg_degree=12, seed=7, weights="uniform")
    got, want, mat = run_case(g, 32, dtype="float32")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    coo = COOMat.from_csr(g)
    via_coo = np.asarray(spmm(coo, jnp.asarray(np.eye(2000, 32, dtype=np.float32))))
    via_edge = np.asarray(
        se.spmm_edge_tiles(mat, jnp.asarray(np.eye(2000, 32, dtype=np.float32)))
    )
    np.testing.assert_allclose(via_edge, via_coo, rtol=1e-4, atol=1e-4)


def test_coo_xla_chunked_matches_direct(monkeypatch):
    """The scanned edge-chunk COO path (big-graph memory cap) must equal the
    direct gather+segment-sum path."""
    from mg_gcn_tpu.ops import spmm as spmm_mod
    from mg_gcn_tpu.ops.spmm import COOMat, _spmm_coo_xla

    g = sparse.random_graph(500, 7, seed=11, weights="uniform")
    b = jnp.asarray(
        np.random.default_rng(12).standard_normal((500, 16)).astype(np.float32)
    )
    mat = COOMat.from_csr(g)
    direct = np.asarray(_spmm_coo_xla(mat, b))
    monkeypatch.setattr(spmm_mod, "GATHER_BYTES_CAP", 4096)  # force many chunks
    chunked = np.asarray(_spmm_coo_xla(mat, b))
    np.testing.assert_allclose(chunked, direct, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(direct, g.to_dense() @ np.asarray(b), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("paired", [False, True])
def test_paired_apply_matches(paired):
    """paired=True (one M@B per chunk pair) must be numerically identical
    to the per-chunk apply."""
    csr = weighted_csr(700, density=0.08, seed=13)
    rng = np.random.default_rng(14)
    b = rng.standard_normal((700, 16)).astype(np.float32)
    mat = se.edge_tile_mat_from_csr(csr, dtype="float32", paired=paired)
    assert mat.paired == paired
    got = np.asarray(se.spmm_edge_tiles(mat, jnp.asarray(b)))
    np.testing.assert_allclose(got, csr.to_dense() @ b, rtol=1e-5, atol=1e-5)


def test_int8_mode_close():
    """int8 mode (per-row weight scales packed in the idx words +
    per-feature operand quantization) stays within 8-bit rounding of the
    exact product, for signed weights."""
    csr = weighted_csr(300, density=0.05, seed=15)
    got, want, mat = run_case(csr, 16, dtype="int8", seed=16)
    assert mat.w is None and mat.row_scale is not None
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 0.03


def test_int8_empty_rows_and_matrix():
    csr = weighted_csr(120, density=0.03, seed=17)
    got, want, _ = run_case(csr, 8, dtype="int8", seed=18)
    assert np.abs(got - want).max() / max(np.abs(want).max(), 1e-9) < 0.03
    empty = CSRData(
        np.zeros(51, np.int64), np.zeros(0, np.int32), np.zeros(0, np.float32), (50, 50)
    )
    got0, want0, _ = run_case(empty, 8, dtype="int8")
    np.testing.assert_array_equal(got0, 0)


def test_int8_rejects_attention_and_transpose():
    import dataclasses

    from mg_gcn_tpu.ops import edge_attention as ea

    csr = weighted_csr(100, density=0.05, seed=19)
    mat = se.edge_tile_mat_from_csr(csr, dtype="int8")
    with pytest.raises(ValueError):
        ea._with_w(mat, jnp.zeros(mat.idx.shape, jnp.float32))
    sched = se.transposed_schedule(mat)
    with pytest.raises(ValueError):
        se.spmm_edge_tiles_t(mat, sched, jnp.zeros((mat.n_out, 8), jnp.float32))


@pytest.mark.slow
def test_sddmm_on_int8_mat_uses_structure_only():
    """SDDMM shares the int8 mat's structure — the quantized-weight payload
    in the idx words must be masked off (scores never read mat.w); the int8
    mode quantizes the OPERANDS per feature, so scores agree with the bf16
    mat's to the 8-bit rounding budget."""
    from mg_gcn_tpu.ops.sddmm import sddmm_edge_tiles

    csr = weighted_csr(200, density=0.05, seed=20)
    rng = np.random.default_rng(21)
    a = rng.standard_normal((200, 16)).astype(np.float32)
    b = rng.standard_normal((200, 16)).astype(np.float32)
    m8 = se.edge_tile_mat_from_csr(csr, dtype="int8")
    mb = se.edge_tile_mat_from_csr(csr, dtype="bfloat16", br=m8.br, paired=m8.paired)
    s8 = np.asarray(sddmm_edge_tiles(m8, jnp.asarray(a), jnp.asarray(b)))
    sb = np.asarray(sddmm_edge_tiles(mb, jnp.asarray(a), jnp.asarray(b)))
    scale = np.abs(sb).max()
    np.testing.assert_allclose(s8, sb, rtol=0, atol=0.03 * scale)
    # a wrong rl decode (unmasked wq bits) would score the wrong rows —
    # padding slots must still be exactly 0
    valid = (np.asarray(m8.idx) >> 30) & 1
    assert np.all(s8[valid == 0] == 0.0)
