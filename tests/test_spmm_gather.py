"""Windowed serial-gather SpMM tests (CPU interpret) vs scipy oracles.

The ultra-sparse single-chip path (ogbn-products scale, BASELINE config 2)
where the reference leans on cuSPARSE's density-independent row SpMM
(cuda_utils.hpp:27-32).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from mg_gcn_tpu import sparse
from mg_gcn_tpu.formats import CSRData
from mg_gcn_tpu.ops import spmm_gather as sg


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kw):
        kw.setdefault("interpret", True)
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", patched)
    monkeypatch.setattr(sg.pl, "pallas_call", patched)
    yield


def weighted_csr(n, m=None, density=0.01, seed=0):
    m = m or n
    mat = sp.random(
        n, m, density=density, format="csr", random_state=seed, dtype=np.float32
    )
    mat.data = (mat.data * 2 - 0.5).astype(np.float32)
    return CSRData.from_scipy(mat)


def run_case(csr, d, seed=0):
    rng = np.random.default_rng(seed)
    b = rng.standard_normal((csr.ncols, d)).astype(np.float32)
    mat = sg.gather_mat_from_csr(csr)
    got = np.asarray(sg.spmm_gather(mat, jnp.asarray(b)))
    want = csr.to_dense() @ b
    return got, want, mat


def test_square_weighted():
    csr = weighted_csr(500, density=0.01, seed=1)
    got, want, mat = run_case(csr, 16)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert 0 < mat.fill <= 1


def test_rectangular():
    csr = weighted_csr(300, 700, density=0.02, seed=2)
    got, want, _ = run_case(csr, 8)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_multi_window_multi_supertile():
    # a graph that genuinely spans several (super-tile, window) groups
    csr = weighted_csr(40_000, 40_000, density=3e-4, seed=3)
    rng = np.random.default_rng(3)
    b = rng.standard_normal((csr.ncols, 4)).astype(np.float32)
    mat = sg.gather_mat_from_csr(csr)
    assert mat.n_out_pad // sg.R_ROWS >= 3  # several super-tiles
    assert mat.n_in_pad // sg.W_ROWS >= 3  # several windows
    got = np.asarray(sg.spmm_gather(mat, jnp.asarray(b)))
    want = csr.to_scipy() @ b
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_empty_rows_and_empty_supertiles():
    # rows 0..99 have edges, the rest are empty; with n > R_ROWS the later
    # super-tiles are all-empty and exercise the dummy zero-init steps
    n = sg.R_ROWS + 300
    m = 600
    dense = np.zeros((100, m), np.float32)
    rng = np.random.default_rng(4)
    mask = rng.random((100, m)) < 0.05
    dense[mask] = rng.standard_normal(int(mask.sum())).astype(np.float32)
    top = sp.csr_matrix(dense)
    csr = CSRData.from_scipy(
        sp.vstack([top, sp.csr_matrix((n - 100, m), dtype=np.float32)]).tocsr()
    )
    b = rng.standard_normal((m, 8)).astype(np.float32)
    mat = sg.gather_mat_from_csr(csr)
    got = np.asarray(sg.spmm_gather(mat, jnp.asarray(b)))
    want = csr.to_scipy() @ b
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert np.all(got[100:] == 0)


def test_empty_matrix():
    csr = CSRData(
        indptr=np.zeros(11, np.int64),
        indices=np.zeros(0, np.int32),
        data=np.zeros(0, np.float32),
        shape=(10, 10),
    )
    b = np.ones((10, 4), np.float32)
    mat = sg.gather_mat_from_csr(csr)
    got = np.asarray(sg.spmm_gather(mat, jnp.asarray(b)))
    assert got.shape == (10, 4)
    assert np.all(got == 0)


@pytest.mark.slow
def test_feature_chunking_past_dmax():
    csr = weighted_csr(200, density=0.02, seed=5)
    d = sg.D_MAX_G + 64
    got, want, _ = run_case(csr, d, seed=5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_spmm_dispatch_and_aggregate_vjp():
    import jax

    from mg_gcn_tpu.ops.spmm import AggPair, aggregate, spmm

    csr = weighted_csr(400, density=0.01, seed=6)
    csr_t = CSRData.from_scipy(csr.to_scipy().T.tocsr())
    rng = np.random.default_rng(6)
    b = rng.standard_normal((400, 8)).astype(np.float32)
    fwd = sg.gather_mat_from_csr(csr)
    bwd = sg.gather_mat_from_csr(csr_t)
    got = np.asarray(spmm(fwd, jnp.asarray(b)))
    np.testing.assert_allclose(got, csr.to_scipy() @ b, rtol=1e-5, atol=1e-5)

    pair = AggPair(fwd=fwd, bwd=bwd)
    f = lambda x: jnp.sum(aggregate(pair, x) ** 2)
    g = jax.grad(f)(jnp.asarray(b))
    want_g = 2 * (csr.to_scipy().T @ (csr.to_scipy() @ b))
    np.testing.assert_allclose(np.asarray(g), want_g, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_binary_pair_matches_normalized_weighted():
    """gather_pair_from_binary_csr (w-less walk + diagonal scales) must
    reproduce the normalize(axis=True) weighted pair exactly."""
    g = sparse.random_graph(300, avg_degree=9, seed=23, weights="ones")
    fwd_b, bwd_b = sg.gather_pair_from_binary_csr(g)
    assert fwd_b.w is None and bwd_b.w is None
    a = sparse.normalize(g, axis=True)
    a_t = sparse.transpose(a)
    fwd_w, bwd_w = sg.gather_pair_from_csr_pair(a_t, a)
    rng = np.random.default_rng(24)
    b = jnp.asarray(rng.standard_normal((300, 8)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(sg.spmm_gather(fwd_b, b)),
        np.asarray(sg.spmm_gather(fwd_w, b)),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(sg.spmm_gather(bwd_b, b)),
        np.asarray(sg.spmm_gather(bwd_w, b)),
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.slow
def test_pairing_matches_unpaired():
    """pair=True (run-coalesced entries) must be numerically identical to
    the all-singles layout."""
    g = sparse.random_graph(500, avg_degree=20, seed=25, weights="uniform")
    mp = sg.gather_mat_from_host(sg.gather_schedule_host(g, pair=True))
    ms = sg.gather_mat_from_host(sg.gather_schedule_host(g, pair=False))
    lp = np.asarray(mp.meta2) & ((1 << sg.LP_BITS) - 1)
    assert 2 * int(lp.sum()) > g.nnz // 2  # dense-enough rows actually pair
    lps = np.asarray(ms.meta2) & ((1 << sg.LP_BITS) - 1)
    assert int(lps.sum()) == 0
    rng = np.random.default_rng(26)
    b = jnp.asarray(rng.standard_normal((500, 8)).astype(np.float32))
    # accumulation order differs between layouts: compare in f32 terms
    np.testing.assert_allclose(
        np.asarray(sg.spmm_gather(mp, b)),
        np.asarray(sg.spmm_gather(ms, b)),
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.slow
def test_tall_supertile_r_rows_32k():
    """r_rows=32768 schedules (auto-picked past R_BIG_THRESHOLD to halve
    the operand window re-streaming — PERF.md round-4): same numerics as
    the default 16k build on a graph spanning several 32k super-tiles."""
    csr = weighted_csr(70_000, 40_000, density=2e-4, seed=9)
    rng = np.random.default_rng(9)
    b = rng.standard_normal((csr.ncols, 4)).astype(np.float32)
    sched = sg.gather_schedule_host(csr, r_rows=32_768)
    assert sched["r_rows"] == 32_768
    mat = sg.gather_mat_from_host(sched)
    assert mat.r_rows == 32_768
    assert mat.n_out_pad // 32_768 >= 3
    got = np.asarray(sg.spmm_gather(mat, jnp.asarray(b)))
    want = csr.to_dense() @ b
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # and the pairs region decodes rows > 16383 correctly (rmask)
    ref = sg.gather_mat_from_csr(csr)  # default 16k build
    got16 = np.asarray(sg.spmm_gather(ref, jnp.asarray(b)))
    np.testing.assert_allclose(got, got16, rtol=1e-5, atol=1e-5)


def test_auto_r_rows_threshold():
    """The auto pick flips to R_ROWS_BIG past the threshold (host-only)."""
    small = sg.gather_schedule_host(weighted_csr(1000, density=5e-3))
    assert small["r_rows"] == sg.R_ROWS


def test_stream_bf16_close():
    """bf16 window streaming: same result to bf16 rounding tolerance."""
    csr = weighted_csr(600, density=0.01, seed=4)
    rng = np.random.default_rng(4)
    b = rng.standard_normal((csr.ncols, 8)).astype(np.float32)
    mat = sg.gather_mat_from_csr(csr)
    exact = np.asarray(sg.spmm_gather(mat, jnp.asarray(b)))
    got = np.asarray(sg.spmm_gather(mat, jnp.asarray(b), stream_bf16=True))
    np.testing.assert_allclose(got, exact, rtol=2e-2, atol=2e-2)
    assert np.abs(got - exact).max() > 0  # bf16 rounding actually happened
