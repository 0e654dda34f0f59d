"""O(pad) step-equalization helpers: a padded schedule must compute the
same product as the natural one (CPU interpret)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from mg_gcn_tpu.formats import CSRData
from mg_gcn_tpu.ops import spmm_edges as se
from mg_gcn_tpu.ops import spmm_gather as sg


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


def weighted_csr(n, m=None, density=0.02, seed=0):
    m = m or n
    mat = sp.random(
        n, m, density=density, format="csr", random_state=seed, dtype=np.float32
    )
    mat.data = (mat.data * 2 - 0.5).astype(np.float32)
    return CSRData.from_scipy(mat)


def test_pad_gather_schedule_matches():
    csr = weighted_csr(600, 500, seed=1)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((500, 8)).astype(np.float32))
    sched = sg.gather_schedule_host(csr)
    S = sched["meta"].shape[0]
    padded = sg.pad_schedule_steps(sched, S + 24)
    assert padded["meta"].shape[0] == S + 24
    got_nat = np.asarray(sg.spmm_gather(sg.gather_mat_from_host(sched), b))
    got_pad = np.asarray(sg.spmm_gather(sg.gather_mat_from_host(padded), b))
    np.testing.assert_array_equal(got_nat, got_pad)
    np.testing.assert_allclose(got_pad, csr.to_scipy() @ np.asarray(b), rtol=1e-5, atol=1e-5)
    # equivalence with the builder's own pad_steps_to path
    rebuilt = sg.gather_schedule_host(csr, pad_steps_to=S + 24)
    np.testing.assert_array_equal(padded["meta"], rebuilt["meta"])
    np.testing.assert_array_equal(padded["idx"], rebuilt["idx"])


def test_pad_edge_schedule_matches():
    csr = weighted_csr(500, 400, density=0.03, seed=2)
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal((400, 8)).astype(np.float32))
    sched = se.edge_tile_schedule_host(csr, dtype="float32")
    S = sched["meta"].shape[0]
    padded = se.pad_edge_schedule(sched, S + 16)
    got_nat = np.asarray(
        se.spmm_edge_tiles(se.edge_tile_mat_from_host(sched), b)
    )
    got_pad = np.asarray(
        se.spmm_edge_tiles(se.edge_tile_mat_from_host(padded), b)
    )
    np.testing.assert_array_equal(got_nat, got_pad)
    # the builder's own pad_steps_to path produces the same schedule
    rebuilt = se.edge_tile_schedule_host(csr, dtype="float32", pad_steps_to=S + 16)
    np.testing.assert_array_equal(padded["meta"], rebuilt["meta"])
    np.testing.assert_array_equal(padded["idx"], rebuilt["idx"])
    np.testing.assert_array_equal(padded["chi"], rebuilt["chi"])
    # the transposed schedule over the padded mat still matches scipy
    ts = se.transposed_schedule(se.edge_tile_mat_from_host(padded))
    a = jnp.asarray(rng.standard_normal((500, 8)).astype(np.float32))
    got_t = np.asarray(
        se.spmm_edge_tiles_t(se.edge_tile_mat_from_host(padded), ts, a)
    )
    np.testing.assert_allclose(
        got_t, csr.to_scipy().T @ np.asarray(a), rtol=1e-4, atol=1e-4
    )
