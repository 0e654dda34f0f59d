"""Distributed serial-gather pair vs the COO reference (4 CPU devices).

The ultra-sparse ring engine (pair_kind="gather") must match the COO ring's
training trajectory for GCN (parity and exact modes) and SAGE."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mg_gcn_tpu import sparse
from mg_gcn_tpu.models.gcn import GCNConfig, init_params
from mg_gcn_tpu.nn import adam
from mg_gcn_tpu.parallel import dist

# compile-heavy interpret-mode tests: nightly-style full suite only
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def problem():
    parts = 4
    n = 256
    g = sparse.random_graph(n, 6, seed=9, weights="random")
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((n, 12)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 5, n).astype(np.int32))
    a = sparse.normalize(g, axis=True)
    a_t = sparse.transpose(a)
    mesh = dist.make_mesh(parts)
    coo = dist.DistAggPair.from_csr_pair(a_t, a, parts, pad_to=64)
    gat = dist.DistGatherPair.from_csr_pair(a_t, a, parts)
    return parts, n, g, x, y, a, a_t, mesh, coo, gat


@pytest.mark.parametrize("parity", [True, False])
def test_dist_gather_gcn_matches_coo(problem, parity):
    parts, n, g, x, y, a, a_t, mesh, coo, gpair = problem
    config = GCNConfig(sizes=(12, 8, 5), parity=parity)
    params = init_params(config)
    opt = adam.adam_init(params)

    step_c = dist.make_dist_train_step(config, mesh, n, pair_kind="coo")
    step_g = dist.make_dist_train_step(config, mesh, n, pair_kind="gather")

    pc, oc = params, opt
    pg_, og = params, opt
    for it in range(2):
        pc, oc, loss_c, acc_c = step_c(pc, oc, coo, x, y)
        pg_, og, loss_g, acc_g = step_g(pg_, og, gpair, x, y)
        np.testing.assert_allclose(
            float(loss_g), float(loss_c), rtol=1e-5, err_msg=f"it{it}"
        )
        np.testing.assert_allclose(float(acc_g), float(acc_c), rtol=1e-6)
    for lc, lg in zip(pc, pg_):
        for k in lc:
            np.testing.assert_allclose(
                np.asarray(lg[k]), np.asarray(lc[k]), rtol=1e-4, atol=1e-5, err_msg=k
            )


def test_dist_gather_sage_matches_coo(problem):
    parts, n, g, x, y, a, a_t, mesh, coo, gpair = problem
    from mg_gcn_tpu.models.sage import SAGEConfig, init_params as sage_init

    m = sparse.normalize(g, axis=False)
    m_t = sparse.transpose(m)
    coo_s = dist.DistAggPair.from_csr_pair(m, m_t, parts, pad_to=64)
    g_s = dist.DistGatherPair.from_csr_pair(m, m_t, parts)
    config = SAGEConfig(sizes=(12, 8, 5))
    params = sage_init(config)
    opt = adam.adam_init(params)

    step_c = dist.make_dist_sage_train_step(config, mesh, n, pair_kind="coo")
    step_g = dist.make_dist_sage_train_step(config, mesh, n, pair_kind="gather")
    pc, oc, loss_c, acc_c = step_c(params, opt, coo_s, x, y)
    pg_, og, loss_g, acc_g = step_g(params, opt, g_s, x, y)
    np.testing.assert_allclose(float(loss_g), float(loss_c), rtol=1e-5)
    for lc, lg in zip(pc, pg_):
        for k in lc:
            np.testing.assert_allclose(
                np.asarray(lg[k]), np.asarray(lc[k]), rtol=1e-4, atol=1e-5, err_msg=k
            )


def test_dist_gather_rejects_all_gather(problem):
    parts, n, g, x, y, a, a_t, mesh, coo, gpair = problem
    config = GCNConfig(sizes=(12, 5))
    with pytest.raises(ValueError, match="ring"):
        dist.make_dist_train_step(
            config, mesh, n, strategy="all_gather", pair_kind="gather"
        )
