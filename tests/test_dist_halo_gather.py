"""Halo exchange with serial-gather local multiplies vs the XLA halo engine
(4 CPU devices): identical training trajectories for GCN and SAGE."""

import numpy as np
import pytest

import jax.numpy as jnp

from mg_gcn_tpu import sparse
from mg_gcn_tpu.models.gcn import GCNConfig, init_params
from mg_gcn_tpu.nn import adam
from mg_gcn_tpu.parallel import dist, dist_halo

# The structure/gate checks and the GCN parity case stay in the fast suite
# as the halo_gather subsystem's smoke coverage (ADVICE r4: CI must keep at
# least one cheap parity test per subsystem un-marked); the SAGE and hybrid-
# scatter variants are compile-heavy interpret-mode and run nightly-style.


@pytest.fixture(scope="module")
def problem():
    parts = 4
    n = 256
    g = sparse.random_graph(n, 5, seed=21, weights="random")
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.standard_normal((n, 10)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 4, n).astype(np.int32))
    a = sparse.normalize(g, axis=True)
    a_t = sparse.transpose(a)
    mesh = dist.make_mesh(parts)
    xla_pair = dist_halo.DistHaloPair.from_csr_pair(a_t, a, parts)
    g_pair = dist_halo.DistHaloPair.from_csr_pair(a_t, a, parts, engine="gather")
    return parts, n, g, x, y, a, a_t, mesh, xla_pair, g_pair


def test_halo_gather_structure(problem):
    parts, n, g, x, y, a, a_t, mesh, xla_pair, g_pair = problem
    assert isinstance(g_pair.fwd, dist_halo.DistHaloGatherMat)
    # same exchange structure: identical round widths and halo volume
    assert g_pair.fwd.round_widths == xla_pair.fwd.round_widths
    assert g_pair.fwd.halo_total == xla_pair.fwd.halo_total
    for s in range(parts - 1):
        np.testing.assert_array_equal(
            np.asarray(g_pair.fwd.send_idx[s]), np.asarray(xla_pair.fwd.send_idx[s])
        )


@pytest.mark.parametrize("parity", [True, False])
def test_halo_gather_gcn_matches_xla_engine(problem, parity):
    parts, n, g, x, y, a, a_t, mesh, xla_pair, g_pair = problem
    config = GCNConfig(sizes=(10, 8, 4), parity=parity)
    params = init_params(config)
    opt = adam.adam_init(params)
    step_x = dist.make_dist_train_step(config, mesh, n, pair_kind="halo")
    step_g = dist.make_dist_train_step(config, mesh, n, pair_kind="halo_gather")

    px, ox = params, opt
    pg_, og = params, opt
    for it in range(2):
        px, ox, loss_x, acc_x = step_x(px, ox, xla_pair, x, y)
        pg_, og, loss_g, acc_g = step_g(pg_, og, g_pair, x, y)
        np.testing.assert_allclose(
            float(loss_g), float(loss_x), rtol=1e-5, err_msg=f"it{it}"
        )
        np.testing.assert_allclose(float(acc_g), float(acc_x), rtol=1e-6)
    for lx, lg in zip(px, pg_):
        for k in lx:
            np.testing.assert_allclose(
                np.asarray(lg[k]), np.asarray(lx[k]), rtol=1e-4, atol=1e-5, err_msg=k
            )


@pytest.mark.slow
def test_halo_gather_sage_matches_xla_engine(problem):
    parts, n, g, x, y, a, a_t, mesh, _, _ = problem
    from mg_gcn_tpu.models.sage import SAGEConfig, init_params as sage_init

    m = sparse.normalize(g, axis=False)
    m_t = sparse.transpose(m)
    xla_pair = dist_halo.DistHaloPair.from_csr_pair(m, m_t, parts)
    g_pair = dist_halo.DistHaloPair.from_csr_pair(m, m_t, parts, engine="gather")
    config = SAGEConfig(sizes=(10, 8, 4))
    params = sage_init(config)
    opt = adam.adam_init(params)
    step_x = dist.make_dist_sage_train_step(config, mesh, n, pair_kind="halo")
    step_g = dist.make_dist_sage_train_step(config, mesh, n, pair_kind="halo_gather")
    px, ox, loss_x, acc_x = step_x(params, opt, xla_pair, x, y)
    pg_, og, loss_g, acc_g = step_g(params, opt, g_pair, x, y)
    np.testing.assert_allclose(float(loss_g), float(loss_x), rtol=1e-5)
    for lx, lg in zip(px, pg_):
        for k in lx:
            np.testing.assert_allclose(
                np.asarray(lg[k]), np.asarray(lx[k]), rtol=1e-4, atol=1e-5, err_msg=k
            )


def test_halo_engine_gate(monkeypatch):
    """Gate math: per-BLOCK feasibility (papers100M-scale global graphs
    exceed the single-schedule caps by design), TPU-backend requirement."""
    import jax

    from mg_gcn_tpu import train as train_mod

    class G:  # only .nrows/.ncols/.nnz are read by the gate
        def __init__(self, n, nnz):
            self.nrows = self.ncols = n
            self.nnz = nnz

    # off TPU: always xla
    assert train_mod.halo_engine(G(16_000_000, 208_000_000), 8) == "xla"

    monkeypatch.setattr(
        jax, "default_backend", lambda: "tpu"
    )
    # papers-rehearsal scale: global caps would fail, per-block caps pass
    assert not train_mod._gather_feasible(16_000_000, 16_000_000, 208_000_000)
    assert train_mod.halo_engine(G(16_000_000, 208_000_000), 8) == "gather"
    # dense-ish graph: edge-tile fill is fine, stay on the XLA engine
    assert train_mod.halo_engine(G(100_000, 50_000_000), 4) == "xla"


@pytest.mark.slow
def test_halo_gather_hybrid_scatter_matches(problem, monkeypatch):
    """Force the thin-group scatter split (papers100M-geometry behavior,
    where the diagonal block's group count exceeds the step cap) and check
    the hybrid gather+COO local engine still matches the XLA halo engine."""
    parts, n, g, x, y, a, a_t, mesh, xla_pair, _ = problem
    monkeypatch.setattr(dist_halo, "GROUP_BUDGET", 0)
    monkeypatch.setattr(dist_halo, "SCATTER_MIN_GROUP", 10**9)  # scatter all
    all_sc = dist_halo.DistHaloPair.from_csr_pair(a_t, a, parts, engine="gather")
    assert int((np.asarray(all_sc.fwd.sc_vals) != 0).sum()) > 0
    monkeypatch.setattr(dist_halo, "SCATTER_MIN_GROUP", 3)  # split for real
    hyb = dist_halo.DistHaloPair.from_csr_pair(a_t, a, parts, engine="gather")

    config = GCNConfig(sizes=(10, 8, 4))
    params = init_params(config)
    opt = adam.adam_init(params)
    step_x = dist.make_dist_train_step(config, mesh, n, pair_kind="halo")
    step_g = dist.make_dist_train_step(config, mesh, n, pair_kind="halo_gather")
    _, _, loss_ref, acc_ref = step_x(params, opt, xla_pair, x, y)
    for pair in (all_sc, hyb):
        _, _, loss_h, acc_h = step_g(params, opt, pair, x, y)
        np.testing.assert_allclose(float(loss_h), float(loss_ref), rtol=1e-5)
        np.testing.assert_allclose(float(acc_h), float(acc_ref), rtol=1e-6)
