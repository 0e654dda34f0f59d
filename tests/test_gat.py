"""GAT model tests (CPU interpret) vs a dense masked-softmax oracle."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from mg_gcn_tpu.formats import CSRData
from mg_gcn_tpu.models import gat
from mg_gcn_tpu.nn import adam
from mg_gcn_tpu.ops import spmm_edges as se

# compile-heavy interpret-mode tests: nightly-style full suite only
pytestmark = pytest.mark.slow


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


def toy_graph(n=120, density=0.05, seed=0):
    g = sp.random(n, n, density=density, format="csr", random_state=seed)
    g = (g + sp.identity(n, format="csr")).tocsr()
    g.data[:] = 1.0
    return CSRData.from_scipy(g), np.asarray(g.todense()) > 0


def dense_gat_forward(params, pattern, x, config):
    """Clean-room dense reference of the same layer math."""
    pat = jnp.asarray(pattern.astype(np.float32))
    h = x
    H = config.heads
    for i, layer in enumerate(params):
        out = config.sizes[i + 1]
        z = h @ layer["W"]
        heads = []
        for hd in range(H):
            zh = z[:, hd * out : (hd + 1) * out]
            e_dst = zh @ layer["a_dst"][hd]  # (n,)
            e_src = zh @ layer["a_src"][hd]
            s = e_dst[:, None] + e_src[None, :]
            s = jnp.where(s > 0, s, config.att_slope * s)
            s = jnp.where(pat > 0, s, -jnp.inf)
            alpha = jax.nn.softmax(s, axis=1)
            heads.append(alpha @ zh)
        if i + 1 < config.num_layers:
            h = jnp.concatenate(heads, axis=1) + layer["b"]
            h = jnp.where(h > 0, h, config.leaky_slope * h)
        else:
            h = sum(heads) / H + layer["b"]
    return h


@pytest.mark.parametrize("heads", [1, 2])
def test_gat_forward_vs_dense(heads):
    csr, pattern = toy_graph(seed=1)
    config = gat.GATConfig(sizes=(12, 8, 5), heads=heads)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((csr.nrows, 12)).astype(np.float32))
    params = gat.init_params(config, jax.random.key(0))
    graph = gat.build_gat_graph(csr, dtype="float32")
    got = gat.forward(params, graph, x, config)
    want = dense_gat_forward(params, pattern, x, config)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_gat_grads_vs_dense():
    csr, pattern = toy_graph(seed=2)
    config = gat.GATConfig(sizes=(6, 4, 3), heads=2)
    rng = np.random.default_rng(2)
    n = csr.nrows
    x = jnp.asarray(rng.standard_normal((n, 6)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 3, n).astype(np.int32))
    params = gat.init_params(config, jax.random.key(1))
    graph = gat.build_gat_graph(csr, dtype="float32")

    loss, acc, grads = gat.loss_and_grad(params, graph, x, y, config)

    from mg_gcn_tpu.ops.softmax_xent import softmax_xent

    def dense_loss(params):
        logits = dense_gat_forward(params, pattern, x, config)
        return softmax_xent(logits, y, None).loss

    want_loss = dense_loss(params)
    want_grads = jax.grad(dense_loss)(params)
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-5)
    for g_got, g_want in zip(grads, want_grads):
        for k in g_got:
            np.testing.assert_allclose(
                np.asarray(g_got[k]),
                np.asarray(g_want[k]),
                rtol=2e-3,
                atol=2e-4,
                err_msg=k,
            )


def test_gat_trains_on_planted_communities():
    # two communities with denser intra-links + informative features
    rng = np.random.default_rng(3)
    n = 160
    labels = (np.arange(n) >= n // 2).astype(np.int32)
    p = np.where(labels[:, None] == labels[None, :], 0.08, 0.01)
    adj = (rng.random((n, n)) < p) | np.eye(n, dtype=bool)
    csr = CSRData.from_scipy(sp.csr_matrix(adj.astype(np.float32)))
    x = rng.standard_normal((n, 8)).astype(np.float32) * 0.3
    x[:, 0] += labels * 1.0
    x = jnp.asarray(x)
    y = jnp.asarray(labels)

    config = gat.GATConfig(sizes=(8, 8, 2), heads=2)
    params = gat.init_params(config, jax.random.key(2))
    graph = gat.build_gat_graph(csr, dtype="float32")
    opt = adam.adam_init(params)

    @jax.jit
    def step(params, opt):
        loss, acc, grads = gat.loss_and_grad(params, graph, x, y, config)
        params, opt = adam.adam_update(params, grads, opt, lr=1e-2)
        return params, opt, loss, acc

    accs, losses = [], []
    for _ in range(25):  # the width-scaled attention init starts gentler
        params, opt, loss, acc = step(params, opt)
        losses.append(float(loss))
        accs.append(float(acc))
    assert losses[-1] < losses[0]
    assert accs[-1] >= 0.9, accs


def test_edge_weighted_gat_vs_dense():
    """alpha ∝ w·exp(s): the log-weight bias must reproduce the dense
    weighted-attention formulation (values and gradients)."""
    n, d = 120, 6
    rng = np.random.default_rng(13)
    g = sp.random(n, n, density=0.06, format="csr", random_state=13)
    g = (g + sp.identity(n, format="csr")).tocsr()
    g.data[:] = rng.random(g.nnz).astype(np.float32) + 0.25  # positive weights
    csr = CSRData.from_scipy(g)
    w_dense = np.asarray(g.todense(), np.float32)
    pattern = w_dense > 0

    config = gat.GATConfig(sizes=(d, 4), heads=1, edge_weighted=True)
    params = gat.init_params(config, jax.random.key(5))
    graph = gat.build_gat_graph(csr, dtype="float32")
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))

    def f_tiles(x):
        return jnp.sum(gat.forward(params, graph, x, config) ** 2)

    def f_dense(x):
        layer = params[0]
        zh = x @ layer["W"]
        e_dst = zh @ layer["a_dst"][0]
        e_src = zh @ layer["a_src"][0]
        s = e_dst[:, None] + e_src[None, :]
        s = jnp.where(s > 0, s, config.att_slope * s)
        num = jnp.where(pattern, jnp.asarray(w_dense) * jnp.exp(s), 0.0)
        alpha = num / jnp.maximum(num.sum(axis=1, keepdims=True), 1e-30)
        return jnp.sum((alpha @ zh + layer["b"]) ** 2)

    v, gx = jax.value_and_grad(f_tiles)(x)
    vd, gxd = jax.value_and_grad(f_dense)(x)
    np.testing.assert_allclose(float(v), float(vd), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gxd), rtol=1e-3, atol=1e-4)
