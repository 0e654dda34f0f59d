"""Layer-wise activation/gradient parity harness.

BASELINE.md success criterion: per-layer activations and gradients allclose
vs the reference semantics. The oracle below is an independent pure-numpy
float64 transcription of the reference C++ forward/backward
(gcn.hpp:437-489, including the dimension-aware ordering, the layer-0
backward-SpMM skip, and the lin.setX quirk); the framework path must match
it layer by layer.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mg_gcn_tpu import sparse
from mg_gcn_tpu.models.gcn import GCNConfig, forward, init_params, loss_and_grad_parity
from mg_gcn_tpu.ops.spmm import AggPair, COOMat

ALPHA = 0.01


def numpy_oracle(a_hat_T, a_hat, Ws, Bs, x, y, sizes):
    """Reference-exact forward+backward in float64. Returns per-layer
    activations, loss, grads."""
    L = len(Ws)
    acts = []
    caches = []
    h = x.astype(np.float64)
    for i in range(L):
        in_, out = sizes[i], sizes[i + 1]
        lin_first = out <= in_
        activation = i + 1 < L
        if lin_first:
            hw = h @ Ws[i] + Bs[i]
            ahw = a_hat_T @ hw
        else:
            hw = a_hat_T @ h
            ahw = hw @ Ws[i] + Bs[i]
        if activation:
            ahw = np.where(ahw > 0, ahw, ALPHA * ahw)
        caches.append(dict(h=h, post=ahw, lin_first=lin_first, act=activation))
        acts.append(ahw)
        h = ahw

    # softmax CE over all rows (gcn.hpp:785-818)
    n = x.shape[0]
    e = np.exp(h - h.max(axis=1, keepdims=True))
    o = e / e.sum(axis=1, keepdims=True)
    loss = -np.log(o[np.arange(n), y]).sum() / n
    g = (o - np.eye(sizes[-1])[y]) / n

    grads = [None] * L
    for i in reversed(range(L)):
        c = caches[i]
        backward_spmm = i != 0
        t = g
        if c["act"]:
            t = np.where(c["post"] > 0, g, ALPHA * g)
        W = Ws[i]
        gr = {}
        if c["lin_first"]:
            g_hw = a_hat @ t if backward_spmm else t
            gr["b"] = g_hw.sum(axis=0, keepdims=True)
            gr["W"] = c["h"].T @ g_hw
            g = g_hw @ W.T if i > 0 else None
        else:
            gr["b"] = t.sum(axis=0, keepdims=True)
            gr["W"] = c["h"].T @ t  # lin.setX(H) quirk, gcn.hpp:477
            if i > 0:
                g_hw = t @ W.T
                g = a_hat @ g_hw if backward_spmm else g_hw
            else:
                g = None
        grads[i] = gr
    return acts, loss, grads


@pytest.mark.parametrize("sizes", [(12, 8, 4), (6, 24, 4), (10, 8, 8, 4)])
def test_layerwise_parity(sizes):
    n = 96
    rng = np.random.default_rng(31)
    g = sparse.random_graph(n, 5, seed=32, weights="ones")
    a_hat = sparse.normalize(g, axis=True)
    a_hat_T = sparse.transpose(a_hat)
    x = rng.standard_normal((n, sizes[0])).astype(np.float32)
    y = rng.integers(0, sizes[-1], n).astype(np.int32)

    config = GCNConfig(sizes=sizes)
    params = init_params(config)
    Ws = [np.asarray(l["W"], np.float64) for l in params]
    Bs = [np.asarray(l["b"], np.float64) for l in params]

    acts_o, loss_o, grads_o = numpy_oracle(
        a_hat_T.to_dense().astype(np.float64),
        a_hat.to_dense().astype(np.float64),
        Ws, Bs, x, y, sizes,
    )

    pair = AggPair(COOMat.from_csr(a_hat_T, pad_to=8), COOMat.from_csr(a_hat, pad_to=8))
    logits, caches = forward(params, pair, jnp.asarray(x), config, return_caches=True)
    for i, cache in enumerate(caches):
        np.testing.assert_allclose(
            np.asarray(cache["post"]), acts_o[i], rtol=5e-5, atol=5e-6,
            err_msg=f"layer {i} activations",
        )
    loss, acc, grads = loss_and_grad_parity(
        params, pair, jnp.asarray(x), jnp.asarray(y), config
    )
    np.testing.assert_allclose(float(loss), loss_o, rtol=1e-5)
    for i in range(len(grads)):
        for k in ("W", "b"):
            np.testing.assert_allclose(
                np.asarray(grads[i][k]), grads_o[i][k], rtol=1e-4, atol=1e-6,
                err_msg=f"layer {i} grad {k}",
            )


def test_planted_partition_learnable():
    """End-to-end learnability: a 3-community planted-partition graph with
    noisy community features must train to high accuracy."""
    from mg_gcn_tpu.nn import adam
    from mg_gcn_tpu.train import build_agg_pair, make_train_step
    import scipy.sparse as ss

    rng = np.random.default_rng(41)
    n, k = 150, 3
    comm = np.repeat(np.arange(k), n // k)
    # dense intra-community, sparse inter-community edges
    p_in, p_out = 0.15, 0.01
    probs = np.where(comm[:, None] == comm[None, :], p_in, p_out)
    adj = (rng.random((n, n)) < probs).astype(np.float32)
    np.fill_diagonal(adj, 1.0)
    graph = __import__("mg_gcn_tpu.formats", fromlist=["CSRData"]).CSRData.from_scipy(
        ss.csr_matrix(adj)
    )
    x = (np.eye(k)[comm] + 0.8 * rng.standard_normal((n, k))).astype(np.float32)
    y = comm.astype(np.int32)

    config = GCNConfig(sizes=(k, 16, k))
    pair = build_agg_pair(graph, impl="xla")
    params = init_params(config)
    opt = adam.adam_init(params)
    step = make_train_step(config)
    acc = 0.0
    for _ in range(40):
        params, opt, loss, acc = step(
            params, opt, pair, jnp.asarray(x), jnp.asarray(y), None
        )
    assert float(acc) > 0.9, f"final accuracy {float(acc)}"


def test_scan_train_matches_loop():
    """lax.scan multi-epoch step must match per-epoch dispatch exactly."""
    from mg_gcn_tpu.nn import adam
    from mg_gcn_tpu.train import build_agg_pair, make_scan_train_steps, make_train_step

    n, f, c = 64, 8, 3
    rng = np.random.default_rng(55)
    g = sparse.random_graph(n, 4, seed=56, weights="random")
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, c, n).astype(np.int32))
    config = GCNConfig(sizes=(f, 8, c))
    pair = build_agg_pair(g, impl="xla")

    p1 = init_params(config)
    o1 = adam.adam_init(p1)
    step = make_train_step(config, donate=False)
    losses1 = []
    for _ in range(4):
        p1, o1, loss, acc = step(p1, o1, pair, x, y, None)
        losses1.append(float(loss))

    p2 = init_params(config)
    o2 = adam.adam_init(p2)
    scan_steps = make_scan_train_steps(config, 4)
    p2, o2, losses2, accs2 = scan_steps(p2, o2, pair, x, y, None)
    np.testing.assert_allclose(np.asarray(losses2), losses1, rtol=1e-6)
    for la, lb in zip(p1, p2):
        for k in la:
            np.testing.assert_allclose(
                np.asarray(lb[k]), np.asarray(la[k]), rtol=1e-5, atol=1e-7
            )
