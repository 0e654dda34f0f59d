"""Bit-packed pattern SpMM kernel tests (vs dense oracles, CPU interpret)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mg_gcn_tpu import sparse
from mg_gcn_tpu.formats import CSRData
from mg_gcn_tpu.ops import spmm_pattern as sp


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    # run the pallas kernels in interpret mode on CPU
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kw):
        kw.setdefault("interpret", True)
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", patched)
    monkeypatch.setattr(sp.pl, "pallas_call", patched)
    yield


def binary_graph(n, deg, seed=0):
    return sparse.random_graph(n, deg, seed=seed, weights="ones")


def test_pack_csr_bits():
    n_pad = sp.N_ALIGN
    g = binary_graph(40, 4, seed=1)
    pack = sp.pack_csr_bits(g, n_pad)
    dense = np.zeros((n_pad, n_pad), np.float32)
    words = n_pad // 32
    for i in range(40):
        for w in range(words):
            word = int(pack[i, w])
            for b in range(32):
                # strided layout: col = (w//128)*4096 + b*128 + w%128
                col = (w // 128) * sp.GROUP + b * 128 + (w % 128)
                dense[i, col] = (word >> b) & 1
    np.testing.assert_array_equal(dense[:40, :40], g.to_dense())
    assert dense[:, 40:].sum() == 0
    assert pack[40:].sum() == 0


def test_pattern_forward_matches_dense():
    n, d = 600, 24  # n_pad = 1024
    g = binary_graph(n, 5, seed=2)
    fwd, bwd = sp.pattern_pair_from_binary_csr(g, dtype="float32")
    b = np.random.default_rng(0).random((n, d)).astype(np.float32)
    got = np.asarray(sp.spmm_pattern(fwd, jnp.asarray(b)))
    a_hat = sparse.normalize(g, axis=True).to_dense()
    want = a_hat.T @ b
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pattern_backward_matches_dense():
    n, d = 600, 24
    g = binary_graph(n, 5, seed=3)
    fwd, bwd = sp.pattern_pair_from_binary_csr(g, dtype="float32")
    b = np.random.default_rng(1).random((n, d)).astype(np.float32)
    got = np.asarray(sp.spmm_pattern(bwd, jnp.asarray(b)))
    a_hat = sparse.normalize(g, axis=True).to_dense()
    want = a_hat @ b
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pattern_bf16_close():
    n, d = 520, 16
    g = binary_graph(n, 4, seed=4)
    fwd, _ = sp.pattern_pair_from_binary_csr(g, dtype="bfloat16")
    b = np.random.default_rng(2).random((n, d)).astype(np.float32)
    got = np.asarray(sp.spmm_pattern(fwd, jnp.asarray(b)))
    a_hat = sparse.normalize(g, axis=True).to_dense()
    want = a_hat.T @ b
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_pattern_int8_close():
    n, d = 520, 16
    g = binary_graph(n, 4, seed=7)
    fwd, bwd = sp.pattern_pair_from_binary_csr(g, dtype="int8")
    b = np.random.default_rng(3).random((n, d)).astype(np.float32)
    a_hat = sparse.normalize(g, axis=True).to_dense()
    got_f = np.asarray(sp.spmm_pattern(fwd, jnp.asarray(b)))
    np.testing.assert_allclose(got_f, a_hat.T @ b, rtol=3e-2, atol=3e-2)
    got_b = np.asarray(sp.spmm_pattern(bwd, jnp.asarray(b)))
    np.testing.assert_allclose(got_b, a_hat @ b, rtol=3e-2, atol=3e-2)


@pytest.mark.slow
def test_pattern_int8_trains_planted():
    """int8 aggregation must still learn the community task."""
    import scipy.sparse as ss

    from mg_gcn_tpu.formats import CSRData
    from mg_gcn_tpu.models.gcn import GCNConfig, init_params
    from mg_gcn_tpu.nn import adam
    from mg_gcn_tpu.ops.spmm import AggPair
    from mg_gcn_tpu.train import make_train_step

    rng = np.random.default_rng(8)
    n, k = 150, 3
    comm = np.repeat(np.arange(k), n // k)
    probs = np.where(comm[:, None] == comm[None, :], 0.15, 0.01)
    adj = (rng.random((n, n)) < probs).astype(np.float32)
    np.fill_diagonal(adj, 1.0)
    graph = CSRData.from_scipy(ss.csr_matrix(adj))
    x = (np.eye(k)[comm] + 0.8 * rng.standard_normal((n, k))).astype(np.float32)
    y = comm.astype(np.int32)
    fwd, bwd = sp.pattern_pair_from_binary_csr(graph, dtype="int8")
    pair = AggPair(fwd=fwd, bwd=bwd)
    config = GCNConfig(sizes=(k, 16, k))
    params = init_params(config)
    opt = adam.adam_init(params)
    step = make_train_step(config)
    acc = 0.0
    for _ in range(40):
        params, opt, loss, acc = step(
            params, opt, pair, jnp.asarray(x), jnp.asarray(y), None
        )
    assert float(acc) > 0.9, f"int8 final accuracy {float(acc)}"


def test_rejects_weighted():
    g = sparse.random_graph(64, 4, seed=5, weights="random")
    with pytest.raises(ValueError, match="binary"):
        sp.pattern_pair_from_binary_csr(g)


@pytest.mark.slow
def test_pattern_spmm_in_model():
    """End-to-end: AggPair of PatternMats through the GCN model."""
    from mg_gcn_tpu.models.gcn import GCNConfig, init_params, loss_and_grad
    from mg_gcn_tpu.ops.spmm import AggPair, COOMat

    n, f, c = 520, 12, 4
    g = binary_graph(n, 5, seed=6)
    fwd, bwd = sp.pattern_pair_from_binary_csr(g, dtype="float32")
    pair_pat = AggPair(fwd=fwd, bwd=bwd)

    a = sparse.normalize(g, axis=True)
    a_t = sparse.transpose(a)
    pair_coo = AggPair(COOMat.from_csr(a_t, pad_to=8), COOMat.from_csr(a, pad_to=8))

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, c, n).astype(np.int32))
    config = GCNConfig(sizes=(f, 8, c))
    params = init_params(config)

    l1, a1, g1 = loss_and_grad(params, pair_coo, x, y, config)
    l2, a2, g2 = loss_and_grad(params, pair_pat, x, y, config)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    np.testing.assert_allclose(float(a2), float(a1), rtol=1e-6)
    for d1, d2 in zip(g1, g2):
        for k in d1:
            np.testing.assert_allclose(
                np.asarray(d2[k]), np.asarray(d1[k]), rtol=5e-4, atol=1e-5
            )


@pytest.mark.slow
def test_pattern_wide_features_chunked():
    """d > D_MAX exercises the feature-chunked kernel calls (the SAGE-512
    config OOMed scoped VMEM before wrapper-level chunking)."""
    n, d = 600, sp.D_MAX + 40
    g = binary_graph(n, 5, seed=9)
    fwd, bwd = sp.pattern_pair_from_binary_csr(g, dtype="float32")
    b = np.random.default_rng(5).random((n, d)).astype(np.float32)
    a_hat = sparse.normalize(g, axis=True).to_dense()
    got_f = np.asarray(sp.spmm_pattern(fwd, jnp.asarray(b)))
    np.testing.assert_allclose(got_f, a_hat.T @ b, rtol=1e-5, atol=1e-5)
    got_b = np.asarray(sp.spmm_pattern(bwd, jnp.asarray(b)))
    np.testing.assert_allclose(got_b, a_hat @ b, rtol=1e-5, atol=1e-5)
