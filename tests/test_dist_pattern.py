"""Distributed bit-packed pattern aggregation vs dense oracles
(CPU, interpret-mode kernels, 2-device mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mg_gcn_tpu import sparse
from mg_gcn_tpu.ops import spmm_pattern as sp
from mg_gcn_tpu.parallel import dist


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kw):
        kw.setdefault("interpret", True)
        return orig(*args, **kw)

    monkeypatch.setattr(sp.pl, "pallas_call", patched)
    yield


@pytest.fixture(scope="module")
def mesh2():
    return dist.make_mesh(2)


def setup_pair(n=5000, deg=4, parts=2):
    g = sparse.random_graph(n, deg, seed=21, weights="ones")
    pair = dist.DistPatternPair.from_binary_csr(g, parts, dtype="float32")
    a_hat = sparse.normalize(g, axis=True).to_dense()
    return g, pair, a_hat


def _run_agg(mesh, pair, h_global, orientation, strategy, dtype="float32"):
    parts = pair.parts
    spec = jax.sharding.PartitionSpec(dist.GRAPH_AXIS)

    def body(pf, pb, sc, h):
        pack = pf[0] if orientation == "PT" else pb[0]
        return dist.dist_aggregate_pattern(
            pack, sc[0], h, parts, orientation, dtype, strategy
        )

    f = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(spec, spec, spec, spec),
            out_specs=spec,
            check_vma=False,
        )
    )
    return np.asarray(f(pair.pack_fwd, pair.pack_bwd, pair.scale, h_global))


@pytest.mark.slow
@pytest.mark.parametrize("strategy", ["ring", "all_gather"])
def test_dist_pattern_forward(mesh2, strategy):
    g, pair, a_hat = setup_pair()
    n, n_pad, d = pair.n, pair.n_pad, 8
    h = np.random.default_rng(0).random((n_pad, d)).astype(np.float32)
    h[n:] = 0
    got = _run_agg(mesh2, pair, jnp.asarray(h), "PT", strategy)
    want = a_hat.T @ h[:n]
    np.testing.assert_allclose(got[:n], want, rtol=1e-5, atol=1e-5)
    assert np.abs(got[n:]).max() == 0  # padded rows have no in-edges


@pytest.mark.slow
@pytest.mark.parametrize("strategy", ["ring"])
def test_dist_pattern_backward(mesh2, strategy):
    g, pair, a_hat = setup_pair()
    n, n_pad, d = pair.n, pair.n_pad, 8
    h = np.random.default_rng(1).random((n_pad, d)).astype(np.float32)
    h[n:] = 0
    got = _run_agg(mesh2, pair, jnp.asarray(h), "P", strategy)
    want = a_hat @ h[:n]
    np.testing.assert_allclose(got[:n], want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("orientation", ["PT", "P"])
def test_dist_pattern_int8_matches_single_chip(mesh2, orientation):
    """Distributed int8 mode must perform the SAME per-feature global
    quantization as the single-chip int8 path (pmax'd scales), not a cast."""
    from mg_gcn_tpu.ops.spmm_pattern import pattern_pair_from_binary_csr, spmm_pattern

    n = 5000
    g = sparse.random_graph(n, 4, seed=21, weights="ones")
    pair = dist.DistPatternPair.from_binary_csr(g, 2, dtype="int8")
    n_pad = pair.n_pad
    h = np.zeros((n_pad, 8), np.float32)
    h[:n] = np.random.default_rng(2).standard_normal((n, 8))
    got = _run_agg(mesh2, pair, jnp.asarray(h), orientation, "ring", dtype="int8")

    fwd1, bwd1 = pattern_pair_from_binary_csr(g, dtype="int8")
    single = spmm_pattern(fwd1 if orientation == "PT" else bwd1, jnp.asarray(h[:n]))
    np.testing.assert_allclose(got[:n], np.asarray(single), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_dist_pattern_train_step(mesh2):
    """Full pattern-pair train step matches the COO dist step."""
    from mg_gcn_tpu.models.gcn import GCNConfig, init_params
    from mg_gcn_tpu.nn import adam

    n, f, c, parts = 5000, 6, 3, 2
    g = sparse.random_graph(n, 4, seed=22, weights="ones")
    ppair = dist.DistPatternPair.from_binary_csr(g, parts, dtype="float32")
    n_pad = ppair.n_pad

    rng = np.random.default_rng(3)
    x = np.zeros((n_pad, f), np.float32)
    x[:n] = rng.standard_normal((n, f))
    y = np.zeros(n_pad, np.int32)
    y[:n] = rng.integers(0, c, n)
    valid = np.arange(n_pad) < n

    config = GCNConfig(sizes=(f, 4, c))
    params = init_params(config)
    opt = adam.adam_init(params)

    step_p = dist.make_dist_train_step(
        config, mesh2, n, pair_kind="pattern", use_mask=True, pattern_dtype="float32"
    )
    p2, o2, loss2, acc2 = step_p(
        params, opt, ppair, jnp.asarray(x), jnp.asarray(y), jnp.asarray(valid)
    )

    # oracle: single-chip COO with train-mask = valid rows
    from mg_gcn_tpu.models.gcn import loss_and_grad
    from mg_gcn_tpu.ops.spmm import AggPair, COOMat

    a = sparse.normalize(g, axis=True)
    a_t = sparse.transpose(a)
    pair1 = AggPair(COOMat.from_csr(a_t, pad_to=8), COOMat.from_csr(a, pad_to=8))
    loss1, acc1, grads1 = loss_and_grad(
        params, pair1, jnp.asarray(x[:n]), jnp.asarray(y[:n]), config
    )
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-4)
    np.testing.assert_allclose(float(acc2), float(acc1), rtol=1e-5)
    p1, _ = adam.adam_update(params, grads1, opt)
    for l1, l2 in zip(p1, p2):
        for k in l1:
            np.testing.assert_allclose(
                np.asarray(l2[k]), np.asarray(l1[k]), rtol=5e-4, atol=5e-6
            )
