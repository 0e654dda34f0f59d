"""Distributed row-partition tests on an 8-virtual-CPU-device mesh.

The reference's distributed tests need 2 physical GPUs
(test/test_dist_matrix.cpp); here the full shard_map path runs on simulated
devices and is checked for exact agreement with the single-chip path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mg_gcn_tpu import sparse
from mg_gcn_tpu.formats import CSRData
from mg_gcn_tpu.models.gcn import GCNConfig, init_params, loss_and_grad
from mg_gcn_tpu.nn import adam
from mg_gcn_tpu.ops.spmm import AggPair, COOMat
from mg_gcn_tpu.parallel import dist


@pytest.fixture(scope="module")
def mesh4():
    return dist.make_mesh(4)


def make_graph(n=64, deg=6, seed=3):
    g = sparse.random_graph(n, deg, seed=seed, weights="random")
    a = sparse.normalize(g, axis=True)
    a_t = sparse.transpose(a)
    return a, a_t


def test_dist_mat_blocks_roundtrip():
    a, _ = make_graph(32)
    dmat = dist.DistRowMat.from_csr(a, 4, pad_to=8)
    # reassemble dense from ring-ordered blocks
    m_loc = 8
    dense = np.zeros((32, 32), np.float32)
    rows = np.asarray(dmat.rows)
    cols = np.asarray(dmat.cols)
    vals = np.asarray(dmat.vals)
    for j in range(4):
        for s in range(4):
            cb = (j + s) % 4
            for r, c, v in zip(rows[j, s], cols[j, s], vals[j, s]):
                if v != 0:
                    dense[j * m_loc + r, cb * m_loc + c] += v
    np.testing.assert_allclose(dense, a.to_dense(), rtol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("strategy", ["ring", "all_gather"])
def test_dist_aggregate_matches_local(mesh4, strategy):
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    a, _ = make_graph(64)
    dmat = dist.DistRowMat.from_csr(a, 4, pad_to=8)
    h = jnp.asarray(np.random.default_rng(0).random((64, 16), np.float32))

    def body(mat, hl):
        local = dict(rows=mat["rows"][0], cols=mat["cols"][0], vals=mat["vals"][0])
        return dist.dist_aggregate(local, hl, 4, strategy)

    spec = jax.sharding.PartitionSpec(dist.GRAPH_AXIS)
    f = shard_map(
        body,
        mesh=mesh4,
        in_specs=(dict(rows=spec, cols=spec, vals=spec), spec),
        out_specs=spec,
        check_vma=False,
    )
    got = f(dict(rows=dmat.rows, cols=dmat.cols, vals=dmat.vals), h)
    expected = a.to_dense() @ np.asarray(h)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("strategy", ["ring", "all_gather"])
def test_dist_train_step_matches_single(mesh4, strategy):
    """Distributed step == single-chip step, exactly the reference's claim
    (same math, different partitioning)."""
    n, f, c = 64, 12, 4
    rng = np.random.default_rng(5)
    a, a_t = make_graph(n)
    x = rng.standard_normal((n, f)).astype(np.float32)
    y = rng.integers(0, c, n).astype(np.int32)

    config = GCNConfig(sizes=(f, 8, c))
    params = init_params(config)
    opt = adam.adam_init(params)

    # single-chip reference result
    pair = AggPair(COOMat.from_csr(a_t, pad_to=8), COOMat.from_csr(a, pad_to=8))
    loss1, acc1, grads1 = loss_and_grad(
        params, pair, jnp.asarray(x), jnp.asarray(y), config
    )
    p1, o1 = adam.adam_update(params, grads1, opt)

    # distributed
    dpair = dist.DistAggPair.from_csr_pair(a_t, a, 4, pad_to=8)
    step = dist.make_dist_train_step(config, mesh4, n, strategy=strategy)
    p2, o2, loss2, acc2 = step(params, opt, dpair, jnp.asarray(x), jnp.asarray(y))

    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    np.testing.assert_allclose(float(acc2), float(acc1), rtol=1e-6)
    for l1, l2 in zip(p1, p2):
        for k in l1:
            np.testing.assert_allclose(
                np.asarray(l2[k]), np.asarray(l1[k]), rtol=2e-4, atol=2e-6
            )


def test_dist_train_decreases_loss(mesh4):
    n, f, c = 64, 12, 4
    rng = np.random.default_rng(6)
    a, a_t = make_graph(n, seed=7)
    x = rng.standard_normal((n, f)).astype(np.float32)
    y = rng.integers(0, c, n).astype(np.int32)
    config = GCNConfig(sizes=(f, 8, c))
    params = init_params(config)
    opt = adam.adam_init(params)
    dpair = dist.DistAggPair.from_csr_pair(a_t, a, 4, pad_to=8)
    step = dist.make_dist_train_step(config, mesh4, n)
    losses = []
    for _ in range(5):
        params, opt, loss, acc = step(params, opt, dpair, jnp.asarray(x), jnp.asarray(y))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_dist_rejects_indivisible():
    a, _ = make_graph(30)
    with pytest.raises(ValueError, match="divisible"):
        dist.DistRowMat.from_csr(a, 4)


def test_dist_exact_matches_single_exact(mesh4):
    """config.parity=False (CLI --exact) must give the single-chip exact
    autodiff training trajectory on the distributed path too."""
    n, f, c = 64, 12, 4
    rng = np.random.default_rng(9)
    a, a_t = make_graph(n)
    x = rng.standard_normal((n, f)).astype(np.float32)
    y = rng.integers(0, c, n).astype(np.int32)

    config = GCNConfig(sizes=(f, 8, c), parity=False)
    params = init_params(config)
    opt = adam.adam_init(params)

    # large Adam eps linearizes the update so f32 reduction-order noise in
    # near-zero grads is not sign-amplified to +-lr (both sides use it)
    hp = dict(adam.DEFAULT_HPARAMS, eps=1.0)
    pair = AggPair(COOMat.from_csr(a_t, pad_to=8), COOMat.from_csr(a, pad_to=8))
    loss1, acc1, grads1 = loss_and_grad(
        params, pair, jnp.asarray(x), jnp.asarray(y), config
    )
    p1, _ = adam.adam_update(params, grads1, opt, **hp)

    dpair = dist.DistAggPair.from_csr_pair(a_t, a, 4, pad_to=8)
    step = dist.make_dist_train_step(config, mesh4, n, hparams=hp)
    p2, _, loss2, acc2 = step(params, opt, dpair, jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    np.testing.assert_allclose(float(acc2), float(acc1), rtol=1e-6)
    for l1, l2 in zip(p1, p2):
        for k in l1:
            np.testing.assert_allclose(
                np.asarray(l2[k]), np.asarray(l1[k]), rtol=1e-4, atol=1e-5
            )
    # and it must differ from the parity (layer-0-skip) trajectory
    config_p = GCNConfig(sizes=(f, 8, c), parity=True)
    _, _, grads_p = loss_and_grad(
        params, pair, jnp.asarray(x), jnp.asarray(y), config_p
    )
    assert not np.allclose(
        np.asarray(grads_p[0]["W"]), np.asarray(grads1[0]["W"]), atol=1e-6
    )


def test_dist_halo_rejects_all_gather(mesh4):
    config = GCNConfig(sizes=(4, 4, 2))
    with pytest.raises(ValueError, match="halo"):
        dist.make_dist_train_step(
            config, mesh4, 64, pair_kind="halo", strategy="all_gather"
        )


def test_col_rejects_residual_and_mask():
    from mg_gcn_tpu.parallel import dist_col

    mesh = dist_col.make_col_mesh(4)
    with pytest.raises(NotImplementedError, match="residual"):
        dist_col.make_col_train_step(
            GCNConfig(sizes=(8, 8, 4), residual=True, parity=False), mesh, 64
        )
    with pytest.raises(NotImplementedError, match="mask"):
        dist_col.make_col_train_step(
            GCNConfig(sizes=(8, 8, 4), loss_mask="train", parity=False), mesh, 64
        )
