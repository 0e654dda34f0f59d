"""Column/tensor-parallel path tests (the reference's dormant -R 0 path,
working here): must match the single-chip exact-autodiff step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mg_gcn_tpu import sparse
from mg_gcn_tpu.models.gcn import GCNConfig, init_params, loss_and_grad
from mg_gcn_tpu.nn import adam
from mg_gcn_tpu.ops.spmm import AggPair, COOMat
from mg_gcn_tpu.parallel import dist_col


@pytest.fixture(scope="module")
def mesh4():
    return dist_col.make_col_mesh(4)


@pytest.mark.slow
def test_col_train_step_matches_single(mesh4):
    n, f, h, c = 48, 16, 8, 4
    rng = np.random.default_rng(11)
    g = sparse.random_graph(n, 5, seed=12, weights="random")
    a = sparse.normalize(g, axis=True)
    a_t = sparse.transpose(a)
    x = rng.standard_normal((n, f)).astype(np.float32)
    y = rng.integers(0, c, n).astype(np.int32)

    config = GCNConfig(sizes=(f, h, c), parity=False)
    params = init_params(config)
    opt = adam.adam_init(params)

    # single-chip exact autodiff oracle: loss trajectory over several steps.
    # (Post-Adam parameters are not compared elementwise: the first Adam step
    # is sign-like, so fp-reassociation differences across psum_scatter can
    # flip near-zero gradient signs; the trajectory check is the meaningful
    # equivalence.)
    pair = AggPair(COOMat.from_csr(a_t, pad_to=8), COOMat.from_csr(a, pad_to=8))
    p1, o1 = params, opt
    losses1, accs1 = [], []
    for _ in range(4):
        loss1, acc1, grads1 = loss_and_grad(
            p1, pair, jnp.asarray(x), jnp.asarray(y), config
        )
        p1, o1 = adam.adam_update(p1, grads1, o1)
        losses1.append(float(loss1))
        accs1.append(float(acc1))

    mat = COOMat.from_csr(a_t, pad_to=8)
    step = dist_col.make_col_train_step(config, mesh4, n)
    p2, o2 = params, opt
    losses2, accs2 = [], []
    for _ in range(4):
        p2, o2, loss2, acc2 = step(p2, o2, mat, jnp.asarray(x), jnp.asarray(y))
        losses2.append(float(loss2))
        accs2.append(float(acc2))

    np.testing.assert_allclose(losses2[0], losses1[0], rtol=1e-5)
    np.testing.assert_allclose(accs2[0], accs1[0], rtol=1e-6)
    np.testing.assert_allclose(losses2, losses1, rtol=2e-2)


def test_col_train_decreases_loss(mesh4):
    n, f, h, c = 48, 8, 8, 4
    rng = np.random.default_rng(13)
    g = sparse.random_graph(n, 4, seed=14)
    a_t = sparse.transpose(sparse.normalize(g, axis=True))
    x = rng.standard_normal((n, f)).astype(np.float32)
    y = rng.integers(0, c, n).astype(np.int32)
    config = GCNConfig(sizes=(f, h, c), parity=False)
    params = init_params(config)
    opt = adam.adam_init(params)
    mat = COOMat.from_csr(a_t, pad_to=8)
    step = dist_col.make_col_train_step(config, mesh4, n)
    losses = []
    for _ in range(5):
        params, opt, loss, acc = step(params, opt, mat, jnp.asarray(x), jnp.asarray(y))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_col_rejects_indivisible(mesh4):
    config = GCNConfig(sizes=(10, 8, 4), parity=False)
    with pytest.raises(ValueError, match="divisible"):
        dist_col.make_col_train_step(config, mesh4, 48)


def test_dist_transpose_matches_local():
    """Explicit distributed dense transpose (dist_matrix.hpp:358-390
    equivalent): column-sharded (n, d) -> column-sharded (d, n)."""
    import jax
    import jax.numpy as jnp

    from mg_gcn_tpu.parallel import dist_col

    parts = 4
    n, d = 32, 8  # both divisible by parts
    rng = np.random.default_rng(7)
    x = rng.standard_normal((n, d)).astype(np.float32)
    mesh = dist_col.make_col_mesh(parts)
    tr = dist_col.make_dist_transpose(mesh, parts)
    got = np.asarray(tr(jnp.asarray(x)))
    np.testing.assert_array_equal(got, x.T)
