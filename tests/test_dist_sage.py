"""Distributed GraphSAGE: must match the single-chip exact sage step."""

import jax.numpy as jnp
import numpy as np
import pytest

from mg_gcn_tpu import sparse
from mg_gcn_tpu.models import sage
from mg_gcn_tpu.nn import adam
from mg_gcn_tpu.parallel import dist


@pytest.fixture(scope="module")
def mesh4():
    return dist.make_mesh(4)


def test_dist_sage_matches_single(mesh4):
    n, f, c = 64, 10, 4
    rng = np.random.default_rng(17)
    g = sparse.random_graph(n, 5, seed=18, weights="random")
    x = rng.standard_normal((n, f)).astype(np.float32)
    y = rng.integers(0, c, n).astype(np.int32)
    config = sage.SAGEConfig(sizes=(f, 8, c))
    params = sage.init_params(config)
    opt = adam.adam_init(params)

    pair1 = sage.build_sage_pair(g, impl="xla")
    l1, a1, g1 = sage.loss_and_grad(params, pair1, jnp.asarray(x), jnp.asarray(y), config)

    m = sparse.normalize(g, axis=False)
    m_t = sparse.transpose(m)
    dpair = dist.DistAggPair.from_csr_pair(m, m_t, 4, pad_to=8)
    step = dist.make_dist_sage_train_step(config, mesh4, n)
    p2, o2, l2, a2 = step(params, opt, dpair, jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    np.testing.assert_allclose(float(a2), float(a1), rtol=1e-6)

    # gradients: single-chip adam update vs distributed
    p1, _ = adam.adam_update(params, g1, opt)
    for la, lb in zip(p1, p2):
        for k in la:
            np.testing.assert_allclose(
                np.asarray(lb[k]), np.asarray(la[k]), rtol=3e-4, atol=3e-6
            )


def test_dist_sage_decreases_loss(mesh4):
    n, f, c = 64, 8, 3
    rng = np.random.default_rng(19)
    g = sparse.random_graph(n, 5, seed=20)
    x = rng.standard_normal((n, f)).astype(np.float32)
    y = rng.integers(0, c, n).astype(np.int32)
    config = sage.SAGEConfig(sizes=(f, 8, c))
    params = sage.init_params(config)
    opt = adam.adam_init(params)
    m = sparse.normalize(g, axis=False)
    m_t = sparse.transpose(m)
    dpair = dist.DistAggPair.from_csr_pair(m, m_t, 4, pad_to=8)
    step = dist.make_dist_sage_train_step(config, mesh4, n)
    losses = []
    for _ in range(5):
        params, opt, loss, acc = step(params, opt, dpair, jnp.asarray(x), jnp.asarray(y))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
