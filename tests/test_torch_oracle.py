"""Independent ground truth: PyTorch oracle vs numpy oracle vs framework.

Three-way validation (VERDICT r1 weak #1/#2): the torch oracle
(tests/torch_oracle.py) is a clean-room transcription of gcn.hpp sharing no
code with the numpy oracle (tests/test_layerwise.py); agreement between the
two independent transcriptions AND the framework rules out a shared
misreading. Exact mode is checked against torch *autograd* — a gradient
engine written by neither hand.
"""

import numpy as np
import pytest

import jax

from mg_gcn_tpu import sparse
from mg_gcn_tpu.models.gcn import (
    GCNConfig,
    init_params,
    loss_and_grad,
    loss_and_grad_parity,
)
from mg_gcn_tpu.nn import adam
from mg_gcn_tpu.ops.spmm import AggPair, COOMat

from tests import torch_oracle
from tests.test_layerwise import numpy_oracle


def setup_case(sizes, n=96, seed=7):
    rng = np.random.default_rng(seed)
    g = sparse.random_graph(n, 5, seed=seed + 1, weights="ones")
    a_hat = sparse.normalize(g, axis=True)
    a_hat_t = sparse.transpose(a_hat)
    x = rng.standard_normal((n, sizes[0])).astype(np.float32)
    y = rng.integers(0, sizes[-1], n).astype(np.int32)
    return a_hat, a_hat_t, x, y


def np_params(params):
    return [
        {k: np.asarray(v, np.float64) for k, v in layer.items()} for layer in params
    ]


@pytest.mark.parametrize("sizes", [(12, 8, 4), (6, 24, 4), (10, 8, 8, 4)])
def test_torch_vs_numpy_oracle_parity(sizes):
    """Two independent transcriptions of gcn.hpp must agree exactly."""
    a_hat, a_hat_t, x, y = setup_case(sizes)
    config = GCNConfig(sizes=sizes)
    params = np_params(init_params(config))
    Ws = [l["W"] for l in params]
    Bs = [l["b"].reshape(1, -1) for l in params]

    acts_np, loss_np, grads_np = numpy_oracle(
        a_hat_t.to_dense().astype(np.float64),
        a_hat.to_dense().astype(np.float64),
        Ws, Bs, x, y, sizes,
    )
    acts_t, loss_t, acc_t, grads_t = torch_oracle.run_parity(
        a_hat.to_dense(), a_hat_t.to_dense(), params, x, y
    )
    assert abs(loss_np - loss_t) < 1e-10
    for i in range(len(sizes) - 1):
        np.testing.assert_allclose(acts_np[i], acts_t[i].numpy(), rtol=1e-9)
        np.testing.assert_allclose(
            grads_np[i]["W"], grads_t[i]["W"].numpy(), rtol=1e-9, atol=1e-12
        )
        np.testing.assert_allclose(
            grads_np[i]["b"].reshape(-1), grads_t[i]["b"].numpy(), rtol=1e-9, atol=1e-12
        )


@pytest.mark.parametrize("sizes", [(12, 8, 4), (6, 24, 4)])
def test_framework_parity_vs_torch(sizes):
    a_hat, a_hat_t, x, y = setup_case(sizes, seed=11)
    config = GCNConfig(sizes=sizes)
    params = init_params(config)
    pair = AggPair(fwd=COOMat.from_csr(a_hat_t), bwd=COOMat.from_csr(a_hat))
    import jax.numpy as jnp

    loss, acc, grads = loss_and_grad_parity(
        params, pair, jnp.asarray(x), jnp.asarray(y), config, None
    )
    _, loss_t, acc_t, grads_t = torch_oracle.run_parity(
        a_hat.to_dense(), a_hat_t.to_dense(), np_params(params), x, y
    )
    assert abs(float(loss) - loss_t) < 1e-4
    assert abs(float(acc) - acc_t) < 1e-6
    for i in range(len(sizes) - 1):
        np.testing.assert_allclose(
            np.asarray(grads[i]["W"]), grads_t[i]["W"].numpy(), rtol=2e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(grads[i]["b"]).reshape(-1),
            grads_t[i]["b"].numpy(),
            rtol=2e-4,
            atol=1e-6,
        )


@pytest.mark.slow
@pytest.mark.parametrize("residual", [False, True])
@pytest.mark.parametrize("sizes", [(12, 8, 4), (6, 24, 6, 4)])
def test_framework_exact_vs_torch_autograd(sizes, residual):
    """Exact mode vs torch autograd — an independent gradient engine."""
    a_hat, a_hat_t, x, y = setup_case(sizes, seed=13)
    config = GCNConfig(sizes=sizes, parity=False, residual=residual)
    params = init_params(config, key=jax.random.key(5))
    pair = AggPair(fwd=COOMat.from_csr(a_hat_t), bwd=COOMat.from_csr(a_hat))
    import jax.numpy as jnp

    loss, acc, grads = loss_and_grad(
        params, pair, jnp.asarray(x), jnp.asarray(y), config, None
    )
    _, loss_t, acc_t, grads_t = torch_oracle.run_exact(
        a_hat_t.to_dense(), np_params(params), x, y, residual=residual
    )
    assert abs(float(loss) - loss_t) < 1e-4
    for i in range(len(sizes) - 1):
        for k in grads_t[i]:
            np.testing.assert_allclose(
                np.asarray(grads[i][k]).reshape(grads_t[i][k].shape),
                grads_t[i][k].numpy(),
                rtol=2e-4,
                atol=1e-6,
                err_msg=f"layer {i} grad {k} (residual={residual})",
            )


def test_adam_step_vs_torch():
    rng = np.random.default_rng(3)
    W = rng.standard_normal((8, 6)).astype(np.float32)
    gW = rng.standard_normal((8, 6)).astype(np.float32)
    hp = dict(lr=1e-2, beta1=0.9, beta2=0.999, weight_decay=5e-4, eps=1e-8)
    import jax.numpy as jnp

    params = [dict(W=jnp.asarray(W))]
    grads = [dict(W=jnp.asarray(gW))]
    state = adam.adam_init(params)
    m = np.zeros_like(W, dtype=np.float64)
    v = np.zeros_like(W, dtype=np.float64)
    Wt = W.astype(np.float64)
    for step in range(1, 4):
        params, state = adam.adam_update(params, grads, state, **hp)
        Wt, m, v = torch_oracle.adam_step_ref(
            Wt, gW, m, v, step, hp["lr"], hp["beta1"], hp["beta2"],
            hp["weight_decay"], hp["eps"],
        )
        Wt, m, v = Wt.numpy(), m.numpy(), v.numpy()
    np.testing.assert_allclose(np.asarray(params[0]["W"]), Wt, rtol=1e-5, atol=1e-6)


def test_sgd_step_vs_torch():
    rng = np.random.default_rng(4)
    W = rng.standard_normal((5, 3)).astype(np.float32)
    gW = rng.standard_normal((5, 3)).astype(np.float32)
    import jax.numpy as jnp

    params = [dict(W=jnp.asarray(W))]
    grads = [dict(W=jnp.asarray(gW))]
    out = adam.sgd_update(params, grads, 1e-2, 5e-4)
    want = torch_oracle.sgd_step_ref(W, gW, 1e-2, 5e-4).numpy()
    np.testing.assert_allclose(np.asarray(out[0]["W"]), want, rtol=1e-5, atol=1e-7)
