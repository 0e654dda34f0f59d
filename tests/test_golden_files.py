"""Golden-file regression test (the reference's test_gcn_forward scheme,
test/test_gcn.cpp:37-96): load a dataset + per-layer weight dumps, run the
framework forward/backward, compare per-layer activations and gradients
against the checked-in golden binaries."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from mg_gcn_tpu import sparse
from mg_gcn_tpu.formats import Dataset, read_dense
from mg_gcn_tpu.models.gcn import GCNConfig, forward, loss_and_grad_parity
from mg_gcn_tpu.ops.spmm import AggPair, COOMat

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "golden")


@pytest.mark.skipif(not os.path.isdir(GOLDEN), reason="golden fixture missing")
def test_golden_forward_backward():
    ds = Dataset.load(GOLDEN)
    n = ds.num_nodes
    sizes = (ds.num_features, 16, 16, ds.num_labels)
    config = GCNConfig(sizes=sizes)

    params = []
    for i in range(3):
        params.append(
            dict(
                W=jnp.asarray(read_dense(os.path.join(GOLDEN, f"{2 * i}.bin"))),
                b=jnp.asarray(read_dense(os.path.join(GOLDEN, f"{2 * i + 1}.bin"))),
            )
        )

    a_hat = sparse.normalize(ds.graph, axis=True)
    a_hat_T = sparse.transpose(a_hat)
    pair = AggPair(COOMat.from_csr(a_hat_T, pad_to=8), COOMat.from_csr(a_hat, pad_to=8))
    x = jnp.asarray(ds.features)
    y = jnp.asarray(ds.labels.reshape(-1))

    logits, caches = forward(params, pair, x, config, return_caches=True)
    for i in range(3):
        expected = read_dense(os.path.join(GOLDEN, f"o{i}.bin"))
        np.testing.assert_allclose(
            np.asarray(caches[i]["post"]), expected, rtol=1e-4, atol=1e-5,
            err_msg=f"layer {i} output",
        )

    loss, acc, grads = loss_and_grad_parity(params, pair, x, y, config)
    expected_loss = float(open(os.path.join(GOLDEN, "loss.txt")).read())
    np.testing.assert_allclose(float(loss), expected_loss, rtol=1e-5)
    for i in range(3):
        gw = read_dense(os.path.join(GOLDEN, f"g{2 * i}.bin"))
        gb = read_dense(os.path.join(GOLDEN, f"g{2 * i + 1}.bin"))
        np.testing.assert_allclose(
            np.asarray(grads[i]["W"]), gw, rtol=2e-4, atol=1e-6,
            err_msg=f"layer {i} G_W",
        )
        np.testing.assert_allclose(
            np.asarray(grads[i]["b"]), gb, rtol=2e-4, atol=1e-6,
            err_msg=f"layer {i} G_b",
        )


@pytest.mark.skipif(
    not os.path.isfile(os.path.join(GOLDEN, "eg0.bin")),
    reason="exact-mode golden files missing",
)
def test_golden_exact_gradients():
    """Exact (autodiff) mode vs torch-autograd golden dumps (eg*.bin)."""
    from mg_gcn_tpu.models.gcn import loss_and_grad

    ds = Dataset.load(GOLDEN)
    sizes = (ds.num_features, 16, 16, ds.num_labels)
    config = GCNConfig(sizes=sizes, parity=False)
    params = []
    for i in range(3):
        params.append(
            dict(
                W=jnp.asarray(read_dense(os.path.join(GOLDEN, f"{2 * i}.bin"))),
                b=jnp.asarray(read_dense(os.path.join(GOLDEN, f"{2 * i + 1}.bin"))),
            )
        )
    a_hat = sparse.normalize(ds.graph, axis=True)
    a_hat_T = sparse.transpose(a_hat)
    pair = AggPair(COOMat.from_csr(a_hat_T, pad_to=8), COOMat.from_csr(a_hat, pad_to=8))
    x = jnp.asarray(ds.features)
    y = jnp.asarray(ds.labels.reshape(-1))
    loss, acc, grads = loss_and_grad(params, pair, x, y, config)
    expected_loss = float(open(os.path.join(GOLDEN, "loss.txt")).read())
    np.testing.assert_allclose(float(loss), expected_loss, rtol=1e-5)
    for i in range(3):
        gw = read_dense(os.path.join(GOLDEN, f"eg{2 * i}.bin"))
        gb = read_dense(os.path.join(GOLDEN, f"eg{2 * i + 1}.bin"))
        np.testing.assert_allclose(
            np.asarray(grads[i]["W"]), gw, rtol=2e-4, atol=1e-6,
            err_msg=f"layer {i} exact G_W",
        )
        np.testing.assert_allclose(
            np.asarray(grads[i]["b"]).reshape(gb.shape), gb, rtol=2e-4, atol=1e-6,
            err_msg=f"layer {i} exact G_b",
        )
