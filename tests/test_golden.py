"""Golden-value numerics tests.

The hard-coded tensors replicate the reference's unit tests exactly
(test/test_gcn.cpp:98-249 — themselves derived from PyTorch), so passing
them proves numerical parity with the reference ops:

* test_cross_entropy  <- test_gcn.cpp:98-115
* test_leaky_relu     <- test_gcn.cpp:118-139
* test_g (dense A)    <- test_gcn.cpp:141-193
* test_csr_g (CSR A)  <- test_gcn.cpp:195-249
"""

import jax.numpy as jnp
import numpy as np

from mg_gcn_tpu.formats import CSRData
from mg_gcn_tpu.ops import elementwise as ew
from mg_gcn_tpu.ops.softmax_xent import softmax_xent
from mg_gcn_tpu.ops.spmm import COOMat, spmm

LOGITS = np.array([[2, 1, 2], [4, 2, 1], [1, -1, 0]], dtype=np.float32)
LABELS = np.array([0, 0, 1], dtype=np.int32)


def test_cross_entropy(ref_close):
    out = softmax_xent(jnp.asarray(LOGITS), jnp.asarray(LABELS))
    ref_close(out.loss, 1.146482)
    expected_g = [
        -0.1925604, 0.0517875, 0.1407729,
        -0.0520684, 0.0380651, 0.0140034,
        0.2217470, -0.3033231, 0.0815762,
    ]
    ref_close(np.asarray(out.grad).ravel(), expected_g)
    # accuracy: preds argmax([2,1,2],[4,2,1],[1,-1,0]) = [0,0,0]; correct 2/3
    ref_close(out.acc, 2 / 3)


def test_leaky_relu(ref_close):
    h = ew.leaky_relu(jnp.asarray(LOGITS))
    out = softmax_xent(h, jnp.asarray(LABELS))
    g = ew.leaky_relu_grad(jnp.asarray(LOGITS), out.grad)
    ref_close(out.loss, 0.8637248)
    expected = [
        -0.1925604, 0.0517875, 0.1407729,
        -0.0520684, 0.0380651, 0.0140034,
        0.1924448, -0.0026324, 0.0007080,
    ]
    ref_close(np.asarray(g).ravel(), expected)


# One-layer GCN fixture shared by the dense and CSR variants
A_DENSE = np.array([[1, 0], [0.5, 0.5]], dtype=np.float32)
X = np.array([[4, 2, 1], [1, -1, 0]], dtype=np.float32)
W = np.array([[1, 2], [-1, 0], [0.5, 1.5]], dtype=np.float32)
B = np.array([[1, 0.5]], dtype=np.float32)
Y = np.array([0, 1], dtype=np.int32)

EXPECTED_LOSS = 3.2750449
EXPECTED_G = [-0.4992494, 0.4992494, 0.0237129, -0.0237129]
EXPECTED_GB = [-0.4755365, 0.4755365]
EXPECTED_GW = [-1.9377153, 1.9377153, -0.9866424, 0.9866424, -0.4873929, 0.4873929]
EXPECTED_GOUT = [0.4873929, 0.4873929, 0.4873930, -0.0118565, -0.0118565, -0.0118565]


def _one_layer_check(matvec, matvec_t, ref_close):
    """The hand-built forward/backward from test_gcn.cpp:141-249."""
    xw = X @ W
    axw = B + matvec(xw)  # broadcast_rows then matmul beta=1
    h = ew.leaky_relu(jnp.asarray(axw))
    out = softmax_xent(h, jnp.asarray(Y))
    g = ew.leaky_relu_grad(jnp.asarray(axw), out.grad)
    g = np.asarray(g)
    g_b = np.ones((1, 2)) @ g
    g_xw = matvec_t(g)
    g_w = X.T @ g_xw
    g_out = g_xw @ W.T
    ref_close(out.loss, EXPECTED_LOSS)
    ref_close(g.ravel(), EXPECTED_G)
    ref_close(g_b.ravel(), EXPECTED_GB)
    ref_close(np.asarray(g_w).ravel(), EXPECTED_GW)
    ref_close(np.asarray(g_out).ravel(), EXPECTED_GOUT)


def test_g(ref_close):
    """Dense-A variant: A@ and Aᵀ@ as plain matmuls (test_gcn.cpp:141-193)."""
    _one_layer_check(
        lambda m: A_DENSE @ m,
        lambda m: A_DENSE.T @ m,
        ref_close,
    )


def test_csr_g(ref_close):
    """CSR variant through our SpMM op (test_gcn.cpp:195-249)."""
    a = CSRData(
        indptr=np.array([0, 1, 3]),
        indices=np.array([0, 0, 1], dtype=np.int32),
        data=np.array([1, 0.5, 0.5], dtype=np.float32),
        shape=(2, 2),
    )
    from mg_gcn_tpu import sparse as sparse_mod

    a_t = sparse_mod.transpose(a)
    mat = COOMat.from_csr(a, pad_to=8)
    mat_t = COOMat.from_csr(a_t, pad_to=8)
    _one_layer_check(
        lambda m: np.asarray(spmm(mat, jnp.asarray(np.asarray(m, np.float32)))),
        lambda m: np.asarray(spmm(mat_t, jnp.asarray(np.asarray(m, np.float32)))),
        ref_close,
    )


def test_csr_g_pallas_interpret(ref_close):
    """Same golden check through the Pallas tiled kernel (interpret mode)."""
    from mg_gcn_tpu.ops.spmm_pallas import TiledMat, spmm_tiled

    a = CSRData(
        indptr=np.array([0, 1, 3]),
        indices=np.array([0, 0, 1], dtype=np.int32),
        data=np.array([1, 0.5, 0.5], dtype=np.float32),
        shape=(2, 2),
    )
    from mg_gcn_tpu import sparse as sparse_mod

    a_t = sparse_mod.transpose(a)
    mat = TiledMat.from_csr(a, br=128, bc=128, interpret=True)
    mat_t = TiledMat.from_csr(a_t, br=128, bc=128, interpret=True)
    _one_layer_check(
        lambda m: np.asarray(spmm_tiled(mat, jnp.asarray(np.asarray(m, np.float32)))),
        lambda m: np.asarray(spmm_tiled(mat_t, jnp.asarray(np.asarray(m, np.float32)))),
        ref_close,
    )
