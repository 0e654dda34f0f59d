"""Phase-timing diagnostics tests."""

import io

import jax.numpy as jnp
import numpy as np

from mg_gcn_tpu import sparse
from mg_gcn_tpu.diagnostics import profile_epoch
from mg_gcn_tpu.models.gcn import GCNConfig, init_params
from mg_gcn_tpu.ops.spmm import AggPair, COOMat


def test_profile_epoch_phases():
    n, f, c = 64, 10, 4
    g = sparse.random_graph(n, 4, seed=50)
    a = sparse.normalize(g, axis=True)
    a_t = sparse.transpose(a)
    pair = AggPair(COOMat.from_csr(a_t, pad_to=8), COOMat.from_csr(a, pad_to=8))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, c, n).astype(np.int32))
    config = GCNConfig(sizes=(f, 8, c))
    params = init_params(config)
    timers = profile_epoch(params, pair, x, y, config)
    out = io.StringIO()
    timers.dump(out, prefix="0_")
    text = out.getvalue()
    # reference-style phase keys present
    assert "0_0_0_matmul-gemm:" in text
    assert "0_0_0_matmul-spmm:" in text
    assert "0_0_0_activation:" in text
    assert "0_0_loss-layer:" in text
    assert "0_1_1_matmul-spmm:" in text  # backward spmm of layer 1
    assert "0_0_1_matmul-spmm" not in text  # layer-0 backward spmm skipped
    for line in text.strip().splitlines():
        name, ms = line.rsplit(":", 1)
        assert float(ms) >= 0
