"""Fused RDMA-ring pattern SpMM (ops/spmm_pattern_ring.py) vs dense oracles.

Runs the real multi-device RDMA schedule under the TPU-semantics interpreter
(pltpu.InterpretParams) on the virtual CPU mesh — the closest software model
of the inter-chip DMA engines that exists without multi-chip hardware."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mg_gcn_tpu import sparse
from mg_gcn_tpu.parallel import dist

# compile-heavy interpret-mode tests: nightly-style full suite only
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def mesh2():
    return dist.make_mesh(2)


@pytest.fixture(scope="module")
def mesh4():
    return dist.make_mesh(4)


def setup_pair(n=5000, parts=2):
    g = sparse.random_graph(n, 4, seed=21, weights="ones")
    pair = dist.DistPatternPair.from_binary_csr(g, parts, dtype="float32")
    a_hat = sparse.normalize(g, axis=True).to_dense()
    return g, pair, a_hat


def _run_fused(mesh, pair, h_global, orientation):
    parts = pair.parts
    spec = jax.sharding.PartitionSpec(dist.GRAPH_AXIS)

    def body(pf, pb, sc, h):
        pack = pf[0] if orientation == "PT" else pb[0]
        return dist.dist_aggregate_pattern(
            pack, sc[0], h, parts, orientation, "float32", "fused", interpret=True
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


@pytest.mark.parametrize("parts", [2, 4])
def test_fused_ring_forward(mesh2, mesh4, parts):
    mesh = mesh2 if parts == 2 else mesh4
    g, pair, a_hat = setup_pair(parts=parts)
    n, n_pad, d = pair.n, pair.n_pad, 8
    h = np.random.default_rng(0).random((n_pad, d)).astype(np.float32)
    h[n:] = 0
    got = _run_fused(mesh, pair, jnp.asarray(h), "PT")
    want = a_hat.T @ h[:n]
    np.testing.assert_allclose(got[:n], want, rtol=1e-5, atol=1e-5)
    assert np.abs(got[n:]).max() == 0


@pytest.mark.parametrize("parts", [2, 4])
def test_fused_ring_backward(mesh2, mesh4, parts):
    mesh = mesh2 if parts == 2 else mesh4
    g, pair, a_hat = setup_pair(parts=parts)
    n, n_pad, d = pair.n, pair.n_pad, 8
    h = np.random.default_rng(1).random((n_pad, d)).astype(np.float32)
    h[n:] = 0
    got = _run_fused(mesh, pair, jnp.asarray(h), "P")
    want = a_hat @ h[:n]
    np.testing.assert_allclose(got[:n], want, rtol=1e-5, atol=1e-5)


def test_fused_ring_int8_matches_xla_ring(mesh2):
    """int8 blocks on the wire through the fused kernel == the ppermute
    int8 path (identical quantization, exact int32 accumulation)."""
    g, pair, a_hat = setup_pair(parts=2)
    n, n_pad, d = pair.n, pair.n_pad, 8
    h = np.zeros((n_pad, d), np.float32)
    h[:n] = np.random.default_rng(7).standard_normal((n, d))
    spec = jax.sharding.PartitionSpec(dist.GRAPH_AXIS)

    def run(strategy, interpret):
        def body(pf, sc, hh):
            return dist.dist_aggregate_pattern(
                pf[0], sc[0], hh, 2, "PT", "int8", strategy, interpret
            )

        f = jax.jit(
            jax.shard_map(
                body,
                mesh=mesh2,
                in_specs=(spec, spec, spec),
                out_specs=spec,
                check_vma=False,
            )
        )
        return np.asarray(f(pair.pack_fwd, pair.scale, jnp.asarray(h)))

    got = run("fused", True)

    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    from mg_gcn_tpu.ops import spmm_pattern as sp

    sp.pl.pallas_call = patched
    try:
        want = run("ring", False)
    finally:
        sp.pl.pallas_call = orig
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fused_train_step_matches_ring(mesh2):
    """Full train step with strategy='fused' == XLA-ppermute pattern step."""
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

    kw = dict(pair_kind="pattern", use_mask=True, pattern_dtype="float32")
    step_f = dist.make_dist_train_step(
        config, mesh2, n, strategy="fused", interpret=True, **kw
    )
    pf, _, loss_f, acc_f = step_f(
        params, opt, ppair, jnp.asarray(x), jnp.asarray(y), jnp.asarray(valid)
    )

    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    from mg_gcn_tpu.ops import spmm_pattern as sp

    sp.pl.pallas_call = patched
    try:
        step_r = dist.make_dist_train_step(config, mesh2, n, strategy="ring", **kw)
        pr, _, loss_r, acc_r = step_r(
            params, opt, ppair, jnp.asarray(x), jnp.asarray(y), jnp.asarray(valid)
        )
    finally:
        sp.pl.pallas_call = orig

    np.testing.assert_allclose(float(loss_f), float(loss_r), rtol=1e-5)
    np.testing.assert_allclose(float(acc_f), float(acc_r), rtol=1e-6)
    for lr, lf in zip(pr, pf):
        for k in lr:
            np.testing.assert_allclose(
                np.asarray(lf[k]), np.asarray(lr[k]), rtol=2e-4, atol=2e-6
            )


# P=8 interpret runs deadlock in the pallas TPU interpreter itself (all
# io_callback threads block inside _allocate_buffer while ring peers hold
# the pool at the entry barrier — an interpreter thread-pool limit, probed
# 2026-08-19). P=4 exercises every ring branch (receive, multi-hop forward
# at s < parts-1, drain), so coverage caps there until the interpreter
# scales.


@pytest.mark.parametrize("orientation", ["PT", "P"])
def test_fused_ring_wide_features_chunked(mesh2, orientation):
    """d > D_MAX must run the fused kernel in feature chunks — NOT silently
    fall back to the ppermute ring (VERDICT r1 next #5)."""
    import warnings

    from mg_gcn_tpu.ops.spmm_pattern import D_MAX

    g, pair, a_hat = setup_pair(parts=2)
    n, n_pad = pair.n, pair.n_pad
    d = D_MAX + 44  # forces >1 chunk, non-multiple of D_MAX
    h = np.zeros((n_pad, d), np.float32)
    h[:n] = np.random.default_rng(9).random((n, d))
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any fallback warning fails the test
        got = _run_fused(mesh2, pair, jnp.asarray(h), orientation)
    want = (a_hat.T if orientation == "PT" else a_hat) @ h[:n]
    np.testing.assert_allclose(got[:n], want, rtol=1e-5, atol=1e-5)
