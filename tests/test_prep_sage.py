"""Dataset prep tooling + GraphSAGE model tests."""

import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from mg_gcn_tpu import sparse
from mg_gcn_tpu.data import prep
from mg_gcn_tpu.formats import Dataset


def test_make_toy_byte_parity(tmp_path, toy_dirs):
    """Our toy generator must write byte-identical files to the reference
    fixtures (prep.py:155-168)."""
    prep.make_toy(str(tmp_path))
    for name in ("toyA", "toyB"):
        for f in ("graph.bin", "features.bin", "labels.bin", "sets.bin"):
            ours = (tmp_path / name / f).read_bytes()
            ref = open(os.path.join(toy_dirs[name], f), "rb").read()
            assert ours == ref, f"{name}/{f} differs"


def test_pad_graph():
    g = sparse.random_graph(10, 3, seed=1, self_loops=False)
    feats = np.random.default_rng(0).random((10, 5), np.float32)
    labels = np.arange(10, dtype=np.int32) % 3
    sets = np.zeros(10, np.int32)
    ds = prep.pad_graph(g, feats, labels, sets, P=8)
    assert ds.num_nodes == 16
    assert ds.num_features == 8
    d = ds.graph.to_dense()
    assert np.all(np.diag(d) != 0)  # self loops
    # padded nodes only have their self loop
    assert d[10:, :10].sum() == 0 and d[:10, 10:].sum() == 0


def test_permuted_variant_preserves_structure():
    g = sparse.random_graph(12, 3, seed=2)
    feats = np.random.default_rng(1).random((12, 4), np.float32)
    ds = Dataset(
        graph=g,
        features=feats,
        labels=np.arange(12, dtype=np.int32).reshape(-1, 1) % 3,
        sets=np.zeros((12, 1), np.int32),
    )
    out = prep.permuted_variant(ds, seed=5)
    assert out.graph.nnz == g.nnz
    # degree multiset preserved
    assert sorted(np.diff(out.graph.indptr)) == sorted(np.diff(g.indptr))


def test_synthetic_roundtrip(tmp_path):
    path = prep.make_synthetic(64, 4, 6, 3, str(tmp_path), P=8, seed=3)
    ds = Dataset.load(path)
    assert ds.num_nodes % 8 == 0
    assert ds.num_features % 8 == 0
    assert ds.num_labels <= 3


def test_comm_volume_report(tmp_path, capsys):
    prep.make_synthetic(64, 4, 6, 3, str(tmp_path), name="cv", P=8, seed=3)
    vol = prep.comm_volume_report(os.path.join(tmp_path, "cv"), 4)
    assert vol.shape == (4, 4)


def test_sage_trains():
    from mg_gcn_tpu.models import sage
    from mg_gcn_tpu.nn import adam
    from mg_gcn_tpu.train import make_train_step

    n, f, c = 64, 10, 4
    g = sparse.random_graph(n, 5, seed=4)
    pair = sage.build_sage_pair(g, impl="xla")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, c, n).astype(np.int32))
    config = sage.SAGEConfig(sizes=(f, 16, c))
    params = sage.init_params(config)
    opt = adam.adam_init(params)
    step = make_train_step(config, model="sage")
    losses = []
    for _ in range(6):
        params, opt, loss, acc = step(params, opt, pair, x, y, None)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_sage_mean_aggregation_semantics():
    """fwd matrix must be row-stochastic (mean over out-edges per row)."""
    from mg_gcn_tpu.models import sage

    g = sparse.random_graph(32, 4, seed=6)
    pair = sage.build_sage_pair(g, impl="xla")
    ones = jnp.ones((32, 3), jnp.float32)
    from mg_gcn_tpu.ops.spmm import spmm

    out = np.asarray(spmm(pair.fwd, ones))
    np.testing.assert_allclose(out, 1.0, rtol=1e-5)
