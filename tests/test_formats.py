"""I/O format tests: parity with the reference binary fixtures
(mirrors test/test_matrix.cpp:11-76)."""

import numpy as np
import pytest

from mg_gcn_tpu.formats import (
    CSRData,
    Dataset,
    read_dense,
    read_pigo_csr,
    write_dense,
    write_pigo_csr,
)

# prep.py:155-168 ground truth
TOYA_DENSE = np.array(
    [[0, 1, 0, 1], [1, 0, 1, 0], [0, 1, 0, 1], [1, 0, 1, 0]], dtype=np.float32
)
TOYB_DENSE = np.array(
    [[0, 1, 1, 1], [1, 1, 1, 0], [0, 1, 1, 1], [1, 1, 1, 0]], dtype=np.float32
)
TOY_FEATURES = np.array([[0, 1], [1, 0], [0, 1], [1, 0]], dtype=np.float32)
TOY_LABELS = np.array([0, 1, 0, 1], dtype=np.int32)
TOY_SETS = np.array([0, 0, 1, 2], dtype=np.int32)


def test_read_toy_graphs(toy_dirs):
    a = read_pigo_csr(toy_dirs["toyA"] + "/graph.bin")
    assert a.shape == (4, 4)
    assert a.nnz == 8
    np.testing.assert_array_equal(a.to_dense(), TOYA_DENSE)
    b = read_pigo_csr(toy_dirs["toyB"] + "/graph.bin")
    assert b.nnz == 12
    np.testing.assert_array_equal(b.to_dense(), TOYB_DENSE)


def test_read_toy_dense(toy_dirs):
    x = read_dense(toy_dirs["toyA"] + "/features.bin", np.float32)
    np.testing.assert_array_equal(x, TOY_FEATURES)
    y = read_dense(toy_dirs["toyA"] + "/labels.bin", np.int32)
    np.testing.assert_array_equal(y.ravel(), TOY_LABELS)
    s = read_dense(toy_dirs["toyA"] + "/sets.bin", np.int32)
    np.testing.assert_array_equal(s.ravel(), TOY_SETS)


def test_write_pigo_byte_parity(toy_dirs, tmp_path):
    """Our writer must produce byte-identical files to the reference prep.py."""
    for name in ("toyA", "toyB"):
        src = toy_dirs[name] + "/graph.bin"
        csr = read_pigo_csr(src)
        out = tmp_path / f"{name}.bin"
        write_pigo_csr(out, csr)
        assert out.read_bytes() == open(src, "rb").read()


def test_write_dense_byte_parity(toy_dirs, tmp_path):
    src = toy_dirs["toyA"] + "/features.bin"
    x = read_dense(src, np.float32)
    out = tmp_path / "features.bin"
    write_dense(out, x, np.float32)
    assert out.read_bytes() == open(src, "rb").read()


def test_dataset_roundtrip(toy_dirs, tmp_path):
    ds = Dataset.load(toy_dirs["toyA"])
    assert ds.num_nodes == 4
    assert ds.num_features == 2
    assert ds.num_labels == 2
    ds.save(tmp_path / "copy")
    ds2 = Dataset.load(tmp_path / "copy")
    np.testing.assert_array_equal(ds.graph.to_dense(), ds2.graph.to_dense())
    np.testing.assert_array_equal(ds.features, ds2.features)
    np.testing.assert_array_equal(ds.labels, ds2.labels)
    np.testing.assert_array_equal(ds.sets, ds2.sets)
    # byte parity for the whole directory
    for f in ("graph.bin", "features.bin", "labels.bin", "sets.bin"):
        assert (tmp_path / "copy" / f).read_bytes() == open(
            toy_dirs["toyA"] + "/" + f, "rb"
        ).read()


def test_scipy_roundtrip():
    rng = np.random.default_rng(0)
    import scipy.sparse as sp

    m = sp.random(50, 50, density=0.1, format="csr", random_state=7, dtype=np.float32)
    csr = CSRData.from_scipy(m)
    np.testing.assert_allclose(csr.to_dense(), m.toarray())
    back = csr.to_scipy()
    assert (back != m).nnz == 0
