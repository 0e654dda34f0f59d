"""Native (C++/OpenMP) schedule builders vs the numpy reference: the
edge-tile and serial-gather schedule dicts must be BIT-identical — the
counting sorts replicate np.argsort(kind="stable") exactly (VERDICT r2 #7;
the cold weighted-pair build was 245 s of numpy temporaries at Reddit
scale)."""

import numpy as np
import pytest

from mg_gcn_tpu import native, sparse
from mg_gcn_tpu.formats import CSRData
from mg_gcn_tpu.ops import spmm_edges as se
from mg_gcn_tpu.ops import spmm_gather as sg

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib unavailable"
)


def _graphs():
    gs = []
    g, _ = sparse.planted_graph(3000, 12, 8, seed=5)
    gs.append(("planted", g))
    gs.append(("uniform", sparse.random_graph(2500, 9, seed=6, weights="random")))
    gs.append(("tall", sparse.random_graph(400, 3, seed=7, weights="random")))
    # empty rows + duplicate-ish structure
    m = sparse.random_graph(1200, 2, seed=8, weights="random")
    gs.append(("sparse", m))
    return gs


def _numpy_only(monkeypatch, module):
    monkeypatch.setattr(module, "__dict__", module.__dict__)  # no-op anchor
    monkeypatch.setenv("MG_GCN_NO_NATIVE", "1")


def _assert_same(a: dict, b: dict):
    assert set(a) == set(b)
    for k in a:
        va, vb = a[k], b[k]
        if isinstance(va, np.ndarray) or isinstance(vb, np.ndarray):
            np.testing.assert_array_equal(
                np.asarray(va), np.asarray(vb), err_msg=k
            )
        else:
            assert va == vb, (k, va, vb)


@pytest.mark.parametrize("dtype", ["bfloat16", "float32", "int8"])
def test_edge_schedule_native_bit_identical(monkeypatch, dtype):
    for name, g in _graphs():
        a = sparse.normalize(g, axis=True)
        want = None
        with monkeypatch.context() as m:
            m.setenv("MG_GCN_NO_NATIVE", "1")
            m.setattr(native, "_tried", False)
            m.setattr(native, "_lib", None)
            want = se.edge_tile_schedule_host(a, dtype=dtype)
        monkeypatch.setattr(native, "_tried", False)
        monkeypatch.setattr(native, "_lib", None)
        assert native.available()
        got = se.edge_tile_schedule_host(a, dtype=dtype)
        _assert_same(got, want)


@pytest.mark.parametrize("pair", [True, False])
@pytest.mark.parametrize("binary", [False, True])
def test_gather_schedule_native_bit_identical(monkeypatch, pair, binary):
    for name, g in _graphs():
        if binary:
            csr = CSRData(g.indptr, g.indices, np.ones(g.nnz, np.float32), g.shape)
        else:
            csr = sparse.normalize(g, axis=True)
        with monkeypatch.context() as m:
            m.setenv("MG_GCN_NO_NATIVE", "1")
            m.setattr(native, "_tried", False)
            m.setattr(native, "_lib", None)
            want = sg.gather_schedule_host(csr, pair=pair)
        monkeypatch.setattr(native, "_tried", False)
        monkeypatch.setattr(native, "_lib", None)
        assert native.available()
        got = sg.gather_schedule_host(csr, pair=pair)
        _assert_same(got, want)
