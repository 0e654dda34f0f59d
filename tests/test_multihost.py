"""Multi-host helpers (parallel/multihost.py), single-process semantics:
explicit shard placement and memmap-backed row-sharded loading."""

import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from mg_gcn_tpu.formats import write_dense
from mg_gcn_tpu.parallel import dist, multihost


def test_shard_put_places_rows():
    mesh = dist.make_mesh(4)
    x = np.arange(64 * 8, dtype=np.float32).reshape(64, 8)
    arr = multihost.shard_put(x, mesh)
    assert arr.sharding == NamedSharding(mesh, P(dist.GRAPH_AXIS))
    np.testing.assert_array_equal(np.asarray(arr), x)
    # each addressable shard holds a contiguous 16-row slab
    for s in arr.addressable_shards:
        assert s.data.shape == (16, 8)


def test_tree_shard_put_pair():
    mesh = dist.make_mesh(4)
    a = dist.DistAggPair.from_csr_pair(
        *_norm_pair(), 4, pad_to=8
    )
    placed = multihost.tree_shard_put(a, mesh, a.shardings(mesh))
    assert placed.fwd.rows.sharding.spec == P(dist.GRAPH_AXIS)
    np.testing.assert_array_equal(np.asarray(placed.fwd.vals), np.asarray(a.fwd.vals))


def _norm_pair():
    from mg_gcn_tpu import sparse

    g = sparse.random_graph(64, 5, seed=4, weights="random")
    a = sparse.normalize(g, axis=True)
    return sparse.transpose(a), a


def test_load_row_sharded_matches_read(tmp_path):
    mesh = dist.make_mesh(4)
    x = np.random.default_rng(0).random((32, 16)).astype(np.float32)
    path = str(tmp_path / "features.bin")
    write_dense(path, x, np.float32)
    arr = multihost.load_row_sharded(path, mesh)
    assert arr.shape == (32, 16)
    assert arr.sharding == NamedSharding(mesh, P(dist.GRAPH_AXIS))
    np.testing.assert_allclose(np.asarray(arr), x)


def test_initialize_noop_single_process():
    # single-process CPU: initialize must not break an existing runtime.
    # (The real initialize + multi-process shard/replicate branches are
    # exercised end-to-end by tests/test_multiprocess.py in two fresh OS
    # processes; in-session the backend is already up, so a RuntimeError
    # about call order is the documented behavior.)
    try:
        multihost.initialize()
    except RuntimeError as e:
        assert "before any JAX calls" in str(e) or "already initialized" in str(e)
    assert jax.process_count() == 1
