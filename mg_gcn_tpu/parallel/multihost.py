"""Multi-host (DCN) support: process init + sharded array materialization.

The reference is explicitly single-node — one process drives P GPUs over
NCCL (`ncclCommInitAll`, dist_matrix.hpp:26-31) and multi-node exists only
as a commented-out MPI test stub (test/CMakeLists.txt:31-37). The TPU build
scales past one host the JAX way:

* :func:`initialize` — `jax.distributed.initialize()`; on TPU pods the
  coordinator/process count are discovered from the runtime environment, so
  the same CLI invocation on every host forms the slice. After it,
  `jax.devices()` spans all hosts and the 1-D ``graph`` mesh from
  `dist.make_mesh` rides ICI within a host and DCN across hosts.

* :func:`shard_put` — place a host array onto the mesh with an explicit
  `NamedSharding`. Single-process: a plain `jax.device_put` (each shard
  goes straight to its device, no post-hoc reshard). Multi-process: each
  process materializes ONLY the shards of its addressable devices via
  `jax.make_array_from_callback`, so no host ever holds remote rows.

* :func:`load_row_sharded` — memory-map a raw dense `.bin` matrix
  (formats.read_dense layout) and shard_put it row-partitioned: at
  papers100M scale each host touches only its own row slab of the file.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .dist import GRAPH_AXIS


def initialize(coordinator_address: str | None = None, **kw) -> None:
    """Form the multi-process JAX runtime (no-op if already initialized).

    On TPU pod slices all arguments are auto-discovered; set
    ``coordinator_address``/``num_processes``/``process_id`` explicitly for
    other fabrics — or via the ``MG_GCN_COORDINATOR`` /
    ``MG_GCN_NUM_PROCESSES`` / ``MG_GCN_PROCESS_ID`` /
    ``MG_GCN_LOCAL_DEVICE_IDS`` environment variables (how ``--multihost``
    CLI runs are launched on fabrics without a cluster detector). Call
    before any other JAX API touches devices.
    """
    import os

    env_coord = coordinator_address is None and "MG_GCN_COORDINATOR" in os.environ
    if env_coord:
        coordinator_address = os.environ["MG_GCN_COORDINATOR"]
        # the companion vars are REQUIRED with the env coordinator: a
        # default of num_processes=1/process_id=0 would let a mis-launched
        # host initialize a "world of 1" and silently train a partial model
        # (round-5 review)
        try:
            kw.setdefault(
                "num_processes", int(os.environ["MG_GCN_NUM_PROCESSES"])
            )
            kw.setdefault("process_id", int(os.environ["MG_GCN_PROCESS_ID"]))
        except KeyError as e:
            raise ValueError(
                "MG_GCN_COORDINATOR is set but the companion env var "
                f"{e.args[0]} is missing — set MG_GCN_NUM_PROCESSES and a "
                "per-host MG_GCN_PROCESS_ID"
            ) from None
        ldi = os.environ.get("MG_GCN_LOCAL_DEVICE_IDS")
        if ldi and "local_device_ids" not in kw:
            kw["local_device_ids"] = [int(v) for v in ldi.split(",")]
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address, **kw)
    except RuntimeError as e:  # already initialized — idempotent by intent
        msg = str(e)
        # jax 0.9 phrases this "distributed.initialize should only be called
        # once"; older versions said "already initialized". A "must be
        # called before" error is real (devices already in use) and raises.
        if "should only be called once" not in msg and "already initialized" not in msg:
            raise


def replicate_put(tree, mesh: Mesh):
    """Replicate a host pytree onto every device of the mesh (weights and
    optimizer state). Multi-process safe: each process materializes its
    addressable replicas via make_array_from_callback, producing *global*
    arrays a multi-host jitted step accepts (process-local arrays are not
    implicitly replicated over non-addressable devices)."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    return jax.tree.map(
        lambda a: jax.make_array_from_callback(
            np.shape(a), sharding, lambda idx: np.asarray(a)[idx]
        ),
        tree,
    )


def shard_put(arr, mesh: Mesh, spec: P | None = None, stream: bool = False) -> jax.Array:
    """Place ``arr`` on ``mesh`` with ``spec`` (default: row-sharded over
    the graph axis), materializing only process-local shards.

    ``stream=True`` forces per-shard slicing even single-process — with a
    ``np.memmap`` source each device shard is paged straight from disk and
    the full matrix never materializes in host RAM (papers100M-scale
    loading; see formats.read_dense(mmap=True))."""
    if spec is None:
        spec = P(GRAPH_AXIS)
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1 and not stream:
        return jax.device_put(arr, sharding)
    shape = np.shape(arr)
    return jax.make_array_from_callback(
        shape, sharding, lambda idx: np.ascontiguousarray(arr[idx])
    )


def tree_shard_put(tree, mesh: Mesh, shardings) -> object:
    """shard_put over a pytree; ``shardings`` is a matching tree of
    NamedShardings (e.g. DistAggPair.shardings(mesh))."""
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)
    return jax.tree.map(
        lambda a, s: jax.make_array_from_callback(
            np.shape(a), s, lambda idx: np.asarray(a)[idx]
        ),
        tree,
        shardings,
    )


def load_row_sharded(path: str, mesh: Mesh, dtype=np.float32) -> jax.Array:
    """Memory-map a raw dense .bin (uint32 n, m header + row-major payload,
    matrix.hpp:486-492 layout) and place it row-sharded over the mesh; each
    process reads only the rows its devices own."""
    header = np.fromfile(path, dtype=np.uint32, count=2)
    n, m = int(header[0]), int(header[1])
    mm = np.memmap(path, dtype=dtype, mode="r", offset=8, shape=(n, m))
    sharding = NamedSharding(mesh, P(GRAPH_AXIS))
    return jax.make_array_from_callback(
        (n, m), sharding, lambda idx: np.array(mm[idx])
    )
