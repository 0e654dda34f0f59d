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
      loc_rows/cols/vals : (P, E_loc)     diagonal block, local column ids
      rem_rows/vals      : (P, S, E_rem)  off-diagonal blocks; round s holds
                           block A[j, (j+s+1) % P]
      rem_cols           : (P, S, E_rem)  column ids rebased into the round's
                           received halo buffer [0, halo_width)
      send_idx           : tuple of S arrays (P, w_s) — local feature rows
                           device j sends in round s (its halo as referenced
                           by the destination (j-s-1) % P). Widths are
                           per-round maxima, so one hub block only widens its
                           own round's exchange, not every round's.
    Padding: vals 0, rows = m_loc-1, cols/send_idx 0.
    """

    loc_rows: jax.Array
    loc_cols: jax.Array
    loc_vals: jax.Array
    rem_rows: jax.Array
    rem_cols: jax.Array
    rem_vals: jax.Array
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
        n = csr.nrows
        if n % parts:
            raise ValueError(
                f"n ({n}) must be divisible by the mesh size ({parts}); pad the "
                "dataset (dist_matrix.hpp:428 semantics)"
            )
        m_loc = n // parts
        part = host_sparse.uniform_partition(n, parts)
        blocks = host_sparse.partition_blocks(csr, part, part)
        S = max(parts - 1, 0)

        # pass 1: halo lists + compact blocks (kept as numpy, padded in pass 2)
        halos: list[list[np.ndarray]] = [[None] * S for _ in range(parts)]
        compact: list[list[tuple]] = [[None] * S for _ in range(parts)]
        e_loc_max, e_rem_max, h_max, h_total = 1, 1, 1, 0
        for j in range(parts):
            e_loc_max = max(e_loc_max, blocks[j][j].nnz)
            for s in range(S):
                k = (j + s + 1) % parts
                blk = blocks[j][k]
                rows = np.repeat(
                    np.arange(m_loc, dtype=np.int32), np.diff(blk.indptr)
                )
                halo_cols, inv = np.unique(blk.indices, return_inverse=True)
                compact[j][s] = (rows, inv.astype(np.int32), blk.data)
                # device k sends halo_cols (its local row ids) to j in round s
                halos[k][s] = halo_cols.astype(np.int32)
                e_rem_max = max(e_rem_max, blk.nnz)
                h_max = max(h_max, halo_cols.size)
                h_total += int(halo_cols.size)

        e_loc = _round_up(e_loc_max, pad_to)
        e_rem = _round_up(e_rem_max, pad_to)
        pad_unit = min(pad_to, 128)
        # per-round widths: one hub block widens only its own round
        widths = tuple(
            _round_up(max(halos[j][s].size for j in range(parts)), pad_unit)
            for s in range(S)
        )

        loc_rows = np.full((parts, e_loc), m_loc - 1, np.int32)
        loc_cols = np.zeros((parts, e_loc), np.int32)
        loc_vals = np.zeros((parts, e_loc), np.float32)
        rem_rows = np.full((parts, S, e_rem), m_loc - 1, np.int32)
        rem_cols = np.zeros((parts, S, e_rem), np.int32)
        rem_vals = np.zeros((parts, S, e_rem), np.float32)
        send_idx = [np.zeros((parts, widths[s]), np.int32) for s in range(S)]
        for j in range(parts):
            d = blocks[j][j]
            e = d.nnz
            loc_rows[j, :e] = np.repeat(
                np.arange(m_loc, dtype=np.int32), np.diff(d.indptr)
            )
            loc_cols[j, :e] = d.indices
            loc_vals[j, :e] = d.data
            for s in range(S):
                rows, cols, vals = compact[j][s]
                e = rows.size
                rem_rows[j, s, :e] = rows
                rem_cols[j, s, :e] = cols
                rem_vals[j, s, :e] = vals
                hc = halos[j][s]
                send_idx[s][j, : hc.size] = hc
        return DistHaloMat(
            loc_rows=jnp.asarray(loc_rows),
            loc_cols=jnp.asarray(loc_cols),
            loc_vals=jnp.asarray(loc_vals),
            rem_rows=jnp.asarray(rem_rows),
            rem_cols=jnp.asarray(rem_cols),
            rem_vals=jnp.asarray(rem_vals),
            send_idx=tuple(jnp.asarray(a) for a in send_idx),
            n=n,
            parts=parts,
            nnz=csr.nnz,
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


@functools.partial(
    jax.tree_util.register_dataclass, data_fields=["fwd", "bwd"], meta_fields=[]
)
@dataclass
class DistHaloPair:
    fwd: DistHaloMat
    bwd: DistHaloMat

    @staticmethod
    def from_csr_pair(csr_fwd, csr_bwd, parts, **kw) -> "DistHaloPair":
        return DistHaloPair(
            DistHaloMat.from_csr(csr_fwd, parts, **kw),
            DistHaloMat.from_csr(csr_bwd, parts, **kw),
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
