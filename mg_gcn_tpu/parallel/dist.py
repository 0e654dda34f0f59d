"""1-D row-partitioned distributed training over a JAX device mesh.

TPU-native re-design of the reference's multi-GPU layer (``dist_matrix.hpp``,
``cuda_utils.hpp:58-92``, ``gcn.hpp`` dist_* twins). The mapping:

* ``dist_row_csr_matrix`` (P×P CSR blocks, dist_matrix.hpp:170-260) →
  :class:`DistRowMat`: stacked per-(device, round) COO blocks, sharded over a
  1-D ``"graph"`` mesh axis, with blocks stored in **ring order** (device j's
  round-s block is column-block (j+s) mod P) so the ring schedule uses static
  indexing only.

* the double-buffered NCCL-broadcast SpMM pipeline (cuda_utils.hpp:58-92) →
  two strategies inside ``shard_map``:

  - ``ring``: P rounds of local block-SpMM + ``lax.ppermute`` of the feature
    block around the ring. The permute of round s+1 is data-independent of
    round s's SpMM, so XLA's latency-hiding scheduler overlaps them — the
    TPU analogue of the reference's high-priority comm stream (`-S` off).
  - ``all_gather``: one ``lax.all_gather`` then a single local SpMM over the
    full feature matrix (the reference's non-overlapped variant, `-S`).

* ``repl_dn_matrix`` weight replication + gradient allreduce
  (dist_matrix.hpp:534-639) → replicated params in ``shard_map`` with
  ``lax.psum`` on weight/bias gradients.

* ``dist_row_softmax_cross_entropy_loss`` (gcn.hpp:890-929) → per-shard
  softmax/NLL (rows are fully local) with scalar ``psum`` for loss/accuracy.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import compat
from .. import sparse as host_sparse

compat.install()  # fixes ppermute lowering under shard_map on jax 0.9.0
from ..formats import CSRData
from ..models.gcn import GCNConfig
from ..nn import adam
from ..ops import elementwise as ew
from ..ops.softmax_xent import softmax  # row-local pieces

GRAPH_AXIS = "graph"


def make_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D mesh over the graph axis (the reference's GPU ring)."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            if len(devices) < num_devices:
                # slicing past the end would silently build a smaller mesh
                # and produce WRONG results (each shard body then sees every
                # partition's blocks but walks only its own) — refuse loudly
                raise ValueError(
                    f"make_mesh({num_devices}) but only {len(devices)} "
                    f"device(s) visible on backend "
                    f"{jax.default_backend()!r}; for CPU simulation set "
                    "JAX_PLATFORMS=cpu via jax.config (the axon "
                    "sitecustomize overrides the env var) and "
                    "XLA_FLAGS=--xla_force_host_platform_device_count=N"
                )
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (GRAPH_AXIS,))


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["rows", "cols", "vals"],
    meta_fields=["n", "parts", "nnz"],
)
@dataclass(frozen=True)
class DistRowMat:
    """Row-partitioned sparse matrix as ring-ordered padded COO blocks.

    ``rows/cols/vals`` have shape (P, P, E): axis 0 is the owning device
    (shard axis), axis 1 the ring round; entry [j, s] holds the COO block
    A[j, (j+s) % P] with row ids local to row-slab j and column ids local to
    column-block (j+s) % P. Padding entries have val == 0, row = last local
    row, col = 0.
    """

    rows: jax.Array
    cols: jax.Array
    vals: jax.Array
    n: int  # global rows (== cols; square)
    parts: int
    nnz: int

    @property
    def rows_per_shard(self) -> int:
        return self.n // self.parts

    @staticmethod
    def from_csr(csr: CSRData, parts: int, pad_to: int = 512) -> "DistRowMat":
        n = csr.nrows
        if n % parts:
            raise ValueError(
                f"n ({n}) must be divisible by the mesh size ({parts}); pad the "
                "dataset (the reference has the same requirement, "
                "dist_matrix.hpp:428, and pads in prep.py)"
            )
        part = host_sparse.uniform_partition(n, parts)
        blocks = host_sparse.partition_blocks(csr, part, part)
        # max nnz over all blocks, padded to a bucket
        emax = max(
            max(blocks[j][k].nnz for k in range(parts)) for j in range(parts)
        )
        emax = max((emax + pad_to - 1) // pad_to * pad_to, pad_to)
        m_loc = n // parts
        rows = np.full((parts, parts, emax), m_loc - 1, np.int32)
        cols = np.zeros((parts, parts, emax), np.int32)
        vals = np.zeros((parts, parts, emax), np.float32)
        for j in range(parts):
            for s in range(parts):
                blk = blocks[j][(j + s) % parts]  # ring order
                e = blk.nnz
                counts = np.diff(blk.indptr)
                rows[j, s, :e] = np.repeat(
                    np.arange(m_loc, dtype=np.int32), counts
                )
                cols[j, s, :e] = blk.indices
                vals[j, s, :e] = blk.data
        return DistRowMat(
            rows=jnp.asarray(rows),
            cols=jnp.asarray(cols),
            vals=jnp.asarray(vals),
            n=n,
            parts=parts,
            nnz=csr.nnz,
        )


@functools.partial(
    jax.tree_util.register_dataclass, data_fields=["fwd", "bwd"], meta_fields=[]
)
@dataclass
class DistAggPair:
    fwd: DistRowMat
    bwd: DistRowMat

    @staticmethod
    def from_csr_pair(csr_fwd, csr_bwd, parts, **kw) -> "DistAggPair":
        return DistAggPair(
            DistRowMat.from_csr(csr_fwd, parts, **kw),
            DistRowMat.from_csr(csr_bwd, parts, **kw),
        )

    def shardings(self, mesh: Mesh):
        spec = jax.tree.map(
            lambda _: NamedSharding(mesh, P(GRAPH_AXIS)), self
        )
        return spec


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["pack_fwd", "pack_bwd", "scale"],
    meta_fields=["n", "n_pad", "parts", "m_loc", "dtype_name", "nnz"],
)
@dataclass(frozen=True)
class DistPatternPair:
    """Row-partitioned bit-packed pattern pair (the fast multi-chip path).

    Per device j (shard axis 0, ring order on axis 1, k_s = (j+s) mod P):
      pack_fwd[j, s] = bits of P[k_s-row-slab, j-col-slab]  (forward rounds)
      pack_bwd[j, s] = bits of P[j-row-slab,  k_s-col-slab] (backward rounds)
      scale[j]       = the diagonal 1/in-degree slab for rows of device j
    Each slab is m_loc = n_pad/P rows where m_loc is a multiple of the
    pattern GROUP (4096), so per-device pattern storage is 2·n_pad·m_loc/8
    bytes — the reference's dist_row_csr_matrix (dist_matrix.hpp:170-260)
    re-imagined as dense bit tiles.
    """

    pack_fwd: jax.Array  # i32[P, P, m_loc, m_loc//32]
    pack_bwd: jax.Array  # i32[P, P, m_loc, m_loc//32]
    scale: jax.Array  # f32[P, m_loc]
    n: int
    n_pad: int
    parts: int
    m_loc: int
    dtype_name: str
    nnz: int

    @staticmethod
    def from_binary_csr(
        csr: CSRData, parts: int, dtype: str = "bfloat16", mesh: Mesh | None = None
    ) -> "DistPatternPair":
        """Build the pair. With ``mesh`` (single-process), device j's blocks
        are built ON device j and assembled into globally-sharded arrays via
        make_array_from_single_device_arrays — the full 2·n_pad²/8 bytes are
        never materialized on one chip (they would not fit at exactly the
        scales the /P per-device budget admits)."""
        import contextlib

        from ..ops import spmm_pattern as sp

        if not sp.is_binary(csr):
            raise ValueError("pattern dist pair needs a binary adjacency")
        n = csr.nrows
        m_loc = sp.round_up(-(-n // parts), sp.GROUP)
        n_pad = m_loc * parts
        part = np.arange(parts + 1, dtype=np.int64) * m_loc
        part = np.minimum(part, n)
        blocks = host_sparse.partition_blocks(csr, part, part)
        devices = None
        if mesh is not None:
            devs = list(mesh.devices.flat)
            if len(devs) == parts and all(
                d.process_index == jax.process_index() for d in devs
            ):
                devices = devs
        fwd_list, bwd_list = [], []
        for j in range(parts):
            ctx = (
                jax.default_device(devices[j]) if devices else contextlib.nullcontext()
            )
            with ctx:
                fj, bj = [], []
                for s in range(parts):
                    k = (j + s) % parts
                    fj.append(
                        sp.pack_bits_on_device(blocks[k][j], m_loc, row_chunks=1)
                    )
                    bj.append(
                        sp.pack_bits_on_device(blocks[j][k], m_loc, row_chunks=1)
                    )
                fwd_list.append(jnp.stack(fj)[None] if devices else jnp.stack(fj))
                bwd_list.append(jnp.stack(bj)[None] if devices else jnp.stack(bj))
        if devices:
            sharding = NamedSharding(mesh, P(GRAPH_AXIS))
            shape = (parts, parts, m_loc, m_loc // 32)
            pack_fwd = jax.make_array_from_single_device_arrays(
                shape, sharding, fwd_list
            )
            pack_bwd = jax.make_array_from_single_device_arrays(
                shape, sharding, bwd_list
            )
        else:
            pack_fwd = jnp.stack(fwd_list)
            pack_bwd = jnp.stack(bwd_list)
        indeg = np.bincount(csr.indices, minlength=n_pad).astype(np.float64)
        with np.errstate(divide="ignore"):
            s_vec = np.where(indeg > 0, 1.0 / indeg, 0.0).astype(np.float32)
        return DistPatternPair(
            pack_fwd=pack_fwd,
            pack_bwd=pack_bwd,
            scale=jnp.asarray(s_vec.reshape(parts, m_loc)),
            n=n,
            n_pad=n_pad,
            parts=parts,
            m_loc=m_loc,
            dtype_name=dtype,
            nnz=csr.nnz,
        )

    def shardings(self, mesh: Mesh):
        spec = NamedSharding(mesh, P(GRAPH_AXIS))
        return DistPatternPair(
            pack_fwd=spec,
            pack_bwd=spec,
            scale=spec,
            n=self.n,
            n_pad=self.n_pad,
            parts=self.parts,
            m_loc=self.m_loc,
            dtype_name=self.dtype_name,
            nnz=self.nnz,
        )


def _local_block_spmm(rows, cols, vals, b, num_rows, sorted_rows=True):
    d = b.shape[1]
    gather_bytes = rows.shape[0] * d * b.dtype.itemsize
    from ..ops.spmm import GATHER_BYTES_CAP

    if gather_bytes <= GATHER_BYTES_CAP:
        g = b[cols] * vals[:, None].astype(b.dtype)
        return jax.ops.segment_sum(
            g, rows, num_segments=num_rows, indices_are_sorted=sorted_rows
        )
    # huge blocks: XLA materializes the gathered (E, d) intermediate, so
    # stream edge chunks through a scan (same cap as ops.spmm._spmm_coo_xla)
    n_chunks = int(-(-gather_bytes // GATHER_BYTES_CAP))
    chunk = -(-rows.shape[0] // n_chunks)
    pad = n_chunks * chunk - rows.shape[0]
    rows_p = jnp.concatenate([rows, jnp.full(pad, num_rows - 1, rows.dtype)])
    cols_p = jnp.concatenate([cols, jnp.zeros(pad, cols.dtype)])
    vals_p = jnp.concatenate([vals, jnp.zeros(pad, vals.dtype)])

    def body(acc, part):
        r, c, v = part
        g = b[c] * v[:, None].astype(b.dtype)
        return acc + jax.ops.segment_sum(
            g, r, num_segments=num_rows, indices_are_sorted=sorted_rows
        ), None

    acc, _ = jax.lax.scan(
        body,
        jnp.zeros((num_rows, d), b.dtype),
        (
            rows_p.reshape(n_chunks, chunk),
            cols_p.reshape(n_chunks, chunk),
            vals_p.reshape(n_chunks, chunk),
        ),
    )
    return acc


def _ring_perm(parts: int):
    # device i receives the block previously held by i+1 (upward ring):
    # src i sends to (i-1) mod P.
    return [(i, (i - 1) % parts) for i in range(parts)]


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["idx", "w", "meta", "meta2"],
    meta_fields=["n", "parts", "nnz"],
)
@dataclass(frozen=True)
class DistGatherMat:
    """Row-partitioned sparse matrix as ring-ordered serial-gather blocks.

    Axis 0 = owning device (shard axis), axis 1 = ring round; entry [j, s]
    is the gather schedule (ops/spmm_gather.py) of block A[j, (j+s) % P].
    All P² blocks share one step count (no-op padded), so the arrays stack;
    the per-block static geometry is a pure function of m_loc = n/P."""

    idx: jax.Array  # i32[P, P, S, E_BLK]
    w: jax.Array  # f32[P, P, S, E_BLK]
    meta: jax.Array  # i32[P, P, S]
    meta2: jax.Array  # i32[P, P, S] (pair/single trip counts)
    n: int
    parts: int
    nnz: int

    @staticmethod
    def from_csr(csr: CSRData, parts: int) -> "DistGatherMat":
        from ..ops import spmm_gather as sg

        n = csr.nrows
        if n % parts:
            raise ValueError(
                f"n ({n}) must be divisible by the mesh size ({parts})"
            )
        part = host_sparse.uniform_partition(n, parts)
        blocks = host_sparse.partition_blocks(csr, part, part)
        scheds = [
            [
                sg.gather_schedule_host(
                    blocks[j][(j + s) % parts], binary=False, r_rows=sg.R_ROWS
                )
                for s in range(parts)
            ]
            for j in range(parts)
        ]
        S_max = max(s["meta"].shape[0] for row in scheds for s in row)
        scheds = [
            [sg.pad_schedule_steps(s, S_max) for s in row] for row in scheds
        ]
        stack = lambda k: jnp.stack(
            [jnp.stack([scheds[j][s][k] for s in range(parts)]) for j in range(parts)]
        )
        return DistGatherMat(
            idx=stack("idx"), w=stack("w"), meta=stack("meta"),
            meta2=stack("meta2"), n=n, parts=parts, nnz=csr.nnz,
        )


@functools.partial(
    jax.tree_util.register_dataclass, data_fields=["fwd", "bwd"], meta_fields=[]
)
@dataclass
class DistGatherPair:
    """(Âᵀ, Â) ring blocks on the serial-gather engine — the distributed
    ultra-sparse path (ogbn-products-scale per-device blocks, where the
    edge-tile fill collapses and XLA's gather runs ~10x slower)."""

    fwd: DistGatherMat
    bwd: DistGatherMat

    @staticmethod
    def from_csr_pair(csr_fwd, csr_bwd, parts) -> "DistGatherPair":
        return DistGatherPair(
            DistGatherMat.from_csr(csr_fwd, parts),
            DistGatherMat.from_csr(csr_bwd, parts),
        )

    def shardings(self, mesh: Mesh):
        return jax.tree.map(lambda _: NamedSharding(mesh, P(GRAPH_AXIS)), self)


GATHER_MAT_FIELDS = ("idx", "w", "meta", "meta2")


def dist_aggregate_gather(mat_local: dict, h: jax.Array, parts: int) -> jax.Array:
    """Per-device ring SpMM on the serial-gather kernel: P rounds of local
    block-SpMM + ppermute (the ultra-sparse analogue of dist_aggregate)."""
    from ..ops import spmm_gather as sg
    from ..ops.spmm_pattern import round_up as _ru

    m_loc = h.shape[0]
    n_out_pad = _ru(max(m_loc, sg.R_ROWS), sg.R_ROWS)
    n_in_pad = _ru(max(m_loc, sg.W_ROWS), sg.W_ROWS)
    win_bits = max(int(np.ceil(np.log2(max(n_in_pad // sg.W_ROWS, 2)))), 1)
    c = jnp.zeros((m_loc, h.shape[1]), jnp.float32)
    b = h
    perm = _ring_perm(parts)
    for s in range(parts):
        mat = sg.GatherMat(
            idx=mat_local["idx"][s],
            w=mat_local["w"][s],
            meta=mat_local["meta"][s],
            meta2=mat_local["meta2"][s],
            scale=None,
            n_out=m_loc,
            n_in=m_loc,
            n_out_pad=n_out_pad,
            n_in_pad=n_in_pad,
            nnz=0,  # diagnostic only; the kernel never reads it
            win_bits=win_bits,
            fill=1.0,
        )
        c = c + sg.spmm_gather(mat, b)
        if s + 1 < parts:
            b = jax.lax.ppermute(b, GRAPH_AXIS, perm=perm)
    return c.astype(h.dtype)


def dist_aggregate(
    mat_local: dict, h: jax.Array, parts: int, strategy: str = "ring"
) -> jax.Array:
    """Per-device body of the distributed SpMM. ``mat_local`` holds this
    device's (P, E) ring-ordered arrays; ``h`` is the local (n/P, d) shard.

    C_j = sum_s A[j, (j+s) % P] @ B_{(j+s) % P}.
    """
    rows, cols, vals = mat_local["rows"], mat_local["cols"], mat_local["vals"]
    m_loc = h.shape[0]
    if strategy == "all_gather":
        # reference -S path: one bulk exchange, then a single local SpMM
        # (cuda_utils.hpp:48-55 semantics but with one fused gather)
        b_full = jax.lax.all_gather(h, GRAPH_AXIS, tiled=True)  # (n, d)
        j = jax.lax.axis_index(GRAPH_AXIS)
        block_ids = jnp.mod(j + jnp.arange(parts), parts)  # (P,)
        cols_glob = cols + block_ids[:, None] * m_loc
        # the concatenated per-block row ids restart at 0 every block — they
        # are NOT sorted; the hint would let XLA's sorted fast path misplace
        # contributions on TPU
        return _local_block_spmm(
            rows.reshape(-1),
            cols_glob.reshape(-1),
            vals.reshape(-1),
            b_full,
            m_loc,
            sorted_rows=False,
        )
    if strategy != "ring":
        raise ValueError(f"unknown dist spmm strategy {strategy!r}")
    c = jnp.zeros((m_loc, h.shape[1]), h.dtype)
    b = h
    perm = _ring_perm(parts)
    for s in range(parts):
        c = c + _local_block_spmm(rows[s], cols[s], vals[s], b, m_loc)
        if s + 1 < parts:
            # independent of this round's SpMM -> overlappable by XLA
            b = jax.lax.ppermute(b, GRAPH_AXIS, perm=perm)
    return c


def dist_aggregate_pattern(
    pack_local: jax.Array,
    scale_local: jax.Array,
    h: jax.Array,
    parts: int,
    orientation: str,
    dtype_name: str = "bfloat16",
    strategy: str = "ring",
    interpret: bool = False,
) -> jax.Array:
    """Per-device distributed SpMM over per-shard bit-packed patterns.

    ``pack_local`` is this device's (P, m_loc, m_loc/32) ring-ordered pattern
    blocks (see DistPatternPair), ``scale_local`` the (m_loc,) diagonal slab.
    Forward ("PT"): C_j = s_j ⊙ Σ_s (P[k_s rows, j cols])ᵀ B_{k_s} — the
    feature-major kernel, post-scaled. Backward ("P"): pre-scale own shard,
    circulate, row-major kernel. Strategy "all_gather" trades the ring for
    one bulk gather (reference -S); "fused" runs the whole schedule in one
    RDMA-ring pallas kernel (ops/spmm_pattern_ring.py).

    dtype_name "int8": per-feature symmetric quantization with a *global*
    scale (``pmax`` over the mesh, so every device quantizes identically —
    same math as the single-chip int8 mode), int32 accumulation, and int8
    blocks on the wire (¼ the ICI bytes of the f32 ppermute path).
    """
    from ..ops import spmm_pattern as sp

    m_loc, d = h.shape
    d_pad = sp.round_up(max(d, 8), 8)
    if strategy == "fused" and parts == 1:
        # no remote peer: the RDMA kernel would leave its round-0 send
        # semaphore unwaited; the ring path with parts=1 is purely local
        strategy = "ring"
    perm = _ring_perm(parts)
    int8_mode = dtype_name == "int8"
    qscale = None
    if int8_mode:
        if orientation != "PT":
            h = h * scale_local[:, None]  # fold pre-scale in before quantizing
        qloc = jnp.max(jnp.abs(h), axis=0)  # (d,)
        qscale = jnp.maximum(jax.lax.pmax(qloc, GRAPH_AXIS), 1e-30) / 127.0
        h = jnp.clip(jnp.round(h / qscale[None, :]), -127, 127).astype(jnp.int8)
    mat_meta = dict(n=m_loc, n_pad=m_loc, nnz=0, scale_side="none", dtype_name=dtype_name)

    def round_mat(s):
        return sp.PatternMat(
            pack=pack_local[s],
            scale=scale_local,
            orientation=orientation,
            **mat_meta,
        )

    # operand dtype on the wire and in the MXU: bf16 (or int8) blocks are
    # cast/quantized ONCE here, so the ring circulates 2x (4x) fewer ICI
    # bytes than an f32 exchange with identical results (the cast is
    # deterministic; the per-round kernels would apply it anyway)
    if int8_mode:
        op_dt = jnp.int8
    elif dtype_name == "bfloat16":
        op_dt = jnp.bfloat16
    else:
        op_dt = jnp.float32

    def dequant_cols(acc):  # acc (*, d_pad) int32 -> f32 with per-feature scales
        acc = acc.astype(jnp.float32)
        if int8_mode:
            qpad = jnp.zeros((d_pad,), jnp.float32).at[:d].set(qscale)
            acc = acc * qpad[None, :]
        return acc

    if orientation == "PT":  # forward, feature-major circulation
        bf0 = jnp.zeros((d_pad, m_loc), op_dt).at[:d, :].set(h.T.astype(op_dt))
        if strategy == "fused":
            from ..ops import spmm_pattern_ring as ring

            # VMEM bounds the per-call feature width at D_MAX: wider
            # operands circulate the ring once per D_MAX chunk (same total
            # ICI bytes; each chunk is a full fused schedule)
            cf = jnp.concatenate(
                [
                    ring.ring_pattern_fwd(
                        pack_local,
                        bf0[i : i + sp.D_MAX],
                        parts,
                        GRAPH_AXIS,
                        interpret=interpret,
                    )
                    for i in range(0, d_pad, sp.D_MAX)
                ],
                axis=0,
            )
        elif strategy == "all_gather":
            cf = jnp.zeros((d_pad, m_loc), sp._acc_dtype(op_dt))
            bf_all = jax.lax.all_gather(bf0, GRAPH_AXIS)  # (P, d_pad, m_loc)
            j = jax.lax.axis_index(GRAPH_AXIS)
            for s in range(parts):
                k = jnp.mod(j + s, parts)
                cf = cf + sp._pattern_call_fwd(
                    round_mat(s), jax.lax.dynamic_index_in_dim(bf_all, k, 0, False)
                )
        else:
            cf = jnp.zeros((d_pad, m_loc), sp._acc_dtype(op_dt))
            bf = bf0
            for s in range(parts):
                cf = cf + sp._pattern_call_fwd(round_mat(s), bf)
                if s + 1 < parts:
                    bf = jax.lax.ppermute(bf, GRAPH_AXIS, perm=perm)
        cf = cf.astype(jnp.float32)
        if int8_mode:
            qpad = jnp.zeros((d_pad,), jnp.float32).at[:d].set(qscale)
            cf = cf * qpad[:, None]
        cf = cf * scale_local[None, :]
        return cf[:d, :].T
    # backward ("P"), row-major circulation with pre-scaled own shard
    # (int8 mode folded the pre-scale in before quantizing above)
    pre = h if int8_mode else h * scale_local[:, None]
    g0 = jnp.zeros((m_loc, d_pad), op_dt).at[:, :d].set(pre.astype(op_dt))
    if strategy == "fused":
        from ..ops import spmm_pattern_ring as ring

        acc = jnp.concatenate(
            [
                ring.ring_pattern_bwd(
                    pack_local,
                    g0[:, i : i + sp.D_MAX],
                    parts,
                    GRAPH_AXIS,
                    interpret=interpret,
                )
                for i in range(0, d_pad, sp.D_MAX)
            ],
            axis=1,
        )
    elif strategy == "all_gather":
        acc = jnp.zeros((m_loc, d_pad), sp._acc_dtype(op_dt))
        g_all = jax.lax.all_gather(g0, GRAPH_AXIS)
        j = jax.lax.axis_index(GRAPH_AXIS)
        for s in range(parts):
            k = jnp.mod(j + s, parts)
            acc = acc + sp._pattern_call_bwd(
                round_mat(s), jax.lax.dynamic_index_in_dim(g_all, k, 0, False)
            )
    else:
        acc = jnp.zeros((m_loc, d_pad), sp._acc_dtype(op_dt))
        g = g0
        for s in range(parts):
            acc = acc + sp._pattern_call_bwd(round_mat(s), g)
            if s + 1 < parts:
                g = jax.lax.ppermute(g, GRAPH_AXIS, perm=perm)
    return dequant_cols(acc)[:, :d]


def _dist_layer_forward(layer, meta, agg_fwd, h, slope):
    w, b = layer["W"], layer["b"]
    if meta["lin_first"]:
        hw = h @ w + b
        ahw = agg_fwd(hw)
    else:
        hw = agg_fwd(h)
        ahw = hw @ w + b
    if meta["activation"]:
        ahw = ew.leaky_relu(ahw, slope)
    if meta["res_proj"]:
        ahw = ahw + h @ layer["Wres"] + layer["bres"]
    elif meta["res_identity"]:
        ahw = ahw + h
    return ahw, dict(h=h, post=ahw)


def _dist_layer_backward(
    layer, meta, agg_bwd, cache, g, slope, need_input_grad
):
    grads = {}
    t = g
    if meta["activation"]:
        t = ew.leaky_relu_grad(cache["post"], g, slope)
    w = layer["W"]
    psum = lambda x: jax.lax.psum(x, GRAPH_AXIS)
    if meta["lin_first"]:
        g_hw = agg_bwd(t) if meta["backward_spmm"] else t
        grads["b"] = psum(jnp.sum(g_hw, axis=0, keepdims=True))  # gcn.hpp:236-238
        grads["W"] = psum(cache["h"].T @ g_hw)  # distᵀ×dist→repl, cuda_utils.hpp:305-313
        g_out = g_hw @ w.T if need_input_grad else None
    else:
        grads["b"] = psum(jnp.sum(t, axis=0, keepdims=True))
        grads["W"] = psum(cache["h"].T @ t)
        if need_input_grad:
            g_hw = t @ w.T
            g_out = agg_bwd(g_hw) if meta["backward_spmm"] else g_hw
        else:
            g_out = None
    if meta["res_proj"]:
        grads["bres"] = psum(jnp.sum(g, axis=0, keepdims=True))
        grads["Wres"] = psum(cache["h"].T @ g)
        if g_out is not None:
            g_out = g_out + g @ layer["Wres"].T
    elif meta["res_identity"] and g_out is not None:
        g_out = g_out + g
    return grads, g_out


def _dist_softmax_xent(logits, y, n_total, mask=None):
    """Row-local softmax + NLL with psum'd scalars (gcn.hpp:890-929)."""
    o = softmax(logits)
    n_loc = logits.shape[0]
    idx = jnp.arange(n_loc)
    logp = jnp.log(jnp.maximum(o[idx, y], jnp.finfo(o.dtype).tiny))
    pred = jnp.argmax(o, axis=-1).astype(jnp.int32)
    correct = (pred == y).astype(logits.dtype)
    onehot = jax.nn.one_hot(y, logits.shape[1], dtype=o.dtype)
    if mask is None:
        denom = jnp.asarray(n_total, logits.dtype)
        g = (o - onehot) / denom
        loss = -jax.lax.psum(jnp.sum(logp), GRAPH_AXIS) / denom
        acc = jax.lax.psum(jnp.sum(correct), GRAPH_AXIS) / denom
    else:
        m = mask.astype(logits.dtype)
        denom = jnp.maximum(jax.lax.psum(jnp.sum(m), GRAPH_AXIS), 1)
        g = (o - onehot) * m[:, None] / denom
        loss = -jax.lax.psum(jnp.sum(logp * m), GRAPH_AXIS) / denom
        acc = jax.lax.psum(jnp.sum(correct * m), GRAPH_AXIS) / denom
    return loss, acc, g


def _local_xent_terms(logits, yv, m, denom):
    """Per-device (loss_share, acc_share) for the row-local softmax-xent —
    differentiable (used under value_and_grad by the exact GCN and SAGE
    steps); the caller psums the shares."""
    o = softmax(logits)
    n_loc = logits.shape[0]
    logp = jnp.log(jnp.maximum(o[jnp.arange(n_loc), yv], jnp.finfo(o.dtype).tiny))
    pred = jnp.argmax(jax.lax.stop_gradient(o), axis=-1).astype(jnp.int32)
    correct = (pred == yv).astype(jnp.float32)
    if m is None:
        return -jnp.sum(logp) / denom, jnp.sum(correct) / denom
    return -jnp.sum(logp * m) / denom, jnp.sum(correct * m) / denom


def dist_loss_and_grad(
    params: Sequence[dict],
    agg_fwd,
    agg_bwd,
    x: jax.Array,
    y: jax.Array,
    config: GCNConfig,
    n_total: int,
    mask: jax.Array | None,
):
    """Per-device forward + reference-parity backward (inside shard_map).

    ``agg_fwd``/``agg_bwd`` are per-device aggregation closures (COO ring,
    pattern ring, or all_gather variants).
    """
    h = x
    caches = []
    for i, layer in enumerate(params):
        h, cache = _dist_layer_forward(
            layer, config.layer_meta(i), agg_fwd, h, config.leaky_slope
        )
        caches.append(cache)
    loss, acc, g = _dist_softmax_xent(h, y.reshape(-1), n_total, mask)
    grads: list = [None] * len(params)
    for i in reversed(range(len(params))):
        grads[i], g = _dist_layer_backward(
            params[i],
            config.layer_meta(i),
            agg_bwd,
            caches[i],
            g,
            config.leaky_slope,
            need_input_grad=i > 0,
        )
    return loss, acc, grads


def _exact_agg(agg_fwd, agg_bwd):
    """Differentiable per-device aggregation: forward uses the Âᵀ schedule,
    the VJP runs the Â schedule — globally d(Âᵀx)·ḡ = Â ḡ, the same algebra
    as the single-chip custom-VJP aggregate (ops/spmm.py)."""

    @jax.custom_vjp
    def agg(h):
        return agg_fwd(h)

    def fwd(h):
        return agg_fwd(h), None

    def bwd(_, g):
        return (agg_bwd(g),)

    agg.defvjp(fwd, bwd)
    return agg


def dist_loss_and_grad_exact(
    params, agg_fwd, agg_bwd, x, y, config: GCNConfig, n_total, mask
):
    """Exact-autodiff twin of :func:`dist_loss_and_grad` (config.parity
    False / CLI --exact): jax.grad through the forward, with the
    aggregation's VJP supplied by :func:`_exact_agg`.

    The differentiated function returns the *local* loss share (no psum
    inside — psum's transpose is psum, which would scale every cotangent by
    P); loss/acc/grads are psum'd afterwards, the reference's allreduce."""
    agg = _exact_agg(agg_fwd, agg_bwd)
    yv = y.reshape(-1)
    if mask is None:
        m = None
        denom = jnp.asarray(n_total, jnp.float32)
    else:
        m = mask.astype(jnp.float32)
        denom = jnp.maximum(jax.lax.psum(jnp.sum(m), GRAPH_AXIS), 1.0)

    def loss_fn(p):
        h = x
        for i, layer in enumerate(p):
            h, _ = _dist_layer_forward(
                layer, config.layer_meta(i), agg, h, config.leaky_slope
            )
        return _local_xent_terms(h, yv, m, denom)

    (loss_loc, acc_loc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    loss = jax.lax.psum(loss_loc, GRAPH_AXIS)
    acc = jax.lax.psum(acc_loc, GRAPH_AXIS)
    grads = jax.tree.map(lambda g: jax.lax.psum(g, GRAPH_AXIS), grads)
    return loss, acc, grads


def make_dist_train_step(
    config: GCNConfig,
    mesh: Mesh,
    n_total: int,
    hparams: dict | None = None,
    strategy: str = "ring",
    use_mask: bool = False,
    pair_kind: str = "coo",
    pattern_dtype: str = "bfloat16",
    interpret: bool = False,
    optimizer: str = "adam",
):
    """Build the jitted distributed train step.

    Signature: (params, opt_state, pair, x, y[, mask]) -> (params, opt_state,
    loss, acc) where ``pair`` is a :class:`DistAggPair` (pair_kind="coo") or
    a :class:`DistPatternPair` (pair_kind="pattern", the MXU fast path);
    x/y are global arrays sharded over the graph axis — for the pattern pair
    they must be padded to ``pair.n_pad`` rows (use a mask to keep loss
    semantics over the real rows). ``config.parity`` selects the backward:
    True = the reference-parity hand-written backward (layer-0 SpMM skip),
    False = exact autodiff gradients (CLI --exact), matching the
    single-device semantics of models/gcn.py.
    """
    try:
        from jax import shard_map  # jax >= 0.7 stable API
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    hp = dict(adam.DEFAULT_HPARAMS)
    if hparams:
        hp.update(hparams)
    parts = mesh.devices.size

    repl = P()
    shard_rows = P(GRAPH_AXIS)
    if pair_kind == "coo":
        mat_spec = dict(rows=shard_rows, cols=shard_rows, vals=shard_rows)
        pair_spec = dict(fwd=mat_spec, bwd=mat_spec)
    elif pair_kind == "pattern":
        pair_spec = dict(pack_fwd=shard_rows, pack_bwd=shard_rows, scale=shard_rows)
    elif pair_kind == "halo":
        from . import dist_halo

        if strategy != "ring":
            raise ValueError(
                "the halo pair has a single (ring) exchange schedule; "
                f"strategy {strategy!r} is not available with pair_kind='halo'"
            )
        mat_spec = {k: shard_rows for k in dist_halo.MAT_FIELDS}
        pair_spec = dict(fwd=mat_spec, bwd=mat_spec)
    elif pair_kind == "gather":
        if strategy != "ring":
            raise ValueError(
                "the gather pair has a single (ring) exchange schedule; "
                f"strategy {strategy!r} is not available with pair_kind='gather'"
            )
        mat_spec = {k: shard_rows for k in GATHER_MAT_FIELDS}
        pair_spec = dict(fwd=mat_spec, bwd=mat_spec)
    elif pair_kind == "halo_gather":
        from . import dist_halo

        if strategy != "ring":
            raise ValueError(
                "the halo pair has a single (ring) exchange schedule; "
                f"strategy {strategy!r} is not available with "
                "pair_kind='halo_gather'"
            )
        mat_spec = {k: shard_rows for k in dist_halo.GATHER_HALO_FIELDS}
        pair_spec = dict(fwd=mat_spec, bwd=mat_spec)
    else:
        raise ValueError(f"unknown pair_kind {pair_kind!r}")
    params_spec = [
        {k: repl for k in ("W", "b", "Wres", "bres") if _layer_has(config, i, k)}
        for i in range(config.num_layers)
    ]
    opt_spec = adam.AdamState(step=repl, m=params_spec, v=params_spec)
    in_specs = (params_spec, opt_spec, pair_spec, shard_rows, shard_rows)
    if use_mask:
        in_specs = in_specs + (shard_rows,)
    out_specs = (params_spec, opt_spec, repl, repl)

    def step(params, opt_state, pair, x, y, *maybe_mask):
        mask = maybe_mask[0] if maybe_mask else None
        if pair_kind == "coo":
            f = dict(
                rows=pair["fwd"]["rows"][0],
                cols=pair["fwd"]["cols"][0],
                vals=pair["fwd"]["vals"][0],
            )
            b = dict(
                rows=pair["bwd"]["rows"][0],
                cols=pair["bwd"]["cols"][0],
                vals=pair["bwd"]["vals"][0],
            )
            agg_fwd = lambda h: dist_aggregate(f, h, parts, strategy)
            agg_bwd = lambda g: dist_aggregate(b, g, parts, strategy)
        elif pair_kind == "halo":
            from . import dist_halo

            strip = dist_halo.strip_shard_axis
            f = {k: strip(pair["fwd"][k]) for k in dist_halo.MAT_FIELDS}
            b = {k: strip(pair["bwd"][k]) for k in dist_halo.MAT_FIELDS}
            agg_fwd = lambda h: dist_halo.dist_aggregate_halo(f, h, parts)
            agg_bwd = lambda g: dist_halo.dist_aggregate_halo(b, g, parts)
        elif pair_kind == "gather":
            f = {k: pair["fwd"][k][0] for k in GATHER_MAT_FIELDS}
            b = {k: pair["bwd"][k][0] for k in GATHER_MAT_FIELDS}
            agg_fwd = lambda h: dist_aggregate_gather(f, h, parts)
            agg_bwd = lambda g: dist_aggregate_gather(b, g, parts)
        elif pair_kind == "halo_gather":
            from . import dist_halo

            strip = dist_halo.strip_shard_axis
            f = {k: strip(pair["fwd"][k]) for k in dist_halo.GATHER_HALO_FIELDS}
            b = {k: strip(pair["bwd"][k]) for k in dist_halo.GATHER_HALO_FIELDS}
            agg_fwd = lambda h: dist_halo.dist_aggregate_halo_gather(f, h, parts)
            agg_bwd = lambda g: dist_halo.dist_aggregate_halo_gather(b, g, parts)
        else:
            pack_fwd = pair["pack_fwd"][0]
            pack_bwd = pair["pack_bwd"][0]
            scale = pair["scale"][0]
            agg_fwd = lambda h: dist_aggregate_pattern(
                pack_fwd, scale, h, parts, "PT", pattern_dtype, strategy, interpret
            )
            agg_bwd = lambda g: dist_aggregate_pattern(
                pack_bwd, scale, g, parts, "P", pattern_dtype, strategy, interpret
            )
        lag = dist_loss_and_grad if config.parity else dist_loss_and_grad_exact
        loss, acc, grads = lag(
            params, agg_fwd, agg_bwd, x, y, config, n_total, mask
        )
        if optimizer == "sgd":
            # linear::update (gcn.hpp:141-144); opt_state rides unchanged
            params = adam.sgd_update(params, grads, hp["lr"], hp["weight_decay"])
        else:
            params, opt_state = adam.adam_update(params, grads, opt_state, **hp)
        return params, opt_state, loss, acc

    smapped = shard_map(
        step, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )

    def wrapper(params, opt_state, pair, x, y, mask=None):
        if pair_kind == "coo":
            pair_dicts = dict(
                fwd=dict(rows=pair.fwd.rows, cols=pair.fwd.cols, vals=pair.fwd.vals),
                bwd=dict(rows=pair.bwd.rows, cols=pair.bwd.cols, vals=pair.bwd.vals),
            )
        elif pair_kind == "halo":
            from . import dist_halo

            pair_dicts = dict(
                fwd={k: getattr(pair.fwd, k) for k in dist_halo.MAT_FIELDS},
                bwd={k: getattr(pair.bwd, k) for k in dist_halo.MAT_FIELDS},
            )
        elif pair_kind == "gather":
            pair_dicts = dict(
                fwd={k: getattr(pair.fwd, k) for k in GATHER_MAT_FIELDS},
                bwd={k: getattr(pair.bwd, k) for k in GATHER_MAT_FIELDS},
            )
        elif pair_kind == "halo_gather":
            from . import dist_halo

            pair_dicts = dict(
                fwd={k: getattr(pair.fwd, k) for k in dist_halo.GATHER_HALO_FIELDS},
                bwd={k: getattr(pair.bwd, k) for k in dist_halo.GATHER_HALO_FIELDS},
            )
        else:
            pair_dicts = dict(
                pack_fwd=pair.pack_fwd, pack_bwd=pair.pack_bwd, scale=pair.scale
            )
        args = (params, opt_state, pair_dicts, x, y)
        if use_mask:
            args = args + (mask,)
        return smapped(*args)

    return jax.jit(wrapper)


def make_dist_infer(config: GCNConfig, mesh: Mesh, strategy: str = "ring"):
    """Row-sharded distributed forward pass (inference/serving).

    (params, pair, x) -> logits, with x/logits global arrays sharded over
    the graph axis and ``pair`` a COO :class:`DistAggPair` — the
    distributed analogue of gcn::operator() (gcn.hpp:966-969).
    """
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    parts = mesh.devices.size
    repl = P()
    shard_rows = P(GRAPH_AXIS)
    mat_spec = dict(rows=shard_rows, cols=shard_rows, vals=shard_rows)
    params_spec = [
        {k: repl for k in ("W", "b", "Wres", "bres") if _layer_has(config, i, k)}
        for i in range(config.num_layers)
    ]

    def fwd(params, fwd_mat, x):
        f = dict(
            rows=fwd_mat["rows"][0], cols=fwd_mat["cols"][0], vals=fwd_mat["vals"][0]
        )
        agg = lambda h: dist_aggregate(f, h, parts, strategy)
        h = x
        for i, layer in enumerate(params):
            h, _ = _dist_layer_forward(
                layer, config.layer_meta(i), agg, h, config.leaky_slope
            )
        return h

    smapped = shard_map(
        fwd,
        mesh=mesh,
        in_specs=(params_spec, mat_spec, shard_rows),
        out_specs=shard_rows,
        check_vma=False,
    )

    def wrapper(params, pair, x):
        fwd_mat = dict(rows=pair.fwd.rows, cols=pair.fwd.cols, vals=pair.fwd.vals)
        return smapped(params, fwd_mat, x)

    return jax.jit(wrapper)


def _layer_has(config: GCNConfig, i: int, key: str) -> bool:
    if key in ("W", "b"):
        return True
    return config.layer_meta(i)["res_proj"]


def make_dist_sage_train_step(
    config,
    mesh: Mesh,
    n_total: int,
    hparams: dict | None = None,
    strategy: str = "ring",
    use_mask: bool = False,
    pair_kind: str = "coo",
):
    """Distributed GraphSAGE train step (row partition, exact autodiff).

    The mean-aggregation pair rides the same ring/all_gather machinery as
    GCN; gradients are taken per device by autodiff (the ppermute transpose
    is the reverse permute) and psum'd, mirroring the replicated-weight
    allreduce. ``pair`` must be a DistAggPair built from (M, Mᵀ) with
    M = row-normalized adjacency (models/sage.py semantics), or a
    DistHaloPair (pair_kind="halo") for the halo-exchange storage mode —
    autodiff differentiates through the halo gather + ppermute exactly.
    """
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    hp = dict(adam.DEFAULT_HPARAMS)
    if hparams:
        hp.update(hparams)
    parts = mesh.devices.size

    repl = P()
    shard_rows = P(GRAPH_AXIS)
    if pair_kind == "coo":
        mat_spec = dict(rows=shard_rows, cols=shard_rows, vals=shard_rows)
    elif pair_kind == "halo":
        from . import dist_halo

        if strategy != "ring":
            raise ValueError(
                "the halo pair has a single (ring) exchange schedule; "
                f"strategy {strategy!r} is not available with pair_kind='halo'"
            )
        mat_spec = {k: shard_rows for k in dist_halo.MAT_FIELDS}
    elif pair_kind == "gather":
        if strategy != "ring":
            raise ValueError(
                "the gather pair has a single (ring) exchange schedule; "
                f"strategy {strategy!r} is not available with pair_kind='gather'"
            )
        mat_spec = {k: shard_rows for k in GATHER_MAT_FIELDS}
    elif pair_kind == "halo_gather":
        from . import dist_halo

        if strategy != "ring":
            raise ValueError(
                "the halo pair has a single (ring) exchange schedule; "
                f"strategy {strategy!r} is not available with "
                "pair_kind='halo_gather'"
            )
        mat_spec = {k: shard_rows for k in dist_halo.GATHER_HALO_FIELDS}
    else:
        raise ValueError(f"unknown pair_kind {pair_kind!r}")
    # autodiff provides the transpose (reverse permute), so only the forward
    # matrix is shipped — except the gather pairs, whose pallas kernel is not
    # differentiable: they ship both directions and use _exact_agg's VJP
    if pair_kind in ("gather", "halo_gather"):
        pair_spec = dict(fwd=mat_spec, bwd=mat_spec)
    else:
        pair_spec = dict(fwd=mat_spec)
    params_spec = [
        {k: repl for k in ("Wself", "Wneigh", "b")} for _ in range(config.num_layers)
    ]
    opt_spec = adam.AdamState(step=repl, m=params_spec, v=params_spec)
    in_specs = (params_spec, opt_spec, pair_spec, shard_rows, shard_rows)
    if use_mask:
        in_specs = in_specs + (shard_rows,)
    out_specs = (params_spec, opt_spec, repl, repl)

    def step(params, opt_state, pair, x, y, *maybe_mask):
        mask = maybe_mask[0] if maybe_mask else None
        if pair_kind == "coo":
            f = dict(
                rows=pair["fwd"]["rows"][0],
                cols=pair["fwd"]["cols"][0],
                vals=pair["fwd"]["vals"][0],
            )
            agg = lambda h: dist_aggregate(f, h, parts, strategy)
        elif pair_kind == "gather":
            f = {k: pair["fwd"][k][0] for k in GATHER_MAT_FIELDS}
            b = {k: pair["bwd"][k][0] for k in GATHER_MAT_FIELDS}
            agg = _exact_agg(
                lambda h: dist_aggregate_gather(f, h, parts),
                lambda g: dist_aggregate_gather(b, g, parts),
            )
        elif pair_kind == "halo_gather":
            from . import dist_halo

            strip = dist_halo.strip_shard_axis
            f = {k: strip(pair["fwd"][k]) for k in dist_halo.GATHER_HALO_FIELDS}
            b = {k: strip(pair["bwd"][k]) for k in dist_halo.GATHER_HALO_FIELDS}
            agg = _exact_agg(
                lambda h: dist_halo.dist_aggregate_halo_gather(f, h, parts),
                lambda g: dist_halo.dist_aggregate_halo_gather(b, g, parts),
            )
        else:
            from . import dist_halo

            f = {k: dist_halo.strip_shard_axis(pair["fwd"][k]) for k in dist_halo.MAT_FIELDS}
            agg = lambda h: dist_halo.dist_aggregate_halo(f, h, parts)
        yv = y.reshape(-1)
        if mask is None:
            denom = jnp.asarray(n_total, jnp.float32)
            m = None
        else:
            m = mask.astype(jnp.float32)
            denom = jnp.maximum(jax.lax.psum(jnp.sum(m), GRAPH_AXIS), 1.0)

        def local_loss(p):
            h = x
            for i, layer in enumerate(p):
                neigh = agg(h)
                h = h @ layer["Wself"] + neigh @ layer["Wneigh"] + layer["b"]
                if i + 1 < config.num_layers:
                    h = ew.leaky_relu(h, config.leaky_slope)
                    if getattr(config, "l2_normalize", False):
                        # row-local (rows are sharded whole) — no collective
                        from ..models.sage import l2_norm_rows

                        h = l2_norm_rows(h)
            return _local_xent_terms(h, yv, m, denom)

        (loss_loc, acc_loc), grads = jax.value_and_grad(local_loss, has_aux=True)(
            params
        )
        loss = jax.lax.psum(loss_loc, GRAPH_AXIS)
        acc = jax.lax.psum(acc_loc, GRAPH_AXIS)
        grads = jax.tree.map(lambda g: jax.lax.psum(g, GRAPH_AXIS), grads)
        params, opt_state = adam.adam_update(params, grads, opt_state, **hp)
        return params, opt_state, loss, acc

    smapped = shard_map(
        step, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )

    def wrapper(params, opt_state, pair, x, y, mask=None):
        if pair_kind == "coo":
            pair_dicts = dict(
                fwd=dict(rows=pair.fwd.rows, cols=pair.fwd.cols, vals=pair.fwd.vals),
            )
        elif pair_kind == "gather":
            pair_dicts = dict(
                fwd={k: getattr(pair.fwd, k) for k in GATHER_MAT_FIELDS},
                bwd={k: getattr(pair.bwd, k) for k in GATHER_MAT_FIELDS},
            )
        elif pair_kind == "halo_gather":
            from . import dist_halo

            pair_dicts = dict(
                fwd={k: getattr(pair.fwd, k) for k in dist_halo.GATHER_HALO_FIELDS},
                bwd={k: getattr(pair.bwd, k) for k in dist_halo.GATHER_HALO_FIELDS},
            )
        else:
            from . import dist_halo

            pair_dicts = dict(
                fwd={k: getattr(pair.fwd, k) for k in dist_halo.MAT_FIELDS},
            )
        args = (params, opt_state, pair_dicts, x, y)
        if use_mask:
            args = args + (mask,)
        return smapped(*args)

    return jax.jit(wrapper)
