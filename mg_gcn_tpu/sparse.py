"""Host-side graph/CSR preprocessing ops.

TPU-native reimplementation of the reference's host preprocessing
(``matrix.hpp:340-424`` normalize/transpose, ``dist_matrix.hpp:215-259``
2-D block partitioning) as numpy algorithms, with an optional C++/OpenMP
fast path (see :mod:`mg_gcn_tpu.native`) for papers100M-scale graphs.

All functions operate on :class:`mg_gcn_tpu.formats.CSRData`.
"""

from __future__ import annotations

import numpy as np

from .formats import CSRData


def _expand_rows(csr: CSRData) -> np.ndarray:
    """Per-edge row ids from indptr (edge-parallel COO expansion)."""
    counts = np.diff(csr.indptr).astype(np.int64)
    return np.repeat(np.arange(csr.nrows, dtype=np.int64), counts)


def normalize(csr: CSRData, axis: bool = False) -> CSRData:
    """Degree-normalize edge weights, matching reference semantics
    (matrix.hpp:340-390).

    axis=False: each row is scaled to sum to 1 (row-stochastic).
    axis=True: each entry is divided by the (weighted) sum of its column
    — i.e. columns sum to 1 (the GCN in-degree normalization used by the
    training path, main.cpp:143 / gcn.hpp:947).

    Returns a new CSRData sharing index structure (indices/indptr reused).
    """
    try:
        from . import native

        if native.available():
            data = native.normalize(csr, axis)
            return CSRData(csr.indptr, csr.indices, data, csr.shape)
    except ImportError:
        pass
    data = csr.data.astype(np.float32, copy=True)
    if not axis:
        # Exact per-row sums, O(row-chunk) extra memory. reduceat alone
        # mishandles empty rows (clamped start indices merge/truncate
        # segments — including the last non-empty row when trailing rows
        # are empty), so mask empty rows after each chunked reduceat
        # instead of materializing an (nnz+1) float64 prefix-sum array.
        ptr = csr.indptr.astype(np.int64)
        n_rows = csr.nrows
        row_sum = np.zeros(n_rows, np.float32)
        CHUNK = 1 << 20
        for r0 in range(0, n_rows, CHUNK):
            r1 = min(r0 + CHUNK, n_rows)
            e0, e1 = ptr[r0], ptr[r1]
            if e1 == e0:
                continue
            # sentinel 0 lets trailing-empty-row starts (== chunk length)
            # index reduceat legally WITHOUT clamping — a clamp would
            # truncate the preceding non-empty row's segment
            chunk = np.concatenate([data[e0:e1].astype(np.float64), [0.0]])
            sums = np.add.reduceat(chunk, ptr[r0:r1] - e0)
            counts = ptr[r0 + 1 : r1 + 1] - ptr[r0:r1]
            row_sum[r0:r1] = np.where(counts > 0, sums, 0.0).astype(np.float32)
        rows = _expand_rows(csr)
        data = data / row_sum[rows]
    else:
        col_sum = np.zeros(csr.ncols, dtype=np.float64)
        np.add.at(col_sum, csr.indices.astype(np.int64), data)
        data = (data / col_sum[csr.indices.astype(np.int64)]).astype(np.float32)
    return CSRData(csr.indptr, csr.indices, data.astype(np.float32), csr.shape)


def transpose(csr: CSRData) -> CSRData:
    """CSR transpose via counting sort (reference matrix.hpp:392-424).

    Note: like the reference, the result's rows hold the original column's
    edges ordered by original row (a stable counting sort).
    """
    try:
        from . import native

        if native.available():
            return native.transpose(csr)
    except ImportError:
        pass
    n, m = csr.shape
    cols = csr.indices.astype(np.int64)
    counts = np.bincount(cols, minlength=m).astype(np.int64)
    indptr = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    order = np.argsort(cols, kind="stable")
    rows = _expand_rows(csr)
    return CSRData(
        indptr=indptr,
        indices=rows[order].astype(np.int32),
        data=csr.data[order],
        shape=(m, n),
    )


def add_self_loops(csr: CSRData, weight: float = 1.0) -> CSRData:
    """Add a self edge to every node (skips nodes that already have one).

    Vectorized single pass (the previous LIL per-node probe was unusable at
    papers100M scale)."""
    import scipy.sparse as ss

    rows = _expand_rows(csr)
    has = np.zeros(csr.nrows, bool)
    on_diag = csr.indices == rows
    has[rows[on_diag]] = True
    missing = np.flatnonzero(~has).astype(np.int64)
    if missing.size == 0:
        return csr
    coo = csr.to_scipy().tocoo()
    r = np.concatenate([coo.row.astype(np.int64), missing])
    c = np.concatenate([coo.col.astype(np.int64), missing])
    d = np.concatenate(
        [coo.data.astype(np.float32), np.full(missing.size, weight, np.float32)]
    )
    out = ss.csr_matrix((d, (r, c)), shape=csr.shape)
    out.sort_indices()
    return CSRData.from_scipy(out)


def uniform_partition(n: int, parts: int) -> np.ndarray:
    """The reference's uniform 1-D partition: p[i] = i*n/P (main.cpp:139-141).

    Returns an array of P+1 boundaries.
    """
    return np.array([i * n // parts for i in range(parts + 1)], dtype=np.int64)


def partition_blocks(
    csr: CSRData, row_part: np.ndarray, col_part: np.ndarray
) -> list[list[CSRData]]:
    """Split A into a P×Q grid of CSR blocks with rebased column indices.

    Equivalent of the reference dist_row_csr_matrix construction
    (dist_matrix.hpp:215-259): block[i][j] holds rows [row_part[i],
    row_part[i+1]) and the columns in [col_part[j], col_part[j+1]), with
    column indices shifted down by col_part[j].
    """
    P = len(row_part) - 1
    Q = len(col_part) - 1
    rows = _expand_rows(csr)
    cols = csr.indices.astype(np.int64)
    col_block = np.searchsorted(col_part[1:], cols, side="right")
    out: list[list[CSRData]] = []
    for i in range(P):
        r0, r1 = int(row_part[i]), int(row_part[i + 1])
        e0, e1 = int(csr.indptr[r0]), int(csr.indptr[r1])
        row_i = rows[e0:e1] - r0
        col_i = cols[e0:e1]
        cb_i = col_block[e0:e1]
        dat_i = csr.data[e0:e1]
        blocks_i = []
        for j in range(Q):
            sel = cb_i == j
            rj = row_i[sel]
            cj = col_i[sel] - int(col_part[j])
            dj = dat_i[sel]
            nrows_blk = r1 - r0
            ncols_blk = int(col_part[j + 1] - col_part[j])
            indptr = np.zeros(nrows_blk + 1, dtype=np.int64)
            np.cumsum(np.bincount(rj, minlength=nrows_blk), out=indptr[1:])
            blocks_i.append(
                CSRData(
                    indptr=indptr,
                    indices=cj.astype(np.int32),
                    data=dj.astype(np.float32),
                    shape=(nrows_blk, ncols_blk),
                )
            )
        out.append(blocks_i)
    return out


def comm_volume(csr: CSRData, part: np.ndarray) -> np.ndarray:
    """P×P inter-partition communication volume matrix (prep.py:232-272).

    volume[i][j] = number of distinct columns owned by partition j that
    partition i's rows reference — i.e. how many feature rows must travel
    j→i for a row-partitioned SpMM.
    """
    try:
        from . import native

        if native.available():
            return native.comm_volume(csr, np.asarray(part, np.int64))
    except ImportError:
        pass
    P = len(part) - 1
    rows = _expand_rows(csr)
    cols = csr.indices.astype(np.int64)
    row_block = np.searchsorted(part[1:], rows, side="right")
    col_block = np.searchsorted(part[1:], cols, side="right")
    vol = np.zeros((P, P), dtype=np.int64)
    for i in range(P):
        sel = row_block == i
        for j in range(P):
            vol[i, j] = np.unique(cols[sel & (col_block == j)]).size
    return vol


def permute_symmetric(csr: CSRData, perm: np.ndarray) -> CSRData:
    """Apply the same permutation to rows and columns: result = A[perm][:, perm].

    ``perm`` maps new index -> old index, consistent with ``features[perm]``
    — exactly the reference's permutation semantics (prep.py:24-43: the
    argsort-permuted identity matrix there composes to ``M[p][:, p]`` with
    ``features[p]`` at prep.py:89-93).
    """
    sp = csr.to_scipy()
    sp = sp[perm][:, perm]
    sp.sort_indices()
    return CSRData.from_scipy(sp)


def cluster_order(csr: CSRData, method: str = "rcm") -> np.ndarray:
    """Locality-improving node ordering (new-index -> old-index permutation).

    Orders nodes so edges concentrate near the diagonal / in blocks, which
    the block-sparse pattern kernel (ops/spmm_pattern_sparse.py) converts
    directly into skipped tiles. The reference's prep kept a PaToH
    hypergraph-partitioning hook for the same purpose (prep.py:20,238-240,
    commented out); here:

    * "rcm"    — reverse Cuthill-McKee bandwidth reduction (scipy).
    * "bfs"    — plain BFS ordering from the max-degree node.
    * "degree" — sort by degree (groups hubs; cheap).
    """
    sym = csr.to_scipy()
    sym = (sym + sym.T).tocsr()
    if method == "rcm":
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        return np.asarray(reverse_cuthill_mckee(sym, symmetric_mode=True))
    if method == "bfs":
        from scipy.sparse.csgraph import breadth_first_order

        start = int(np.argmax(np.diff(sym.indptr)))
        order, _ = breadth_first_order(sym, start, return_predecessors=True)
        seen = np.zeros(csr.nrows, bool)
        seen[order] = True
        rest = np.flatnonzero(~seen)
        return np.concatenate([order, rest]).astype(np.int64)
    if method == "degree":
        return np.argsort(-np.diff(csr.indptr)).astype(np.int64)
    raise ValueError(f"unknown cluster method {method!r}")


def random_graph(
    n: int,
    avg_degree: float,
    seed: int = 0,
    self_loops: bool = True,
    weights: str = "ones",
) -> CSRData:
    """Synthetic benchmark graph: uniform random edges (Erdős–Rényi-ish).

    Used by bench.py when real datasets (Reddit/OGB) cannot be downloaded.
    Duplicate edges are merged.
    """
    rng = np.random.default_rng(seed)
    nnz_target = int(n * avg_degree)
    src = rng.integers(0, n, size=nnz_target, dtype=np.int64)
    dst = rng.integers(0, n, size=nnz_target, dtype=np.int64)
    if self_loops:
        src = np.concatenate([src, np.arange(n, dtype=np.int64)])
        dst = np.concatenate([dst, np.arange(n, dtype=np.int64)])
    key = src * n + dst
    key = np.unique(key)
    src, dst = key // n, key % n
    if weights == "ones":
        data = np.ones(src.shape[0], dtype=np.float32)
    else:
        data = rng.random(src.shape[0], dtype=np.float32) + 0.5
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(src, minlength=n), out=indptr[1:])
    return CSRData(indptr=indptr, indices=dst.astype(np.int32), data=data, shape=(n, n))


def planted_graph(
    n: int,
    avg_degree: float,
    classes: int,
    intra: float = 0.55,
    seed: int = 3,
    self_loops: bool = True,
) -> tuple[CSRData, np.ndarray]:
    """Synthetic benchmark graph with a planted community structure.

    Returns ``(graph, comm)`` where ``comm[i]`` is node i's community —
    usable directly as a classification label. ``intra`` is the fraction of
    edges drawn inside the source node's community (contiguous index
    ranges, so the layout is clustered like real datasets: Reddit and the
    OGB graphs are community graphs, not uniform-random ones). Duplicate
    edges are merged. Used by bench.py and the accuracy validators: a
    planted task makes the benchmark's loss trajectory decrease, so the
    recorded throughput doubles as full-scale numerics evidence (the
    reference prints ``epoch loss acc seconds``, main.cpp:130).
    """
    rng = np.random.default_rng(seed)
    sizes = np.full(classes, n // classes, np.int64)
    sizes[: n % classes] += 1
    bounds = np.concatenate([[0], np.cumsum(sizes)])
    comm = np.repeat(np.arange(classes, dtype=np.int32), sizes)
    nnz_target = int(n * avg_degree)
    src = rng.integers(0, n, size=nnz_target, dtype=np.int64)
    is_intra = rng.random(nnz_target) < intra
    c_of = comm[src]
    lo, hi = bounds[c_of], bounds[c_of + 1]
    pick = lo + (rng.random(nnz_target) * (hi - lo)).astype(np.int64)
    dst = np.where(is_intra, pick, rng.integers(0, n, size=nnz_target, dtype=np.int64))
    if self_loops:
        src = np.concatenate([src, np.arange(n, dtype=np.int64)])
        dst = np.concatenate([dst, np.arange(n, dtype=np.int64)])
    key = np.unique(src * n + dst)
    src, dst = key // n, key % n
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(src, minlength=n), out=indptr[1:])
    g = CSRData(
        indptr=indptr,
        indices=dst.astype(np.int32),
        data=np.ones(src.shape[0], np.float32),
        shape=(n, n),
    )
    return g, comm


def planted_features(
    comm: np.ndarray, dim: int, noise: float = 10.0, seed: int = 0
) -> np.ndarray:
    """Features carrying the planted community signal: a random projection
    of the community one-hot plus Gaussian noise (the harder the noise, the
    more epochs a GCN needs — noise 10 at 41 classes/608 dims reaches ~0.94
    accuracy by epoch 5, scripts/validate_accuracy.py)."""
    rng = np.random.default_rng(seed)
    classes = int(comm.max()) + 1
    proj = rng.standard_normal((classes, dim)).astype(np.float32)
    x = proj[comm] + noise * rng.standard_normal((comm.size, dim)).astype(np.float32)
    return x
