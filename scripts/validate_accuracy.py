"""Accuracy validation at Reddit scale: bf16 vs int8 pattern aggregation.

Builds a planted 41-community graph at the headline-bench scale (n=232,968,
avg degree ~493, ~80% intra-community edges), features = noisy random
projection of the community one-hot, and trains the 3x128 GCN for 20 epochs
in each aggregation dtype. Verifies the int8 mode (2x MXU) reaches the same
final accuracy as bf16 before anyone considers promoting it.
"""

import os
import sys
import time

import numpy as np
import scipy.sparse as ss

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 232_968
DEG = 493
CLASSES = 41
FEATURES = 608
HIDDEN = [128, 128]
EPOCHS = 20
CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache")


def planted_graph():
    path = os.path.join(CACHE, f"planted2_{N}_{DEG}_{CLASSES}.npz")
    from mg_gcn_tpu.formats import CSRData

    if os.path.exists(path):
        with np.load(path) as d:
            return (
                CSRData(d["indptr"], d["indices"], d["data"], (N, N)),
                d["comm"],
            )
    rng = np.random.default_rng(3)
    comm = rng.integers(0, CLASSES, N).astype(np.int32)
    order = np.argsort(comm, kind="stable")  # contiguous communities
    comm = comm[order.argsort()]  # keep labels aligned with node ids
    src = np.arange(N, dtype=np.int64).repeat(DEG)
    intra = rng.random(src.size) < 0.55
    # intra edges: random node of the same community (communities are the
    # index ranges of the sorted order)
    bounds = np.searchsorted(np.sort(comm), np.arange(CLASSES + 1))
    sorted_ids = np.argsort(comm, kind="stable")
    c_of = comm[src]
    lo, hi = bounds[c_of], bounds[c_of + 1]
    pick = lo + (rng.random(src.size) * (hi - lo)).astype(np.int64)
    dst = np.where(intra, sorted_ids[pick], rng.integers(0, N, src.size))
    m = ss.csr_matrix((np.ones(src.size, np.float32), (src, dst)), shape=(N, N))
    m.sum_duplicates()
    m.data[:] = 1.0
    g = CSRData.from_scipy(m)
    np.savez(path, indptr=g.indptr, indices=g.indices, data=g.data, comm=comm)
    return g, comm


def main():
    import jax.numpy as jnp

    from mg_gcn_tpu.models.gcn import GCNConfig, init_params
    from mg_gcn_tpu.nn import adam
    from mg_gcn_tpu.train import build_agg_pair, make_scan_train_steps

    t0 = time.time()
    g, comm = planted_graph()
    print(f"graph ready ({g.nnz} edges) in {time.time()-t0:.0f}s", file=sys.stderr)
    rng = np.random.default_rng(0)
    proj = rng.standard_normal((CLASSES, FEATURES)).astype(np.float32)
    x = jnp.asarray(
        np.eye(CLASSES, dtype=np.float32)[comm] @ proj
        + 10.0 * rng.standard_normal((N, FEATURES)).astype(np.float32)
    )
    y = jnp.asarray(comm)
    config = GCNConfig(sizes=(FEATURES, *HIDDEN, CLASSES))
    results = {}
    for dtype in ("bfloat16", "int8"):
        t0 = time.time()
        pair = build_agg_pair(g, impl="pattern", pattern_dtype=dtype)
        steps = make_scan_train_steps(config, EPOCHS)
        params = init_params(config)
        p, o, losses, accs = steps(params, adam.adam_init(params), pair, x, y, None)
        accs = np.asarray(accs)
        results[dtype] = float(accs[-1])
        print(
            f"[{dtype}] final acc {accs[-1]:.4f} (ep5 {accs[4]:.4f}, "
            f"ep10 {accs[9]:.4f}) loss {float(losses[-1]):.4f} "
            f"in {time.time()-t0:.0f}s",
            file=sys.stderr,
        )
        del pair, p, o
    gap = results["bfloat16"] - results["int8"]
    print(f"accuracy gap bf16 - int8 = {gap:+.4f}")


if __name__ == "__main__":
    main()
