"""Probe: where do the reddit-scale PageRank seconds go?

Runs the pattern-SpMV power iteration at reddit scale and reports
iteration count, per-iteration cost, and the fixed setup cost — the
numbers that decide how to hit the VERDICT r2 target (<= ~15 s).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mg_gcn_tpu.sparse import planted_graph
from mg_gcn_tpu.models.pagerank import _pagerank_mat
from mg_gcn_tpu.ops.spmm import spmm

N = 232_968
DEG = 493


def main():
    t0 = time.time()
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache"
    )
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, f"pg_{N}_{DEG}_41.npz")  # bench.get_graph's key
    if os.path.exists(path):
        from mg_gcn_tpu.formats import CSRData

        with np.load(path) as d:
            g = CSRData(d["indptr"], d["indices"], d["data"], (N, N))
    else:
        g, comm = planted_graph(N, DEG, 41, seed=3)
        np.savez(path, indptr=g.indptr, indices=g.indices, data=g.data, comm=comm)
    print(f"graph ready ({g.nnz}) in {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    mat = _pagerank_mat(g, "auto")
    print(f"mat ({type(mat).__name__}) in {time.time()-t0:.1f}s", file=sys.stderr)

    damping, eps, max_iters = 0.85, 1e-4, 1000
    n = g.nrows

    @jax.jit
    def run(mat):
        p0 = jnp.ones((n, 1), jnp.float32)

        def cond(state):
            p, p_prev, it = state
            err = jnp.max(jnp.abs(p - p_prev))
            return jnp.logical_and(err >= eps, it < max_iters)

        def body(state):
            p, _, it = state
            p_new = spmm(mat, damping * p + (1.0 - damping))
            return p_new, p, it + 1

        p1 = spmm(mat, damping * p0 + (1.0 - damping))
        p, _, it = jax.lax.while_loop(cond, body, (p1, p0, jnp.int32(1)))
        return p, it

    t0 = time.time()
    p, it = run(mat)
    iters = int(it)
    print(f"first run: {time.time()-t0:.2f}s ({iters} iterations, compile incl)",
          file=sys.stderr)
    t0 = time.time()
    p, it = run(mat)
    float(p[0, 0])
    dt = time.time() - t0
    print(f"second run: {dt:.2f}s -> {dt/iters*1e3:.1f} ms/iter", file=sys.stderr)

    # fixed-iteration probe: 20 iterations, no convergence test (fori_loop)
    @jax.jit
    def run_fixed(mat, k):
        p0 = jnp.ones((n, 1), jnp.float32)

        def body(i, p):
            return spmm(mat, damping * p + (1.0 - damping))

        return jax.lax.fori_loop(0, k, body, p0)

    float(run_fixed(mat, 20)[0, 0])  # compile
    t0 = time.time()
    float(run_fixed(mat, 20)[0, 0])
    dt = time.time() - t0
    print(f"fixed 20 iters: {dt:.2f}s -> {dt/20*1e3:.1f} ms/iter", file=sys.stderr)

    # d=128 comparison: one SpMM at d=128 should cost the same as d=1 on
    # the pattern path (both pad to 128 lanes)
    x = jnp.ones((n, 128), jnp.float32)

    @jax.jit
    def one(mat, x):
        return spmm(mat, x)

    float(one(mat, x)[0, 0])
    t0 = time.time()
    float(one(mat, x)[0, 0])
    print(f"single d=128 spmm: {(time.time()-t0)*1e3:.1f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
