"""Round-4 probe: weighted edge-tile SpMM br selection at bench scale.

VERDICT r3 weak #1: weighted bf16 epoch regressed 1.735 -> 2.130 s between
BENCH_r02 and r03. Root cause hypothesis: the bench graph changed to
planted-community (seed 3) in round 3; its cached schedule was built with
the mean-density br picker (br=896, paired -> fill 0.62: off-diagonal
groups carry ~109 background edges = 1 chunk, and pairing rounds each to
2), while `_pick_br_exact` (landed in the final snapshot commit) would
pick a taller tile. This probe builds the FWD schedule at the exact pick
and at br=896 on the real bench graph and times the kernel on the chip.

Run: python scripts/probe_weighted_r4.py [--skip-896]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from mg_gcn_tpu import sparse as hs
from mg_gcn_tpu.formats import CSRData
from mg_gcn_tpu.ops import spmm_edges as se

N = 232_968
AVG_DEG = 493
CACHE = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
CHAIN = 10
D = 128
FREQ = 940e9  # v5e cycles/s


def get_graph():
    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"pg_{N}_{AVG_DEG}_41.npz")
    if os.path.exists(path):
        with np.load(path) as d:
            return CSRData(d["indptr"], d["indices"], d["data"], (N, N)), d["comm"]
    g, comm = hs.planted_graph(N, AVG_DEG, 41, seed=3)
    np.savez(path, indptr=g.indptr, indices=g.indices, data=g.data, comm=comm)
    return g, comm


def time_spmm(mat, tag):
    x = jnp.asarray(np.random.default_rng(0).random((mat.n_in, D), np.float32))

    @jax.jit
    def chain(m, v):
        acc = v
        for _ in range(CHAIN):
            acc = se.spmm_edge_tiles(m, acc[: m.n_in])
            acc = acc * (1.0 + 1e-6 * acc / (jnp.abs(acc) + 1.0))
        return acc

    float(jnp.sum(chain(mat, x)))  # compile + force
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(chain(mat, x)))
        best = min(best, time.perf_counter() - t0)
    per = best / CHAIN
    cyc = per * FREQ / mat.nnz
    print(
        f"[{tag}] br={mat.br} paired={mat.paired} fill={mat.fill:.3f} "
        f"S={mat.num_steps}: {per*1e3:.1f} ms/SpMM = {mat.nnz/per/1e9:.3f} "
        f"Gedge/s, {cyc:.2f} cyc/edge",
        flush=True,
    )
    return per


def main():
    t0 = time.time()
    g, _ = get_graph()
    print(f"graph ready ({g.nnz} edges) in {time.time()-t0:.1f}s", flush=True)
    rng = np.random.default_rng(5)
    wvals = rng.random(g.nnz, np.float32) + 0.5
    wg = CSRData(g.indptr, g.indices, wvals, g.shape)
    t0 = time.time()
    wa = hs.normalize(wg, axis=True)
    wa_t = hs.transpose(wa)
    print(f"normalize+transpose in {time.time()-t0:.1f}s", flush=True)

    configs = [("auto-exact", None, None)]
    if "--skip-896" not in sys.argv:
        configs.append(("896-paired", 896, True))
    for tag, br, paired in configs:
        t0 = time.time()
        sched = se.edge_tile_schedule_host(wa_t, br=br, paired=paired)
        print(f"[{tag}] schedule built in {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        mat = se.edge_tile_mat_from_host(sched)
        jax.block_until_ready(mat.idx)
        print(f"[{tag}] uploaded in {time.time()-t0:.1f}s", flush=True)
        time_spmm(mat, tag)
        del mat, sched


if __name__ == "__main__":
    main()
