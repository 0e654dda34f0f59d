"""Round-4 kernel probes (real v5e): banked gather A/B, SDDMM two-level
select at bench scale, block-banded isolation re-measurement.

Usage: python scripts/probe_r4_kernels.py [gather] [sddmm] [banded]
(no args = all three)
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

CHAIN = 10


def timeit(fn, *args):
    float(jnp.sum(fn(*args)))  # compile + force
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


def probe_gather():
    from mg_gcn_tpu.ops import spmm_gather as sg

    for tag, gen in (
        ("uniform", lambda: hs.random_graph(65536, 50, seed=0, weights="uniform")),
        ("community", lambda: hs.planted_graph(65536, 50, 16, seed=0)[0]),
    ):
        g = gen()
        sched = sg.gather_schedule_host(g, binary=False)
        mat = sg.gather_mat_from_host(sched)
        d = 128
        rng = np.random.default_rng(1)
        b = jnp.asarray(rng.standard_normal((mat.n_in_pad, d)).astype(np.float32))
        for banked in (False, True):

            @jax.jit
            def chain(m, v, _banked=banked):
                acc = v
                for _ in range(CHAIN):
                    acc = sg._gather_call(m, acc[: m.n_in_pad], _banked)
                    acc = acc * (1.0 + 1e-7 * acc / (jnp.abs(acc) + 1.0))
                return acc

            best = timeit(chain, mat, b)
            per = best / CHAIN
            cyc = per * 940e6 / g.nnz
            print(
                f"[gather {tag} banked={banked}] pairfrac={mat.pairfrac:.2f} "
                f"{per*1e3:.2f} ms/SpMM = {cyc:.2f} cyc/edge",
                flush=True,
            )
        del mat, sched


def probe_sddmm():
    from mg_gcn_tpu.ops import spmm_edges as se
    from mg_gcn_tpu.ops.sddmm import sddmm_edge_tiles

    path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache",
                        "pg_232968_493_41.npz")
    with np.load(path) as d:
        g = CSRData(d["indptr"], d["indices"], d["data"], (232968, 232968))
    rng = np.random.default_rng(5)
    wvals = rng.random(g.nnz, np.float32) + 0.5
    wg = CSRData(g.indptr, g.indices, wvals, g.shape)
    wa = hs.normalize(wg, axis=True)
    wa_t = hs.transpose(wa)
    t0 = time.time()
    sched = se.edge_tile_schedule_host(wa_t)
    mat = se.edge_tile_mat_from_host(sched)
    jax.block_until_ready(mat.idx)
    print(f"sched built+uploaded {time.time()-t0:.1f}s br={mat.br} "
          f"paired={mat.paired} fill={mat.fill:.3f}", flush=True)
    d = 128
    a = jnp.asarray(np.random.default_rng(0).standard_normal(
        (mat.n_out, d)).astype(np.float32))

    CH = 5

    @jax.jit
    def chain(m, aa):
        # scalar accumulation: keeping CH full score arrays alive OOMs HBM
        acc = jnp.float32(0)
        a_ = aa
        for _ in range(CH):
            s = sddmm_edge_tiles(m, a_, a_[: m.n_in])
            acc = acc + jnp.sum(s)
            a_ = a_ * (1.0 + 1e-6 * acc / (jnp.abs(acc) + 1.0))
        return acc

    best = timeit(chain, mat, a)
    per = best / CH
    print(
        f"[sddmm reddit-scale br={mat.br}] {per*1e3:.1f} ms = "
        f"{g.nnz/per/1e9:.3f} Gedge/s",
        flush=True,
    )


def probe_banded():
    """Replicates the bench's banded section byte-for-byte (same rng seeds,
    same ±4096 band) but in an otherwise empty HBM."""
    import scipy.sparse as ss

    from mg_gcn_tpu.ops import spmm_pattern_sparse as sps

    N, AVG_DEG = 232_968, 493
    t0 = time.time()
    bpath = os.path.join(
        os.path.dirname(__file__), "..", ".bench_cache", f"band_{N}_{AVG_DEG}.npz"
    )
    if os.path.exists(bpath):
        with np.load(bpath) as dd:
            g = CSRData(dd["indptr"], dd["indices"], dd["data"], (N, N))
    else:
        rb = np.random.default_rng(7)
        src = np.arange(N, dtype=np.int64).repeat(AVG_DEG)
        dst = np.clip(src + rb.integers(-4096, 4097, src.size), 0, N - 1)
        m = ss.csr_matrix((np.ones(src.size, np.float32), (src, dst)), shape=(N, N))
        m.sum_duplicates()
        m.data[:] = 1.0
        g = CSRData.from_scipy(m)
        os.makedirs(os.path.dirname(bpath), exist_ok=True)
        np.savez(bpath, indptr=g.indptr, indices=g.indices, data=g.data)
    print(f"banded graph {g.nnz} edges in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    bfwd, bbwd = sps.block_pattern_pair_from_binary_csr(g, dtype="bfloat16")
    print(f"block pair built {time.time()-t0:.1f}s tile_occ={bfwd.occupancy:.4f} "
          f"plane_occ={bfwd.plane_occ:.4f}", flush=True)

    @jax.jit
    def pair_pass(fm, bm, v):
        return sps.spmm_block_pattern(bm, sps.spmm_block_pattern(fm, v))

    v = jnp.asarray(np.random.default_rng(11).random((N, 128), np.float32))
    float(jnp.sum(pair_pass(bfwd, bbwd, v)))  # compile
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        float(jnp.sum(pair_pass(bfwd, bbwd, v)))
        ts.append(time.perf_counter() - t0)
    spmm_s = min(ts) / 2
    print(
        f"[block-banded isolated] {spmm_s*1e3:.1f} ms/SpMM = "
        f"{g.nnz/spmm_s/1e9:.2f} Gedge/s  (samples: "
        + ", ".join(f"{t*1e3:.1f}" for t in ts)
        + " ms/pair)",
        flush=True,
    )


if __name__ == "__main__":
    which = set(sys.argv[1:]) or {"gather", "sddmm", "banded"}
    if "gather" in which:
        probe_gather()
    if "sddmm" in which:
        probe_sddmm()
    if "banded" in which:
        probe_banded()
