"""Round-5 SDDMM probe: q-range row select (SMEM-fed [q0,q1] fori_loop)
vs the full nq-loop select, on the cached Reddit-scale br=512 schedule.
Usage: python scripts/probe_sddmm_r5.py [br]
With a br argument != 512, builds a fresh schedule at that br instead of
loading the cache (to sweep br with q-skip on).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mg_gcn_tpu.ops import sddmm as sd  # noqa: E402
from mg_gcn_tpu.ops import spmm_edges as se  # noqa: E402

CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache"
)
br_arg = int(sys.argv[1]) if len(sys.argv) > 1 else 512

t0 = time.time()
if br_arg == 512:
    with np.load(
        os.path.join(CACHE, "weighted_edge_sched_bfloat16_113508306_v4-128-8-4096.npz")
    ) as z:
        fs = {k[2:]: z[k] for k in z.files if k.startswith("f_")}
    mat = se.edge_tile_mat_from_host(fs)
else:
    from mg_gcn_tpu import sparse as hs

    with np.load(os.path.join(CACHE, "pg_232968_493_41.npz")) as gg:
        from mg_gcn_tpu.formats import CSRData

        n = gg["indptr"].shape[0] - 1
        g = CSRData(gg["indptr"], gg["indices"], gg["data"], (n, n))
    a_n = hs.normalize(g, axis=True)
    a_t = hs.transpose(a_n)
    sched = se.edge_tile_schedule_host(a_t, dtype="bfloat16", br=br_arg)
    mat = se.edge_tile_mat_from_host(sched)
NNZ = mat.nnz
print(
    f"mat up in {time.time()-t0:.0f}s: br={mat.br} S={mat.num_steps} "
    f"fill={mat.fill:.3f} nnz={NNZ}",
    file=sys.stderr,
)

rng = np.random.default_rng(0)
D = 128
a = jnp.asarray(rng.standard_normal((mat.n_out, D)).astype(np.float32))
CHAIN = 5


def run(tag, qskip, select="two"):
    @jax.jit
    def chain(mat, a):
        t = 0.0
        for i in range(CHAIN):
            s = sd.sddmm_edge_tiles(mat, a + i, a + i, qskip=qskip, select=select)
            t = t + jnp.sum(s[:: 64 * 1024])
        return t

    r1 = float(chain(mat, a))
    t1 = time.perf_counter()
    r2 = float(chain(mat, a))
    dt = (time.perf_counter() - t1) / CHAIN
    print(
        f"{tag:28s}: {dt*1e3:7.1f} ms/SDDMM  {NNZ/dt/1e9:.3f} Gedge/s  "
        f"(check {r2:.3e})"
    )
    return dt


d_full = run("two-level select", False)
d_one = run("one-level (br,K) select", False, select="one")
print(f"one-level vs two-level {d_full/d_one:.2f}x")
