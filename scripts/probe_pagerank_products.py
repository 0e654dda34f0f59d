"""Bisect the BENCH_r04 pagerank_products regression (18.5 s vs 10.16 in r3,
8.6 claimed in PERF.md): time power_iterate on the cached v2 (16k super-tile)
and v3 (32k super-tile) products schedules, separating compile from steady
state. Run on the real chip."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mg_gcn_tpu.models.pagerank import power_iterate  # noqa: E402
from mg_gcn_tpu.ops.spmm_gather import gather_mat_from_host  # noqa: E402

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache")

which = sys.argv[1] if len(sys.argv) > 1 else "v3"
path = {
    "v2": "products_gather_bin_124879776_v2-2048-12-14.npz",
    "v3": "products_gather_bin_124879776_v3-2048-12-14.npz",
}[which]

t0 = time.time()
with np.load(os.path.join(CACHE, path)) as dd:
    fs = {k[2:]: dd[k] for k in dd.files if k.startswith("f_")}
print(f"load {which}: {time.time()-t0:.1f}s, steps={fs['meta'].shape[0]}, "
      f"r_rows={fs.get('r_rows', 16384)}", file=sys.stderr)

# reconstruct the bench's pagerank operator: Âᵀ walk, pre-scale 1/outdeg
n = int(fs["n_out"])
# outdegree of the original graph == row sums of the forward (transposed)
# mat's columns; bench uses indptr of pg. Load the graph cache for outdeg.
with np.load(os.path.join(CACHE, "products_pg_2449029_50_48.npz")) as gg:
    indptr = gg["indptr"]
outdeg = np.diff(indptr).astype(np.float32)
mat = gather_mat_from_host(
    fs, scale=(1.0 / np.maximum(outdeg, 1.0)), scale_side="pre"
)
print(f"upload done at {time.time()-t0:.1f}s", file=sys.stderr)

t1 = time.time()
prv, prit = power_iterate(mat, n, damping=0.85, eps=1e-4)
t_total = time.time() - t1
print(f"[{which}] power_iterate total {t_total:.2f}s ({prit} iters)")

# steady state: second call reuses... power_iterate re-jits each call.
t2 = time.time()
prv, prit = power_iterate(mat, n, damping=0.85, eps=1e-4)
print(f"[{which}] second call {time.time()-t2:.2f}s ({prit} iters)")
