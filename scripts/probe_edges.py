"""Hardware probe for the edge-tile weighted SpMM kernel (real v5e).

Checks Mosaic lowering + numerics vs the XLA COO path, then times chained
SpMMs (dispatch amortized; axon needs a forced host read to block).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mg_gcn_tpu import sparse
from mg_gcn_tpu.ops import spmm_edges as se
from mg_gcn_tpu.ops.spmm import COOMat, spmm

n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
deg = float(sys.argv[2]) if len(sys.argv) > 2 else 100
d = int(sys.argv[3]) if len(sys.argv) > 3 else 128
dtype = sys.argv[4] if len(sys.argv) > 4 else "bfloat16"
chain = 10

print(f"devices: {jax.devices()}", flush=True)
g = sparse.random_graph(n, avg_degree=deg, seed=0, weights="uniform")
print(f"graph n={n} nnz={g.nnz} d={d} dtype={dtype}", flush=True)

t0 = time.perf_counter()
mat = se.edge_tile_mat_from_csr(g, dtype=dtype)
jax.block_until_ready(mat.idx)
float(jnp.sum(mat.w.astype(jnp.float32)))  # force
t1 = time.perf_counter()
print(
    f"build+transfer: {t1-t0:.1f} s; steps={mat.num_steps} fill={mat.fill:.3f} "
    f"slots={mat.idx.size}",
    flush=True,
)

rng = np.random.default_rng(1)
b = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))

# numerics vs XLA COO on a column slice
t0 = time.perf_counter()
out = se.spmm_edge_tiles(mat, b)
s_edge = float(jnp.sum(out))
t1 = time.perf_counter()
print(f"first call (compile): {t1-t0:.1f} s", flush=True)
if g.nnz > 20_000_000:
    # the XLA COO check materializes an (nnz, d) gather — OOM at this
    # scale; verify an 8-column slice against host scipy instead
    ref8 = g.to_scipy() @ np.asarray(b[:, :8])
    got8 = np.asarray(out[:, :8])
    err = float(np.max(np.abs(got8 - ref8)) / (np.max(np.abs(ref8)) + 1e-30))
    print(f"rel err vs scipy (8 cols): {err:.2e}", flush=True)
else:
    coo = COOMat.from_csr(g)
    ref = spmm(coo, b)
    err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-30))
    print(f"rel err vs COO/XLA: {err:.2e}", flush=True)
tol = 1e-4 if dtype == "float32" else 3e-2
assert err < tol, f"numerics mismatch {err}"


@jax.jit
def chained(mat, b):
    x = b
    for _ in range(chain):
        x = se.spmm_edge_tiles(mat, x)
        x = x * (1.0 / jnp.float32(deg))  # keep magnitudes bounded
    return jnp.sum(x)


float(chained(mat, b))  # compile
times = []
for _ in range(3):
    t0 = time.perf_counter()
    float(chained(mat, b))
    times.append(time.perf_counter() - t0)
t = (min(times) - 0.0265) / chain
gedges = g.nnz / t / 1e9
cyc = t * 0.94e9 / mat.idx.size
print(
    f"per-SpMM: {t*1e3:.2f} ms = {gedges:.3f} Gedge/s "
    f"({cyc:.2f} cyc/slot, {t*0.94e9/g.nnz:.2f} cyc/edge)",
    flush=True,
)
