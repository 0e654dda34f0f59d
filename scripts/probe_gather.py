"""Hardware probe for the windowed serial-gather SpMM kernel (real v5e).

Checks Mosaic lowering + numerics vs scipy, then times chained SpMMs
(dispatch amortized; axon needs a forced host read to block). The regime of
interest is ultra-sparse (ogbn-products scale: density ~2e-5) where the
edge-tile kernel's slot fill collapses and the XLA gather path runs at
~90 ns/edge.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mg_gcn_tpu import sparse
from mg_gcn_tpu.ops import spmm_gather as sg

n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
deg = float(sys.argv[2]) if len(sys.argv) > 2 else 50
d = int(sys.argv[3]) if len(sys.argv) > 3 else 128
chain = 10

print(f"devices: {jax.devices()}", flush=True)
g = sparse.random_graph(n, avg_degree=deg, seed=0, weights="uniform")
print(f"graph n={n} nnz={g.nnz} d={d} density={g.nnz/n/n:.2e}", flush=True)

t0 = time.perf_counter()
mat = sg.gather_mat_from_csr(g)
jax.block_until_ready(mat.idx)
float(jnp.sum(mat.w))  # force
t1 = time.perf_counter()
print(
    f"build+transfer: {t1-t0:.1f} s; steps={mat.num_steps} fill={mat.fill:.3f} "
    f"slots={mat.idx.size}",
    flush=True,
)

rng = np.random.default_rng(1)
b = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))

t0 = time.perf_counter()
out = sg.spmm_gather(mat, b)
s0 = float(jnp.sum(out))
t1 = time.perf_counter()
print(f"first call (compile): {t1-t0:.1f} s", flush=True)
ref8 = g.to_scipy() @ np.asarray(b[:, :8])
got8 = np.asarray(out[:, :8])
err = float(np.max(np.abs(got8 - ref8)) / (np.max(np.abs(ref8)) + 1e-30))
print(f"rel err vs scipy (8 cols): {err:.2e}", flush=True)
assert err < 1e-4, f"numerics mismatch {err}"


@jax.jit
def chained(mat, b):
    x = b
    for _ in range(chain):
        x = sg.spmm_gather(mat, x)
        x = x * (1.0 / jnp.float32(deg))
    return jnp.sum(x)


float(chained(mat, b))  # compile
times = []
for _ in range(3):
    t0 = time.perf_counter()
    float(chained(mat, b))
    times.append(time.perf_counter() - t0)
t = (min(times) - 0.0265) / chain
gedges = g.nnz / t / 1e9
print(
    f"per-SpMM: {t*1e3:.2f} ms = {gedges:.3f} Gedge/s "
    f"({t*0.94e9/mat.idx.size:.2f} cyc/slot, {t*0.94e9/g.nnz:.2f} cyc/edge)",
    flush=True,
)
