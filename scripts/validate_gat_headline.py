"""Headline-scale GAT convergence evidence (round 5): the 2-layer 2-head
GAT at full Reddit scale (n=233k, nnz=113.5M) on the split transposed
schedule, trained for N epochs on the planted 41-community task. Reuses
the bench's cached graph + edge schedule."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from mg_gcn_tpu.formats import CSRData
from mg_gcn_tpu.models import gat as gat_mod
from mg_gcn_tpu.nn import adam
from mg_gcn_tpu.ops import spmm_edges as se
from mg_gcn_tpu.sparse import planted_features

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache")
EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 30

t0 = time.time()
with np.load(os.path.join(CACHE, "pg_232968_493_41.npz")) as gg:
    comm = gg["comm"]
gspath = [f for f in os.listdir(CACHE) if f.startswith("gat_headline_sched_")][0]
with np.load(os.path.join(CACHE, gspath)) as dd:
    hsched = {k: dd[k] for k in dd.files}
hmat = se.edge_tile_mat_from_host(hsched)
hgraph = (hmat, se.transposed_schedule(hmat, auto_split=True))
print(f"graph up in {time.time()-t0:.0f}s parts={len(hgraph[1])}", file=sys.stderr)
hconfig = gat_mod.GATConfig(sizes=(64, 64, 41), heads=2)
hx = jnp.asarray(planted_features(comm, 64, noise=2.0, seed=8))
hy = jnp.asarray(comm.astype(np.int32))
params = gat_mod.init_params(hconfig, jax.random.key(0))
opt = adam.adam_init(params)

@jax.jit
def step(params, opt, hgraph, hx, hy):
    loss, acc, grads = gat_mod.loss_and_grad(params, hgraph, hx, hy, hconfig)
    params, opt = adam.adam_update(params, grads, opt)
    return params, opt, loss, acc

for e in range(EPOCHS):
    t1 = time.perf_counter()
    params, opt, loss, acc = step(params, opt, hgraph, hx, hy)
    print(f"epoch {e}: loss={float(loss):.4f} acc={float(acc):.4f} "
          f"{time.perf_counter()-t1:.2f}s", flush=True)
