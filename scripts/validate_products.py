"""Products-config (BASELINE config 2) convergence evidence (VERDICT r4 #5).

Trains the bench's exact products problem (planted 48-community graph at
ogbn-products scale, noise-4.0 features, 3x256 GCN) to convergence on the
real chip, reusing the bench's cached graph + gather schedules so the run
costs epochs only. Prints the accuracy trajectory; the PERF.md entry records
the endpoint (the bench's 3 epochs are a startup-slope sample, not the
converged accuracy — this run is the "does config 2 train" record).

Usage: python scripts/validate_products.py [epochs]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from mg_gcn_tpu.formats import CSRData  # noqa: E402
from mg_gcn_tpu.models.gcn import GCNConfig, init_params  # noqa: E402
from mg_gcn_tpu.nn import adam  # noqa: E402
from mg_gcn_tpu.ops.spmm import AggPair  # noqa: E402
from mg_gcn_tpu.ops.spmm_gather import gather_mat_from_host  # noqa: E402
from mg_gcn_tpu.train import make_train_step  # noqa: E402

CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache"
)
EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 30

t0 = time.time()
with np.load(os.path.join(CACHE, "products_pg_2449029_50_48.npz")) as gg:
    pcomm = gg["comm"]
    n = gg["indptr"].shape[0] - 1
    graph = CSRData(gg["indptr"], gg["indices"], gg["data"], (n, n))
with np.load(
    os.path.join(CACHE, "products_gather_bin_124879776_v3-2048-12-14.npz")
) as dd:
    fs = {k[2:]: dd[k] for k in dd.files if k.startswith("f_")}
    bs = {k[2:]: dd[k] for k in dd.files if k.startswith("b_")}
cs = np.bincount(graph.indices.astype(np.int64), minlength=graph.ncols).astype(
    np.float32
)
inv_cs = 1.0 / np.maximum(cs, 1.0)
from dataclasses import replace

pair = AggPair(
    replace(
        gather_mat_from_host(fs, scale=inv_cs, scale_side="post"),
        stream_bf16=True,
    ),
    replace(
        gather_mat_from_host(bs, scale=inv_cs, scale_side="pre"),
        stream_bf16=True,
    ),
)
print(f"pair up in {time.time()-t0:.0f}s", file=sys.stderr)

# the bench's feature/label generator
from mg_gcn_tpu.sparse import planted_features  # noqa: E402

x = jnp.asarray(planted_features(pcomm, 100, noise=4.0, seed=4))
y = jnp.asarray(pcomm.astype(np.int32))
config = GCNConfig(sizes=(100, 256, 256, 48))
params = init_params(config)
opt = adam.adam_init(params)
step = make_train_step(config)
for e in range(EPOCHS):
    t1 = time.perf_counter()
    params, opt, loss, acc = step(params, opt, pair, x, y, None)
    loss = float(loss)
    print(
        f"epoch {e}: loss={loss:.4f} acc={float(acc):.4f} "
        f"{time.perf_counter()-t1:.2f}s",
        flush=True,
    )
