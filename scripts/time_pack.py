"""Breakdown of pattern-pack setup time on the real chip."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 232_968
AVG_DEG = 493
CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache")


def main():
    import jax
    import jax.numpy as jnp

    from mg_gcn_tpu.formats import CSRData
    from mg_gcn_tpu.ops import spmm_pattern as sp

    path = os.path.join(CACHE, f"rg_{N}_{AVG_DEG}.npz")
    t0 = time.time()
    with np.load(path) as d:
        g = CSRData(d["indptr"], d["indices"], d["data"], (N, N))
    print(f"load: {time.time()-t0:.1f}s", file=sys.stderr)

    n_pad = sp.round_up(N, sp.N_ALIGN)
    words = n_pad // 32
    rows_per = n_pad // 8
    indptr = g.indptr.astype(np.int64)

    # host prep only
    t0 = time.time()
    staged_np = []
    for c in range(8):
        r0 = min(c * rows_per, N)
        r1 = min(r0 + rows_per, N)
        e0, e1 = int(indptr[r0]), int(indptr[r1])
        cols = g.indices[e0:e1].astype(np.int32, copy=False)
        lo = cols.astype(np.uint16)
        hi = (cols >> 16).astype(np.uint8)
        ptr = (indptr[r0 : r1 + 1] - e0).astype(np.int32)
        staged_np.append((lo, hi, ptr))
    print(f"host prep: {time.time()-t0:.1f}s", file=sys.stderr)

    # transfers only
    t0 = time.time()
    dev = []
    for lo, hi, ptr in staged_np:
        dev.append((jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(ptr)))
    jax.block_until_ready(dev)
    float(dev[-1][0][0])  # force (block_until_ready is a no-op on axon)
    print(f"transfers: {time.time()-t0:.1f}s", file=sys.stderr)

    # full build (includes compile on first call)
    t0 = time.time()
    pack = sp.pack_bits_on_device(g, n_pad)
    int(pack[0, 0])
    print(f"pack_bits_on_device total: {time.time()-t0:.1f}s", file=sys.stderr)

    # second build: no compile
    t0 = time.time()
    pack2 = sp.pack_bits_on_device(g, n_pad)
    int(pack2[0, 0])
    print(f"pack_bits_on_device warm: {time.time()-t0:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
