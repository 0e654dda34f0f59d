"""Block-sparse plane-mask kernel vs dense-pattern kernel on structured graphs."""

import os
import sys
import time

import numpy as np
import scipy.sparse as ss

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 131_072
D = 128


def banded(n, deg=6, half=512, seed=0):
    rng = np.random.default_rng(seed)
    src = np.arange(n, dtype=np.int64).repeat(deg)
    dst = np.clip(src + rng.integers(-half, half + 1, src.size), 0, n - 1)
    m = ss.csr_matrix((np.ones(src.size, np.float32), (src, dst)), shape=(n, n))
    m.data[:] = 1.0
    return m


def clustered(n, k=16, deg=12, p_bg=0.02, seed=1):
    rng = np.random.default_rng(seed)
    c = n // k
    src = rng.integers(0, n, n * deg)
    off = rng.integers(0, c, n * deg)
    dst = (src // c) * c + off
    bg = rng.random(n * deg) < p_bg
    dst[bg] = rng.integers(0, n, bg.sum())
    m = ss.csr_matrix((np.ones(src.size, np.float32), (src, dst)), shape=(n, n))
    m.data[:] = 1.0
    return m


CHAIN = 10


def timeit(spmm, mat, b):
    """Per-application seconds with the ~26 ms tunnel dispatch amortized:
    chain CHAIN dependent applications inside one jit."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(mat, b):
        for _ in range(CHAIN):
            b = spmm(mat, b) * (1.0 / CHAIN)  # keep magnitudes bounded
        return jnp.sum(b)

    float(chained(mat, b))  # compile + force
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = chained(mat, b)
        float(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) / CHAIN


def main():
    import jax.numpy as jnp

    from mg_gcn_tpu.formats import CSRData
    from mg_gcn_tpu.ops import spmm_pattern as sp
    from mg_gcn_tpu.ops import spmm_pattern_sparse as sps

    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.random((N, D), np.float32))
    for name, m in [("banded", banded(N)), ("clustered", clustered(N))]:
        g = CSRData.from_scipy(m)
        dt0 = time.time()
        fwd_d, bwd_d = sp.pattern_pair_from_binary_csr(g, dtype="bfloat16")
        td_f = timeit(sp.spmm_pattern, fwd_d, b)
        td_b = timeit(sp.spmm_pattern, bwd_d, b)
        print(
            f"[{name}] nnz={g.nnz} dense fwd={td_f*1e3:.2f}ms bwd={td_b*1e3:.2f}ms",
            file=sys.stderr,
        )
        for tile_r in (512, 1024, 2048):
            dt0 = time.time()
            fwd_b, bwd_b = sps.block_pattern_pair_from_binary_csr(
                g, dtype="bfloat16", tile_r=tile_r
            )
            tb_f = timeit(sps.spmm_block_pattern, fwd_b, b)
            tb_b = timeit(sps.spmm_block_pattern, bwd_b, b)
            print(
                f"[{name}] tile_r={tile_r} tile_occ={fwd_b.occupancy:.4f} "
                f"plane_occ={fwd_b.plane_occ:.4f} steps={fwd_b.fwd_tile.shape[0]} "
                f"build={time.time()-dt0:.1f}s | "
                f"fwd={tb_f*1e3:.2f}ms ({td_f/tb_f:.1f}x) "
                f"bwd={tb_b*1e3:.2f}ms ({td_b/tb_b:.1f}x)",
                file=sys.stderr,
            )


if __name__ == "__main__":
    main()
