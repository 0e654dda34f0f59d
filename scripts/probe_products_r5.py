"""Round-5 products SpMM probe: where do the 674 ms (d=128) / 1071 ms
(d=256) go, and does d-chunking at 128 lanes (which keeps the second
accumulator bank inside the VMEM scope) beat the one-call unbanked d=256?

Run on the real chip: python scripts/probe_products_r5.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mg_gcn_tpu.ops import spmm_gather as sg  # noqa: E402

CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache"
)

t0 = time.time()
with np.load(
    os.path.join(CACHE, "products_gather_bin_124879776_v3-2048-12-14.npz")
) as dd:
    fs = {k[2:]: dd[k] for k in dd.files if k.startswith("f_")}
mat = sg.gather_mat_from_host(fs)
NNZ = mat.nnz
print(
    f"loaded+uploaded in {time.time()-t0:.1f}s: steps={mat.num_steps} "
    f"r_rows={mat.r_rows} pairfrac={mat.pairfrac:.2f}",
    file=sys.stderr,
)

rng = np.random.default_rng(0)
CHAIN = 3


def timeit(tag, d, banked, stream, d_max):
    old_dmax = sg.D_MAX_G
    sg.D_MAX_G = d_max
    try:
        b = jnp.asarray(rng.standard_normal((mat.n_in, d)).astype(np.float32))

        @jax.jit
        def chain(mat, b):
            out = b
            for _ in range(CHAIN):
                d_pad = sg.round_up(max(out.shape[1], 128), 128)
                wire_t = jnp.bfloat16 if stream else jnp.float32
                b_pad = jnp.zeros((mat.n_in_pad, d_pad), wire_t)
                b_pad = b_pad.at[: out.shape[0], : out.shape[1]].set(
                    out.astype(wire_t)
                )
                out = sg._gather_call(mat, b_pad, banked=banked)[: mat.n_out, :d]
            return jnp.sum(out)

        r = float(chain(mat, b))  # compile + run
        t1 = time.perf_counter()
        r = float(chain(mat, b))
        dt = (time.perf_counter() - t1) / CHAIN
        cyc = dt * 940e6 / NNZ * 128 / 128  # v5e scalar core ~940 MHz
        print(
            f"{tag:42s} d={d:3d} banked={int(banked)} stream={int(stream)} "
            f"dmax={d_max}: {dt*1e3:7.1f} ms/SpMM  "
            f"{NNZ/dt/1e9:.3f} Gedge/s"
        )
    finally:
        sg.D_MAX_G = old_dmax


variants = {
 "a": ("d128 one-call", 128, True, True, 256),
 "b": ("d128 one-call unbanked", 128, False, True, 256),
 "c": ("d256 one-call (status quo)", 256, True, True, 256),
 "d": ("d256 2x128 chunked banked", 256, True, True, 128),
 "e": ("d256 2x128 chunked unbanked", 256, False, True, 128),
 "f": ("d256 one-call f32 wire", 256, True, False, 256),
}
for key in sys.argv[1:] or list(variants):
    timeit(*variants[key])
