"""Kernel-variant probe for the serial-gather SpMM inner loop (real v5e).

Isolates the per-edge cost components: fori_loop overhead, the bwin dynamic
read, and the out-block read-modify-write. Variants run on the same built
schedule; only variant 0 is numerically meaningful.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mg_gcn_tpu import sparse
from mg_gcn_tpu.ops import spmm_gather as sg
from mg_gcn_tpu.ops.spmm_gather import E_BLK, LIVE_BITS, R_ROWS, W_BITS, W_ROWS

n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
deg = float(sys.argv[2]) if len(sys.argv) > 2 else 50
d = int(sys.argv[3]) if len(sys.argv) > 3 else 128
chain = 10

g = sparse.random_graph(n, avg_degree=deg, seed=0, weights="uniform")
# pair=False: the isolation variants below walk the all-singles layout
# (the shipped kernel's paired layout is probed via the public API)
mat = sg.gather_mat_from_host(sg.gather_schedule_host(g, pair=False))
print(f"n={n} nnz={g.nnz} d={d} steps={mat.num_steps} fill={mat.fill:.3f}", flush=True)
rng = np.random.default_rng(1)
b = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))


def make_kernel(variant, unroll):
    def kernel(meta_ref, idx_ref, w_ref, b_ref, out_ref):
        s = pl.program_id(0)
        m = meta_ref[s]

        @pl.when(((m >> LIVE_BITS) & 1) == 1)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        row8 = s % 8

        def body(i, _):
            v = idx_ref[row8, i]
            r = v >> W_BITS
            c = v & (W_ROWS - 1)
            wv = w_ref[row8, i]
            if variant == "full":
                row = b_ref[pl.ds(c, 1), :]
                acc = out_ref[pl.ds(r, 1), :]
                out_ref[pl.ds(r, 1), :] = acc + wv * row
            elif variant == "normw":  # write, no read back (breaks accum)
                row = b_ref[pl.ds(c, 1), :]
                out_ref[pl.ds(r, 1), :] = wv * row
            elif variant == "noout":  # gather only, fixed out row
                row = b_ref[pl.ds(c, 1), :]
                out_ref[0:1, :] = wv * row
            elif variant == "noread":  # scatter only, fixed in row
                row = b_ref[0:1, :]
                acc = out_ref[pl.ds(r, 1), :]
                out_ref[pl.ds(r, 1), :] = acc + wv * row
            elif variant == "scalar":  # loop + scalar reads only
                out_ref[0:1, 0:1] = (wv + v).reshape(1, 1) * jnp.ones((1, 1), jnp.float32)
            elif variant == "noidx":  # no w read: weight fixed
                row = b_ref[pl.ds(c, 1), :]
                acc = out_ref[pl.ds(r, 1), :]
                out_ref[pl.ds(r, 1), :] = acc + row
            elif variant == "noop":  # loop floor: no SMEM reads at all
                out_ref[0:1, 0:1] = jnp.full((1, 1), 1.0, jnp.float32)
            return 0

        def body_twophase(i, _):
            # phase 1: all scalar reads + bwin loads; phase 2: RMW accs
            base = i * unroll
            rcs = []
            gs = []
            for k in range(unroll):
                v = idx_ref[row8, base + k]
                r = v >> W_BITS
                c = v & (W_ROWS - 1)
                wv = w_ref[row8, base + k]
                rcs.append((r, wv))
                gs.append(b_ref[pl.ds(c, 1), :])
            for (r, wv), g in zip(rcs, gs):
                acc = out_ref[pl.ds(r, 1), :]
                out_ref[pl.ds(r, 1), :] = acc + wv * g
            return 0

        if unroll == 1:
            jax.lax.fori_loop(0, m & ((1 << LIVE_BITS) - 1), body, 0)  # live == ls here (pair=False)
        elif variant == "twophase":
            jax.lax.fori_loop(0, E_BLK // unroll, body_twophase, 0)
        else:
            # full-block walk (padding slots carry w=0) in unrolled strides
            def body_u(i, _):
                for k in range(unroll):
                    body(i * unroll + k, 0)
                return 0

            jax.lax.fori_loop(0, E_BLK // unroll, body_u, 0)

    return kernel


def run(variant, unroll):
    S = mat.num_steps
    win_bits = mat.win_bits
    win_mask = (1 << win_bits) - 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((8, E_BLK), lambda s, meta: (s // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, E_BLK), lambda s, meta: (s // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (W_ROWS, d),
                lambda s, meta: ((meta[s] >> (1 + LIVE_BITS)) & win_mask, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (R_ROWS, d),
            lambda s, meta: (meta[s] >> (win_bits + 1 + LIVE_BITS), 0),
            memory_space=pltpu.VMEM,
        ),
    )
    call = pl.pallas_call(
        make_kernel(variant, unroll),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mat.n_out_pad, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    @jax.jit
    def chained(mat, bp):
        x = bp
        for _ in range(chain):
            x = call(mat.meta, mat.idx, mat.w, x[: mat.n_in_pad]) * (
                1.0 / jnp.float32(deg)
            )
        return jnp.sum(x)

    b_pad = jnp.zeros((mat.n_in_pad, d), jnp.float32).at[:n].set(b)
    try:
        float(chained(mat, b_pad))
    except Exception as e:
        print(f"{variant} u{unroll}: FAILED {str(e)[:200]}", flush=True)
        return
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(mat, b_pad))
        times.append(time.perf_counter() - t0)
    t = (min(times) - 0.0265) / chain
    print(
        f"{variant} u{unroll}: {t*1e3:.2f} ms = {g.nnz/t/1e9:.3f} Gedge/s "
        f"({t*0.94e9/g.nnz:.2f} cyc/edge)",
        flush=True,
    )


import ast

cases = [
    ("full", 16),
    ("full", 32),
    ("noidx", 16),
    ("scalar", 16),
    ("noop", 16),
    ("noop", 1),
]
if len(sys.argv) > 4:
    cases = ast.literal_eval(sys.argv[4])
for variant, unroll in cases:
    run(variant, unroll)
