"""Compile-and-run every Pallas kernel family ON REAL TPU at tiny shapes.

The CPU test suite runs the kernels under the interpreter, which accepts
programs Mosaic later rejects on v5e (round-5 example: the int8 SDDMM's
int8×int8 vector multiply was latent for a whole round because only
interpret-mode tests exercised it). This smoke is the hardware-legalization
gate: every engine × dtype × mode compiles and produces finite numbers in
one short run. Use after ANY kernel change (see .claude/skills/verify).

Exit code 0 = all kernels legalized and ran.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "mg_gcn_tpu", "jax"),
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import scipy.sparse as sp  # noqa: E402

from mg_gcn_tpu import sparse as hs  # noqa: E402
from mg_gcn_tpu.formats import CSRData  # noqa: E402

assert jax.default_backend() in ("tpu", "axon"), (
    f"hardware smoke needs a TPU backend, got {jax.default_backend()}"
)

rng = np.random.default_rng(0)
FAILED = []


def check(tag, fn):
    t0 = time.time()
    try:
        v = float(fn())
        ok = np.isfinite(v)
        print(f"[{'ok' if ok else 'NAN'}] {tag:42s} {v:.4e}  ({time.time()-t0:.1f}s)")
        if not ok:
            FAILED.append(tag)
    except Exception as e:  # noqa: BLE001 - report every failure, run all
        print(f"[FAIL] {tag}: {str(e)[:300]}")
        FAILED.append(tag)


def weighted_csr(n, density=0.01, seed=0, positive=False):
    m = sp.random(n, n, density=density, format="csr", random_state=seed,
                  dtype=np.float32)
    m.data[:] = np.abs(m.data) + 0.1 if positive else m.data * 2 - 0.5
    return CSRData.from_scipy(m)


N = 3000
g_bin = hs.random_graph(N, 6, seed=1)  # binary
g_w = weighted_csr(N, seed=2)
g_pos = weighted_csr(N, seed=3, positive=True)
x = jnp.asarray(rng.standard_normal((N, 64)).astype(np.float32))

# --- dense-pattern MXU kernel (bf16 / f32 / int8) -------------------------
from mg_gcn_tpu.ops import spmm_pattern as spt  # noqa: E402

n_pad = spt.round_up(N, spt.N_ALIGN)
pack = spt.pack_bits_on_device(g_bin, n_pad)
for dt in ("bfloat16", "float32", "int8"):
    mat = spt.PatternMat(
        pack, jnp.asarray(spt.row_scale(g_bin, n_pad)), N, n_pad, g_bin.nnz,
        "PT", "pre", dt,
    )
    check(f"pattern {dt}", lambda mat=mat: jnp.sum(spt.spmm_pattern(mat, x)))

# --- block-sparse pattern kernel ------------------------------------------
from mg_gcn_tpu.ops import spmm_pattern_sparse as sps  # noqa: E402

bmat, bmat_b = sps.block_pattern_pair_from_binary_csr(g_bin, dtype="bfloat16")
check("block-pattern bf16 fwd", lambda: jnp.sum(sps.spmm_block_pattern(bmat, x)))
check("block-pattern bf16 bwd", lambda: jnp.sum(sps.spmm_block_pattern(bmat_b, x)))

# --- edge-tile kernel: fwd bf16/f32/int8, transposed, split ---------------
from mg_gcn_tpu.ops import spmm_edges as se  # noqa: E402

for dt in ("bfloat16", "float32", "int8"):
    emat = se.edge_tile_mat_from_csr(g_w if dt != "int8" else g_pos, dtype=dt)
    check(
        f"edge-tile fwd {dt}",
        lambda emat=emat: jnp.sum(se.spmm_edge_tiles(emat, x)),
    )
emat_f = se.edge_tile_mat_from_csr(g_w, dtype="float32", br=512)
tsched = se.transposed_schedule(emat_f)
check(
    "edge-tile transposed f32",
    lambda: jnp.sum(se.spmm_edge_tiles_t(emat_f, tsched, x)),
)
# forced multi-part split (the headline-GAT fit): needs several column
# windows (BCW = 4096) to partition
mw = sp.random(600, 8 * se.BCW, density=0.004, format="csr", random_state=4,
               dtype=np.float32)
mw.data[:] = mw.data * 2 - 0.5
wide = se.edge_tile_mat_from_csr(CSRData.from_scipy(mw), dtype="float32")
words = se.transposed_step_words(np.asarray(wide.meta), wide.tcw_bits,
                                 wide.n_in_pad)
_saved = se.MAX_STEPS
try:
    se.MAX_STEPS = max(8, words // 2 + 2)
    parts = se.transposed_schedule(wide, auto_split=True)
finally:
    se.MAX_STEPS = _saved
xa = jnp.asarray(rng.standard_normal((600, 64)).astype(np.float32))
if isinstance(parts, tuple):
    check(
        f"edge-tile transposed split x{len(parts)}",
        lambda: jnp.sum(se.spmm_edge_tiles_t(wide, parts, xa)),
    )

# --- SDDMM: bf16 / f32 / int8, one-level, q-skip record kernel ------------
from mg_gcn_tpu.ops import sddmm as sd  # noqa: E402

for dt in ("bfloat16", "float32", "int8"):
    smat = se.edge_tile_mat_from_csr(
        g_w if dt != "int8" else g_pos, dtype=dt, br=512
    )
    check(
        f"sddmm {dt}",
        lambda smat=smat: jnp.sum(sd.sddmm_edge_tiles(smat, x, x)),
    )
check(
    "sddmm one-level select",
    lambda: jnp.sum(sd.sddmm_edge_tiles(emat_f, x, x, select="one")),
)
check(
    "sddmm q-range kernel (record)",
    lambda: jnp.sum(sd.sddmm_edge_tiles(emat_f, x, x, qskip=True)),
)

# --- attention pipeline gradients (custom VJPs over all three kernels) ----
from mg_gcn_tpu.ops import edge_attention as ea  # noqa: E402

amat, asched = ea.build_attention_graph(g_bin, dtype="bfloat16")


def attn_loss(a):
    s = ea.sddmm(amat, asched, a, a)
    alpha = ea.slot_softmax(amat, asched, s)
    return jnp.sum(ea.spmm_attn(amat, asched, alpha, a) ** 2)


check("attention fwd+bwd bf16", lambda: jnp.sum(jax.grad(attn_loss)(x)))

# --- serial-gather kernel: weighted/binary, banked on/off, bf16 stream ----
from mg_gcn_tpu.ops import spmm_gather as sg  # noqa: E402

gm_w = sg.gather_mat_from_csr(g_w)
gm_b, _ = sg.gather_pair_from_binary_csr(g_bin)
check("gather weighted f32", lambda: jnp.sum(sg.spmm_gather(gm_w, x)))
check("gather binary+scale", lambda: jnp.sum(sg.spmm_gather(gm_b, x)))
check(
    "gather bf16 stream",
    lambda: jnp.sum(sg.spmm_gather(gm_w, x, stream_bf16=True)),
)

# --- pagerank chunk (scan over the pattern SpMV) --------------------------
from mg_gcn_tpu.models.pagerank import pagerank  # noqa: E402

check("pagerank pattern path", lambda: jnp.sum(jnp.asarray(pagerank(g_bin))))

print(f"\n{len(FAILED)} failures" + (f": {FAILED}" if FAILED else " — all kernels legalize on this chip"))
sys.exit(1 if FAILED else 0)
