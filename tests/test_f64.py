"""f64 numerics mode (parity with the reference's double kernel templates,
cuda_utils.cu:392-451): loss and gradients on the COO/XLA engine match a
float64 numpy oracle to 1e-12 relative. Runs in a subprocess because
jax_enable_x64 is process-global."""

import os

import pytest
import subprocess
import sys

CODE = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
from mg_gcn_tpu import sparse
from mg_gcn_tpu.models.gcn import GCNConfig, init_params, loss_and_grad
from mg_gcn_tpu.ops.spmm import AggPair, COOMat
from mg_gcn_tpu.train import build_agg_pair
import pytest

n, f, h, c = 96, 12, 24, 4  # layer0 out>in (agg-first), layer1 lin-first
g = sparse.random_graph(n, 5, seed=7, weights="random")
rng = np.random.default_rng(7)
x64 = rng.standard_normal((n, f))
y = rng.integers(0, c, n).astype(np.int32)
config = GCNConfig(sizes=(f, h, c))  # parity semantics (layer-0 grad skip)
params = init_params(config, dtype=jnp.float64)
pair = build_agg_pair(g, impl="xla", coo_val_dtype=np.float64)
assert pair.fwd.vals.dtype == jnp.float64

loss, acc, grads = loss_and_grad(
    params, pair, jnp.asarray(x64), jnp.asarray(y), config
)
assert jnp.asarray(loss).dtype == jnp.float64

# ---- float64 numpy oracle of the parity step ----
a = sparse.normalize(g, axis=True)          # f32 normalize (shared input)
A = a.to_dense().astype(np.float64)
AT = A.T
W = [np.asarray(p["W"], np.float64) for p in params]
B = [np.asarray(p["b"], np.float64) for p in params]
slope = 0.01

hs = [x64]
pre = []
hcur = x64
for i in range(2):
    lin_first = W[i].shape[1] <= W[i].shape[0]
    if lin_first:
        z = AT @ (hcur @ W[i] + B[i])
    else:
        z = (AT @ hcur) @ W[i] + B[i]
    if i == 0:
        z = np.where(z > 0, z, slope * z)
    pre.append(z)
    hcur = z
    hs.append(hcur)
logits = hcur
m = logits.max(axis=1, keepdims=True)
e = np.exp(logits - m)
p = e / e.sum(axis=1, keepdims=True)
nll = -np.log(p[np.arange(n), y])
loss_o = nll.mean()
acc_o = (p.argmax(1) == y).mean()
G = (p - np.eye(c)[y]) / n

# backward (parity: layer-0 backward SpMM + input grad skipped)
grads_o = []
g2 = G
for i in (1, 0):
    lin_first = W[i].shape[1] <= W[i].shape[0]
    t = g2
    if i == 0:
        t = np.where(pre[0] > 0, t, slope * t)
    if lin_first:
        g_hw = (A @ t) if i > 0 else t   # layer-0 skips the backward SpMM
        gW = hs[i].T @ g_hw
        gb = g_hw.sum(axis=0, keepdims=True)
        g2 = g_hw @ W[i].T
    else:
        # reference quirk: agg-first gW uses the raw layer input, not Â·H
        # (lin.setX(H), gcn.hpp:477) — replicated by the parity path
        gW = hs[i].T @ t
        gb = t.sum(axis=0, keepdims=True)
        g2 = A @ (t @ W[i].T) if i > 0 else None
    grads_o.append((gW, gb))
grads_o = grads_o[::-1]

rel = abs(float(loss) - loss_o) / abs(loss_o)
assert rel < 1e-12, rel
assert abs(float(acc) - acc_o) < 1e-12
for i, (gW, gb) in enumerate(grads_o):
    got_w = np.asarray(grads[i]["W"], np.float64)
    got_b = np.asarray(grads[i]["b"], np.float64)
    dw = np.abs(got_w - gW).max() / max(np.abs(gW).max(), 1e-300)
    db = np.abs(got_b - gb).max() / max(np.abs(gb).max(), 1e-300)
    assert dw < 1e-12, (i, dw)
    assert db < 1e-12, (i, db)
print("F64_OK", rel)
"""


@pytest.mark.slow
def test_f64_matches_numpy_oracle():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-c", CODE],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "F64_OK" in r.stdout
