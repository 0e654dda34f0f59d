"""BASELINE config 3 geometry: the halo_gather pair at P=16.

The papers100M configuration is row-partitioned across 16+ devices with
halo exchange and serial-gather local multiplies (scripts/papers_p16.py
builds it at true n≈1.11e8 scale). This test runs the same P=16 surface —
a 16-virtual-device CPU mesh needs its own subprocess because conftest
pins the suite to 8 — and asserts the distributed step's loss matches a
single-device step to f32 tolerance.
"""

import os
import subprocess
import sys

import pytest

# compile-heavy P=16 subprocess test: nightly-style full suite only
pytestmark = pytest.mark.slow

CODE = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import numpy as np
import jax.numpy as jnp
from mg_gcn_tpu import sparse
from mg_gcn_tpu.models.gcn import GCNConfig, init_params, loss_and_grad
from mg_gcn_tpu.nn import adam
from mg_gcn_tpu.ops.spmm import AggPair, COOMat
from mg_gcn_tpu.parallel import dist, dist_halo

parts, n = 16, 2048
g = sparse.random_graph(n, 4, seed=33, weights="random")
rng = np.random.default_rng(33)
x = jnp.asarray(rng.standard_normal((n, 6)).astype(np.float32))
y = jnp.asarray(rng.integers(0, 3, n).astype(np.int32))
a = sparse.normalize(g, axis=True)
a_t = sparse.transpose(a)
config = GCNConfig(sizes=(6, 8, 3))
params = init_params(config)
opt = adam.adam_init(params)

pair = AggPair(COOMat.from_csr(a_t), COOMat.from_csr(a))
loss1, acc1, _ = loss_and_grad(params, pair, x, y, config)

mesh = dist.make_mesh(parts)
hg_pair = dist_halo.DistHaloPair.from_csr_pair(a_t, a, parts, engine="gather")
assert isinstance(hg_pair.fwd, dist_halo.DistHaloGatherMat)
step = dist.make_dist_train_step(config, mesh, n, pair_kind="halo_gather")
_, _, loss2, acc2 = step(params, opt, hg_pair, x, y)
d_loss = abs(float(loss1) - float(loss2))
d_acc = abs(float(acc1) - float(acc2))
assert d_loss <= 1e-5, (float(loss1), float(loss2))
assert d_acc <= 1e-6, (float(acc1), float(acc2))
print("P16_OK", d_loss)
"""


def test_halo_gather_p16_matches_single():
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=16",
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-c", CODE],
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "P16_OK" in r.stdout
