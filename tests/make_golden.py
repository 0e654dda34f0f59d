"""Generate the cora-like golden-file fixture (run once; checked in).

Replicates the reference's golden-file scheme (test/test_gcn.cpp:37-96,
disabled there for lack of the cora_v2 dumps): a small dataset directory
plus per-layer weight files ``0.bin..5.bin``, per-layer forward outputs
``o0..o2.bin`` and weight/bias gradients ``g0..g5.bin`` (parity mode) and
``eg0..eg5.bin`` (exact mode) — all produced by the **independent PyTorch
oracle** (tests/torch_oracle.py, a clean-room transcription of gcn.hpp;
exact-mode gradients come from torch *autograd*), written in the reference
raw dense format. This mirrors the reference's use of PyTorch dumps as
framework-independent ground truth.

Usage: python tests/make_golden.py [out_dir]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mg_gcn_tpu import sparse  # noqa: E402
from mg_gcn_tpu.formats import Dataset, write_dense  # noqa: E402
from mg_gcn_tpu.nn import init as init_lib  # noqa: E402
from tests import torch_oracle  # noqa: E402

SIZES = (16, 16, 16, 7)  # mirrors the reference's cora test: X.m, 16, 16, labels
N = 256
SEED = 123


def main(out_dir="tests/data/golden"):
    rng = np.random.default_rng(SEED)
    g = sparse.random_graph(N, 4, seed=SEED, weights="ones")
    x = rng.standard_normal((N, SIZES[0])).astype(np.float32)
    y = rng.integers(0, SIZES[-1], N).astype(np.int32)
    sets = rng.choice([0, 1, 2], N).astype(np.int32)

    ds = Dataset(
        graph=g,
        features=x,
        labels=y.reshape(-1, 1),
        sets=sets.reshape(-1, 1),
    )
    os.makedirs(out_dir, exist_ok=True)
    ds.save(out_dir)

    params = [
        dict(
            W=init_lib.kaiming_uniform_ref(SIZES[i], SIZES[i + 1], seed=99 + i).astype(
                np.float64
            ),
            b=init_lib.bias_ref(SIZES[i + 1], seed=199 + i).astype(np.float64),
        )
        for i in range(3)
    ]

    a_hat = sparse.normalize(g, axis=True)
    a_hat_t = sparse.transpose(a_hat)
    acts, loss, acc, grads = torch_oracle.run_parity(
        a_hat.to_dense(), a_hat_t.to_dense(), params, x, y
    )
    _, eloss, _, egrads = torch_oracle.run_exact(
        a_hat_t.to_dense(), params, x, y
    )
    assert abs(loss - eloss) < 1e-10  # same forward, different backward

    for i in range(3):
        write_dense(os.path.join(out_dir, f"{2 * i}.bin"), params[i]["W"], np.float32)
        write_dense(
            os.path.join(out_dir, f"{2 * i + 1}.bin"),
            params[i]["b"].reshape(1, -1),
            np.float32,
        )
        write_dense(os.path.join(out_dir, f"o{i}.bin"), acts[i].numpy(), np.float32)
        write_dense(
            os.path.join(out_dir, f"g{2 * i}.bin"), grads[i]["W"].numpy(), np.float32
        )
        write_dense(
            os.path.join(out_dir, f"g{2 * i + 1}.bin"),
            grads[i]["b"].numpy().reshape(1, -1),
            np.float32,
        )
        write_dense(
            os.path.join(out_dir, f"eg{2 * i}.bin"), egrads[i]["W"].numpy(), np.float32
        )
        write_dense(
            os.path.join(out_dir, f"eg{2 * i + 1}.bin"),
            egrads[i]["b"].numpy().reshape(1, -1),
            np.float32,
        )
    with open(os.path.join(out_dir, "loss.txt"), "w") as f:
        f.write(repr(float(loss)))
    print(f"wrote torch-oracle golden fixture to {out_dir} (loss={loss})")


if __name__ == "__main__":
    main(*sys.argv[1:])
