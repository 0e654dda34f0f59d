"""papers100M config-3 end-to-end at true scale (VERDICT r2 #3).

Builds BASELINE config 3's halo_gather distributed pair at P=16 on a graph
with papers100M's node-count geometry (n≈1.11e8; the reference's whole
reason to exist is graphs this size — SURVEY §5, comm-volume tooling at
/root/reference/test/data/prep.py:232-272), validating that every
per-device serial-gather schedule fits the single-chip SMEM caps at
m_loc ≈ 6.9M (the NOTES round-3 item: caps pass only at P≥16), then

1. reports the measured halo exchange bytes against the communication-
   volume lower bound (sparse.comm_volume — the reference's prep.py -c);
2. writes the dataset in the reference binary formats and runs one
   training epoch through the CLI's huge-graph path (-P 16 --impl halo
   --mmap) on a 16-virtual-device CPU mesh, reporting peak RSS.

The halo_gather pair's *execution* is numerics-tested at small scale
(tests/test_papers_p16.py runs it on a real 16-device CPU mesh); running
the Pallas gather kernel in interpret mode over 7e8 edges is not feasible
on CPU, so the full-scale train step uses the XLA local engine with the
SAME exchange structure (identical send_idx/round_widths — asserted in
tests/test_dist_halo_gather.py).

Graph: mostly-local (banded ±2000 with 15% uniform long-range edges) —
papers100M is a citation graph whose natural orderings are strongly local.
Rows are generated pre-sorted with explicit self-loops so no O(nnz log nnz)
host sort is needed at 7e8 edges.

Usage: python scripts/papers_p16.py [n] [deg] [d] [out_dir]
"""

import os
import resource
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mg_gcn_tpu import sparse  # noqa: E402
from mg_gcn_tpu.formats import CSRData, write_dense, write_pigo_csr  # noqa: E402

PARTS = 16


def make_graph(n: int, deg: int, seed: int = 0) -> CSRData:
    """(deg+1) edges per row, row-major generation (no global sort): a
    self-loop + deg neighbors, 85% banded (±2000), 15% uniform."""
    rng = np.random.default_rng(seed)
    k = deg + 1
    dst = np.empty((n, k), np.int32)
    dst[:, 0] = np.arange(n, dtype=np.int32)
    chunk = 1 << 22
    for r0 in range(0, n, chunk):
        rows = min(chunk, n - r0)
        base = np.arange(r0, r0 + rows, dtype=np.int64)[:, None]
        off = rng.integers(-2000, 2001, size=(rows, deg), dtype=np.int64)
        local = np.clip(base + off, 0, n - 1)
        uni = rng.integers(0, n, size=(rows, deg), dtype=np.int64)
        pick = rng.random((rows, deg)) < 0.85
        dst[r0 : r0 + rows, 1:] = np.where(pick, local, uni).astype(np.int32)
    indptr = np.arange(n + 1, dtype=np.int64) * k
    return CSRData(
        indptr=indptr,
        indices=dst.reshape(-1),
        data=np.ones(n * k, np.float32),
        shape=(n, n),
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 111_060_000
    deg = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    out = sys.argv[4] if len(sys.argv) > 4 else "/tmp/papers_p16"
    assert n % PARTS == 0
    import jax

    jax.config.update("jax_platforms", "cpu")

    t0 = time.time()
    g = make_graph(n, deg)
    print(f"graph: n={n} nnz={g.nnz} in {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    a = sparse.normalize(g, axis=True)
    a_t = sparse.transpose(a)
    print(f"normalize+transpose: {time.time()-t0:.0f}s", flush=True)

    # 1) the P=16 halo_gather pair — per-device serial-gather schedules at
    # m_loc = n/16; the build raises if any block exceeds the SMEM caps
    from mg_gcn_tpu.parallel import dist_halo

    t0 = time.time()
    pair = dist_halo.DistHaloPair.from_csr_pair(a_t, a, PARTS, engine="gather")
    fwd = pair.fwd
    assert isinstance(fwd, dist_halo.DistHaloGatherMat)
    loc_steps = int(fwd.loc_meta.shape[1])
    rem_steps = [int(m.shape[1]) for m in fwd.rem_meta]
    idx_bytes = fwd.loc_idx.size * 4 + sum(i.size * 4 for i in fwd.rem_idx)
    sc_edges = int((np.asarray(fwd.sc_vals) != 0).sum())
    print(
        f"halo_gather pair built in {time.time()-t0:.0f}s: m_loc={n//PARTS}, "
        f"loc_steps={loc_steps}, rem_steps(max)={max(rem_steps)}, "
        f"schedule idx bytes={idx_bytes/1e9:.2f} GB (x2 for w), "
        f"scatter remainder {sc_edges} edges "
        f"({sc_edges/max(g.nnz,1):.1%} of nnz — thin groups on the XLA path)",
        flush=True,
    )

    # 2) measured exchange vs the comm-volume lower bound. The halo build
    # ships each referenced remote row once per (src, dst) pair — exactly
    # the lower bound; the padded round widths add the stacking overhead.
    part = sparse.uniform_partition(n, PARTS)
    t0 = time.time()
    vol = sparse.comm_volume(a_t, part)
    bound_rows = int(vol.sum() - np.trace(vol))
    measured_rows = int(fwd.halo_total)
    padded_rows = int(sum(fwd.round_widths)) * PARTS
    print(
        f"comm volume ({time.time()-t0:.0f}s): lower bound {bound_rows} rows "
        f"/SpMM, halo moves {measured_rows} (ratio "
        f"{measured_rows/max(bound_rows,1):.4f}), padded rounds ship "
        f"{padded_rows} ({padded_rows/max(bound_rows,1):.2f}x); "
        f"{padded_rows*d*4/1e9:.2f} GB/SpMM at d={d} "
        f"(dense bcast would ship {n*(PARTS-1)*d*4/1e9:.0f} GB)",
        flush=True,
    )
    del pair, fwd, vol

    # 3) dataset on disk (reference binary formats) + 1 epoch through the
    # CLI huge-graph path: -P 16 --impl halo --mmap on 16 virtual devices
    if not os.path.exists(os.path.join(out, "graph.bin")):
        os.makedirs(out, exist_ok=True)
        t0 = time.time()
        write_pigo_csr(os.path.join(out, "graph.bin"), g)
        rng = np.random.default_rng(1)
        with open(os.path.join(out, "features.bin"), "wb") as f:
            np.asarray([n, d], np.uint32).tofile(f)
            for r0 in range(0, n, 1 << 21):
                rows = min(1 << 21, n - r0)
                f.write(rng.standard_normal((rows, d)).astype(np.float32).tobytes())
        labels = rng.integers(0, 16, n).astype(np.uint32)
        write_dense(os.path.join(out, "labels.bin"), labels.reshape(-1, 1), np.uint32)
        write_dense(
            os.path.join(out, "sets.bin"),
            rng.choice([0, 1, 2], n).astype(np.uint32).reshape(-1, 1),
            np.uint32,
        )
        gb = sum(
            os.path.getsize(os.path.join(out, f))
            for f in ("graph.bin", "features.bin", "labels.bin", "sets.bin")
        ) / 1e9
        print(f"dataset on disk: {gb:.2f} GB in {time.time()-t0:.0f}s", flush=True)
    del g, a, a_t

    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={PARTS}",
        MG_GCN_GATHER_CAP=str(128 << 20),
    )
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; from mg_gcn_tpu.cli import main; sys.exit(main(sys.argv[1:]))"
    )
    args = [
        sys.executable, "-c", code,
        "-P", str(PARTS), "-R", "1", "-E", "1", "--impl", "halo", "--mmap",
        "train", out, "1", "32",
    ]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    t0 = time.time()
    proc = subprocess.Popen(
        args, env=env, cwd=repo,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    for line in proc.stdout:
        print("  |", line.rstrip(), flush=True)
    proc.wait()
    print(
        f"P=16 train epoch: {time.time()-t0:.0f}s wall, exit {proc.returncode}, "
        f"peak child RSS "
        f"{resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss/1e6:.1f} GB",
        flush=True,
    )
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
