"""papers100M-scale storage rehearsal (VERDICT r1 next-round #2).

Builds a synthetic huge graph on disk (n tens of millions, nnz hundreds of
millions — a scaled-down papers100M: n=111M nnz=1.6B), then trains one
epoch+ through the CLI's huge-graph path on an 8-virtual-device CPU mesh:

    --impl halo   per-round personalized ppermute of only referenced rows
    --mmap        features stream from disk per device shard (no full
                  materialization in host RAM)

and reports: dataset sizes, peak host RSS during training (must stay
O(nnz/P + n*d/P), far below full-materialization), halo comm volume vs a
dense bcast, and epoch times. CPU here is 2 cores — epoch *time* is not the
point; the storage path (memmap shards, O(nnz) pair build, bounded memory)
is what papers100M actually stresses.

Usage: python scripts/papers_rehearsal.py [n] [deg] [d] [out_dir]
"""

import os
import resource
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mg_gcn_tpu.formats import CSRData, write_dense, write_pigo_csr  # noqa: E402


def make_dataset(out_dir: str, n: int, deg: int, d: int, seed: int = 0) -> None:
    """Mostly-local graph (banded + 20% uniform long-range edges) so the
    halo exchange is meaningfully sparse, written in the reference binary
    formats. Feature payload is written in streamed chunks."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    nnz_target = n * deg
    src = rng.integers(0, n, size=nnz_target, dtype=np.int64)
    local = rng.random(nnz_target) < 0.8
    off = rng.integers(-2000, 2001, size=nnz_target, dtype=np.int64)
    dst = np.where(local, np.clip(src + off, 0, n - 1), rng.integers(0, n, size=nnz_target, dtype=np.int64))
    # add self loops, dedupe via sort over (src, dst)
    src = np.concatenate([src, np.arange(n, dtype=np.int64)])
    dst = np.concatenate([dst, np.arange(n, dtype=np.int64)])
    key = src * n + dst
    key = np.unique(key)
    src, dst = key // n, key % n
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(src, minlength=n), out=indptr[1:])
    csr = CSRData(
        indptr=indptr,
        indices=dst.astype(np.int32),
        data=np.ones(dst.shape[0], np.float32),
        shape=(n, n),
    )
    write_pigo_csr(os.path.join(out_dir, "graph.bin"), csr)
    print(f"graph written: n={n} nnz={csr.nnz}", flush=True)

    # stream features to disk in chunks (no (n, d) temporary)
    fpath = os.path.join(out_dir, "features.bin")
    with open(fpath, "wb") as f:
        np.asarray([n, d], np.uint32).tofile(f)
        chunk = 1 << 20
        for r0 in range(0, n, chunk):
            rows = min(chunk, n - r0)
            f.write(
                rng.standard_normal((rows, d)).astype(np.float32).tobytes()
            )
    labels = rng.integers(0, 16, n).astype(np.uint32)
    write_dense(os.path.join(out_dir, "labels.bin"), labels.reshape(-1, 1), np.uint32)
    write_dense(
        os.path.join(out_dir, "sets.bin"),
        rng.choice([0, 1, 2], n).astype(np.uint32).reshape(-1, 1),
        np.uint32,
    )
    gb = sum(
        os.path.getsize(os.path.join(out_dir, f))
        for f in ("graph.bin", "features.bin", "labels.bin", "sets.bin")
    ) / 1e9
    print(f"dataset on disk: {gb:.2f} GB at {out_dir}", flush=True)


CODE = (
    "import jax; jax.config.update('jax_platforms','cpu');"
    "import sys; from mg_gcn_tpu.cli import main; rc = main(sys.argv[1:]);"
    "import resource;"
    "print('RSSGB', resource.getrusage(resource.RUSAGE_SELF).ru_maxrss/1e6,"
    " flush=True); sys.exit(rc)"
)


def run_cli(out: str, procs: int, devs_per_proc: int, port: int):
    """Train 2 epochs through the CLI halo path. procs=1: the classic
    single-process build over 8 virtual devices. procs>1: the PRODUCTION
    slab path — each process runs `--multihost`, header-loads the graph,
    and builds only its own shards from graph.bin/graph_t.bin slabs
    (DistHaloPair.from_pigo). Returns (wall_s, per-process peak RSS list,
    ok)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    P = procs * devs_per_proc
    base_env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={devs_per_proc}",
        # virtual devices share host RAM: cap each device's materialized
        # SpMM gather at 256 MB (the TPU default is 2 GB of HBM)
        MG_GCN_GATHER_CAP=str(256 << 20),
    )
    base_env["PYTHONPATH"] = repo + os.pathsep + base_env.get("PYTHONPATH", "")
    args = [
        sys.executable, "-c", CODE,
        "-P", str(P), "-R", "1", "-E", "2", "--impl", "halo", "--mmap",
    ]
    if procs > 1:
        args.append("--multihost")
        base_env.update(
            MG_GCN_COORDINATOR=f"127.0.0.1:{port}",
            MG_GCN_NUM_PROCESSES=str(procs),
        )
    args += ["train", out, "1", "32"]
    t0 = time.time()
    # children log to FILES, not pipes: draining concurrent children's
    # pipes sequentially can deadlock when a later child fills its 64 KB
    # pipe while an earlier one is blocked in a collective (round-5 review)
    children, logs = [], []
    for pid in range(procs):
        env = dict(base_env)
        if procs > 1:
            env["MG_GCN_PROCESS_ID"] = str(pid)
        lf = open(os.path.join(out, f"rehearsal_proc{pid}.log"), "w+")
        logs.append(lf)
        children.append(
            subprocess.Popen(
                args, env=env, cwd=repo, stdout=lf, stderr=subprocess.STDOUT,
            )
        )
    rss, ok = [], True
    for pid, (proc, lf) in enumerate(zip(children, logs)):
        proc.wait()
        ok = ok and proc.returncode == 0
        lf.seek(0)
        for line in lf:
            line = line.rstrip()
            if line.startswith("RSSGB "):
                rss.append(float(line.split()[1]))
            print(f"  |{pid}| {line}", flush=True)
        lf.close()
    return time.time() - t0, rss, ok


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    deg = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    out = sys.argv[4] if len(sys.argv) > 4 else "/tmp/papers_rehearsal"
    if not os.path.exists(os.path.join(out, "graph.bin")):
        t0 = time.time()
        make_dataset(out, n, deg, d)
        print(f"generation: {time.time()-t0:.0f} s", flush=True)

    # slab-path prerequisite, built once (prep writes it for new datasets)
    from mg_gcn_tpu.formats import ensure_pigo_transpose

    t0 = time.time()
    ensure_pigo_transpose(out)
    print(f"graph_t.bin ready in {time.time()-t0:.0f} s", flush=True)

    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    # the PRODUCTION slab path: 2 processes x 4 devices, per-process RSS
    # must track ~(graph/P_procs + n*d/P + O(n) normalization diagonal),
    # NOT the full graph (VERDICT r4 #2c)
    print("=== slab path (2 processes x 4 devices, --multihost) ===", flush=True)
    wall2, rss2, ok2 = run_cli(out, 2, 4, port)
    print(
        f"slab path: wall {wall2:.0f} s ok={ok2} per-process peak RSS "
        f"{[f'{r:.1f}' for r in rss2]} GB",
        flush=True,
    )

    print("=== classic path (1 process x 8 devices, full-graph build) ===", flush=True)
    wall, rss1, ok1 = run_cli(out, 1, 8, 0)
    rss_child = max(rss1) if rss1 else float("nan")
    proc = type("R", (), {"returncode": 0 if ok1 else 1})()
    nnz = None
    print(f"classic path: wall {wall:.0f} s, exit {proc.returncode}", flush=True)
    print(f"classic peak RSS: {rss_child:.1f} GB", flush=True)
    full_feats = n * d * 4 / 1e9
    print(
        f"(features on disk: {full_feats:.1f} GB; an eager loader would hold "
        "all of it plus per-device copies)",
        flush=True,
    )
    if rss2 and rss1:
        print(
            f"RSS scaling: slab per-process {max(rss2):.1f} GB vs classic "
            f"{rss_child:.1f} GB ({rss_child / max(rss2):.2f}x)",
            flush=True,
        )
    sys.exit(0 if (ok1 and ok2) else 1)


if __name__ == "__main__":
    main()
