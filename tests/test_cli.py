"""CLI + checkpoint + graft-entry tests (driver-visible surfaces)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    XLA_FLAGS="--xla_force_host_platform_device_count=8",
    PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
)


def run_cli(args, cwd):
    # -c shim: the axon sitecustomize overrides JAX_PLATFORMS, so force cpu
    # through jax.config the way conftest does.
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; from mg_gcn_tpu.cli import main; sys.exit(main(sys.argv[1:]))"
    )
    return subprocess.run(
        [sys.executable, "-c", code, *args],
        env=ENV,
        cwd=cwd,
        capture_output=True,
        text=True,
        # the dist-GAT case compiles a 4-device mesh of slot-softmax rings
        # and takes ~260 s on an unloaded CPU — 300 s flaked under load
        timeout=540,
    )


@pytest.fixture(scope="module")
def toy(tmp_path_factory):
    d = "/root/reference/test/data/toyA"
    if not os.path.isdir(d):
        pytest.skip("toy data missing")
    return d


@pytest.mark.slow
def test_cli_train_single(toy, tmp_path):
    r = run_cli(["-E", "3", "train", toy, "1", "8"], cwd=tmp_path)
    assert r.returncode == 0, r.stderr
    lines = [l for l in r.stderr.splitlines() if l and l[0].isdigit()]
    assert len(lines) >= 3
    # epoch loss acc seconds
    parts = lines[-1].split()
    assert len(parts) == 4
    # timer CSV written
    csvs = list((tmp_path / "csvs").iterdir())
    assert csvs, "no timer csv written"


@pytest.mark.slow
def test_cli_train_dist(toy, tmp_path):
    r = run_cli(["-P", "4", "-R", "1", "-E", "2", "train", toy, "1", "8"], cwd=tmp_path)
    assert r.returncode == 0, r.stderr
    lines = [l for l in r.stderr.splitlines() if l and l[0].isdigit()]
    assert len(lines) >= 2


@pytest.mark.slow
def test_cli_train_dist_sage(toy, tmp_path):
    r = run_cli(
        ["-P", "4", "-R", "1", "-E", "2", "--model", "sage", "train", toy, "1", "8"],
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    lines = [l for l in r.stderr.splitlines() if l and l[0].isdigit()]
    assert len(lines) >= 2


@pytest.mark.slow
def test_cli_train_col_partition(toy, tmp_path):
    # -R 0: the column/tensor-parallel path (reference main.cpp:171-189,
    # commented out there; operational here via parallel/dist_col.py)
    r = run_cli(["-P", "4", "-R", "0", "-E", "2", "train", toy, "1", "8"], cwd=tmp_path)
    assert r.returncode == 0, r.stderr
    lines = [l for l in r.stderr.splitlines() if l and l[0].isdigit()]
    assert len(lines) >= 2


@pytest.mark.slow
def test_cli_residual(toy, tmp_path):
    r = run_cli(
        ["-E", "2", "--residual", "--exact", "train", toy, "2", "8", "12"],
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    lines = [l for l in r.stderr.splitlines() if l and l[0].isdigit()]
    assert len(lines) >= 2


@pytest.mark.slow
def test_cli_residual_dist(toy, tmp_path):
    r = run_cli(
        ["-P", "4", "-R", "1", "-E", "2", "--residual", "train", toy, "1", "8"],
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr


@pytest.mark.slow
def test_cli_sgd_optimizer(toy, tmp_path):
    r = run_cli(
        ["-E", "3", "--optimizer", "sgd", "train", toy, "1", "8"], cwd=tmp_path
    )
    assert r.returncode == 0, r.stderr
    lines = [l for l in r.stderr.splitlines() if l and l[0].isdigit()]
    losses = [float(l.split()[1]) for l in lines]
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_cli_sgd_dist(toy, tmp_path):
    r = run_cli(
        ["-P", "4", "-R", "1", "-E", "2", "--optimizer", "sgd", "train", toy, "1", "8"],
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr


@pytest.mark.slow
def test_cli_infer_dist(toy, tmp_path):
    # the last width rounds up to a multiple of P (main.cpp:135), so the
    # checkpoint must come from a run with the same P
    ck = tmp_path / "m.npz"
    r = run_cli(
        ["-P", "4", "-R", "1", "-E", "1", "--save", str(ck), "train", toy, "1", "8"],
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    r = run_cli(
        ["-P", "4", "-R", "1", "--load", str(ck), "infer", toy, "1", "8"],
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert "inference:" in r.stderr


@pytest.mark.slow
def test_cli_train_gat(toy, tmp_path):
    r = run_cli(
        ["-E", "2", "--model", "gat", "--heads", "2", "train", toy, "1", "8"],
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    lines = [l for l in r.stderr.splitlines() if l and l[0].isdigit()]
    assert len(lines) >= 2
    assert len(lines[-1].split()) == 4


@pytest.mark.slow
def test_cli_train_dist_gat(toy, tmp_path):
    r = run_cli(
        ["-P", "4", "-R", "1", "-E", "2", "--model", "gat", "--heads", "2",
         "train", toy, "1", "8"],
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    lines = [l for l in r.stderr.splitlines() if l and l[0].isdigit()]
    assert len(lines) >= 2


def test_cli_gat_rejects_col_partition(toy, tmp_path):
    r = run_cli(
        ["-P", "4", "-E", "1", "--model", "gat", "train", toy, "1", "8"],
        cwd=tmp_path,
    )
    assert r.returncode == 2
    assert "GAT" in r.stderr or "gat" in r.stderr


def test_cli_sage_rejects_block_impl(toy, tmp_path):
    r = run_cli(
        ["--model", "sage", "--impl", "block", "-E", "1", "train", toy, "1", "8"],
        cwd=tmp_path,
    )
    assert r.returncode == 2
    assert "sage" in r.stderr and "block" in r.stderr


def test_cli_col_partition_rejects_sage(toy, tmp_path):
    # -R 0 (column parallel) is wired for GCN; SAGE still needs -R 1
    r = run_cli(
        ["-P", "4", "-E", "1", "--model", "sage", "train", toy, "1", "8"],
        cwd=tmp_path,
    )
    assert r.returncode == 2
    assert "-R 1" in r.stderr


@pytest.mark.slow
def test_cli_checkpoint_roundtrip(toy, tmp_path):
    ck = tmp_path / "model.ckpt.npz"
    r = run_cli(
        ["-E", "2", "--save", str(ck), "train", toy, "1", "8"], cwd=tmp_path
    )
    assert r.returncode == 0, r.stderr
    assert ck.exists()
    r2 = run_cli(
        ["-E", "1", "--load", str(ck), "train", toy, "1", "8"], cwd=tmp_path
    )
    assert r2.returncode == 0, r2.stderr


@pytest.mark.slow
def test_cli_infer(toy, tmp_path):
    ck = tmp_path / "m.ckpt.npz"
    r = run_cli(["-E", "3", "--save", str(ck), "train", toy, "1", "8"], cwd=tmp_path)
    assert r.returncode == 0, r.stderr
    r2 = run_cli(["--load", str(ck), "infer", toy, "1", "8"], cwd=tmp_path)
    assert r2.returncode == 0, r2.stderr
    assert "inference:" in r2.stderr
    from mg_gcn_tpu.formats import read_dense

    preds = read_dense(tmp_path / "predictions.bin", np.int32)
    assert preds.shape == (4, 1)


def test_cli_infer_requires_checkpoint(toy, tmp_path):
    r = run_cli(["infer", toy, "1", "8"], cwd=tmp_path)
    assert r.returncode == 2
    assert "--load" in r.stderr


def test_cli_pagerank(toy, tmp_path):
    r = run_cli(["pagerank", toy], cwd=tmp_path)
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "pagerank.bin").exists()
    from mg_gcn_tpu.formats import read_dense

    p = read_dense(tmp_path / "pagerank.bin", np.float32)
    assert p.shape == (4, 1)
    np.testing.assert_allclose(p.sum(), 4.0, rtol=1e-4)


def test_checkpoint_module(tmp_path):
    import jax.numpy as jnp

    from mg_gcn_tpu.checkpoint import load_checkpoint, save_checkpoint

    tree = [{"W": jnp.ones((3, 2)), "b": jnp.zeros((1, 2))}]
    path = tmp_path / "t.npz"
    save_checkpoint(path, tree)
    zero_template = [{"W": jnp.zeros((3, 2)), "b": jnp.ones((1, 2))}]
    back = load_checkpoint(path, zero_template)
    np.testing.assert_array_equal(np.asarray(back[0]["W"]), np.ones((3, 2)))
    with pytest.raises(ValueError, match="shape"):
        load_checkpoint(path, [{"W": jnp.zeros((4, 2)), "b": jnp.ones((1, 2))}])


def test_graft_entry_single():
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as ge
        import jax

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert np.isfinite(np.asarray(out)).all()
    finally:
        sys.path.remove(REPO)


@pytest.mark.slow
def test_graft_entry_multichip():
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)
    finally:
        sys.path.remove(REPO)


@pytest.mark.slow
def test_cli_infer_sage_and_gat(toy, tmp_path):
    for model, extra in [("sage", []), ("gat", ["--heads", "2"])]:
        ck = tmp_path / f"{model}.npz"
        r = run_cli(
            ["-E", "2", "--model", model, *extra, "--save", str(ck),
             "train", toy, "1", "8"],
            cwd=tmp_path,
        )
        assert r.returncode == 0, r.stderr
        r2 = run_cli(
            ["--model", model, *extra, "--load", str(ck), "infer", toy, "1", "8"],
            cwd=tmp_path,
        )
        assert r2.returncode == 0, (model, r2.stderr)
        assert "inference:" in r2.stderr
