"""Command-line interface, mirroring the reference ``mg_gcn`` binary.

Usage (reference main.cpp:50-98):

    python -m mg_gcn_tpu.cli [-h] [-P num] [-R row] [-E epochs] [-S] [-N]
        train <data_dir> <L> <d1> ... <dL>
    python -m mg_gcn_tpu.cli pagerank <data_dir>          (capability upgrade)

Flags (same letters/semantics as the reference):
  -P  number of devices (default 1)
  -R  1 = row-partitioned distributed mode (required for P > 1, as in the
      reference where the column path is disabled, main.cpp:171-189)
  -E  epochs (default 20, main.cpp:52)
  -S  disable communication overlap -> all_gather exchange strategy
  -N  "no_wait": force overlap -> ring exchange strategy (the default)

Extras (new capabilities, off by default):
  --exact        exact autodiff gradients instead of reference-parity backward
  --mask-train   compute loss over the train set only (reference uses all rows)
  --lr/--wd/--b1/--b2/--eps-adam   optimizer hyperparameters
  --seed N       jax.random init instead of the reference's seed-99 init
  --save/--load  checkpoint the params+optimizer pytree
  --profile DIR  capture a jax.profiler trace of the run

Per-epoch output is ``epoch loss acc seconds`` on stderr and a per-phase
timer CSV under ``csvs/`` (main.cpp:100-111 conventions).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="mg_gcn_tpu",
        description="TPU-native multi-device full-batch GCN training framework",
    )
    p.add_argument("-P", type=int, default=1, metavar="num", help="number of devices")
    p.add_argument("-R", type=int, default=0, metavar="row", help="enable row partition")
    p.add_argument("-E", type=int, default=20, metavar="epochs", help="number of epochs")
    p.add_argument("-S", action="store_true", help="disable comm overlap (all_gather)")
    p.add_argument("-N", action="store_true", help="no-wait: force overlap (ring)")
    p.add_argument("--exact", action="store_true", help="exact autodiff gradients")
    p.add_argument("--mask-train", action="store_true", help="loss on train set only")
    p.add_argument(
        "--residual",
        action="store_true",
        help="residual connections per layer (identity when in==out, else a "
        "projection linear; gcn.hpp:432-434,453-456)",
    )
    p.add_argument(
        "--optimizer",
        default="adam",
        choices=["adam", "sgd"],
        help="sgd = the reference linear::update rule W=(1-wd)W-lr*G "
        "(gcn.hpp:141-144); adam = gcn.hpp:146-172 (default)",
    )
    p.add_argument(
        "--impl",
        default="auto",
        choices=["auto", "pattern", "block", "edge", "gather", "xla", "pallas", "halo"],
        help="aggregation engine; 'halo' (P>1) exchanges only referenced "
        "feature rows (papers100M-scale storage mode)",
    )
    p.add_argument("--model", default="gcn", choices=["gcn", "sage", "gat"])
    p.add_argument(
        "--heads",
        type=int,
        default=1,
        help="attention heads per GAT layer (--model gat; concat on hidden "
        "layers, mean on the output layer)",
    )
    p.add_argument(
        "--edge-weighted",
        action="store_true",
        help="weight the GAT attention by the graph's positive edge values "
        "(alpha ∝ w·exp(s); --model gat, single chip)",
    )
    p.add_argument(
        "--pattern-dtype",
        default="bfloat16",
        choices=["bfloat16", "float32", "int8"],
        help="MXU input dtype for the pattern SpMM kernel (int8 = 2x "
        "throughput with 8-bit-quantized activations)",
    )
    p.add_argument(
        "--f64",
        action="store_true",
        help="run the whole train step in float64 on the COO/XLA engine — "
        "numerics-debugging twin of the reference's double kernel "
        "templates (cuda_utils.cu:392-451); single chip, --model gcn, "
        "--impl xla/auto only",
    )
    p.add_argument(
        "--mmap",
        action="store_true",
        help="memory-map features.bin and stream each device's row shard "
        "straight from disk (papers100M-scale loading; halo/coo pairs)",
    )
    p.add_argument(
        "--multihost",
        action="store_true",
        help="form a multi-process JAX runtime (jax.distributed.initialize) "
        "before training: the graph mesh then spans all hosts (ICI within a "
        "host, DCN across), and each process materializes only its own row "
        "shards",
    )
    p.add_argument(
        "--exchange",
        default="auto",
        choices=["auto", "ring", "all_gather", "fused"],
        help="P>1 feature-exchange schedule: ring = XLA ppermute rounds "
        "(default, -N), all_gather = bulk exchange (-S), fused = single "
        "RDMA-ring pallas kernel per SpMM (pattern pair only)",
    )
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--wd", type=float, default=5e-4)
    p.add_argument("--b1", type=float, default=0.9)
    p.add_argument("--b2", type=float, default=0.999)
    p.add_argument("--eps-adam", type=float, default=1e-8)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--save", metavar="PATH", help="write checkpoint after training")
    p.add_argument(
        "--save-every",
        type=int,
        default=0,
        metavar="N",
        help="also checkpoint every N epochs (to --save path; enables "
        "mid-run failure recovery with --load)",
    )
    p.add_argument("--load", metavar="PATH", help="resume from checkpoint")
    p.add_argument("--profile", metavar="DIR", help="jax.profiler trace directory")
    p.add_argument(
        "--time-phases",
        action="store_true",
        help="append a per-phase (SpMM/GEMM/activation/loss) device timing "
        "breakdown to the timer CSV (diagnostic; un-fused epoch)",
    )
    p.add_argument("--csv-dir", default="csvs")
    p.add_argument("--damping", type=float, default=0.85, help="pagerank damping")
    p.add_argument("--eps", type=float, default=1e-4, help="pagerank tolerance")
    p.add_argument("command", help="train | infer | pagerank")
    p.add_argument("args", nargs="*", help="command arguments")
    return p


def _csv_name(data_dir: str, sizes, P: int) -> str:
    # main.cpp:100-111: dataset dir name (prefixed "permuted_" when under a
    # permuted/ directory) + sizes + device count
    parts = [s for s in os.path.normpath(data_dir).split(os.sep) if s]
    name = ""
    permuted = False
    for s in parts:
        if s == "permuted":
            permuted = True
        else:
            name = ("permuted_" if permuted else "") + s
    for s in sizes:
        name += f"_{s}"
    return f"{name}_{P}.csv"


def _maybe_save(opts, epoch: int, params, opt_state) -> None:
    """Periodic checkpoint hook shared by the training loops (process 0)."""
    if not (opts.save_every and opts.save and (epoch + 1) % opts.save_every == 0):
        return
    import jax

    if jax.process_index() == 0:
        from .checkpoint import save_checkpoint

        save_checkpoint(opts.save, (params, opt_state))


def cmd_train(opts) -> int:
    if opts.impl == "halo" and opts.P == 1:
        print("--impl halo is a distributed mode; use -P <num> -R 1", file=sys.stderr)
        return 2
    if opts.model == "sage" and opts.impl in ("block", "pallas"):
        print(
            f"--model sage does not support --impl {opts.impl}; "
            "use auto, pattern, edge, gather, xla, or halo",
            file=sys.stderr,
        )
        return 2
    if opts.edge_weighted and opts.model != "gat":
        print("--edge-weighted is a GAT option (--model gat)", file=sys.stderr)
        return 2
    if opts.model == "gat":
        if opts.P > 1 and not opts.R:
            print(
                "-R 0 (column parallel) supports --model gcn only; "
                "use -R 1 for GAT",
                file=sys.stderr,
            )
            return 2
        if opts.impl not in ("auto", "edge"):
            print(
                "--model gat runs on the edge-tile attention kernels; "
                "use --impl auto or edge",
                file=sys.stderr,
            )
            return 2
    import jax
    import jax.numpy as jnp

    if opts.f64:
        if opts.P > 1 or opts.model != "gcn" or opts.impl not in ("auto", "xla"):
            print(
                "--f64 runs single-chip GCN on the COO/XLA engine "
                "(--impl auto/xla, -P 1, --model gcn)",
                file=sys.stderr,
            )
            return 2
        jax.config.update("jax_enable_x64", True)

    from .formats import Dataset
    from .models.gcn import GCNConfig, init_params
    from .nn import adam
    from .timers import TimerRegistry, trace

    if len(opts.args) < 2:
        print("train requires: <data_dir> <L> <d1> ... <dL>", file=sys.stderr)
        return 2
    data_dir = opts.args[0]
    num_sizes = int(opts.args[1])
    hidden = [int(x) for x in opts.args[2 : 2 + num_sizes]]
    if len(hidden) != num_sizes:
        print(f"expected {num_sizes} layer sizes", file=sys.stderr)
        return 2

    # multihost halo runs never materialize the full graph on any process:
    # the header-only load keeps graph.bin on disk and the halo pair builds
    # from per-process row slabs (DistHaloPair.from_pigo). Other engines
    # (pattern is gated off multi-process; coo/gather build from the full
    # CSR) still load it. Gated on a REAL multi-process runtime: a
    # single-process --multihost run gains nothing from slabs and would
    # lose the pattern-engine auto-pick (round-5 review).
    import jax as _jax

    slab_graph = (
        opts.multihost
        and _jax.process_count() > 1
        and opts.P > 1
        and opts.R == 1
        and opts.impl in ("halo", "auto")
        and opts.model in ("gcn", "sage")
        and not opts.f64
    )
    ds = Dataset.load(
        data_dir,
        mmap_features=opts.mmap,
        graph_mode="header" if slab_graph else "full",
    )
    print(f"{ds.num_nodes} {ds.graph.nnz}", file=sys.stderr)
    num_labels = ds.num_labels
    print(f"num_labels = {num_labels}", file=sys.stderr)
    print(f"feature size = {ds.num_features}", file=sys.stderr)

    P = opts.P
    sizes = [ds.num_features, *hidden, num_labels]
    if P > 1:
        sizes[-1] = (sizes[-1] + P - 1) // P * P  # main.cpp:135
        if not opts.R:
            # column parallel shards every width across P devices; round all
            # widths up (features are zero-padded to match)
            sizes = [(s + P - 1) // P * P for s in sizes]

    hparams = dict(
        lr=opts.lr, beta1=opts.b1, beta2=opts.b2, weight_decay=opts.wd, eps=opts.eps_adam
    )
    if opts.model == "sage":
        from .models.sage import SAGEConfig

        if opts.residual:
            print("--residual is a GCN option (--model gcn)", file=sys.stderr)
            return 2
        if opts.optimizer == "sgd" and opts.P > 1:
            print(
                "--optimizer sgd is not wired for distributed SAGE; use "
                "adam or --model gcn",
                file=sys.stderr,
            )
            return 2
        config = SAGEConfig(
            sizes=tuple(sizes),
            loss_mask="train" if opts.mask_train else "all",
        )
    elif opts.model == "gat":
        from .models.gat import GATConfig

        if opts.residual:
            print("--residual is a GCN option (--model gcn)", file=sys.stderr)
            return 2
        if opts.edge_weighted and opts.P > 1:
            print(
                "--edge-weighted GAT is single-chip (the distributed graph "
                "drops edge values); use -P 1",
                file=sys.stderr,
            )
            return 2
        config = GATConfig(
            sizes=tuple(sizes),
            heads=opts.heads,
            loss_mask="train" if opts.mask_train else "all",
            edge_weighted=opts.edge_weighted,
        )
    else:
        config = GCNConfig(
            sizes=tuple(sizes),
            parity=not opts.exact,
            residual=opts.residual,
            loss_mask="train" if opts.mask_train else "all",
        )
    timers = TimerRegistry()
    os.makedirs(opts.csv_dir, exist_ok=True)
    csv_path = os.path.join(opts.csv_dir, _csv_name(data_dir, sizes, P))

    key = None if opts.seed is None else jax.random.key(opts.seed)
    if opts.model == "sage":
        from .models.sage import init_params as sage_init

        params = sage_init(config, key)
    elif opts.model == "gat":
        from .models.gat import init_params as gat_init

        params = gat_init(config, key)
    else:
        params = init_params(
            config, key, dtype=jnp.float64 if opts.f64 else None
        )
    opt_state = adam.adam_init(params)
    if opts.load:
        from .checkpoint import load_checkpoint

        params, opt_state = load_checkpoint(opts.load, (params, opt_state))

    with trace(opts.profile):
        if P <= 1:
            rc = _train_single(opts, ds, config, hparams, params, opt_state, timers)
        else:
            if not opts.R:
                # -R 0: column/tensor-parallel path (the reference wires it
                # at main.cpp:171-189 but leaves it commented out; here it
                # works — parallel/dist_col.py)
                if opts.model == "sage":
                    print(
                        "-R 0 (column parallel) supports --model gcn only; "
                        "use -R 1 for SAGE",
                        file=sys.stderr,
                    )
                    return 2
                rc = _train_col(opts, ds, config, hparams, params, opt_state, timers)
            elif opts.model == "sage":
                rc = _train_dist_sage(opts, ds, config, hparams, params, opt_state, timers)
            elif opts.model == "gat":
                rc = _train_dist_gat(opts, ds, config, hparams, params, opt_state, timers)
            else:
                rc = _train_dist(opts, ds, config, hparams, params, opt_state, timers)
    params, opt_state, code = rc
    if code == 0:
        with open(csv_path, "w") as f:
            timers.dump(f)
    if code == 0 and opts.save:
        from .checkpoint import save_checkpoint

        save_checkpoint(opts.save, (params, opt_state))
    return code


def _train_single(opts, ds, config, hparams, params, opt_state, timers):
    import jax.numpy as jnp

    from .train import build_agg_pair, make_train_step

    with timers.span("0_preprocess"):
        if opts.model == "sage":
            from .models.sage import build_sage_pair

            pair = build_sage_pair(ds.graph, impl=opts.impl, dtype=opts.pattern_dtype)
        elif opts.model == "gat":
            from .models.gat import build_gat_graph

            dtype = "bfloat16" if opts.pattern_dtype == "int8" else opts.pattern_dtype
            pair = build_gat_graph(ds.graph, dtype=dtype)
        else:
            pair = build_agg_pair(
                ds.graph,
                impl="xla" if opts.f64 else opts.impl,
                pattern_dtype=opts.pattern_dtype,
                coo_val_dtype=np.float64 if opts.f64 else np.float32,
            )
        x = jnp.asarray(ds.features, jnp.float64 if opts.f64 else jnp.float32)
        y = jnp.asarray(ds.labels.reshape(-1).astype(np.int32))
        mask = (
            jnp.asarray(ds.sets.reshape(-1) == 0) if config.loss_mask == "train" else None
        )
    step = make_train_step(
        config, hparams, optimizer=opts.optimizer, model=opts.model
    )
    for e in range(opts.E):
        t0 = time.perf_counter()
        params, opt_state, loss, acc = step(params, opt_state, pair, x, y, mask)
        loss, acc = float(loss), float(acc)
        dt = time.perf_counter() - t0
        timers.record(f"{e}_0_epoch", dt * 1e3)
        print(f"{e} {loss} {acc} {dt}", file=sys.stderr)
        _maybe_save(opts, e, params, opt_state)
    if opts.time_phases and opts.model == "gcn":
        from .diagnostics import profile_epoch, profile_fused_step

        # fused-step trace first (measures the production step, reference
        # epoch_gpu_phase scheme); un-fused replay only if the backend
        # emitted no device-plane trace
        before = len(timers._entries)
        _, params, opt_state = profile_fused_step(
            step, (params, opt_state, pair, x, y, mask), timers, prefix="phase_"
        )
        if len(timers._entries) == before:
            print("no device trace; falling back to un-fused phase replay", file=sys.stderr)
            profile_epoch(params, pair, x, y, config, timers, prefix="phase_")
    return params, opt_state, 0


def _train_col(opts, ds, config, hparams, params, opt_state, timers):
    """-R 0: column/tensor-parallel training (parallel/dist_col.py) — the
    reference's dormant dist_linear/dist_softmax path (gcn.hpp:298-409,
    main.cpp:171-189) made operational."""
    import jax
    import jax.numpy as jnp

    from . import sparse as host_sparse
    from .ops.spmm import COOMat
    from .parallel import dist_col

    P = opts.P
    if len(jax.devices()) < P:
        print(f"only {len(jax.devices())} devices visible", file=sys.stderr)
        return params, opt_state, 2
    if opts.mask_train or opts.residual:
        print(
            "-R 0 (column parallel) does not support --mask-train/--residual; "
            "use -R 1",
            file=sys.stderr,
        )
        return params, opt_state, 2
    if config.parity:
        print(
            "note: column path uses exact autodiff gradients (no parity "
            "quirks to mirror; the reference column path predates them)",
            file=sys.stderr,
        )
        from dataclasses import replace

        config = replace(config, parity=False)
    with timers.span("0_preprocess"):
        a = host_sparse.normalize(ds.graph, axis=True)
        a_t = host_sparse.transpose(a)
        mat = COOMat.from_csr(a_t)
        mesh = dist_col.make_col_mesh(P)
        x_np = ds.features.astype(np.float32)
        if x_np.shape[1] < config.sizes[0]:  # zero-pad to the rounded width
            pad = config.sizes[0] - x_np.shape[1]
            x_np = np.pad(x_np, ((0, 0), (0, pad)))
        x = jnp.asarray(x_np)
        y = jnp.asarray(ds.labels.reshape(-1).astype(np.int32))
    step = dist_col.make_col_train_step(
        config, mesh, ds.num_nodes, hparams, optimizer=opts.optimizer
    )
    for e in range(opts.E):
        t0 = time.perf_counter()
        params, opt_state, loss, acc = step(params, opt_state, mat, x, y)
        loss, acc = float(loss), float(acc)
        dt = time.perf_counter() - t0
        timers.record(f"{e}_0_epoch", dt * 1e3)
        print(f"{e} {loss} {acc} {dt}", file=sys.stderr)
        _maybe_save(opts, e, params, opt_state)
    return params, opt_state, 0


def _slab_halo_pair(graph_header, P, mesh, norm: str):
    """Shared multihost slab ceremony: engine gate, write-once graph_t.bin
    (process 0 + barrier), then the per-process from_pigo pair build —
    used by both the GCN and SAGE dist paths (round-5 review: keep the
    barrier/transpose logic in ONE place)."""
    import jax

    from .formats import ensure_pigo_transpose
    from .parallel import dist_halo
    from .train import halo_engine

    engine = halo_engine(graph_header, P)
    d_dir = os.path.dirname(graph_header.path)
    if jax.process_index() == 0:
        ensure_pigo_transpose(d_dir)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"graph_t_ready_{norm}")
    dpair = dist_halo.DistHaloPair.from_pigo(
        graph_header.path,
        os.path.join(d_dir, "graph_t.bin"),
        P,
        mesh=mesh,
        engine=engine,
        norm=norm,
    )
    return dpair, ("halo_gather" if engine == "gather" else "halo"), engine


def _train_dist(opts, ds, config, hparams, params, opt_state, timers):
    import jax
    import jax.numpy as jnp

    from . import sparse as host_sparse
    from .parallel import dist

    P = opts.P
    if len(jax.devices()) < P:
        print(
            f"requested -P {P} but only {len(jax.devices())} devices visible",
            file=sys.stderr,
        )
        return params, opt_state, 2
    strategy = "all_gather" if opts.S else "ring"
    exchange_auto = opts.exchange == "auto"
    if not exchange_auto:
        strategy = opts.exchange
    with timers.span("0_preprocess"):
        n = ds.num_nodes
        mesh = dist.make_mesh(P)
        from .ops import spmm_pattern
        from .train import PATTERN_MEM_BUDGET

        # the dist layout stores two packs (fwd + bwd ring orders) per device;
        # multi-process builds would materialize them on one chip, so the
        # pattern mode is single-process-per-mesh only (halo/coo scale past)
        from .formats import GraphHeader

        use_pattern = opts.impl in ("auto", "pattern") and (
            jax.default_backend() in ("tpu", "axon")
            and jax.process_count() == 1
            and not isinstance(ds.graph, GraphHeader)  # header = slab path
            and spmm_pattern.is_binary(ds.graph)
            and 2 * ds.num_nodes ** 2 / 8 / P <= PATTERN_MEM_BUDGET
        )
        if opts.impl == "pattern" and not use_pattern:
            print("pattern impl not applicable here", file=sys.stderr)
            return params, opt_state, 2
        np_mask = ds.sets.reshape(-1) == 0 if config.loss_mask == "train" else None
        if use_pattern:
            dpair = dist.DistPatternPair.from_binary_csr(ds.graph, P, mesh=mesh)
            n_pad = dpair.n_pad
            x_np = np.zeros((n_pad, ds.num_features), np.float32)
            x_np[:n] = ds.features
            y_np = np.zeros(n_pad, np.int32)
            y_np[:n] = ds.labels.reshape(-1)
            valid = np.arange(n_pad) < n
            np_mask = valid if np_mask is None else np.concatenate(
                [np_mask, np.zeros(n_pad - n, bool)]
            )
            from .parallel import multihost

            dpair = multihost.tree_shard_put(dpair, mesh, dpair.shardings(mesh))
            x = multihost.shard_put(x_np, mesh)
            y = multihost.shard_put(y_np, mesh)
            mask = multihost.shard_put(np_mask, mesh)
            pair_kind = "pattern"
            if exchange_auto and not opts.S and not opts.N and P > 1:
                # default to the fused RDMA-ring kernel for eligible
                # pattern runs: one pallas kernel per SpMM runs the whole
                # P-round schedule with inter-chip DMAs overlapping MXU
                # work, bf16 on the wire (ops/spmm_pattern_ring.py);
                # -N pins the XLA ppermute ring, -S all_gather
                strategy = "fused"
                print("exchange: fused RDMA ring (auto)", file=sys.stderr)
        else:
            if n % P:
                print(
                    f"node count {n} not divisible by P={P}; pad the dataset "
                    "(prep pads to multiples of 8 like the reference)",
                    file=sys.stderr,
                )
                return params, opt_state, 2
            from .formats import GraphHeader

            if isinstance(ds.graph, GraphHeader):
                # multihost slab path: normalize/transpose never run on the
                # full graph — the pair builds from per-process row slabs of
                # graph.bin + graph_t.bin (VERDICT r4 #2: zero from_csr_pair
                # call sites on this path)
                a = a_t = None
            else:
                a = host_sparse.normalize(ds.graph, axis=True)  # main.cpp:143
                a_t = host_sparse.transpose(a)
            if opts.impl == "gather":
                # serial-gather blocks: the ultra-sparse per-device engine
                # (ops/spmm_gather.py); ring exchange only
                if strategy != "ring":
                    print(
                        "--impl gather uses the ring exchange; drop -S / "
                        "--exchange",
                        file=sys.stderr,
                    )
                    return params, opt_state, 2
                dpair = dist.DistGatherPair.from_csr_pair(a_t, a, P)
                pair_kind = "gather"
            elif opts.impl in ("halo", "auto"):
                # halo exchange: ship only referenced feature rows — the
                # huge-graph mode (auto's fallback when pattern is infeasible).
                # Ultra-sparse graphs run the local multiplies on the
                # serial-gather kernel (~10x XLA's gather at that density)
                from .parallel import dist_halo
                from .train import halo_engine

                if isinstance(ds.graph, GraphHeader):
                    dpair, pair_kind, engine = _slab_halo_pair(
                        ds.graph, P, mesh, norm="gcn"
                    )
                else:
                    engine = halo_engine(ds.graph, P)
                    dpair = dist_halo.DistHaloPair.from_csr_pair(
                        a_t, a, P, engine=engine
                    )
                    pair_kind = "halo_gather" if engine == "gather" else "halo"
                if engine == "gather":
                    print("halo local engine: serial-gather", file=sys.stderr)
                moved = P * sum(dpair.fwd.round_widths)
                print(
                    f"halo exchange: {moved} rows/SpMM fwd moved "
                    f"({dpair.fwd.halo_total} useful; dense bcast would "
                    f"move {(P - 1) * n})",
                    file=sys.stderr,
                )
            else:
                dpair = dist.DistAggPair.from_csr_pair(a_t, a, P)
                pair_kind = "coo"
            from .parallel import multihost

            if not isinstance(ds.graph, GraphHeader):
                # the from_pigo slab build already materialized globally
                # sharded arrays (make_array_from_callback); re-sharding a
                # non-addressable global array via numpy would fail
                dpair = multihost.tree_shard_put(
                    dpair, mesh, dpair.shardings(mesh)
                )
            feats = ds.features
            if feats.dtype != np.float32:
                feats = feats.astype(np.float32)
            # stream=True pages each device shard straight from the memmap
            # (--mmap): the full feature matrix never lands in host RAM
            x = multihost.shard_put(feats, mesh, stream=isinstance(feats, np.memmap))
            y = multihost.shard_put(ds.labels.reshape(-1).astype(np.int32), mesh)
            mask = multihost.shard_put(np_mask, mesh) if np_mask is not None else None
    if strategy == "fused" and pair_kind != "pattern":
        print(
            "--exchange fused needs the bit-pattern pair (binary adjacency "
            "within the pattern memory budget)",
            file=sys.stderr,
        )
        return params, opt_state, 2
    from .parallel import multihost

    # weights/optimizer state must be *global* replicated arrays for the
    # multi-host mesh (process-local arrays fail at the first step() call)
    params = multihost.replicate_put(params, mesh)
    opt_state = multihost.replicate_put(opt_state, mesh)
    step = dist.make_dist_train_step(
        config,
        mesh,
        n,
        hparams,
        strategy=strategy,
        use_mask=mask is not None,
        pair_kind=pair_kind,
        pattern_dtype=opts.pattern_dtype,
        optimizer=opts.optimizer,
    )
    for e in range(opts.E):
        t0 = time.perf_counter()
        out = step(params, opt_state, dpair, x, y, *(() if mask is None else (mask,)))
        params, opt_state, loss, acc = out
        loss, acc = float(loss), float(acc)
        dt = time.perf_counter() - t0
        timers.record(f"{e}_0_epoch", dt * 1e3)
        print(f"{e} {loss} {acc} {dt}", file=sys.stderr)
        _maybe_save(opts, e, params, opt_state)
    return params, opt_state, 0


def _train_dist_sage(opts, ds, config, hparams, params, opt_state, timers):
    import jax
    import jax.numpy as jnp

    from . import sparse as host_sparse
    from .parallel import dist

    P = opts.P
    if len(jax.devices()) < P:
        print(f"only {len(jax.devices())} devices visible", file=sys.stderr)
        return params, opt_state, 2
    n = ds.num_nodes
    if n % P:
        print(f"node count {n} not divisible by P={P}", file=sys.stderr)
        return params, opt_state, 2
    strategy = "all_gather" if opts.S else "ring"
    with timers.span("0_preprocess"):
        from .formats import GraphHeader

        mesh = dist.make_mesh(P)
        if isinstance(ds.graph, GraphHeader):
            m = m_t = None  # multihost slab path: graph stays on disk
        else:
            m = host_sparse.normalize(ds.graph, axis=False)
            m_t = host_sparse.transpose(m)
        if opts.impl in ("halo", "auto") and isinstance(ds.graph, GraphHeader):
            # per-process slab build of the SAGE mean-aggregator pair
            # (M, Mᵀ) from graph.bin/graph_t.bin
            dpair, pair_kind, _ = _slab_halo_pair(ds.graph, P, mesh, norm="sage")
        elif opts.impl == "halo":
            from .parallel import dist_halo
            from .train import halo_engine

            engine = halo_engine(ds.graph, P)
            dpair = dist_halo.DistHaloPair.from_csr_pair(m, m_t, P, engine=engine)
            pair_kind = "halo_gather" if engine == "gather" else "halo"
        elif opts.impl == "gather":
            if strategy != "ring":
                print(
                    "--impl gather uses the ring exchange; drop -S",
                    file=sys.stderr,
                )
                return params, opt_state, 2
            dpair = dist.DistGatherPair.from_csr_pair(m, m_t, P)
            pair_kind = "gather"
        else:
            dpair = dist.DistAggPair.from_csr_pair(m, m_t, P)
            pair_kind = "coo"
        if opts.multihost:
            from .parallel import multihost

            if not isinstance(ds.graph, GraphHeader):
                dpair = multihost.tree_shard_put(
                    dpair, mesh, dpair.shardings(mesh)
                )
            feats = ds.features
            if feats.dtype != np.float32:
                feats = feats.astype(np.float32)
            x = multihost.shard_put(
                feats, mesh, stream=isinstance(feats, np.memmap)
            )
            y = multihost.shard_put(
                ds.labels.reshape(-1).astype(np.int32), mesh
            )
            mask = (
                multihost.shard_put(ds.sets.reshape(-1) == 0, mesh)
                if config.loss_mask == "train"
                else None
            )
            params = multihost.replicate_put(params, mesh)
            opt_state = multihost.replicate_put(opt_state, mesh)
        else:
            x = jnp.asarray(ds.features, jnp.float32)
            y = jnp.asarray(ds.labels.reshape(-1).astype(np.int32))
            mask = (
                jnp.asarray(ds.sets.reshape(-1) == 0)
                if config.loss_mask == "train"
                else None
            )
    step = dist.make_dist_sage_train_step(
        config,
        mesh,
        n,
        hparams,
        strategy=strategy,
        use_mask=mask is not None,
        pair_kind=pair_kind,
    )
    for e in range(opts.E):
        t0 = time.perf_counter()
        out = step(params, opt_state, dpair, x, y, *(() if mask is None else (mask,)))
        params, opt_state, loss, acc = out
        loss, acc = float(loss), float(acc)
        dt = time.perf_counter() - t0
        timers.record(f"{e}_0_epoch", dt * 1e3)
        print(f"{e} {loss} {acc} {dt}", file=sys.stderr)
        _maybe_save(opts, e, params, opt_state)
    return params, opt_state, 0


def _train_dist_gat(opts, ds, config, hparams, params, opt_state, timers):
    import jax
    import jax.numpy as jnp

    from .parallel import dist, dist_gat

    P = opts.P
    if len(jax.devices()) < P:
        print(f"only {len(jax.devices())} devices visible", file=sys.stderr)
        return params, opt_state, 2
    n = ds.num_nodes
    if n % P:
        print(f"node count {n} not divisible by P={P}", file=sys.stderr)
        return params, opt_state, 2
    with timers.span("0_preprocess"):
        mesh = dist.make_mesh(P)
        dtype = "bfloat16" if opts.pattern_dtype == "int8" else opts.pattern_dtype
        g = dist_gat.build_dist_gat_graph(ds.graph, P, dtype=dtype)
        arrays = dist_gat.graph_arrays(g)
        x = jnp.asarray(ds.features, jnp.float32)
        y = jnp.asarray(ds.labels.reshape(-1).astype(np.int32))
        mask = (
            jnp.asarray(ds.sets.reshape(-1) == 0) if config.loss_mask == "train" else None
        )
    step = dist_gat.make_dist_gat_train_step(
        config,
        mesh,
        g,
        hparams,
        use_mask=mask is not None,
        optimizer=opts.optimizer,
    )
    for e in range(opts.E):
        t0 = time.perf_counter()
        out = step(params, opt_state, arrays, x, y, *(() if mask is None else (mask,)))
        params, opt_state, loss, acc = out
        loss, acc = float(loss), float(acc)
        dt = time.perf_counter() - t0
        timers.record(f"{e}_0_epoch", dt * 1e3)
        print(f"{e} {loss} {acc} {dt}", file=sys.stderr)
        _maybe_save(opts, e, params, opt_state)
    return params, opt_state, 0


def cmd_infer(opts) -> int:
    """Inference/serving path: load a checkpoint, run the forward pass, write
    predictions (and logits) in the raw dense format. The reference's
    equivalent is gcn::operator() (gcn.hpp:966-969)."""
    import jax
    import jax.numpy as jnp

    from .formats import Dataset, write_dense
    from .models.gcn import GCNConfig, forward, init_params
    from .nn import adam

    if len(opts.args) < 2:
        print("infer requires: <data_dir> <L> <d1> ... <dL>", file=sys.stderr)
        return 2
    if not opts.load:
        print("infer requires --load CHECKPOINT", file=sys.stderr)
        return 2
    data_dir = opts.args[0]
    num_sizes = int(opts.args[1])
    hidden = [int(x) for x in opts.args[2 : 2 + num_sizes]]
    if opts.P > 1 and not opts.R:
        # a -R 0 checkpoint has every width rounded to a multiple of P and
        # column-sharded semantics; this path does not reconstruct that
        print(
            "-R 0 (column parallel) inference is not wired; train with "
            "-R 1 or infer with -P 1",
            file=sys.stderr,
        )
        return 2
    ds = Dataset.load(data_dir)
    sizes = [ds.num_features, *hidden, ds.num_labels]
    if opts.P > 1:
        sizes[-1] = (sizes[-1] + opts.P - 1) // opts.P * opts.P
    if opts.model == "sage":
        from .models.sage import SAGEConfig
        from .models.sage import forward as model_forward
        from .models.sage import init_params as model_init

        config = SAGEConfig(sizes=tuple(sizes))
    elif opts.model == "gat":
        from .models.gat import GATConfig
        from .models.gat import forward as model_forward
        from .models.gat import init_params as model_init

        config = GATConfig(
            sizes=tuple(sizes),
            heads=opts.heads,
            edge_weighted=opts.edge_weighted,
        )
    else:
        model_forward, model_init = forward, init_params
        config = GCNConfig(sizes=tuple(sizes), residual=opts.residual)
    if opts.model != "gcn" and opts.P > 1:
        print(
            f"distributed infer supports --model gcn only (got {opts.model}); "
            "use -P 1",
            file=sys.stderr,
        )
        return 2

    from .checkpoint import load_checkpoint
    from .train import build_agg_pair

    template = model_init(config)
    params, _ = load_checkpoint(opts.load, (template, adam.adam_init(template)))
    x = jnp.asarray(ds.features, jnp.float32)
    if opts.P > 1 and opts.R:
        # distributed (row-sharded) inference
        from . import sparse as host_sparse
        from .parallel import dist

        if ds.num_nodes % opts.P:
            print(
                f"node count {ds.num_nodes} not divisible by P={opts.P}",
                file=sys.stderr,
            )
            return 2
        a = host_sparse.normalize(ds.graph, axis=True)
        a_t = host_sparse.transpose(a)
        mesh = dist.make_mesh(opts.P)
        dpair = dist.DistAggPair.from_csr_pair(a_t, a, opts.P)
        infer = dist.make_dist_infer(config, mesh)
        t0 = time.perf_counter()
        logits = infer(params, dpair, x)
        preds = np.asarray(jnp.argmax(logits, axis=-1), np.int32)
        dt = time.perf_counter() - t0
    else:
        if opts.model == "sage":
            from .models.sage import build_sage_pair

            pair = build_sage_pair(ds.graph, impl=opts.impl, dtype=opts.pattern_dtype)
        elif opts.model == "gat":
            from .models.gat import build_gat_graph

            dtype = "bfloat16" if opts.pattern_dtype == "int8" else opts.pattern_dtype
            pair = build_gat_graph(ds.graph, dtype=dtype)
        else:
            pair = build_agg_pair(
                ds.graph, impl=opts.impl, pattern_dtype=opts.pattern_dtype
            )
        t0 = time.perf_counter()
        logits = jax.jit(lambda p, pr, x: model_forward(p, pr, x, config))(
            params, pair, x
        )
        preds = np.asarray(jnp.argmax(logits, axis=-1), np.int32)
        dt = time.perf_counter() - t0
    y = ds.labels.reshape(-1)
    acc = float((preds == y).mean())
    print(f"inference: n={ds.num_nodes} acc={acc} seconds={dt}", file=sys.stderr)
    out = opts.save or "predictions.bin"
    write_dense(out, preds.reshape(-1, 1), np.int32)
    print(f"wrote {out}", file=sys.stderr)
    return 0


def cmd_pagerank(opts) -> int:
    from .formats import read_pigo_csr
    from .models.pagerank import pagerank, pagerank_dist

    if not opts.args:
        print("pagerank requires: <data_dir>", file=sys.stderr)
        return 2
    graph = read_pigo_csr(os.path.join(opts.args[0], "graph.bin"))
    t0 = time.perf_counter()
    if opts.P > 1:
        from .parallel import dist

        p = pagerank_dist(graph, dist.make_mesh(opts.P), damping=opts.damping, eps=opts.eps)
    else:
        p = pagerank(graph, damping=opts.damping, eps=opts.eps)
    dt = time.perf_counter() - t0
    print(f"pagerank n={p.shape[0]} sum={p.sum():.3f} seconds={dt}", file=sys.stderr)
    out = opts.save or "pagerank.bin"
    from .formats import write_dense

    write_dense(out, p.reshape(-1, 1), np.float32)
    print(f"wrote {out}", file=sys.stderr)
    return 0


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache (first TPU compile through the remote
    AOT service can take minutes; cached recompiles take seconds)."""
    if os.environ.get("MG_GCN_NO_COMPILE_CACHE"):
        return
    cache = os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "mg_gcn_tpu", "jax"),
    )
    os.makedirs(cache, exist_ok=True)


def _apply_platform_env() -> None:
    # Honor JAX_PLATFORMS even where a sitecustomize pins jax_platforms
    # (the axon TPU tunnel does); the config wins over the env var.
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        jax.config.update("jax_platforms", want)


def main(argv=None) -> int:
    # cache env var must be set before the first jax import (jax snapshots
    # config defaults from os.environ at import time)
    _enable_compile_cache()
    _apply_platform_env()
    opts = build_parser().parse_args(argv)
    if opts.multihost:
        from .parallel import multihost

        multihost.initialize()
    if opts.command == "train":
        return cmd_train(opts)
    if opts.command == "infer":
        return cmd_infer(opts)
    if opts.command == "pagerank":
        return cmd_pagerank(opts)
    print(f"Unknown command: {opts.command}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main())
