"""Single-chip training driver: jitted train step + epoch loop.

Equivalent of the reference's single-GPU path (main.cpp:113-133): per epoch
``train_forward -> backward -> adam_update -> sync``, printing
``epoch loss acc seconds`` to stderr. Distributed training lives in
:mod:`mg_gcn_tpu.parallel`.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from . import sparse
from .formats import CSRData, Dataset
from .models.gcn import GCNConfig, init_params, loss_and_grad
from .nn import adam
from .ops.spmm import AggPair, COOMat
from .timers import TimerRegistry


from .ops.spmm_pattern import MEM_BUDGET as PATTERN_MEM_BUDGET  # noqa: E402


def _gather_feasible(
    n_out: int, n_in: int, nnz: int, r_rows: int | None = None
) -> bool:
    """Whether a (n_out × n_in, nnz) matrix fits one serial-gather schedule
    (SMEM step budget + packed-meta bit budget). ``r_rows`` must match the
    super-tile height the BUILDER that will run actually uses: None mirrors
    ``gather_schedule_host``'s auto-pick (R_ROWS_BIG past the threshold);
    callers gating builds that PIN a height (the halo per-block schedules
    pin R_ROWS) must pass it — a gate modeling a different kernel than the
    builder approves schedules the builder then refuses (round-5 review)."""
    from .ops import spmm_gather

    if r_rows is None:
        r_rows = (
            spmm_gather.R_ROWS_BIG
            if n_out > spmm_gather.R_BIG_THRESHOLD
            else spmm_gather.R_ROWS
        )
    n_st = -(-max(n_out, 1) // r_rows)
    n_win = -(-max(n_in, 1) // spmm_gather.W_ROWS)
    # conservative: actual S <= nnz/E_BLK + groups (<= n_st*n_win) +
    # dummy/pad steps (<= n_st + 8)
    steps_est = nnz // spmm_gather.E_BLK + n_st * n_win + n_st + 16
    # bit budget with the builder's own ceil(log2) formula (a product
    # check passes non-power-of-two counts whose bit sum overflows)
    st_bits = max(int(np.ceil(np.log2(max(n_st, 2)))), 1)
    win_bits = max(int(np.ceil(np.log2(max(n_win, 2)))), 1)
    return (
        steps_est < spmm_gather.MAX_STEPS_G
        and st_bits + win_bits + 1 + spmm_gather.LIVE_BITS <= 31
    )


def _edge_or_gather(graph: CSRData) -> str:
    """Dispatch between the two O(nnz) kernels by expected edge-tile slot
    fill (PERF.md: ~2.3/fill vs ~7.8 cyc/edge => crossover fill ~0.3)."""
    from .ops import spmm_edges

    fill = spmm_edges.expected_fill(graph.nrows, graph.ncols, graph.nnz)
    if fill >= 0.3:
        return "edge"
    if _gather_feasible(graph.nrows, graph.ncols, graph.nnz):
        return "gather"
    return "edge"  # its builder falls back to COO/XLA if infeasible


def halo_engine(graph: CSRData, parts: int) -> str:
    """Local-multiply engine for the distributed halo mode: 'gather' on TPU
    in the ultra-sparse regime, else 'xla'.

    The feasibility caps apply to the PER-BLOCK schedules — (n/P × n/P)
    diagonal blocks holding at most a row slab's edges — not to the global
    matrix, which at papers100M scale exceeds the single-schedule caps by
    design (that is why the graph is sharded)."""
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        return "xla"  # interpret-mode pallas off TPU is pathological
    from .ops import spmm_edges

    fill = spmm_edges.expected_fill(graph.nrows, graph.ncols, graph.nnz)
    m_loc = max(graph.nrows // max(parts, 1), 1)
    # the largest row slab bounds every block's nnz exactly (an average
    # would let a hub-heavy slab pass the gate and then blow the builder's
    # schedule caps); fall back to the average for stub graphs in tests
    indptr = getattr(graph, "indptr", None)
    if indptr is not None and len(indptr) == graph.nrows + 1:
        bounds = np.asarray(indptr)[:: m_loc][: parts + 1]
        slab_nnz = int(np.max(np.diff(bounds))) if bounds.size > 1 else graph.nnz
    elif getattr(graph, "path", None):
        # header-loaded graph (multihost slab path): the same exact bound,
        # from P+1 indptr words read straight off the PIGO file
        from .formats import read_pigo_indptr_at

        bounds = read_pigo_indptr_at(
            graph.path, list(range(0, graph.nrows + 1, m_loc))[: parts + 1]
        )
        slab_nnz = int(np.max(np.diff(bounds))) if bounds.size > 1 else graph.nnz
    else:
        slab_nnz = -(-graph.nnz // max(parts, 1))
    from .ops import spmm_gather as _sg

    # the halo per-block builders pin r_rows=R_ROWS (dist_halo
    # stacked_scheds / from_slabs) — gate with the SAME height
    if fill < 0.3 and _gather_feasible(m_loc, m_loc, slab_nnz, r_rows=_sg.R_ROWS):
        return "gather"
    return "xla"


def build_agg_pair(
    graph: CSRData,
    impl: str = "auto",
    pre_normalized: bool = False,
    tile_br: int = 512,
    tile_bc: int = 512,
    interpret: bool = False,
    pattern_dtype: str = "bfloat16",
    coo_val_dtype=np.float32,
) -> AggPair:
    """Host preprocessing -> device-resident (Â, Âᵀ) aggregation pair.

    Mirrors the gcn ctor (gcn.hpp:946-954): column-normalize A by in-degree,
    transpose; the forward aggregation matrix is Âᵀ (row-stochastic), the
    backward one is Â.

    impl:
      "auto"    — on TPU with a binary adjacency: the block-sparse pattern
                  kernel when tile occupancy < 0.5 (clustered graphs — see
                  ops/spmm_pattern_sparse.py), else the dense-pattern MXU
                  kernel when n²/8 fits the memory budget
                  (ops/spmm_pattern.py); weighted adjacencies (or binary
                  ones too large for the pattern store) use the edge-tile
                  MXU kernel (ops/spmm_edges.py); otherwise COO/XLA.
      "pattern" — force the dense-pattern kernel (raises if not applicable).
      "block"   — force the block-sparse pattern kernel.
      "edge"    — force the edge-tile kernel (arbitrary edge values).
      "gather"  — force the windowed serial-gather kernel (ultra-sparse
                  graphs; arbitrary edge values).
      "xla"     — COO gather/segment-sum compiled by XLA.
      "pallas"  — tiled-ELL Pallas kernel (interpret/debug only on v5e).
    """
    from .ops import spmm_pattern, spmm_pattern_sparse

    if impl not in ("auto", "pattern", "block", "edge", "gather", "xla", "pallas"):
        raise ValueError(
            f"unknown aggregation impl {impl!r} (expected auto/pattern/block/"
            "edge/gather/xla/pallas; 'halo' is a distributed mode — see "
            "parallel.dist_halo)"
        )
    if impl == "auto":
        import jax

        on_tpu = jax.default_backend() in ("tpu", "axon")
        if on_tpu and not pre_normalized and spmm_pattern.is_binary(graph):
            tile_occ, plane_occ = spmm_pattern_sparse.estimate_occupancy(graph)
            n_pad = spmm_pattern.round_up(graph.nrows, spmm_pattern.N_ALIGN)
            dense_bytes = n_pad * n_pad / 8
            block_bytes = tile_occ * dense_bytes
            # block wins on memory when tiles skip, and on compute when
            # planes skip (measured: ~2x at plane_occ 0.17, breakeven ~0.4)
            if (
                tile_occ < 0.5 or plane_occ < 0.3
            ) and block_bytes <= PATTERN_MEM_BUDGET:
                impl = "block"
            elif dense_bytes <= PATTERN_MEM_BUDGET:
                impl = "pattern"
            else:
                impl = _edge_or_gather(graph)
        elif on_tpu:
            # weighted adjacency: edge-tile when its slot fill holds up
            # (measured ~4x the XLA gather path at Reddit scale), the
            # serial-gather kernel in the ultra-sparse regime (~10x at
            # products scale) — PERF.md
            impl = _edge_or_gather(graph)
        else:
            impl = "xla"
    if impl == "block":
        if pre_normalized:
            raise ValueError("pattern impls need the raw binary adjacency")
        fwd, bwd = spmm_pattern_sparse.block_pattern_pair_from_binary_csr(
            graph, dtype=pattern_dtype
        )
        return AggPair(fwd=fwd, bwd=bwd)
    if impl == "pattern":
        if pre_normalized:
            raise ValueError("pattern impls need the raw binary adjacency")
        fwd, bwd = spmm_pattern.pattern_pair_from_binary_csr(
            graph, dtype=pattern_dtype
        )
        return AggPair(fwd=fwd, bwd=bwd)
    if impl == "gather" and not pre_normalized and bool((graph.data == 1).all()):
        # binary adjacency: the in-degree normalization factors into
        # diagonal scales around w-less binary walks (half the SMEM
        # traffic and transfer bytes)
        from .ops.spmm_gather import gather_pair_from_binary_csr

        try:
            fwd, bwd = gather_pair_from_binary_csr(graph)
            return AggPair(fwd=fwd, bwd=bwd)
        except ValueError as exc:
            print(
                f"gather schedule infeasible ({exc}); falling back to "
                "the COO/XLA engine",
                file=sys.stderr,
            )
            a = sparse.normalize(graph, axis=True)
            return AggPair(
                fwd=COOMat.from_csr(sparse.transpose(a)), bwd=COOMat.from_csr(a)
            )
    a = graph if pre_normalized else sparse.normalize(graph, axis=True)
    a_t = sparse.transpose(a)
    if impl == "gather":
        from .ops.spmm_gather import gather_pair_from_csr_pair

        try:
            fwd, bwd = gather_pair_from_csr_pair(a_t, a)
            return AggPair(fwd=fwd, bwd=bwd)
        except ValueError as exc:
            # schedule too large for single-chip SMEM — COO/XLA still works,
            # but say so (silent degradation misattributes bench numbers)
            print(
                f"gather schedule infeasible ({exc}); falling back to "
                "the COO/XLA engine",
                file=sys.stderr,
            )
            return AggPair(fwd=COOMat.from_csr(a_t), bwd=COOMat.from_csr(a))
    if impl == "edge":
        from .ops.spmm_edges import edge_pair_from_csr_pair

        # int8 rides the idx-packed quantized-weight mode (2x MXU rate,
        # per-row weight scales + per-feature operand scales)
        try:
            fwd, bwd = edge_pair_from_csr_pair(a_t, a, dtype=pattern_dtype)
            return AggPair(fwd=fwd, bwd=bwd)
        except ValueError as exc:
            # schedule too large for single-chip SMEM — COO/XLA still works,
            # but say so (silent degradation misattributes bench numbers)
            print(
                f"edge-tile schedule infeasible ({exc}); falling back to "
                "the COO/XLA engine",
                file=sys.stderr,
            )
            return AggPair(fwd=COOMat.from_csr(a_t), bwd=COOMat.from_csr(a))
    if impl == "pallas":
        from .ops.spmm_pallas import TiledMat

        make = partial(TiledMat.from_csr, br=tile_br, bc=tile_bc, interpret=interpret)
    else:
        # coo_val_dtype=np.float64 is the f64 numerics mode (the reference's
        # double templates, cuda_utils.cu:392-451) — COO/XLA engine only
        make = partial(COOMat.from_csr, val_dtype=coo_val_dtype)
    # forward multiplies by Âᵀ, backward by Â (layer ctor args gcn.hpp:954)
    return AggPair(fwd=make(a_t), bwd=make(a))


def make_train_step(
    config,
    hparams: dict | None = None,
    optimizer: str = "adam",
    donate: bool = True,
    model: str = "gcn",
) -> Callable:
    """Build the jitted full train step:
    (params, opt_state, pair, x, y, mask) -> (params, opt_state, loss, acc).

    ``model`` selects the family: "gcn" (reference-parity or exact, per
    config.parity) or "sage" (GraphSAGE mean aggregator, exact autodiff).
    """
    hp = dict(adam.DEFAULT_HPARAMS)
    if hparams:
        hp.update(hparams)
    if model == "gcn":
        lag = loss_and_grad
    elif model == "sage":
        from .models.sage import loss_and_grad as lag  # noqa: F811
    elif model == "gat":
        from .models.gat import loss_and_grad as lag  # noqa: F811
    else:
        raise ValueError(f"unknown model {model!r}")

    def step(params, opt_state, pair, x, y, mask):
        loss, acc, grads = lag(params, pair, x, y, config, mask)
        with jax.named_scope("adam-update"):
            if optimizer == "adam":
                params, opt_state = adam.adam_update(params, grads, opt_state, **hp)
            elif optimizer == "sgd":
                params = adam.sgd_update(params, grads, hp["lr"], hp["weight_decay"])
            else:
                raise ValueError(f"unknown optimizer {optimizer!r}")
        return params, opt_state, loss, acc

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(step, static_argnames=(), donate_argnums=donate_argnums)


def make_scan_train_steps(
    config,
    num_epochs: int,
    hparams: dict | None = None,
    model: str = "gcn",
) -> Callable:
    """Multiple epochs in ONE dispatch via lax.scan (the idiomatic JAX
    training loop): (params, opt_state, pair, x, y, mask) -> (params,
    opt_state, losses[num_epochs], accs[num_epochs]).

    Removes per-epoch host round-trips — on this setup the dispatch is
    ~26 ms through the tunnel, a real fraction of a sub-second epoch."""
    hp = dict(adam.DEFAULT_HPARAMS)
    if hparams:
        hp.update(hparams)
    if model == "gcn":
        lag = loss_and_grad
    elif model == "sage":
        from .models.sage import loss_and_grad as lag  # noqa: F811
    elif model == "gat":
        from .models.gat import loss_and_grad as lag  # noqa: F811
    else:
        raise ValueError(f"unknown model {model!r}")

    def steps(params, opt_state, pair, x, y, mask):
        def body(carry, _):
            params, opt_state = carry
            loss, acc, grads = lag(params, pair, x, y, config, mask)
            params, opt_state = adam.adam_update(params, grads, opt_state, **hp)
            return (params, opt_state), (loss, acc)

        (params, opt_state), (losses, accs) = jax.lax.scan(
            body, (params, opt_state), None, length=num_epochs
        )
        return params, opt_state, losses, accs

    return jax.jit(steps, donate_argnums=(0, 1))


@dataclass
class TrainResult:
    losses: list = field(default_factory=list)
    accs: list = field(default_factory=list)
    epoch_seconds: list = field(default_factory=list)
    params: Any = None
    opt_state: Any = None


def train(
    dataset: Dataset,
    hidden: list[int],
    epochs: int = 20,
    hparams: dict | None = None,
    config_kw: dict | None = None,
    impl: str = "xla",
    pattern_dtype: str = "bfloat16",
    seed: int | None = None,
    log: bool = True,
    timers: TimerRegistry | None = None,
    params: Any = None,
    opt_state: Any = None,
    f64: bool = False,
) -> TrainResult:
    """Full-batch training on one chip.

    ``hidden`` is the list of hidden widths (the CLI's d1..dL); the full size
    schedule becomes [num_features, *hidden, num_labels] like main.cpp:93-98.
    ``seed=None`` uses the reference's bit-exact seed-99 init.
    ``f64`` runs the whole step in float64 on the COO/XLA engine — the
    numerics-debugging twin of the reference's double kernel templates
    (cuda_utils.cu:392-451); requires jax_enable_x64 and rejects the
    bf16/int8 Pallas kernel impls.
    """
    if f64:
        if impl not in ("xla", "auto"):
            raise ValueError(
                f"f64 mode runs on the COO/XLA engine only (impl {impl!r}; "
                "the Pallas kernels compute in bf16/int8/f32)"
            )
        impl = "xla"
        if not jax.config.jax_enable_x64:
            raise ValueError(
                "f64 mode needs jax_enable_x64 (set JAX_ENABLE_X64=1 or "
                "jax.config.update('jax_enable_x64', True) before arrays "
                "are created)"
            )
    fdt = jnp.float64 if f64 else jnp.float32
    sizes = (dataset.num_features, *hidden, dataset.num_labels)
    config = GCNConfig(sizes=tuple(int(s) for s in sizes), **(config_kw or {}))
    pair = build_agg_pair(
        dataset.graph,
        impl=impl,
        pattern_dtype=pattern_dtype,
        coo_val_dtype=np.float64 if f64 else np.float32,
    )
    x = jnp.asarray(dataset.features, fdt)
    y = jnp.asarray(dataset.labels.reshape(-1), jnp.int32)
    mask = None
    if config.loss_mask == "train":
        mask = jnp.asarray(dataset.sets.reshape(-1) == 0)

    if params is None:
        params = init_params(
            config,
            None if seed is None else jax.random.key(seed),
            dtype=fdt if f64 else None,
        )
    if opt_state is None:
        opt_state = adam.adam_init(params)
    step = make_train_step(config, hparams)

    result = TrainResult()
    for e in range(epochs):
        t0 = time.perf_counter()
        params, opt_state, loss, acc = step(params, opt_state, pair, x, y, mask)
        loss, acc = float(loss), float(acc)  # blocks, like ctx.sync()
        dt = time.perf_counter() - t0
        result.losses.append(loss)
        result.accs.append(acc)
        result.epoch_seconds.append(dt)
        if timers is not None:
            timers.record(f"{e}_0_epoch", dt * 1e3)
        if log:
            print(f"{e} {loss} {acc} {dt}", file=sys.stderr)
    result.params, result.opt_state = params, opt_state
    return result
