"""Per-phase device timing breakdown.

The reference instruments every op with CUDA-event pairs and dumps
``epoch_gpu_phase`` timings to CSV (matrix.hpp:107-157, main.cpp:111). Two
equivalents here:

* :func:`profile_fused_step` (the ``--time-phases`` default): runs the
  *production fused* train step under a ``jax.profiler`` trace and reduces
  the device plane's per-HLO-op times into the reference's timer keys via
  the ``jax.named_scope`` annotations woven through models/gcn.py — the
  true analogue of the reference's in-path CUDA events (what's measured is
  the real step, fusion intact; ops XLA merged across scope boundaries are
  credited to the surviving op's scope).
* :func:`profile_epoch` (fallback): each phase compiled as a separate
  jitted function and timed with forced completion — faithful per-phase
  costs at the price of lost fusion across phases (used when the backend
  emits no device-plane trace).
"""

from __future__ import annotations

import time
from typing import Sequence

import jax
import jax.numpy as jnp

from .models.gcn import GCNConfig
from .ops import elementwise as ew
from .ops.softmax_xent import softmax_xent
from .ops.spmm import AggPair, spmm
from .timers import TimerRegistry


def profile_fused_step(
    step_fn,
    args: tuple,
    timers: TimerRegistry | None = None,
    prefix: str = "phase_",
    epochs: int = 2,
    trace_dir: str | None = None,
):
    """Trace ``epochs`` calls of the real (fused) train step and record
    per-phase device milliseconds (averaged per epoch) under the reference
    timer keys. ``step_fn(*args)`` must return updated (params, opt_state,
    ...) whose first two outputs can be fed back (the standard step
    signature; donation-safe — the updated pytrees are returned). Returns
    ``(timers, params, opt_state)``; no phase entries are added if the
    backend produced no device-plane trace (caller may fall back to
    :func:`profile_epoch`).
    """
    import tempfile

    from .xplane import device_time_by_scope

    timers = timers or TimerRegistry()
    own_dir = trace_dir is None
    trace_dir = trace_dir or tempfile.mkdtemp(prefix="mggcn_phases_")
    params, opt_state, *rest_args = args
    out = step_fn(params, opt_state, *rest_args)  # compile outside the trace
    params, opt_state = out[0], out[1]
    _ = jnp.sum(jax.tree.leaves(out[2])[0]).item()  # force
    with jax.profiler.trace(trace_dir):
        for _e in range(epochs):
            out = step_fn(params, opt_state, *rest_args)
            params, opt_state = out[0], out[1]
            _ = jnp.sum(jax.tree.leaves(out[2])[0]).item()
    totals = device_time_by_scope(trace_dir)
    if own_dir:
        import shutil

        shutil.rmtree(trace_dir, ignore_errors=True)
    for name, ms in sorted(totals.items()):
        timers.record(prefix + name, ms / epochs)
    return timers, params, opt_state


def _timed(timers: TimerRegistry, name: str, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    # the axon platform's block_until_ready is a no-op; force a host read
    leaf = jax.tree.leaves(out)[0]
    _ = jnp.sum(leaf).item()
    timers.record(name, (time.perf_counter() - t0) * 1e3)
    return out


def profile_epoch(
    params: Sequence[dict],
    pair: AggPair,
    x: jax.Array,
    y: jax.Array,
    config: GCNConfig,
    timers: TimerRegistry | None = None,
    prefix: str = "0_",
) -> TimerRegistry:
    """Run one un-fused, phase-timed epoch (forward + parity backward).

    Phase names mirror the reference timer keys: ``<layer>_0_matmul-gemm``,
    ``<layer>_0_matmul-spmm``, ``<layer>_0_activation``, ``loss-layer``,
    ``<layer>_1_*`` for backward (gcn.hpp naming).
    """
    timers = timers or TimerRegistry()
    slope = config.leaky_slope

    lin = jax.jit(lambda h, w, b: h @ w + b)
    agg_f = jax.jit(lambda m, h: spmm(m, h))
    act = jax.jit(lambda h: ew.leaky_relu(h, slope))
    act_bwd = jax.jit(lambda p, g: ew.leaky_relu_grad(p, g, slope))
    loss_f = jax.jit(lambda h, y: softmax_xent(h, y))
    colsum = jax.jit(lambda g: jnp.sum(g, axis=0, keepdims=True))
    matT = jax.jit(lambda a, b: a.T @ b)
    matNT = jax.jit(lambda a, b: a @ b.T)

    h = x
    caches = []
    for i, layer in enumerate(params):
        meta = config.layer_meta(i)
        name = f"{prefix}{i}_0"
        if meta["lin_first"]:
            hw = _timed(timers, f"{name}_matmul-gemm", lin, h, layer["W"], layer["b"])
            ahw = _timed(timers, f"{name}_matmul-spmm", agg_f, pair.fwd, hw)
        else:
            hw = _timed(timers, f"{name}_matmul-spmm", agg_f, pair.fwd, h)
            ahw = _timed(timers, f"{name}_matmul-gemm", lin, hw, layer["W"], layer["b"])
        if meta["activation"]:
            ahw = _timed(timers, f"{name}_activation", act, ahw)
        caches.append(dict(h=h, post=ahw))
        h = ahw

    out = _timed(timers, f"{prefix}loss-layer", loss_f, h, y)
    g = out.grad
    for i in reversed(range(len(params))):
        meta = config.layer_meta(i)
        name = f"{prefix}{i}_1"
        layer, cache = params[i], caches[i]
        t = g
        if meta["activation"]:
            t = _timed(timers, f"{name}_activation", act_bwd, cache["post"], g)
        if meta["lin_first"]:
            g_hw = (
                _timed(timers, f"{name}_matmul-spmm", agg_f, pair.bwd, t)
                if meta["backward_spmm"]
                else t
            )
            _timed(timers, f"{name}_gb", colsum, g_hw)
            _timed(timers, f"{name}_gw", matT, cache["h"], g_hw)
            g = (
                _timed(timers, f"{name}_gout", matNT, g_hw, layer["W"])
                if i > 0
                else None
            )
        else:
            _timed(timers, f"{name}_gb", colsum, t)
            _timed(timers, f"{name}_gw", matT, cache["h"], t)
            if i > 0:
                g_hw = _timed(timers, f"{name}_gout", matNT, t, layer["W"])
                g = (
                    _timed(timers, f"{name}_matmul-spmm", agg_f, pair.bwd, g_hw)
                    if meta["backward_spmm"]
                    else g_hw
                )
    return timers
