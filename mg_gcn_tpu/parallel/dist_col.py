"""Column (feature-dimension / tensor) parallel GCN training.

The reference ships a dormant column-partition path (`-R 0`, disabled at
main.cpp:171-189): dense matrices sharded along the feature dimension
(``dist_dn_matrix``, dist_matrix.hpp:262-392), column-sharded weights with
scatter/reduce GEMMs (``dist_linear``, gcn.hpp:298-409), an all-to-all
distributed transpose, and a distributed softmax using allreduce max/sum
(``dist_softmax``, gcn.hpp:680-721). This module provides the working
TPU-native equivalent:

* activations live as (n, d/P) shards over a ``"feat"`` mesh axis;
* the adjacency is **replicated** (each device runs the full SpMM on its
  feature slice — the column path's SpMM is embarrassingly parallel,
  cuda_utils.hpp:35-45);
* linear layers are tensor-parallel: row-sharded W with
  ``psum_scatter`` partial-sum reduction (the modern form of the
  reference's ncclReduce + scatter GEMM, cuda_utils.hpp:193-229);
* the loss uses the distributed softmax reductions (pmax row max, psum
  denominator, masked psum NLL — gcn.hpp:690-721 / cuda_utils.hpp:560-605);
* gradients come from autodiff through the collectives (exact mode; the
  reference's column path has no layer-skip quirks to mirror).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.gcn import GCNConfig
from ..nn import adam
from ..ops.spmm import spmm

FEAT_AXIS = "feat"


def make_col_mesh(num_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (FEAT_AXIS,))


def dist_transpose(x_local: jax.Array, parts: int) -> jax.Array:
    """Distributed dense transpose on the feature mesh (per-device body).

    The explicit equivalent of the reference's ``dist_dn_matrix::transpose``
    (dist_matrix.hpp:358-390: per-device transpose → shuffle-encode →
    NCCL send/recv all-to-all): a column-sharded (n, d/P) matrix becomes
    the column-sharded (d, n/P) transpose — device k ends with
    ``xᵀ[:, k·n/P:(k+1)·n/P]``. On TPU the shuffle-encode kernel
    disappears: one ``lax.all_to_all`` exchanges the row×column blocks and
    the local transpose is a single XLA op. n must divide the mesh size."""
    n, dl = x_local.shape
    if n % parts:
        raise ValueError(f"rows ({n}) must be divisible by the mesh size ({parts})")
    m_loc = n // parts
    # my (n, dl) column slab as P row blocks; block j goes to device j
    blocks = x_local.reshape(parts, m_loc, dl)
    # recv[j] = device j's block of MY row slab: x[my_rows, j·dl:(j+1)·dl]
    recv = jax.lax.all_to_all(blocks, FEAT_AXIS, split_axis=0, concat_axis=0)
    slab = recv.transpose(1, 0, 2).reshape(m_loc, parts * dl)  # x[my_rows, :]
    return slab.T  # (d, n/P)


def make_dist_transpose(mesh: Mesh, parts: int):
    """Jitted column-sharded (n, d) -> column-sharded (d, n) transpose."""
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    body = shard_map(
        lambda x: dist_transpose(x, parts),
        mesh=mesh,
        in_specs=P(None, FEAT_AXIS),
        out_specs=P(None, FEAT_AXIS),
        check_vma=False,
    )
    return jax.jit(body)


def _tp_linear(h_local: jax.Array, w_local: jax.Array, b_local: jax.Array):
    """Tensor-parallel XW + b: h (n, in/P) @ w (in/P, out) -> partial (n, out)
    -> psum_scatter -> (n, out/P), plus the local bias columns."""
    partial = h_local @ w_local
    out = jax.lax.psum_scatter(
        partial, FEAT_AXIS, scatter_dimension=1, tiled=True
    )
    return out + b_local


def _dist_col_softmax_xent(logits_local, y, n_total, parts):
    """Column-sharded softmax CE: logits (n, c/P) per device.

    Row max via pmax, denominator via psum (gcn.hpp:690-721); the NLL term
    and the accuracy comparison select the label's owning shard by masking +
    psum (the reference's rank-offset argmax kernels, cuda_utils.cu:106-133).
    """
    n, c_loc = logits_local.shape
    j = jax.lax.axis_index(FEAT_AXIS)
    col0 = j * c_loc
    # the max shift is mathematically a constant in the softmax -> no grad.
    # (pmax/pmin have no differentiation rules in this jax even under
    # stop_gradient, so the cross-shard max is an all_gather + local max.)
    row_max = jax.lax.stop_gradient(
        jnp.max(
            jax.lax.all_gather(jnp.max(logits_local, axis=1), FEAT_AXIS), axis=0
        )
    )  # (n,)
    e = jnp.exp(logits_local - row_max[:, None])
    denom = jax.lax.psum(jnp.sum(e, axis=1), FEAT_AXIS)  # (n,)
    o_local = e / denom[:, None]

    y = y.reshape(-1)
    local_col = y - col0
    in_shard = (local_col >= 0) & (local_col < c_loc)
    idx = jnp.clip(local_col, 0, c_loc - 1)
    p_label_local = jnp.where(in_shard, o_local[jnp.arange(n), idx], 0.0)
    p_label = jax.lax.psum(p_label_local, FEAT_AXIS)
    logp = jnp.log(jnp.maximum(p_label, jnp.finfo(o_local.dtype).tiny))

    # global argmax: local max value + global column index, combined via pmax
    # (accuracy only — no gradient flows here)
    o_sg = jax.lax.stop_gradient(o_local)
    local_arg = jnp.argmax(o_sg, axis=1)
    local_max = jnp.max(o_sg, axis=1)
    gmax = jnp.max(jax.lax.all_gather(local_max, FEAT_AXIS), axis=0)
    # first shard holding the max wins (reference max_row_indices_equal with
    # rank*m offset then min-reduce, cuda_utils.cu:120-133)
    cand = jnp.where(local_max == gmax, local_arg + col0, jnp.int32(2**30))
    pred = jnp.min(jax.lax.all_gather(cand, FEAT_AXIS), axis=0)
    correct = (pred == y).astype(logits_local.dtype)

    denom_n = jnp.asarray(n_total, logits_local.dtype)
    loss = -jnp.sum(logp) / denom_n
    acc = jnp.sum(correct) / denom_n
    return loss, acc


def col_loss_fn(params, mat, x_local, y, config: GCNConfig, n_total, parts):
    """Per-device forward + loss (differentiable; inside shard_map)."""
    h = x_local
    for i, layer in enumerate(params):
        meta = config.layer_meta(i)
        # column path always computes (A H) W order? The reference dist
        # layer keeps the same dimension-aware rule; both orders are valid
        # here because A is replicated. lin-first needs full-width HW, so we
        # aggregate first when lin_first would shrink, matching compute cost.
        if meta["lin_first"]:
            hw = _tp_linear(h, layer["W"], layer["b"])
            ahw = spmm(mat, hw)
        else:
            ah = spmm(mat, h)
            ahw = _tp_linear(ah, layer["W"], layer["b"])
        if meta["activation"]:
            ahw = jnp.where(ahw > 0, ahw, config.leaky_slope * ahw)
        h = ahw
    return _dist_col_softmax_xent(h, y, n_total, parts)


def make_col_train_step(
    config: GCNConfig,
    mesh: Mesh,
    n_total: int,
    hparams: dict | None = None,
    optimizer: str = "adam",
):
    """Jitted tensor-parallel train step.

    (params, opt_state, mat, x, y) -> (params, opt_state, loss, acc) with
    x sharded on the feature axis, W sharded on the input dim, b on the
    output dim; ``mat`` is a replicated device sparse matrix (COOMat).
    Requires every layer width divisible by the mesh size (the reference
    rounds the last width up to a multiple of P for the same reason,
    main.cpp:135).
    """
    if config.residual:
        raise NotImplementedError(
            "the column/tensor-parallel path does not implement residual "
            "connections; use the row-partitioned path (-R 1)"
        )
    if config.loss_mask != "all":
        raise NotImplementedError(
            "the column/tensor-parallel path computes loss over all rows "
            "(reference semantics); --mask-train needs the row path (-R 1)"
        )
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    hp = dict(adam.DEFAULT_HPARAMS)
    if hparams:
        hp.update(hparams)
    parts = mesh.devices.size
    for s in config.sizes:
        if s % parts:
            raise ValueError(
                f"column-parallel needs widths divisible by P; got {s} % {parts}"
            )

    repl = P()
    col = P(None, FEAT_AXIS)
    row = P(FEAT_AXIS)
    params_spec = [{"W": row, "b": col} for _ in range(config.num_layers)]

    def step(params, opt_state, mat, x, y):
        def loss_fn(p):
            return col_loss_fn(p, mat, x, y, config, n_total, parts)

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # grads of sharded params are already local shards; updates are local
        if optimizer == "sgd":
            params_new, opt_new = (
                adam.sgd_update(params, grads, hp["lr"], hp["weight_decay"]),
                opt_state,
            )
        else:
            params_new, opt_new = adam.adam_update(params, grads, opt_state, **hp)
        return params_new, opt_new, loss, acc

    from ..ops.spmm import COOMat

    def wrapper(params, opt_state, mat: COOMat, x, y):
        mat_specs = COOMat(
            rows=repl, cols=repl, vals=repl,
            n_rows=mat.n_rows, n_cols=mat.n_cols, nnz=mat.nnz,
        )
        opt_spec = adam.AdamState(step=repl, m=params_spec, v=params_spec)
        smapped = shard_map(
            step,
            mesh=mesh,
            in_specs=(params_spec, opt_spec, mat_specs, col, repl),
            out_specs=(params_spec, opt_spec, repl, repl),
            check_vma=False,
        )
        return smapped(params, opt_state, mat, x, y)

    return jax.jit(wrapper)
