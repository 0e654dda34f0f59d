"""Full-batch GCN: layers, model, forward and backward passes.

TPU-native re-design of the reference model layer (``gcn.hpp``). The model
is a pure-functional parameter pytree plus jittable forward / train-step
functions; there is no mutable layer object graph.

Two differentiation modes:

* **autodiff** (default) — the forward pass is built from
  :func:`mg_gcn_tpu.ops.spmm.aggregate` (custom-VJP SpMM using the
  pre-transposed matrix) and ``jax.grad`` produces exact gradients.

* **parity** — a hand-written backward pass that reproduces the reference
  training CLI's deliberate deviations from exact gradients, so loss/accuracy
  trajectories can be matched step for step:

  - layer 0 skips its backward SpMM entirely: its weight gradient is
    ``Hᵀ G`` instead of ``Hᵀ (A G)`` (``backward_spmm = (i != 1)`` at
    gcn.hpp:954, skip at gcn.hpp:469-474), and no input gradient is formed;
  - in the SpMM-first ordering the weight gradient uses the layer *input*
    instead of the aggregated input (``lin.setX(H)``, gcn.hpp:477) because
    the shared HW buffer has been clobbered by later layers;
  - the loss is computed over all nodes (main.cpp ignores sets.bin).

Layer schedule semantics shared by both modes (mirroring gcn.hpp:437-458):

* dimension-aware op ordering: if ``out <= in`` compute ``Â(HW + b)``
  (linear first — note the bias rides through the aggregation, which is
  exact when Â is row-stochastic), else ``(ÂH)W + b``;
* LeakyReLU(0.01) on every layer but the last;
* optional residual connection (identity when ``in == out``, otherwise a
  projection linear), applied after the activation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..nn import init as init_lib
from ..ops import elementwise as ew
from ..ops.softmax_xent import softmax_xent
from ..ops.spmm import AggPair, aggregate, spmm


@dataclass(frozen=True)
class GCNConfig:
    """Static model configuration.

    ``sizes`` is the full width schedule [num_features, d1, ..., dL,
    num_labels] — same convention as the reference CLI (main.cpp:93-98).
    """

    sizes: tuple[int, ...]
    residual: bool = False
    leaky_slope: float = 0.01
    parity: bool = True  # reference-exact backward quirks
    loss_mask: str = "all"  # "all" (reference) or "train"

    @property
    def num_layers(self) -> int:
        return len(self.sizes) - 1

    def layer_meta(self, i: int) -> dict:
        in_, out = self.sizes[i], self.sizes[i + 1]
        return dict(
            in_=in_,
            out=out,
            lin_first=out <= in_,  # HW.m() == AHW.m() test, gcn.hpp:441
            activation=i + 1 < self.num_layers,  # all but last, gcn.hpp:954
            backward_spmm=i != 0,  # layer-0 skip, gcn.hpp:954
            res_proj=self.residual and in_ != out,
            res_identity=self.residual and in_ == out,
        )


def init_params(
    config: GCNConfig, key: jax.Array | None = None, dtype=None
) -> list[dict]:
    """Build the parameter pytree.

    With ``key=None``, uses the reference's exact init (every matrix drawn
    from a fresh seed-99 minstd engine — bit parity, see nn/init.py).
    With a PRNG key, uses per-layer independent jax.random draws.
    ``dtype`` casts the parameters (f64 numerics mode — the reference
    templates every kernel for float AND double, cuda_utils.cu:392-451;
    requires jax_enable_x64).
    """
    params: list[dict] = []
    for i in range(config.num_layers):
        meta = config.layer_meta(i)
        in_, out = meta["in_"], meta["out"]
        layer: dict[str, jax.Array] = {}
        if key is None:
            layer["W"] = jnp.asarray(init_lib.kaiming_uniform_ref(in_, out))
            layer["b"] = jnp.asarray(init_lib.bias_ref(out))
            if meta["res_proj"]:
                layer["Wres"] = jnp.asarray(init_lib.kaiming_uniform_ref(in_, out))
                layer["bres"] = jnp.asarray(init_lib.bias_ref(out))
        else:
            key, kw, kb, krw, krb = jax.random.split(key, 5)
            layer["W"] = init_lib.kaiming_uniform(kw, in_, out)
            layer["b"] = init_lib.bias_uniform(kb, out)
            if meta["res_proj"]:
                layer["Wres"] = init_lib.kaiming_uniform(krw, in_, out)
                layer["bres"] = init_lib.bias_uniform(krb, out)
        if dtype is not None:
            layer = {k: v.astype(dtype) for k, v in layer.items()}
        params.append(layer)
    return params


def _layer_forward(
    layer: dict, meta: dict, pair: AggPair, h: jax.Array, slope: float, tag: str = "L"
):
    """One GCN layer forward; returns (output, cache-for-backward).

    ``tag`` labels the phase scopes (jax.named_scope) with the reference's
    timer-key names (gcn.hpp register_timer sites) so ``--time-phases`` can
    attribute device time inside the *fused* step from profiler traces.
    """
    w, b = layer["W"], layer["b"]
    if meta["lin_first"]:
        with jax.named_scope(f"{tag}_0_matmul-gemm"):
            hw = h @ w + b  # bias precedes aggregation, gcn.hpp:116-123
        with jax.named_scope(f"{tag}_0_matmul-spmm"):
            ahw = aggregate(pair, hw)
    else:
        with jax.named_scope(f"{tag}_0_matmul-spmm"):
            hw = aggregate(pair, h)
        with jax.named_scope(f"{tag}_0_matmul-gemm"):
            ahw = hw @ w + b
    if meta["activation"]:
        with jax.named_scope(f"{tag}_0_activation"):
            ahw = ew.leaky_relu(ahw, slope)
    if meta["res_proj"]:
        with jax.named_scope(f"{tag}_0_residual"):
            ahw = ahw + h @ layer["Wres"] + layer["bres"]
    elif meta["res_identity"]:
        with jax.named_scope(f"{tag}_0_residual"):
            ahw = ahw + h
    # "post" doubles as the activation-sign source in the parity backward:
    # the reference reuses the in-place-overwritten AHW buffer (post
    # activation *and* residual) for leaky_relu_backward (gcn.hpp:465).
    cache = dict(h=h, post=ahw)
    return ahw, cache


def forward(
    params: Sequence[dict],
    pair: AggPair,
    x: jax.Array,
    config: GCNConfig,
    return_caches: bool = False,
):
    """Model forward: returns logits (and per-layer caches if requested)."""
    h = x
    caches = []
    for i, layer in enumerate(params):
        h, cache = _layer_forward(
            layer, config.layer_meta(i), pair, h, config.leaky_slope, tag=str(i)
        )
        caches.append(cache)
    if return_caches:
        return h, caches
    return h


def loss_fn(
    params: Sequence[dict],
    pair: AggPair,
    x: jax.Array,
    y: jax.Array,
    config: GCNConfig,
    mask: jax.Array | None = None,
):
    """Differentiable loss for the autodiff path. Returns (loss, acc)."""
    logits = forward(params, pair, x, config)
    out = softmax_xent(logits, y, mask)
    return out.loss, out.acc


def _layer_backward(
    layer: dict,
    meta: dict,
    pair: AggPair,
    cache: dict,
    g: jax.Array,
    slope: float,
    need_input_grad: bool,
    tag: str = "L",
):
    """Reference-parity manual backward for one layer (gcn.hpp:460-489)."""
    grads: dict[str, jax.Array] = {}
    t = g
    if meta["activation"]:
        # The reference passes the (in-place overwritten) post-activation
        # buffer; sign(post) == sign(pre) for leaky relu so this is exact
        # whenever no residual was added on top (gcn.hpp:465).
        with jax.named_scope(f"{tag}_1_activation"):
            t = ew.leaky_relu_grad(cache["post"], g, slope)
    w = layer["W"]
    if meta["lin_first"]:
        with jax.named_scope(f"{tag}_1_matmul-spmm"):
            g_hw = spmm(pair.bwd, t) if meta["backward_spmm"] else t
        with jax.named_scope(f"{tag}_1_matmul-gemm"):
            grads["b"] = jnp.sum(g_hw, axis=0, keepdims=True)
            grads["W"] = cache["h"].T @ g_hw
            g_out = g_hw @ w.T if need_input_grad else None
    else:
        with jax.named_scope(f"{tag}_1_matmul-gemm"):
            grads["b"] = jnp.sum(t, axis=0, keepdims=True)
            # Deliberate reference deviation: uses the layer input, not ÂH
            # (lin.setX(H), gcn.hpp:477) — the shared HW buffer is long gone.
            grads["W"] = cache["h"].T @ t
            g_hw = t @ w.T if need_input_grad else None
        if need_input_grad:
            with jax.named_scope(f"{tag}_1_matmul-spmm"):
                g_out = spmm(pair.bwd, g_hw) if meta["backward_spmm"] else g_hw
        else:
            g_out = None
    if meta["res_proj"]:
        with jax.named_scope(f"{tag}_1_residual"):
            grads["bres"] = jnp.sum(g, axis=0, keepdims=True)
            grads["Wres"] = cache["h"].T @ g
            if g_out is not None:
                g_out = g_out + g @ layer["Wres"].T
    elif meta["res_identity"] and g_out is not None:
        g_out = g_out + g
    return grads, g_out


def loss_and_grad_parity(
    params: Sequence[dict],
    pair: AggPair,
    x: jax.Array,
    y: jax.Array,
    config: GCNConfig,
    mask: jax.Array | None = None,
):
    """Reference-exact forward + manual backward.

    Returns (loss, acc, grads) where grads matches the params pytree
    structure. Layer 0's input gradient is never formed (backward_out=false
    for the first layer, gcn.hpp:954 via backward_spmm flag).
    """
    logits, caches = forward(params, pair, x, config, return_caches=True)
    with jax.named_scope(f"{len(params)}_loss-layer"):
        out = softmax_xent(logits, y, mask)
    g = out.grad
    grads: list[dict] = [None] * len(params)
    for i in reversed(range(len(params))):
        grads[i], g = _layer_backward(
            params[i],
            config.layer_meta(i),
            pair,
            caches[i],
            g,
            config.leaky_slope,
            need_input_grad=i > 0,
            tag=str(i),
        )
    return out.loss, out.acc, grads


def loss_and_grad(
    params, pair, x, y, config: GCNConfig, mask=None
):
    """Dispatch on config.parity; returns (loss, acc, grads)."""
    if config.parity:
        return loss_and_grad_parity(params, pair, x, y, config, mask)
    (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, pair, x, y, config, mask
    )
    return loss, acc, grads
