"""Optimizers, matching the reference's update rules exactly.

The reference embeds its optimizers inside the linear layer
(``gcn.hpp:141-172``); here they are standalone pytree transforms (optax
style, but self-contained and bit-matching the reference semantics):

* :func:`sgd_update` — ``W = (1 - wd) * W - lr * G`` for weights,
  ``b -= lr * G_b`` for biases (gcn.hpp:141-144: axpby on W, plain axpy on b).
* Adam (:func:`adam_init` / :func:`adam_update`) — **coupled** weight decay:
  ``G_W += wd * W`` *before* the moment updates (gcn.hpp:158 — not AdamW),
  applied to weights only, never biases; moments
  ``m = (1-b1) G + b1 m``, ``v = (1-b2) G^2 + b2 v``; final step
  ``p -= lr * (m / bc1) / (sqrt(v / bc2) + eps)`` with bias corrections
  ``bc1 = 1 - b1^t``, ``bc2 = 1 - b2^t`` (cuda_utils.cu:208-218 adam_final).

Reference CLI hyperparameters (main.cpp:126,163): lr 1e-2, b1 0.9, b2 0.999,
wd 5e-4, eps 1e-8.

Params are pytrees whose leaves are dicts with "W"/"b" keys (see
models/gcn.py); decay applies to leaves whose path ends in "W".
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

DEFAULT_HPARAMS = dict(lr=1e-2, beta1=0.9, beta2=0.999, weight_decay=5e-4, eps=1e-8)


class AdamState(NamedTuple):
    step: jax.Array  # i32 scalar
    m: Any  # first moments, same pytree as params
    v: Any  # second moments


def _is_decayed(path) -> bool:
    """Weight decay applies to 'W' leaves only (gcn.hpp:158 decays W, not b)."""
    last = path[-1]
    key = getattr(last, "key", getattr(last, "name", None))
    return isinstance(key, str) and key.startswith("W")


def adam_init(params: Any) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(step=jnp.zeros((), jnp.int32), m=zeros, v=jax.tree.map(jnp.zeros_like, params))


def adam_update(
    params: Any,
    grads: Any,
    state: AdamState,
    lr: float = 1e-2,
    beta1: float = 0.9,
    beta2: float = 0.999,
    weight_decay: float = 5e-4,
    eps: float = 1e-8,
) -> tuple[Any, AdamState]:
    step = state.step + 1
    # canonicalized: f32 normally, f64 under jax_enable_x64 (f64 mode's
    # bias corrections must not round through f32)
    t = step.astype(jax.dtypes.canonicalize_dtype(jnp.float64))
    bc1 = 1.0 - jnp.power(beta1, t)
    bc2 = 1.0 - jnp.power(beta2, t)

    def decay(path, p, g):
        if weight_decay and _is_decayed(path):
            return g + weight_decay * p  # coupled decay, gcn.hpp:158
        return g

    gd = jax.tree_util.tree_map_with_path(decay, params, grads)
    new_m = jax.tree.map(lambda g, m: (1.0 - beta1) * g + beta1 * m, gd, state.m)
    new_v = jax.tree.map(lambda g, v: (1.0 - beta2) * g * g + beta2 * v, gd, state.v)
    new_params = jax.tree.map(
        lambda p, m, v: p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps),
        params,
        new_m,
        new_v,
    )
    return new_params, AdamState(step=step, m=new_m, v=new_v)


def sgd_update(
    params: Any,
    grads: Any,
    lr: float,
    weight_decay: float = 0.0,
) -> Any:
    """Reference linear::update (gcn.hpp:141-144)."""

    def leaf(path, p, g):
        if weight_decay and _is_decayed(path):
            return (1.0 - weight_decay) * p - lr * g
        return p - lr * g

    return jax.tree_util.tree_map_with_path(leaf, params, grads)
