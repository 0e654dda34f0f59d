"""Numerically-stable softmax + cross-entropy loss over all rows.

TPU-native equivalent of the reference's softmax / softmax_cross_entropy_loss
layers (``gcn.hpp:639-935``). Semantics mirrored exactly:

* Softmax is the stable row-max-subtracted form (gcn.hpp:651-675).
* Loss = mean over **all** n rows of -log(softmax[row, Y[row]]) — the
  reference computes loss/accuracy over every node and never consults the
  train/val/test sets (``sets.bin`` is loaded but unused, main.cpp:85).
  An optional row mask supports proper train-set masking as an upgrade.
* The gradient is (softmax - onehot(Y)) / n (gcn.hpp:785-818); with a mask,
  masked rows get zero gradient and n is replaced by the mask count.
* Accuracy = fraction of rows whose argmax equals the label.

The reference takes |log p| via cublasAsum (gcn.hpp:813 abssum); since
log p <= 0 this equals -sum log p. We compute -mean log p directly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .elementwise import max_rows, subtract_rows_exp


class LossOut(NamedTuple):
    loss: jax.Array  # scalar
    acc: jax.Array  # scalar
    grad: jax.Array  # (n, c) gradient wrt logits


def softmax(x: jax.Array) -> jax.Array:
    """Stable row softmax mirroring the reference op order (gcn.hpp:651-675):
    row max -> exp(x - max) -> row-sum -> divide."""
    e = subtract_rows_exp(x, max_rows(x))
    return e / jnp.sum(e, axis=-1, keepdims=True)


def softmax_xent(
    logits: jax.Array,
    labels: jax.Array,
    mask: jax.Array | None = None,
) -> LossOut:
    """Loss, accuracy, and the logits gradient in one pass.

    ``labels`` is int (n,) or (n, 1). ``mask`` (optional) is a boolean (n,)
    row mask; None reproduces the reference's all-rows behaviour.
    """
    y = labels.reshape(-1).astype(jnp.int32)
    n, c = logits.shape
    o = softmax(logits)
    logp = jnp.log(
        jnp.maximum(o[jnp.arange(n), y], jnp.finfo(o.dtype).tiny)
    )
    pred = jnp.argmax(o, axis=-1).astype(jnp.int32)
    correct = (pred == y).astype(logits.dtype)
    onehot = jax.nn.one_hot(y, c, dtype=o.dtype)
    if mask is None:
        denom = jnp.asarray(n, logits.dtype)
        g = (o - onehot) / denom
        loss = -jnp.sum(logp) / denom
        acc = jnp.sum(correct) / denom
    else:
        m = mask.reshape(-1).astype(logits.dtype)
        denom = jnp.maximum(jnp.sum(m), 1)
        g = (o - onehot) * m[:, None] / denom
        loss = -jnp.sum(logp * m) / denom
        acc = jnp.sum(correct * m) / denom
    return LossOut(loss=loss, acc=acc, grad=g)
