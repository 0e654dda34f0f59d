"""Elementwise / rowwise ops.

The reference implements these as 23 hand-written CUDA kernels
(``cuda_utils.cu``); on TPU nearly all of them are single jnp expressions
that XLA fuses into neighbouring matmuls for free. They are kept as named
functions so the model code reads like the reference's op vocabulary and so
parity tests can target them directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LEAKY_SLOPE = 0.01  # reference default alpha (cuda_utils.cu:26-38)


def leaky_relu(x: jax.Array, alpha: float = LEAKY_SLOPE) -> jax.Array:
    """max(x, alpha*x) (cuda_utils.cu:26-30)."""
    return jnp.where(x > 0, x, alpha * x)


def leaky_relu_grad(x: jax.Array, g: jax.Array, alpha: float = LEAKY_SLOPE) -> jax.Array:
    """g where x > 0 else alpha*g (cuda_utils.cu:32-38).

    Like the reference's in-place call sites, ``x`` may be either the
    pre-activation or the post-activation value — the sign is the same.
    """
    return jnp.where(x > 0, g, alpha * g)


def broadcast_rows(b: jax.Array, n: int) -> jax.Array:
    """Tile a (1, m) row over n rows (cuda_utils.cu:40-51)."""
    return jnp.broadcast_to(b.reshape(1, -1), (n, b.shape[-1]))


def scale_rows(x: jax.Array, s: jax.Array) -> jax.Array:
    """x[i, :] / s[i] (cuda_utils.cu:75-79)."""
    return x / s.reshape(-1, 1)


def max_rows(x: jax.Array) -> jax.Array:
    """Row-wise max (cuda_utils.cu:95-104)."""
    return jnp.max(x, axis=-1)


def max_row_indices(x: jax.Array) -> jax.Array:
    """Row argmax (cuda_utils.cu:106-118); ties resolve to the first index,
    matching the reference kernel's strict ``>`` comparison scan."""
    return jnp.argmax(x, axis=-1).astype(jnp.int32)


def subtract_rows_exp(x: jax.Array, s: jax.Array) -> jax.Array:
    """exp(x - s[:, None]) fused (cuda_utils.cu:194-200)."""
    return jnp.exp(x - s.reshape(-1, 1))
