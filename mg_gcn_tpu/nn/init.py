"""Weight initialization.

Two modes:

* :func:`kaiming_uniform_ref` — **bit-parity** with the reference's
  ``dn_matrix::init`` (matrix.hpp:539-545): Kaiming-uniform with LeakyReLU
  gain sqrt(2 / (1 + 0.01^2)), bound ``gain * sqrt(3 / fan_in)``, drawn from
  ``std::default_random_engine(99)`` (libstdc++ minstd_rand0) through
  ``std::uniform_real_distribution`` — both reproduced exactly here, so
  every layer's initial weights match the reference bit for bit. Note the
  reference reseeds the engine at 99 *per matrix*, so equal-shaped layers get
  identical weights; we reproduce that too.

* :func:`kaiming_uniform` — idiomatic JAX: same distribution from a
  ``jax.random`` key (used when parity with the reference is not required).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

MINSTD0_A = 16807
MINSTD0_M = 2147483647  # 2^31 - 1
LEAKY_GAIN = math.sqrt(2.0 / (1.0 + 0.01 * 0.01))
BIAS_GAIN = math.sqrt(1.0 / 3.0)  # reference b.init(sqrt(1/3)), gcn.hpp:110


def minstd0_sequence(seed: int, count: int) -> np.ndarray:
    """First ``count`` outputs of std::minstd_rand0 (x <- 16807 x mod 2^31-1).

    Vectorized by log-doubling: X[n:2n] = (a^n mod M) * X[:n] mod M, exact in
    uint64 (products < 2^62).
    """
    if count <= 0:
        return np.empty(0, dtype=np.uint64)
    x0 = (MINSTD0_A * (seed % MINSTD0_M)) % MINSTD0_M
    out = np.empty(count, dtype=np.uint64)
    out[0] = x0
    filled = 1
    mult = MINSTD0_A
    while filled < count:
        take = min(filled, count - filled)
        out[filled : filled + take] = (out[:take] * mult) % MINSTD0_M
        filled += take
        mult = (mult * mult) % MINSTD0_M
    return out


def _canonical_from_minstd0(seed: int, count: int) -> np.ndarray:
    """libstdc++ std::generate_canonical<double, 53> over minstd_rand0.

    For minstd_rand0 the engine range R = max - min + 1 = 2^31 - 2 and
    k = ceil(53 / log2(R)) = 2 draws per variate:
    ret = ((x1 - 1) + (x2 - 1) * R) / R^2.
    """
    r = np.float64(MINSTD0_M - 1)  # 2147483646
    seq = minstd0_sequence(seed, 2 * count).astype(np.float64) - 1.0
    return (seq[0::2] + seq[1::2] * r) / (r * r)


def uniform_ref(
    shape: tuple[int, ...], low: float, high: float, seed: int = 99
) -> np.ndarray:
    """std::uniform_real_distribution(low, high) over default_random_engine(seed),
    row-major fill — float64 math truncated to float32 like the reference's
    float buffer assignment."""
    count = int(np.prod(shape))
    u = _canonical_from_minstd0(seed, count)
    return (u * (high - low) + low).astype(np.float32).reshape(shape)


def kaiming_uniform_ref(
    fan_in: int, fan_out: int, gain: float = LEAKY_GAIN, seed: int = 99
) -> np.ndarray:
    """Reference dn_matrix::init for a (fan_in, fan_out) weight matrix."""
    bound = gain * math.sqrt(3.0 / fan_in)
    return uniform_ref((fan_in, fan_out), -bound, bound, seed)


def bias_ref(fan_out: int, seed: int = 99) -> np.ndarray:
    """Reference bias init: b is (1, out) so N=1 and the bound is
    sqrt(1/3) * sqrt(3/1) = 1 -> U(-1, 1)."""
    bound = BIAS_GAIN * math.sqrt(3.0 / 1.0)
    return uniform_ref((1, fan_out), -bound, bound, seed)


def kaiming_uniform(
    key: jax.Array,
    fan_in: int,
    fan_out: int,
    gain: float = LEAKY_GAIN,
    dtype=jnp.float32,
) -> jax.Array:
    """Idiomatic-JAX Kaiming uniform with the same distribution parameters."""
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, (fan_in, fan_out), dtype, -bound, bound)


def bias_uniform(key: jax.Array, fan_out: int, dtype=jnp.float32) -> jax.Array:
    return jax.random.uniform(key, (1, fan_out), dtype, -1.0, 1.0)
