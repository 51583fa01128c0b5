"""Soft-argmin disparity regression.

Reference behavior (adaptive_stereo/models/stereo_net.py:124-134, 190-192):
softmax over the disparity axis of the aggregated (pre-softmax) cost volume,
then the expectation sum_d d * p(d). Note the reference applies softmax (not
softmin) to "cost" — the network learns the similarity sign convention; we
preserve that exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_disparity(cost: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Softmax over the disparity axis of a (B, D, H, W) cost volume."""
    return jax.nn.softmax(cost, axis=axis)


def soft_argmin(cost: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Soft-argmin (softmax expectation) over the disparity axis.

    Args:
      cost: pre-softmax cost volume, shape (B, D, H, W) with disparity on
        `axis` (default 1).

    Returns:
      Expected disparity, shape (B, H, W), same dtype as input promoted to
      at least float32 for the reduction.
    """
    d = cost.shape[axis]
    p = jax.nn.softmax(cost, axis=axis)
    disp_values = jnp.arange(d, dtype=p.dtype)
    shape = [1] * cost.ndim
    shape[axis] = d
    return jnp.sum(p * disp_values.reshape(shape), axis=axis)
