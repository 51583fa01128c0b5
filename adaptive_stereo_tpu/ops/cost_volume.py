"""Difference cost-volume construction.

Reference behavior (adaptive_stereo/models/stereo_net.py:169-184): for each
candidate disparity d in [0, D), the cost slice is the elementwise difference
between the left feature map and the right feature map shifted right by d
pixels; columns x < d (where the right feature would be out of frame) are
exactly zero:

    cost[b, d, y, x, :] = f_l[b, y, x, :] - f_r[b, y, x - d, :]   if x >= d
                          0                                        otherwise

The reference builds this with a Python loop of strided CUDA tensor writes.
Here it is a single vectorized XLA expression: D is small and static
(D = (maxdisp+1) // 2^(input_scale+k), e.g. 12), so an unrolled trace of pads
+ subtractions fuses into one kernel. Output layout is (B, D, H, W, C)
("NDHWC") so the 3D aggregation convolutions run channels-last on the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp


def difference_cost_volume(f_l: jnp.ndarray, f_r: jnp.ndarray, num_disp: int) -> jnp.ndarray:
    """Build a difference cost volume.

    Args:
      f_l: left feature map, shape (B, H, W, C).
      f_r: right feature map, shape (B, H, W, C).
      num_disp: number of candidate disparities D (static).

    Returns:
      Cost volume of shape (B, D, H, W, C).
    """
    if f_l.shape != f_r.shape:
        raise ValueError(f"feature shapes differ: {f_l.shape} vs {f_r.shape}")
    b, h, w, c = f_l.shape
    if num_disp < 1:
        raise ValueError("num_disp must be >= 1")

    slices = []
    for d in range(num_disp):
        if d == 0:
            slices.append(f_l - f_r)
        elif d >= w:
            # Entire right view is out of frame at this disparity; the
            # reference's empty strided write leaves the slice all-zero.
            slices.append(jnp.zeros_like(f_l))
        else:
            # Shift right features right by d; zero out the first d columns of
            # the *difference* (reference leaves those entries at exactly 0,
            # not f_l - 0).
            shifted = jnp.pad(f_r[:, :, : w - d, :], ((0, 0), (0, 0), (d, 0), (0, 0)))
            diff = f_l - shifted
            zeros = jnp.zeros((b, h, d, c), dtype=diff.dtype)
            slices.append(jnp.concatenate([zeros, diff[:, :, d:, :]], axis=2))
    return jnp.stack(slices, axis=1)
