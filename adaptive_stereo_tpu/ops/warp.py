"""Differentiable linear (horizontal-disparity) image warping.

Reference behavior (adaptive_stereo/models/linear_warping.py:6-57): builds a
sampling grid, offsets the x coordinate by the disparity, normalizes with
u = 2*x/W - 1 and samples via F.grid_sample(mode="bilinear",
padding_mode="border") with the default align_corners=False.

IMPORTANT numerical quirk preserved on purpose: grid_sample with
align_corners=False un-normalizes u back to pixel coordinates as
((u + 1) * W - 1) / 2, so the reference's normalization (which is the
align_corners=True formula) means every sample lands at (x - disp - 0.5,
y - 0.5) — a half-pixel shift in both axes. The published adaptation results
were produced with this sampling, so we reproduce it exactly rather than
"fixing" it. The validity mask is u, v in [-1, 1], i.e. 0 <= x -/+ disp <= W
(the y condition is always true).

TPU-first implementation: the vertical half-pixel shift is a constant, so the
warp factorizes into (a) a fixed 2-row average along H and (b) a per-pixel
1-D bilinear gather along W implemented with take_along_axis — no 2-D
grid_sample needed. Both steps are XLA-fusable and differentiable w.r.t. both
the image and the disparity.
"""

from __future__ import annotations

import jax.numpy as jnp


def _vertical_halfpixel_blur(img: jnp.ndarray) -> jnp.ndarray:
    """Sample rows at y - 0.5 with border clamping: row 0 stays, row y>=1
    becomes the average of rows y-1 and y."""
    avg = 0.5 * (img[:, :-1, :, :] + img[:, 1:, :, :])
    return jnp.concatenate([img[:, :1, :, :], avg], axis=1)


def linear_warp(
    img: jnp.ndarray,
    positive_disp: jnp.ndarray,
    right_to_left: bool = True,
):
    """Warp `img` horizontally by a positive disparity map.

    If right_to_left (synthesize a left view from the right image):
        out(x, y) = img(x - disp(x, y), y)
    else (synthesize a right view from the left image):
        out(x, y) = img(x + disp(x, y), y)

    Args:
      img: (B, H, W, C) image/features to sample from.
      positive_disp: (B, H, W) or (B, H, W, 1) disparity map.
      right_to_left: direction flag; True means `positive_disp` is
        left-centered.

    Returns:
      (warped, valid_mask): warped is (B, H, W, C); valid_mask is (B, H, W, 1)
      boolean, False where the source column is out of frame.
    """
    if positive_disp.ndim == img.ndim:
        disp = positive_disp[..., 0]
    else:
        disp = positive_disp
    b, h, w, c = img.shape
    dtype = jnp.promote_types(img.dtype, jnp.float32)

    x = jnp.arange(w, dtype=dtype)
    if right_to_left:
        sample_x = x[None, None, :] - disp.astype(dtype)
    else:
        sample_x = x[None, None, :] + disp.astype(dtype)

    # Validity before the half-pixel shift, matching the reference mask
    # (linear_warping.py:54-55): -1 <= 2*sample_x/W - 1 <= 1.
    valid = (sample_x >= 0.0) & (sample_x <= w)

    # grid_sample(align_corners=False) un-normalization + border clamp.
    px = jnp.clip(sample_x - 0.5, 0.0, w - 1.0)
    x0 = jnp.floor(px)
    wx = px - x0
    x0i = x0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)

    img_v = _vertical_halfpixel_blur(img.astype(dtype))

    # Per-pixel 1-D gather along W. take_along_axis wants matching rank.
    x0g = jnp.broadcast_to(x0i[..., None], (b, h, w, c))
    x1g = jnp.broadcast_to(x1i[..., None], (b, h, w, c))
    left_px = jnp.take_along_axis(img_v, x0g, axis=2)
    right_px = jnp.take_along_axis(img_v, x1g, axis=2)
    warped = left_px + wx[..., None] * (right_px - left_px)

    return warped.astype(img.dtype), valid[..., None]
