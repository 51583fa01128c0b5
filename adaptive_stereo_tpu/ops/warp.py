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

TPU-first implementation: the vertical half-pixel shift is a constant 2-row
average along H; the per-pixel horizontal bilinear sample is a GATHER, and
TPU has no fast gather — XLA lowers take_along_axis to a serialized custom
fusion measured at 11.3 ms per call at 320x960 (adapt-step trace, round 2).
Instead the sample is expressed as a banded ONE-HOT MATMUL: the bilinear
weight row relu(1 - |px - xi|) has <= 2 nonzeros, so

    warped(x) = sum_xi relu(1 - |px(x) - xi|) * img_v(xi)

exactly reproduces (1-wx)*img(x0) + wx*img(x1) including the border clamp
(px is pre-clipped to [0, W-1]). The xi axis is restricted to a static band
of width block + max_disp + 2 around each output block, and the contraction
runs on the MXU with Precision.HIGHEST (exact f32: measured max |diff| vs
the gather path 1.2e-7; 4.3x faster fwd+bwd at 320x960).

Both formulations are exposed: implementation="onehot" (default) and
"gather" (the take_along_axis path, used as the cross-check oracle).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def _vertical_halfpixel_blur(img: jnp.ndarray) -> jnp.ndarray:
    """Sample rows at y - 0.5 with border clamping: row 0 stays, row y>=1
    becomes the average of rows y-1 and y."""
    avg = 0.5 * (img[:, :-1, :, :] + img[:, 1:, :, :])
    return jnp.concatenate([img[:, :1, :, :], avg], axis=1)


def _sample_coords(disp, w, right_to_left, dtype):
    """Un-normalized grid_sample source coordinates and validity mask."""
    x = jnp.arange(w, dtype=dtype)
    if right_to_left:
        sample_x = x[None, None, :] - disp.astype(dtype)
    else:
        sample_x = x[None, None, :] + disp.astype(dtype)
    # Validity before the half-pixel shift, matching the reference mask
    # (linear_warping.py:54-55): -1 <= 2*sample_x/W - 1 <= 1.
    valid = (sample_x >= 0.0) & (sample_x <= w)
    px = jnp.clip(sample_x - 0.5, 0.0, w - 1.0)
    return px, valid


def _warp_gather(img_v, px, w):
    """take_along_axis formulation (slow on TPU; exact oracle)."""
    b, h, _, c = img_v.shape
    x0 = jnp.floor(px)
    wx = px - x0
    x0i = x0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    x0g = jnp.broadcast_to(x0i[..., None], (b, h, w, c))
    x1g = jnp.broadcast_to(x1i[..., None], (b, h, w, c))
    left_px = jnp.take_along_axis(img_v, x0g, axis=2)
    right_px = jnp.take_along_axis(img_v, x1g, axis=2)
    return left_px + wx[..., None] * (right_px - left_px)


_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def _warp_onehot(img_v, px, w, max_disp, right_to_left,
                 precision="highest", band_dtype=None):
    """Banded one-hot matmul formulation (MXU; exact in f32/HIGHEST).

    precision / band_dtype: MXU precision of the contraction and the dtype
    the band weights/windows are cast to. The defaults (f32, HIGHEST) are
    EXACT vs grid_sample (max |diff| 1.2e-7) but run multi-pass on the MXU —
    the round-4 fleet trace showed this einsum at 21% of the N=8 fleet step
    (artifacts/profile_fleet_r4.log). Lower settings trade small
    interpolation error for large speedups (measured in
    scripts/exp_warp_precision.py); production configs opt in explicitly.
    """
    b, h, _, c = img_v.shape
    dtype = img_v.dtype
    prec = _PRECISIONS[precision] if isinstance(precision, str) else precision
    mm_dtype = jnp.dtype(band_dtype) if band_dtype is not None else None

    def contract(eq, m, win):
        if mm_dtype is not None:
            m = m.astype(mm_dtype)
            win = win.astype(mm_dtype)
        out = jnp.einsum(eq, m, win, precision=prec)
        return out.astype(dtype)

    if max_disp is None or max_disp >= w:
        # Full-width band: one block spanning all of W — exact for ANY
        # disparity value (including > max_disp), no padding needed.
        xi = jnp.arange(w, dtype=dtype)
        m = jnp.maximum(1.0 - jnp.abs(px[..., None] - xi), 0.0)
        return contract("bhxi,bhic->bhxc", m, img_v)

    d = int(max_disp)
    # Source-column bounds for an output column x (px pre-clipped to
    # [0, W-1], disparity in [0, d]):
    #   right_to_left: px in [x-d-0.5, x-0.5] -> taps in [x-d-1, x]
    #   left_to_right: px in [x-0.5, x+d-0.5] -> taps in [x-1, x+d]
    lo = d + 1 if right_to_left else 1
    hi = 1 if right_to_left else d + 1
    blk = 64
    nb = -(-w // blk)
    wp = nb * blk
    band = blk + lo + hi

    imgp = jnp.pad(img_v, ((0, 0), (0, 0), (lo, band), (0, 0)), mode="edge")
    # Overlapping source windows: window k covers source columns
    # [k*blk - lo, k*blk - lo + band).
    win_idx = (jnp.arange(nb) * blk)[:, None] + jnp.arange(band)[None, :]
    win = imgp[:, :, win_idx, :]                       # (B, H, nb, band, C)

    pxp = jnp.pad(px, ((0, 0), (0, 0), (0, wp - w)), constant_values=-2.0)
    pxb = pxp.reshape(b, h, nb, blk)
    src = (jnp.arange(band, dtype=dtype) - lo)[None, :] + \
        (jnp.arange(nb, dtype=dtype) * blk)[:, None]   # (nb, band)
    m = jnp.maximum(
        1.0 - jnp.abs(pxb[..., None] - src[None, None, :, None, :]), 0.0)
    out = contract("bhnxi,bhnic->bhnxc", m, win)
    return out.reshape(b, h, wp, c)[:, :, :w, :]


def linear_warp(
    img: jnp.ndarray,
    positive_disp: jnp.ndarray,
    right_to_left: bool = True,
    max_disp: Optional[int] = None,
    implementation: str = "onehot",
    precision: str = "highest",
    band_dtype: Optional[str] = None,
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
      max_disp: optional static disparity bound. When given, the one-hot
        matmul restricts its source band to max_disp+2 columns per output
        block (less memory traffic); disparities are clamped to
        [0, max_disp] first, which diverges from torch grid_sample only for
        predictions beyond the model's stated maximum. None = full-width
        band, exact for any disparity.
      implementation: "onehot" (banded one-hot matmul, MXU, default) or
        "gather" (take_along_axis oracle; slow on TPU).
      precision / band_dtype: MXU precision and band dtype of the one-hot
        contraction — ("highest", None) is exact grid_sample parity; see
        _warp_onehot for the speed/accuracy trade (gather ignores these).

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

    px, valid = _sample_coords(disp, w, right_to_left, dtype)
    if max_disp is not None:
        # Keep sources inside the static band (documented divergence for
        # out-of-contract disparities; the mask still uses unclamped coords).
        if right_to_left:
            x = jnp.arange(w, dtype=dtype)[None, None, :]
            px = jnp.maximum(px, jnp.maximum(x - max_disp - 0.5, 0.0))
        else:
            x = jnp.arange(w, dtype=dtype)[None, None, :]
            px = jnp.minimum(px, jnp.minimum(x + max_disp - 0.5, w - 1.0))

    img_v = _vertical_halfpixel_blur(img.astype(dtype))
    if implementation == "gather":
        warped = _warp_gather(img_v, px, w)
    else:
        warped = _warp_onehot(img_v, px, w, max_disp, right_to_left,
                              precision=precision, band_dtype=band_dtype)

    return warped.astype(img.dtype), valid[..., None]


def convert_disp_to_flow(positive_disp: jnp.ndarray, height: int,
                         width: int) -> jnp.ndarray:
    """Left positive-disparity map -> normalized "flow" sampling grid.

    F(x, y) = (x - d(x, y), y), normalized with the reference's
    align_corners=True formula u = 2*x/W - 1 (debug/testing utility;
    reference adaptive_stereo/models/linear_warping.py:88-121 — the sibling
    DispToFlow module there is dead code: it returns an undefined
    `valid_mask`, linear_warping.py:85, so only this functional form is
    implemented).

    Args:
      positive_disp: (B, H, W, 1) or (B, H, W) left-centered disparities
        (positive = source pixel lies `d` columns to the LEFT in the right
        image).

    Returns:
      (B, H, W, 2) float32 grid of normalized (u, v) coordinates.
    """
    if positive_disp.ndim == 4:
        disp = positive_disp[..., 0]
    else:
        disp = positive_disp
    b = disp.shape[0]
    cols = jnp.arange(width, dtype=jnp.float32)[None, None, :]
    rows = jnp.arange(height, dtype=jnp.float32)[None, :, None]
    u = 2.0 * (cols - disp.astype(jnp.float32)) / width - 1.0
    v = jnp.broadcast_to(2.0 * rows / height - 1.0, (b, height, width))
    return jnp.stack([u, v], axis=-1)
