"""Disparity / image visualization helpers.

Behavioral contract from reference utils/visualization.py: colormapped
disparity panels (per-image normalization) for TensorBoard and offline PNG
dumps. numpy/matplotlib only — nothing here runs on device.
"""

from __future__ import annotations

import numpy as np


def apply_disparity_colormap(disp: np.ndarray, cmap: str = "magma") -> np.ndarray:
    """Colormap a (H, W) or (H, W, 1) disparity map with per-image
    normalization. Returns (H, W, 3) float32 in [0, 1]."""
    import matplotlib

    d = np.asarray(disp, np.float32)
    if d.ndim == 3:
        d = d[..., 0]
    lo, hi = float(d.min()), float(d.max())
    norm = (d - lo) / (hi - lo + 1e-9)
    return np.asarray(matplotlib.colormaps[cmap](norm), np.float32)[..., :3]


def side_by_side(*imgs: np.ndarray) -> np.ndarray:
    """Horizontally concatenate images (H, W, 3), padding heights."""
    imgs = [np.asarray(i, np.float32) for i in imgs]
    h = max(i.shape[0] for i in imgs)
    padded = [
        np.pad(i, ((0, h - i.shape[0]), (0, 0), (0, 0))) for i in imgs
    ]
    return np.concatenate(padded, axis=1)


def save_png(path: str, img: np.ndarray) -> None:
    import imageio.v2 as imageio

    imageio.imwrite(path, (np.clip(img, 0, 1) * 255).round().astype(np.uint8))
