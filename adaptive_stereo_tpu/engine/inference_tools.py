"""Offline inference tooling (reference evaluate_model.py:23-126):
- save: dump per-image predicted disparities to disk;
- playback: per-image EPE + side-by-side visualization PNGs (the reference's
  OpenCV windows, headless);
- video: annotated colorized-disparity frames for video assembly.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def _forward_fn(model, input_scale: int):
    import jax

    @jax.jit
    def forward(variables, left, right):
        out = model.apply(variables, left, right, side="l",
                          output_cost_volume=False, train=False)
        return out[f"pred_disp_l/{input_scale}"]

    return forward


def save_disparities(model, variables, dataset, output_folder: str,
                     input_scale: int, limit: Optional[int] = None) -> int:
    """Dump pred_disp_l/<s> for each dataset item as .npy
    (reference evaluate_model.py:34-70)."""
    import jax.numpy as jnp

    os.makedirs(output_folder, exist_ok=True)
    forward = _forward_fn(model, input_scale)
    n = len(dataset) if limit is None else min(limit, len(dataset))
    for i in range(n):
        item = dataset[i]
        disp = forward(variables,
                       jnp.asarray(item[f"color_l/{input_scale}"])[None],
                       jnp.asarray(item[f"color_r/{input_scale}"])[None])
        np.save(os.path.join(output_folder, f"{i:06d}_pred_disp.npy"),
                np.asarray(disp)[0, ..., 0])
    return n


def playback(model, variables, dataset, output_folder: str, input_scale: int,
             limit: Optional[int] = None) -> Dict[str, float]:
    """Per-image EPE + side-by-side (left | colorized pred | colorized gt)
    PNGs (reference evaluate_model.py:72-96, headless)."""
    import jax.numpy as jnp

    from ..utils.visualization import apply_disparity_colormap, save_png, side_by_side

    os.makedirs(output_folder, exist_ok=True)
    forward = _forward_fn(model, input_scale)
    n = len(dataset) if limit is None else min(limit, len(dataset))
    epes = []
    for i in range(n):
        item = dataset[i]
        disp = np.asarray(forward(
            variables,
            jnp.asarray(item[f"color_l/{input_scale}"])[None],
            jnp.asarray(item[f"color_r/{input_scale}"])[None]))[0, ..., 0]
        panels = [item[f"color_l/{input_scale}"], apply_disparity_colormap(disp)]
        gt_key = f"gt_disp_l/{input_scale}"
        if gt_key in item:
            gt = item[gt_key][..., 0]
            mask = gt > 0
            epe = float(np.abs(disp - gt)[mask].mean()) if mask.any() else float("nan")
            epes.append(epe)
            print(f"[playback] image {i}: EPE={epe:.3f}")
            panels.append(apply_disparity_colormap(gt))
        save_png(os.path.join(output_folder, f"{i:06d}.png"), side_by_side(*panels))
    return {"EPE": float(np.mean(epes)) if epes else float("nan"), "count": n}


def render_video_frames(model, variables, dataset, output_folder: str,
                        input_scale: int, limit: Optional[int] = None) -> int:
    """Colorized-disparity-over-image frames (reference evaluate_model.py:98-119)."""
    import jax.numpy as jnp

    from ..utils.visualization import apply_disparity_colormap, save_png

    os.makedirs(output_folder, exist_ok=True)
    forward = _forward_fn(model, input_scale)
    n = len(dataset) if limit is None else min(limit, len(dataset))
    for i in range(n):
        item = dataset[i]
        disp = np.asarray(forward(
            variables,
            jnp.asarray(item[f"color_l/{input_scale}"])[None],
            jnp.asarray(item[f"color_r/{input_scale}"])[None]))[0, ..., 0]
        frame = np.concatenate(
            [item[f"color_l/{input_scale}"], apply_disparity_colormap(disp)], axis=0)
        save_png(os.path.join(output_folder, f"frame_{i:06d}.png"), frame)
    return n
