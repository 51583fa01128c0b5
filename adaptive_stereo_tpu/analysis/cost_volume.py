"""Cost-volume dump + per-pixel slice plots (reference
evaluation/cost_volume_analysis.py:34-131 — the paper's cost-slice figure).

Saves cost volumes as .npy, then plots the disparity-axis cost profile at the
min- or max-FCS pixel with max/mean reference lines and the GT disparity
marker.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def save_cost_volumes(model, variables, loader, output_folder: str,
                      input_scale: int, k: int, num_images: int = 5) -> int:
    """Dump per-image cost volumes + coarse-scale GT disparity as .npy."""
    import jax
    import jax.numpy as jnp

    os.makedirs(output_folder, exist_ok=True)
    coarse = input_scale + k

    @jax.jit
    def forward(variables, left, right):
        out = model.apply(variables, left, right, side="l",
                          output_cost_volume=True, train=False)
        return out[f"cost_volume_l/{coarse}"]

    saved = 0
    for i, batch in enumerate(loader):
        if saved >= num_images:
            break
        for b in range(batch[f"color_l/{input_scale}"].shape[0]):
            if saved >= num_images:
                break
            left = jnp.asarray(batch[f"color_l/{input_scale}"][b : b + 1])
            right = jnp.asarray(batch[f"color_r/{input_scale}"][b : b + 1])
            cv = np.asarray(forward(variables, left, right))[0]  # (D, h, w)
            np.save(os.path.join(output_folder, f"{saved}_cost_volume.npy"), cv)
            gt_key = f"gt_disp_l/{coarse}"
            if gt_key in batch:
                np.save(os.path.join(output_folder, f"{saved}_gt.npy"),
                        np.asarray(batch[gt_key][b])[..., 0])
            saved += 1
    return saved


def plot_cost_volume_slices(output_folder: str, num_images: int,
                            use_min_fcs: bool = True,
                            line_color: str = "tab:blue",
                            ylim: Optional[tuple] = None) -> None:
    """For each dumped cost volume, plot cost-vs-disparity at the pixel with
    the min (novel-est) or max (most confident) FCS."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..ops import feature_contrast_mean

    for i in range(num_images):
        cv = np.load(os.path.join(output_folder, f"{i}_cost_volume.npy"))  # (D,h,w)
        gt_path = os.path.join(output_folder, f"{i}_gt.npy")
        gt = np.load(gt_path) if os.path.exists(gt_path) else None

        fcs = np.asarray(feature_contrast_mean(cv[None]))[0]
        idx = int(fcs.argmin() if use_min_fcs else fcs.argmax())
        row, col = idx // fcs.shape[-1], idx % fcs.shape[-1]

        cost_slice = cv[:, row, col]
        s = np.sort(cost_slice)[::-1]
        max_value, mean_value = s[0], s[2:].mean()

        plt.clf()
        plt.figure(figsize=(4, 3))
        d = len(cost_slice)
        plt.plot(np.arange(d), cost_slice, color=line_color)
        plt.xticks(np.arange(0, d, step=2))
        plt.xlabel("disparity")
        plt.ylabel(r"feature similarity score $\mathcal{C}(u, v)$")
        plt.hlines(max_value, 0, d - 2.5, linestyles="dashed", colors="gray")
        plt.hlines(mean_value, 0, d - 2.5, linestyles="dashed", colors="gray")
        plt.text(d - 2.5, max_value, "max", va="center")
        plt.text(d - 2.5, mean_value, "mean", va="center")
        if gt is not None:
            gt_val = gt[row, col]
            plt.vlines(gt_val, cost_slice.min(), cost_slice.max(),
                       linestyles="dashed", colors="black")
        if ylim is not None:
            plt.ylim(ylim)
        plt.savefig(os.path.join(output_folder, f"{i}_cost_volume_slice.pdf"),
                    bbox_inches="tight")
        plt.close("all")
