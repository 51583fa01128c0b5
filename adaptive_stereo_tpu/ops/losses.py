"""Supervised and self-supervised (Monodepth) losses.

Numerics mirror the reference exactly (adaptive_stereo/utils/loss_functions.py):
- khamis_robust_loss (:6-15): mean over gt>0 of sqrt((gt-pred)^2 + 4)/2 - 1,
  with num_valid floored at 1.
- SSIM (:41-72): 3x3 average-pool formulation with count_include_pad=True
  (every window divides by 9, including zero padding at the borders), then
  (1 - ssim)/2 clamped to [0, 1].
- edge-aware smoothness (:75-103): image-gradient-weighted disparity
  gradients, zero-padded back to full resolution.
- monodepth_loss (:106-138): 0.85*SSIM + 0.15*L1 + w_s*smoothness with
  mean-normalized disparity in the smoothness term.
- monodepth_single_loss (adapt.py:78-86): single-sided photometric loss,
  masked mean over the warp validity mask. This is the path used for all
  published results.
- monodepth_leftright_loss (:141-190): the reference version contains a live
  bug (`outputs = {}` clobbers its input at :154, and adapt.py's call path
  would crash on a misspelled key). We implement the evident INTENT: L/R
  occlusion-masked photometric + consistency loss. Divergence documented here.

All functions take NHWC tensors; disparity maps are (B, H, W, 1).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .warp import linear_warp


def khamis_robust_loss(pred_disp: jnp.ndarray, gt_disp: jnp.ndarray) -> jnp.ndarray:
    """Two-parameter robust loss from StereoNet (Khamis et al. 2018)."""
    mask = (gt_disp > 0).astype(pred_disp.dtype)
    num_valid = jnp.maximum(jnp.sum(mask), 1.0)
    err = jnp.sqrt((gt_disp - pred_disp) ** 2 + 4.0) / 2.0 - 1.0
    return jnp.sum(err * mask) / num_valid


def khamis_robust_loss_multiscale(
    inputs: Dict[str, jnp.ndarray],
    outputs: Dict[str, jnp.ndarray],
    scales=(0,),
    gt_disp_scale: int = 0,
) -> Dict[str, jnp.ndarray]:
    """Multi-scale Khamis loss; every scale's prediction is full-resolution
    already (the model upsamples), compared against the same full-res GT
    (reference loss_functions.py:18-38)."""
    losses: Dict[str, jnp.ndarray] = {}
    total = 0.0
    for scale in scales:
        l = khamis_robust_loss(
            outputs[f"pred_disp_l/{scale}"], inputs[f"gt_disp_l/{gt_disp_scale}"]
        )
        losses[f"khamis_robust_loss/{scale}"] = l
        total = total + l
    losses["total_loss"] = total
    return losses


def _banded_mean_matrix(n: int, dtype) -> jnp.ndarray:
    """(n, n) matrix averaging each element with its <=2 in-range neighbors
    divided by 3 (zero contribution outside the border)."""
    i = jnp.arange(n)
    return (jnp.abs(i[:, None] - i[None, :]) <= 1).astype(dtype) / 3.0


def _avg_pool_3x3_include_pad(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 average pool, zero-padded, dividing by 9 everywhere
    (torch avg_pool2d count_include_pad=True semantics). NHWC.

    Computed as two separable banded matmuls instead of lax.reduce_window:
    TPU reduce-window is a slow VPU path (0.9 ms per pool at 320x960 in the
    round-2 adapt-step trace); the banded matmul runs on the MXU with exact
    f32 precision and an identical zero-pad /9 contract."""
    a_h = _banded_mean_matrix(x.shape[1], x.dtype)
    a_w = _banded_mean_matrix(x.shape[2], x.dtype)
    hp = jnp.einsum("hi,biwc->bhwc", a_h, x,
                    precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("wj,bhjc->bhwc", a_w, hp,
                      precision=jax.lax.Precision.HIGHEST)


def ssim(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Structural-similarity *loss* map: clamp((1 - SSIM)/2, 0, 1). NHWC."""
    c1 = 0.01 ** 2
    c2 = 0.03 ** 2

    mu_x = _avg_pool_3x3_include_pad(x)
    mu_y = _avg_pool_3x3_include_pad(y)

    sigma_x = _avg_pool_3x3_include_pad(x * x) - mu_x * mu_x
    sigma_y = _avg_pool_3x3_include_pad(y * y) - mu_y * mu_y
    sigma_xy = _avg_pool_3x3_include_pad(x * y) - mu_x * mu_y

    ssim_n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    ssim_d = (mu_x ** 2 + mu_y ** 2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.clip((1 - ssim_n / ssim_d) / 2, 0.0, 1.0)


def monodepth_edge_aware_smoothness_loss(disp: jnp.ndarray, img: jnp.ndarray) -> jnp.ndarray:
    """Edge-aware smoothness map, zero-padded to (B, H, W, 1). NHWC:
    disp (B, H, W, 1), img (B, H, W, 3)."""
    grad_disp_x = jnp.abs(disp[:, :, :-1, :] - disp[:, :, 1:, :])
    grad_disp_y = jnp.abs(disp[:, :-1, :, :] - disp[:, 1:, :, :])

    grad_img_x = jnp.mean(jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :]), axis=-1, keepdims=True)
    grad_img_y = jnp.mean(jnp.abs(img[:, :-1, :, :] - img[:, 1:, :, :]), axis=-1, keepdims=True)

    grad_disp_x = grad_disp_x * jnp.exp(-grad_img_x)
    grad_disp_y = grad_disp_y * jnp.exp(-grad_img_y)

    grad_disp_x = jnp.pad(grad_disp_x, ((0, 0), (0, 0), (0, 1), (0, 0)))
    grad_disp_y = jnp.pad(grad_disp_y, ((0, 0), (0, 1), (0, 0), (0, 0)))
    return grad_disp_x + grad_disp_y


def monodepth_loss(
    pred_disp: jnp.ndarray,
    true_img: jnp.ndarray,
    warped_img: jnp.ndarray,
    smoothness_weight: float = 0.001,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Monodepth photometric loss map: 0.85*SSIM + 0.15*L1 + w_s*smooth.

    Returns (total, l1, ssim, smooth) maps, each (B, H, W, 1).
    """
    photo_ssim = jnp.mean(ssim(true_img, warped_img), axis=-1, keepdims=True)
    photo_l1 = jnp.mean(jnp.abs(true_img - warped_img), axis=-1, keepdims=True)
    l_photo = 0.85 * photo_ssim + 0.15 * photo_l1

    mean_disp = jnp.mean(pred_disp, axis=(1, 2), keepdims=True)
    norm_disp = pred_disp / (mean_disp + 1e-7)
    l_smooth = monodepth_edge_aware_smoothness_loss(norm_disp, true_img)

    return l_photo + smoothness_weight * l_smooth, photo_l1, photo_ssim, l_smooth


def monodepth_single_loss(
    left_img: jnp.ndarray,
    right_img: jnp.ndarray,
    pred_disp_l: jnp.ndarray,
    smoothness_weight: float = 1e-3,
    max_disp: Optional[int] = None,
    warp_precision: str = "highest",
):
    """Single-sided adaptation loss (reference adapt.py:78-86): warp the right
    image to the left view with the left disparity, photometric loss, masked
    mean over the warp validity mask.

    max_disp: optional static disparity bound forwarded to the warp's banded
    one-hot matmul (see ops/warp.py) — engines pass the model's maxdisp at
    the loss scale.
    warp_precision: MXU precision of the warp contraction; "highest"
    (default) is exact grid_sample parity, "high" is 2.7e-5 off and ~30%
    faster backward, "default" is 4e-3 off and ~2.4x faster backward at
    fleet batch sizes (artifacts/exp_warp_precision_r4.log).

    Returns (scalar loss, left_warped image).
    """
    left_warped, mask = linear_warp(right_img, pred_disp_l, right_to_left=True,
                                    max_disp=max_disp,
                                    precision=warp_precision)
    l_total = monodepth_loss(pred_disp_l, left_img, left_warped, smoothness_weight)[0]
    m = mask.astype(l_total.dtype)
    loss = jnp.sum(l_total * m) / jnp.maximum(jnp.sum(m), 1.0)
    return loss, left_warped


def monodepth_leftright_loss(
    left_img: jnp.ndarray,
    right_img: jnp.ndarray,
    pred_disp_l: jnp.ndarray,
    pred_disp_r: jnp.ndarray,
    smoothness_weight: float = 1e-3,
    consistency_weight: float = 1e-3,
    max_disp: Optional[int] = None,
    warp_precision: str = "highest",
):
    """Left-right consistency Monodepth loss — the evident intent of reference
    loss_functions.py:141-190 (whose committed version is dead code; see module
    docstring). Occlusion masks: occ = pred_disp >= 0.95 * cross-warped disp.

    Returns (scalar loss, dict of warped outputs).
    """
    warped_disp_l, _ = linear_warp(pred_disp_r, pred_disp_l, right_to_left=True,
                                   max_disp=max_disp, precision=warp_precision)
    warped_disp_r, _ = linear_warp(pred_disp_l, pred_disp_r, right_to_left=False,
                                   max_disp=max_disp, precision=warp_precision)

    occ_mask_l = (pred_disp_l >= 0.95 * warped_disp_l)
    occ_mask_r = (pred_disp_r >= 0.95 * warped_disp_r)

    left_warped, left_mask = linear_warp(right_img, pred_disp_l, right_to_left=True,
                                         max_disp=max_disp,
                                         precision=warp_precision)
    right_warped, right_mask = linear_warp(left_img, pred_disp_r, right_to_left=False,
                                           max_disp=max_disp,
                                           precision=warp_precision)

    mask_l = jax.lax.stop_gradient((occ_mask_l & left_mask).astype(left_img.dtype))
    mask_r = jax.lax.stop_gradient((occ_mask_r & right_mask).astype(left_img.dtype))

    l_left = monodepth_loss(pred_disp_l, left_img, left_warped, smoothness_weight)[0]
    l_right = monodepth_loss(pred_disp_r, right_img, right_warped, smoothness_weight)[0]

    def masked_mean(x, m):
        return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)

    l_consistency = jnp.mean(mask_l * jnp.abs(pred_disp_l - warped_disp_l)) + jnp.mean(
        mask_r * jnp.abs(pred_disp_r - warped_disp_r)
    )
    total = (
        masked_mean(l_left, mask_l)
        + masked_mean(l_right, mask_r)
        + consistency_weight * l_consistency
    )
    outputs = {
        "left_warped": left_warped * mask_l,
        "right_warped": right_warped * mask_r,
    }
    return total, outputs
