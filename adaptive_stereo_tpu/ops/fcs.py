"""Feature Contrast Score (FCS) — the cost-volume OOD signal.

Reference behavior (adaptive_stereo/utils/feature_contrast.py:12-23): per pixel,
sort the D cost entries descending; FCS = sorted[0] - mean(sorted[2:]). The
top-2 entries are skipped because soft-argmin sub-pixel interpolation makes the
two best-matching disparities both score high on in-distribution data.

TPU-first design: a full sort over D is unnecessary — only the two largest
values are needed, since mean(sorted[2:]) == (sum - top1 - top2) / (D - 2).
We use lax.top_k(k=2) + a sum, which XLA lowers to a couple of vectorized
passes over the (small, static) disparity axis and fuses with the producer.
A low FCS means the cost volume has no confident match anywhere -> novel frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def feature_contrast_mean(cost_volume: jnp.ndarray) -> jnp.ndarray:
    """Max-minus-mean FCS, skipping the top-2 disparities.

    Args:
      cost_volume: shape (B, D, H, W), pre-softmax aggregated cost.

    Returns:
      Per-pixel FCS map, shape (B, H, W).
    """
    d = cost_volume.shape[1]
    if d < 3:
        raise ValueError(f"FCS requires D >= 3 disparities, got {d}")
    # (B, H, W, D) so top_k runs over the trailing axis.
    cv = jnp.moveaxis(cost_volume, 1, -1)
    cv = jax.lax.stop_gradient(cv)
    top2, _ = jax.lax.top_k(cv, 2)
    total = jnp.sum(cv, axis=-1)
    mean_nonmax = (total - top2[..., 0] - top2[..., 1]) / (d - 2)
    return top2[..., 0] - mean_nonmax


def feature_contrast_median(cost_volume: jnp.ndarray) -> jnp.ndarray:
    """Max-minus-median FCS variant (reference feature_contrast.py:4-9).

    torch.median returns the LOWER of the two middle values for an even count,
    so we take sorted[(D-1)//2] rather than averaging the middle pair.
    """
    d = cost_volume.shape[1]
    cv = jax.lax.stop_gradient(cost_volume)
    max_each = jnp.max(cv, axis=1)
    med_each = jnp.sort(cv, axis=1)[:, (d - 1) // 2]
    return max_each - med_each
