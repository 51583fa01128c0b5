"""Image entropy utilities (exploratory OOD signals).

Reference: adaptive_stereo/utils/entropy.py:4-46. Tested but not used in the
live adaptation path; kept for parity of the analysis toolbox.
"""

from __future__ import annotations

import jax.numpy as jnp


def _shannon_entropy_from_counts(bin_counts: jnp.ndarray, num_pixels: int) -> jnp.ndarray:
    bin_probs = bin_counts.astype(jnp.float32) / float(num_pixels)
    log_probs = jnp.where(bin_probs > 0, jnp.log2(jnp.where(bin_probs > 0, bin_probs, 1.0)), 0.0)
    return -jnp.sum(bin_probs * log_probs)


def grayscale_shannon_entropy(img: jnp.ndarray) -> jnp.ndarray:
    """Shannon entropy of the 256-bin grayscale intensity histogram.

    img: float image in [0, 1], any shape (single image, not batched —
    matching the reference's contract).
    """
    img_256 = jnp.clip((255.0 * img).astype(jnp.int32), 0, 255)
    counts = jnp.zeros((256,), jnp.int32).at[img_256.reshape(-1)].add(1)
    return _shannon_entropy_from_counts(counts, img_256.size)


def gradient_shannon_entropy(img: jnp.ndarray) -> jnp.ndarray:
    """Entropy of the horizontal intensity-gradient histogram (256 bins over
    [-255, 255], bin width ~2 — mirroring torch.histc(256, min=-255, max=255))."""
    if img.ndim != 2:
        raise ValueError("gradient_shannon_entropy expects a single (H, W) image")
    img_256 = (255.0 * img).astype(jnp.int32)
    diff_x = (img_256[:, 1:] - img_256[:, :-1]).astype(jnp.float32)
    # torch.histc: 256 uniform bins over [-255, 255]; values at the right edge
    # fall into the last bin.
    bin_idx = jnp.clip(((diff_x + 255.0) * (256.0 / 510.0)).astype(jnp.int32), 0, 255)
    counts = jnp.zeros((256,), jnp.int32).at[bin_idx.reshape(-1)].add(1)
    return _shannon_entropy_from_counts(counts, diff_x.size)
