"""Online exponential moving average (TensorBoard smoothing semantics).

Reference: adaptive_stereo/utils/ema.py:1-13. Host-side scalar math — used to
smooth the raw Feature Contrast Score stream before OOD thresholding
(adapt.py:355-359, weight 0.999).
"""

from __future__ import annotations


def online_ema(s_last: float, v_new: float, weight: float = 0.999) -> float:
    """One EMA update: s = w*s_last + (1-w)*v_new."""
    return s_last * weight + (1.0 - weight) * v_new
