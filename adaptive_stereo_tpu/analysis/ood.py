"""FCS-based OOD analysis (reference evaluation/ood_analysis.py).

Computes per-image Feature Contrast Scores for train vs novel datasets, the
precision/recall of the threshold classifier ("novel if FCS <= cutoff",
reference :108-119), and the Gaussian-percentile threshold derivation that
produced the canonical OOD_THRESHOLD constants (reference :196-236 — 1st-5th
percentile of the train-domain FCS distribution under a normal fit).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import numpy as np


def compute_fcs_for_loader(model, variables, loader, input_scale: int, k: int,
                           max_batches: Optional[int] = None) -> np.ndarray:
    """Per-IMAGE mean FCS over a loader (eval mode). Returns (N,) array."""
    import jax.numpy as jnp

    from ..ops import feature_contrast_mean

    coarse = input_scale + k

    @jax.jit
    def fcs_batch(variables, left, right):
        out = model.apply(variables, left, right, side="l",
                          output_cost_volume=True, train=False)
        return jnp.mean(feature_contrast_mean(out[f"cost_volume_l/{coarse}"]), axis=(1, 2))

    scores = []
    for i, batch in enumerate(loader):
        if max_batches is not None and i >= max_batches:
            break
        left = jnp.asarray(batch[f"color_l/{input_scale}"])
        right = jnp.asarray(batch[f"color_r/{input_scale}"])
        scores.append(np.asarray(fcs_batch(variables, left, right)))
    return np.concatenate(scores)


def compute_precision_recall(train_values: np.ndarray, novel_values: np.ndarray,
                             cutoff: float) -> Tuple[float, float]:
    """Classifier: novel iff value <= cutoff (reference ood_analysis.py:105-119)."""
    tp = int((novel_values <= cutoff).sum())
    fn = int((novel_values > cutoff).sum())
    fp = int((train_values <= cutoff).sum())
    pr = tp / (tp + fp) if (tp + fp) > 0 else 1.0
    re = tp / (tp + fn)
    return pr, re


def precision_recall_curve(train_values: np.ndarray, novel_values: np.ndarray,
                           num: int = 100):
    """PR over cutoffs spanning the novel FCS range (reference :122-137)."""
    cutoffs = np.linspace(novel_values.min(), novel_values.max(), num=num)
    pr = np.zeros(num)
    re = np.zeros(num)
    for i, c in enumerate(cutoffs):
        pr[i], re[i] = compute_precision_recall(train_values, novel_values, c)
    return cutoffs, pr, re


def derive_percentile_threshold(train_values: np.ndarray,
                                percentile: float = 0.05) -> float:
    """Gaussian-fit percentile of the train FCS distribution — how the
    canonical OOD thresholds were derived (reference :204-209)."""
    from scipy import stats

    mu = float(train_values.mean())
    sigma = math.sqrt(float(train_values.var()))
    return float(stats.norm.ppf(percentile, loc=mu, scale=sigma))


def plot_fcs_histogram(train_values, novel_values, output_path: str,
                       percentile: float = 0.05) -> None:
    """Overlaid train/novel FCS histograms with the Gaussian percentile line
    (reference :190-236)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from scipy import stats

    plt.clf()
    bins = np.histogram(np.hstack((train_values, novel_values)), bins=40)[1]
    y1, _, _ = plt.hist(train_values, bins, facecolor="blue", density=True,
                        alpha=0.5, label="train")
    y2, _, _ = plt.hist(novel_values, bins, facecolor="red", density=True,
                        alpha=0.5, label="novel")
    plt.xlabel("feature contrast score")
    plt.ylabel("frequency")

    mu, sigma = train_values.mean(), math.sqrt(train_values.var())
    pct_x = stats.norm.ppf(percentile, loc=mu, scale=sigma)
    plt.vlines(pct_x, 0, max(y1.max(), y2.max()), colors="black",
               linestyles=(0, (5, 5)))
    plt.plot(bins, stats.norm.pdf(bins, mu, sigma), color="black")
    plt.legend(loc="upper left", fontsize="large")
    plt.savefig(output_path, bbox_inches="tight")


def plot_precision_recall(train_values, novel_values, output_path: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _, pr, re = precision_recall_curve(train_values, novel_values)
    plt.clf()
    plt.plot(re, pr)
    plt.xlabel("recall")
    plt.ylabel("precision")
    plt.ylim(0, 1.05)
    plt.savefig(output_path, bbox_inches="tight")
