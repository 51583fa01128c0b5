"""Evaluation loop — the metrics comparison contract (reference
train.py:74-126 / SURVEY.md §3.4).

EPE, D1-all@{2,3,4,5}px, FCS; per-batch means averaged over batches. The
fast_eval (1/10 of batches) and num_steps capping quirks are preserved so
numbers are comparable with reference logs.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np


def evaluate(eval_step, params, batch_stats, loader, fast_eval: bool = False,
             num_steps: int = -1) -> Dict[str, float]:
    num_batches = len(loader) // 10 if fast_eval else len(loader)
    if num_steps > 0:
        num_batches = min(num_steps // loader.batch_size, len(loader))
    num_batches = max(num_batches, 1)

    acc: Dict[str, list] = {}
    for i, batch in enumerate(loader):
        if i >= num_batches:
            break
        device_batch = {k: jax.device_put(v) for k, v in batch.items()}
        metrics = eval_step(params, batch_stats, device_batch)
        for k, v in metrics.items():
            acc.setdefault(k, []).append(float(v))
    return {k: float(np.mean(v)) for k, v in acc.items()}
