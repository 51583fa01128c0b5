"""TensorBoard scalar extraction (reference evaluation/tensorboard_plot.py).

Pulls scalar series (EPE / FCS / losses) out of event files written by the
engines' MetricsWriter, optionally applies the TensorBoard-style EMA
smoothing (ops.online_ema — the same smoothing the OOD gate uses), and
exports to pandas/CSV for plotting.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from ..ops import online_ema


def _find_event_files(log_dir: str) -> List[str]:
    out = []
    for dirpath, _dirs, files in os.walk(log_dir):
        for fn in files:
            if "tfevents" in fn:
                out.append(os.path.join(dirpath, fn))
    return sorted(out)


def read_scalars(log_dir: str, tags: Optional[List[str]] = None) -> Dict[str, "object"]:
    """Returns {tag: (steps ndarray, values ndarray)} for every scalar tag
    (or the requested subset) under log_dir."""
    try:
        from tensorboard.backend.event_processing.event_accumulator import (
            EventAccumulator,
        )
    except ImportError as e:  # pragma: no cover
        raise ImportError("tensorboard is required for scalar extraction") from e

    series: Dict[str, List] = {}
    for path in _find_event_files(log_dir):
        acc = EventAccumulator(os.path.dirname(path), size_guidance={"scalars": 0})
        acc.Reload()
        for tag in acc.Tags().get("scalars", []):
            if tags is not None and tag not in tags:
                continue
            for ev in acc.Scalars(tag):
                series.setdefault(tag, []).append((ev.step, ev.value))

    out = {}
    for tag, pairs in series.items():
        pairs.sort()
        steps = np.asarray([p[0] for p in pairs])
        values = np.asarray([p[1] for p in pairs])
        out[tag] = (steps, values)
    return out


def smooth_series(values: np.ndarray, weight: float = 0.999) -> np.ndarray:
    """TensorBoard EMA smoothing (ops/ema.py semantics)."""
    out = np.empty_like(values, dtype=np.float64)
    s = float(values[0])
    for i, v in enumerate(values):
        s = online_ema(s, float(v), weight)
        out[i] = s
    return out


def scalars_to_csv(log_dir: str, output_csv: str,
                   tags: Optional[List[str]] = None,
                   smooth_weight: Optional[float] = None) -> None:
    import pandas as pd

    data = read_scalars(log_dir, tags)
    frames = []
    for tag, (steps, values) in data.items():
        df = pd.DataFrame({"step": steps, "tag": tag, "value": values})
        if smooth_weight is not None:
            df["smoothed"] = smooth_series(values, smooth_weight)
        frames.append(df)
    pd.concat(frames, ignore_index=True).to_csv(output_csv, index=False)
