"""Metrics logging: TensorBoard writers, console banners, trials.csv.

Behavioral contract from reference train.py:25-71 (log_scalars / log_images),
adapt.py:175-184,247-271 (trials.csv accumulation with trial resume).
"""

from __future__ import annotations

import json
import os
import subprocess
from typing import Dict, Iterable, Optional

import numpy as np


def git_sha(default: str = "unknown") -> str:
    """Current repo commit hash for run provenance (reference train.py:149-152
    uses gitpython; a subprocess keeps this dependency-free)."""
    try:
        out = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=5,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        sha = out.stdout.strip()
        return sha if out.returncode == 0 and sha else default
    except Exception:
        return default


def write_opt_json(log_path: str, cfg) -> dict:
    """Dump the run configuration + git commit hash to <log_path>/opt.json
    (reference train.py:149-160: opt.commit_hash = sha; json dump)."""
    d = json.loads(cfg.to_json())
    d["commit_hash"] = git_sha()
    os.makedirs(log_path, exist_ok=True)
    with open(os.path.join(log_path, "opt.json"), "w") as f:
        f.write(json.dumps(d, sort_keys=True, indent=2) + "\n")
    return d


def _contains_prefix(name: str, prefixes: Iterable[str]) -> bool:
    return any(p in name for p in prefixes)


class MetricsWriter:
    """Thin TensorBoard writer that degrades to no-op if tensorboardX is
    unavailable, plus the reference's console banner format."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        try:
            from tensorboardX import SummaryWriter

            self._writer = SummaryWriter(log_dir)
        except Exception:
            self._writer = None

    def add_scalar(self, name: str, value, step: int) -> None:
        if self._writer is not None:
            self._writer.add_scalar(name, float(value), step)

    def add_image(self, name: str, img_hwc: np.ndarray, step: int) -> None:
        if self._writer is not None:
            self._writer.add_image(name, np.moveaxis(img_hwc, -1, 0), step)

    def log_images(self, inputs: Dict, outputs: Dict, step: int,
                   skip_prefixes: Iterable[str] = ("cost_volume", "fcs")) -> None:
        """Colorized disparity / raw RGB panels for the first batch element
        (reference train.py:54-71 log_images): keys containing 'disp' get the
        per-image-normalized colormap; other image-shaped entries go through
        raw; cost volumes are skipped."""
        if self._writer is None:
            return
        from .visualization import apply_disparity_colormap

        for io in (inputs, outputs):
            for name, v in io.items():
                if _contains_prefix(name, skip_prefixes):
                    continue
                arr = np.asarray(v[0], np.float32)  # first batch element
                if arr.ndim != 3:
                    continue
                if "disp" in name:
                    viz = apply_disparity_colormap(arr)
                else:
                    viz = np.clip(arr, 0.0, 1.0)
                    if viz.shape[-1] == 1:
                        viz = np.repeat(viz, 3, axis=-1)
                    elif viz.shape[-1] != 3:
                        continue
                self.add_image(name, viz, step)

    def log_scalars(self, metrics: Dict, losses: Dict, examples_per_sec: float,
                    epoch: int, step: int) -> None:
        for name, v in losses.items():
            self.add_scalar(name, v, step)
        for name, v in metrics.items():
            self.add_scalar(name, v, step)
        self.add_scalar("examples_per_sec", examples_per_sec, step)

        print(f"\n{epoch}|{step}" + "=" * 70)
        print(f"TIMING  // examples/sec={examples_per_sec:.3f}")
        if metrics:
            print(
                "METRICS // EPE={:.3f} | >2px={:.3f} | >3px={:.3f} | >4px={:.3f} | >5px={:.3f}".format(
                    *(float(metrics.get(k, -1)) for k in
                      ("EPE", "D1_all_2px", "D1_all_3px", "D1_all_4px", "D1_all_5px"))
                )
            )
        if losses:
            print("LOSS    // " + " | ".join(
                f"{n}={float(v):.3f}" for n, v in losses.items()))
        print("=" * 75 + "\n")

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()


class TrialsLog:
    """Durable per-run results table: trials.csv with resume semantics
    (reference adapt.py:247-271)."""

    def __init__(self, path: str):
        import pandas as pd

        self.path = path
        if os.path.exists(path):
            self.df = pd.read_csv(path)
            self.trial_index = int(self.df["trial"].max()) + 1
            print(f"\nNOTE: Found existing trials.csv, running trial #{self.trial_index}")
        else:
            self.df = pd.DataFrame()
            self.trial_index = 0
            print("\nNOTE: No existing trials.csv, starting from trial #0")

    def append(self, metrics_adapt: Dict, metrics_train: Dict,
               gradient_updates: Optional[Dict], step: int) -> None:
        import pandas as pd

        d: Dict = {"trial": self.trial_index, "step": step}
        for k, v in metrics_adapt.items():
            d[k + "_ADAPT"] = [float(v)]
        for k, v in metrics_train.items():
            d[k + "_TRAIN"] = [float(v)]
        for k, v in (gradient_updates or {}).items():
            d[k] = [v]
        self.df = pd.concat([self.df, pd.DataFrame(d)], ignore_index=True)
        self.df.to_csv(self.path, index=False)
