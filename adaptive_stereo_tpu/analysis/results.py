"""Adaptation results pipeline (reference evaluation/preprocess_adapt_results.py
and generate_adaptation_plots.py).

Collates per-method trials.csv files into the long-form results table
(Method / Step / EPE / FCS / Domain / GradientUpdates) and renders the
paper's line plots and bar charts.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

METHOD_LEGEND = {"nonstop": "MAD-FULL", "vs": "VS", "er": "ER", "vs+er": "VS + ER"}


def collate_trials(
    trials_by_method: Dict[str, str],
    steps: Sequence[int] = (1000, 2000, 3000, 4000),
    pre_adapt_method: Optional[str] = "nonstop",
):
    """Build the long-form results DataFrame from per-method trials.csv paths.

    `pre_adapt_method`: method whose step==-1 (pre-adaptation) row is
    included (the reference only evaluates pre-adaptation once, for nonstop —
    preprocess_adapt_results.py:44-46).
    """
    import pandas as pd

    rows: Dict[str, List] = {"Method": [], "Step": [], "EPE": [], "FCS": [],
                             "Domain": [], "GradientUpdates": []}
    for method, csv_path in trials_by_method.items():
        if not os.path.exists(csv_path):
            raise FileNotFoundError(f"missing trials.csv for {method}: {csv_path}")
        df = pd.read_csv(csv_path, header=0)
        if df["trial"].nunique() != 1:
            raise ValueError(f"{csv_path}: expected a single trial")

        use_steps = list(steps)
        if method == pre_adapt_method:
            use_steps.insert(0, -1)

        for step in use_steps:
            sel = df[df["step"] == step]
            if len(sel) == 0:
                continue
            for domain in ("TRAIN", "ADAPT"):
                rows["Method"].append(METHOD_LEGEND.get(method, method))
                rows["Step"].append(step)
                rows["EPE"].append(sel[f"EPE_{domain}"].iloc[0])
                rows["FCS"].append(sel[f"FCS_{domain}"].iloc[0])
                rows["Domain"].append(domain)
                gu = sel["GRADIENT_UPDATES"].iloc[0] if "GRADIENT_UPDATES" in sel else 0
                rows["GradientUpdates"].append(gu)
    return pd.DataFrame(rows)


def results_to_csv(trials_by_method: Dict[str, str], output_path: str, **kw) -> None:
    collate_trials(trials_by_method, **kw).to_csv(output_path, index=False)


def plot_adaptation_curves(results_df, output_path: str, metric: str = "EPE") -> None:
    """Per-domain metric-vs-step line plots, one line per method."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    for ax, domain in zip(axes, ("ADAPT", "TRAIN")):
        sub = results_df[results_df["Domain"] == domain]
        for method in sub["Method"].unique():
            ms = sub[sub["Method"] == method].sort_values("Step")
            ax.plot(ms["Step"], ms[metric], marker="o", label=method)
        ax.set_title(f"{domain} domain")
        ax.set_xlabel("adaptation step")
        ax.set_ylabel(metric)
    axes[0].legend()
    fig.tight_layout()
    fig.savefig(output_path, bbox_inches="tight")
    plt.close(fig)


def plot_gradient_updates_bar(results_df, output_path: str,
                              step: int = 4000) -> None:
    """Gradient-updates-at-budget bar chart (efficiency headline)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    sub = results_df[(results_df["Step"] == step) & (results_df["Domain"] == "ADAPT")]
    fig, ax = plt.subplots(figsize=(5, 4))
    ax.bar(sub["Method"], sub["GradientUpdates"])
    ax.set_ylabel(f"gradient updates @ {step} steps")
    fig.tight_layout()
    fig.savefig(output_path, bbox_inches="tight")
    plt.close(fig)
