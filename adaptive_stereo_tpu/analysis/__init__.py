"""Analysis harness: FCS/OOD analysis, results pipeline, cost-volume plots,
timing benchmarks (reference evaluation/ directory equivalents)."""

from .ood import (
    compute_fcs_for_loader,
    compute_precision_recall,
    precision_recall_curve,
    derive_percentile_threshold,
)
from .results import collate_trials, results_to_csv
from .timing import time_stereonet
