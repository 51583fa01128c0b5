"""Serving configuration (behavioral contract of reference ros/config.py:12-62,
minus ROS topic plumbing — ROS itself is out of scope, the stream-API shape is
kept per SURVEY.md §3.5)."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


def _default_intrinsics() -> np.ndarray:
    return np.array(
        [[1329.0, 0.0, 607.5], [0.0, 1329.0, 159.5], [0.0, 0.0, 1.0]], np.float64
    )


@dataclass
class ServingConfig:
    model_input_height: int = 320
    model_input_width: int = 1216
    stereonet_k: int = 4
    input_scale: int = 0
    load_weights_folder: str = ""

    max_depth: float = 100.0
    stereo_baseline_meters: float = 1.0
    voxel_disp_scale: int = 2        # pyramid scale used for the voxel map
    voxel_scale_meters: float = 0.15
    publish_disp_hz: float = 20.0
    publish_color_point_cloud: bool = True
    camera_intrinsics: np.ndarray = field(default_factory=_default_intrinsics)
    compute_dtype: str = "bfloat16"
    # Fused Pallas cost-aggregation kernel for the forward pass. Measured on
    # TPU v5e at the paper cost-volume shape in the modes that matter:
    #   train-mode B=2 (streaming fwd):  1.358 vs 1.45 ms XLA bf16 (faster;
    #     artifacts/exp_agg_r2b.log)
    #   EVAL-mode   B=1 (this config):   0.733 vs 0.690 ms XLA bf16 (SLOWER;
    #     parity verified, artifacts/exp_agg_eval_r3.log)
    #   EVAL-mode   B=2 (batched DONE):  0.821 vs 1.061 ms XLA bf16 (faster)
    # The sync serving path is batch-1 eval, where the kernel loses — so the
    # default is OFF; enable for batched (B>=2) pipelines. Training paths
    # keep the XLA stack (fwd+bwd parity: the kernel's VJP rematerializes
    # the XLA twin). Auto-falls back off-TPU and for shapes the kernel does
    # not cover.
    pallas_aggregation: bool = False
    # Fully fused Pallas coarse head (cost-volume build + aggregation +
    # soft-argmin/FCS in ONE VMEM-resident kernel, ops/pallas/coarse_head.py).
    # Default decided by measurement at the serving config (B=1 eval bf16):
    # see PERFORMANCE.md "Fused coarse head" and artifacts/exp_coarse_head.log.
    fused_coarse_head: bool = False
