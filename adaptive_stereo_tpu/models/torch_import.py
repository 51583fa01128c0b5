"""Import reference PyTorch checkpoints into flax variable trees.

The reference saves `feature_net.pth` / `stereo_net.pth` state dicts
(reference train.py:129-137, scripts/split_state_dict.py). This module maps
those names 1:1 onto our flax module tree so EPE parity can be verified with
pretrained weights before any training works (SURVEY.md §7 step 2).

Weight layout conversions:
  Conv2d  (O, I, kh, kw)     -> (kh, kw, I, O)
  Conv3d  (O, I, kd, kh, kw) -> (kd, kh, kw, I, O)
  BatchNorm weight/bias/running_mean/running_var -> scale/bias and
  batch_stats mean/var.

torch is only used (CPU) to deserialize .pth files; all math is JAX.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import numpy as np


def _conv2d(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _conv3d(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 4, 1, 0))


def _np(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _convbn(sd, torch_conv: str, torch_bn: str) -> Tuple[dict, dict]:
    """Returns (params, batch_stats) for a ConvBN module."""
    params = {
        "conv": {"kernel": _conv2d(sd[f"{torch_conv}.weight"]), "bias": sd[f"{torch_conv}.bias"]},
        "bn": {"scale": sd[f"{torch_bn}.weight"], "bias": sd[f"{torch_bn}.bias"]},
    }
    stats = {"bn": {"mean": sd[f"{torch_bn}.running_mean"], "var": sd[f"{torch_bn}.running_var"]}}
    return params, stats


def _basic_block(sd, prefix: str) -> Tuple[dict, dict]:
    """BasicBlock: torch conv1 = Sequential(Sequential(conv, bn), leaky) so the
    conv is `conv1.0.0` and bn `conv1.0.1`.

    The reference block also owns a `conv2` that its forward() never applies
    (reference stereo_net.py:44-51) — those tensors are dead weight in every
    checkpoint, so they are intentionally NOT imported."""
    p1, s1 = _convbn(sd, f"{prefix}.conv1.0.0", f"{prefix}.conv1.0.1")
    return {"conv1": p1}, {"conv1": s1}


def import_feature_net_state_dict(sd: Dict[str, Any], k: int) -> Tuple[dict, dict]:
    """Map a reference FeatureExtractorNetwork state dict to flax
    (params, batch_stats) for models.FeatureExtractorNetwork."""
    sd = _np(sd)
    params: dict = {}
    stats: dict = {}
    for i in range(k):
        params[f"downsample_{i}"] = {
            "kernel": _conv2d(sd[f"downsample.{i}.weight"]),
            "bias": sd[f"downsample.{i}.bias"],
        }
    for i in range(6):
        p, s = _basic_block(sd, f"residual_blocks.{i}")
        params[f"residual_{i}"] = p
        stats[f"residual_{i}"] = s
    params["conv_alone"] = {
        "kernel": _conv2d(sd["conv_alone.weight"]),
        "bias": sd["conv_alone.bias"],
    }
    return params, stats


def import_stereo_net_state_dict(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """Map a reference StereoNet state dict to flax (params, batch_stats) for
    models.StereoNet."""
    sd = _np(sd)
    params: dict = {}
    stats: dict = {}
    for i in range(4):
        params[f"filter_{i}"] = {
            "conv": {
                "kernel": _conv3d(sd[f"filter.{i}.0.0.weight"]),
                "bias": sd[f"filter.{i}.0.0.bias"],
            },
            "bn": {"scale": sd[f"filter.{i}.0.1.weight"], "bias": sd[f"filter.{i}.0.1.bias"]},
        }
        stats[f"filter_{i}"] = {
            "bn": {
                "mean": sd[f"filter.{i}.0.1.running_mean"],
                "var": sd[f"filter.{i}.0.1.running_var"],
            }
        }
    params["conv3d_alone"] = {
        "kernel": _conv3d(sd["conv3d_alone.weight"]),
        "bias": sd["conv3d_alone.bias"],
    }

    ref = "edge_aware_refinements.0"
    rp: dict = {}
    rs: dict = {}
    p, s = _convbn(sd, f"{ref}.conv2d_feature.0.0", f"{ref}.conv2d_feature.0.1")
    rp["conv2d_feature"] = p
    rs["conv2d_feature"] = s
    for i in range(6):
        p, s = _basic_block(sd, f"{ref}.residual_astrous_blocks.{i}")
        rp[f"astrous_{i}"] = p
        rs[f"astrous_{i}"] = s
    rp["conv2d_out"] = {
        "kernel": _conv2d(sd[f"{ref}.conv2d_out.weight"]),
        "bias": sd[f"{ref}.conv2d_out.bias"],
    }
    params["refinement_0"] = rp
    stats["refinement_0"] = rs
    return params, stats


def _inv_conv2d(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (3, 2, 0, 1))


def _inv_conv3d(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (4, 3, 0, 1, 2))


def export_feature_net_state_dict(params: dict, stats: dict, k: int) -> Dict[str, np.ndarray]:
    """Inverse of import_feature_net_state_dict: flax -> reference torch
    state-dict names (dead conv2 tensors are zero-filled so strict torch
    loading still works)."""
    sd: Dict[str, np.ndarray] = {}

    def put_convbn(prefix_conv, prefix_bn, p, st):
        sd[f"{prefix_conv}.weight"] = _inv_conv2d(p["conv"]["kernel"])
        sd[f"{prefix_conv}.bias"] = np.asarray(p["conv"]["bias"])
        sd[f"{prefix_bn}.weight"] = np.asarray(p["bn"]["scale"])
        sd[f"{prefix_bn}.bias"] = np.asarray(p["bn"]["bias"])
        sd[f"{prefix_bn}.running_mean"] = np.asarray(st["bn"]["mean"])
        sd[f"{prefix_bn}.running_var"] = np.asarray(st["bn"]["var"])
        sd[f"{prefix_bn}.num_batches_tracked"] = np.asarray(0)

    for i in range(k):
        sd[f"downsample.{i}.weight"] = _inv_conv2d(params[f"downsample_{i}"]["kernel"])
        sd[f"downsample.{i}.bias"] = np.asarray(params[f"downsample_{i}"]["bias"])
    for i in range(6):
        p, st = params[f"residual_{i}"], stats[f"residual_{i}"]
        put_convbn(f"residual_blocks.{i}.conv1.0.0", f"residual_blocks.{i}.conv1.0.1",
                   p["conv1"], st["conv1"])
        # Dead conv2 (never applied in the reference forward): zeros.
        c = p["conv1"]["conv"]["kernel"].shape[-1]
        sd[f"residual_blocks.{i}.conv2.0.weight"] = np.zeros((c, c, 3, 3), np.float32)
        sd[f"residual_blocks.{i}.conv2.0.bias"] = np.zeros((c,), np.float32)
        sd[f"residual_blocks.{i}.conv2.1.weight"] = np.ones((c,), np.float32)
        sd[f"residual_blocks.{i}.conv2.1.bias"] = np.zeros((c,), np.float32)
        sd[f"residual_blocks.{i}.conv2.1.running_mean"] = np.zeros((c,), np.float32)
        sd[f"residual_blocks.{i}.conv2.1.running_var"] = np.ones((c,), np.float32)
        sd[f"residual_blocks.{i}.conv2.1.num_batches_tracked"] = np.asarray(0)
    sd["conv_alone.weight"] = _inv_conv2d(params["conv_alone"]["kernel"])
    sd["conv_alone.bias"] = np.asarray(params["conv_alone"]["bias"])
    return sd


def export_stereo_net_state_dict(params: dict, stats: dict) -> Dict[str, np.ndarray]:
    """Inverse of import_stereo_net_state_dict: flax -> reference torch
    state-dict names (strict-loadable; dead conv2 tensors zero-filled)."""
    sd: Dict[str, np.ndarray] = {}

    def put_bn(prefix_bn, p, st):
        sd[f"{prefix_bn}.weight"] = np.asarray(p["bn"]["scale"])
        sd[f"{prefix_bn}.bias"] = np.asarray(p["bn"]["bias"])
        sd[f"{prefix_bn}.running_mean"] = np.asarray(st["bn"]["mean"])
        sd[f"{prefix_bn}.running_var"] = np.asarray(st["bn"]["var"])
        sd[f"{prefix_bn}.num_batches_tracked"] = np.asarray(0)

    for i in range(4):
        p, st = params[f"filter_{i}"], stats[f"filter_{i}"]
        sd[f"filter.{i}.0.0.weight"] = _inv_conv3d(p["conv"]["kernel"])
        sd[f"filter.{i}.0.0.bias"] = np.asarray(p["conv"]["bias"])
        put_bn(f"filter.{i}.0.1", p, st)
    sd["conv3d_alone.weight"] = _inv_conv3d(params["conv3d_alone"]["kernel"])
    sd["conv3d_alone.bias"] = np.asarray(params["conv3d_alone"]["bias"])

    ref = "edge_aware_refinements.0"
    rp, rs = params["refinement_0"], stats["refinement_0"]
    sd[f"{ref}.conv2d_feature.0.0.weight"] = _inv_conv2d(rp["conv2d_feature"]["conv"]["kernel"])
    sd[f"{ref}.conv2d_feature.0.0.bias"] = np.asarray(rp["conv2d_feature"]["conv"]["bias"])
    put_bn(f"{ref}.conv2d_feature.0.1", rp["conv2d_feature"], rs["conv2d_feature"])
    for i in range(6):
        bp, bs = rp[f"astrous_{i}"], rs[f"astrous_{i}"]
        pre = f"{ref}.residual_astrous_blocks.{i}"
        sd[f"{pre}.conv1.0.0.weight"] = _inv_conv2d(bp["conv1"]["conv"]["kernel"])
        sd[f"{pre}.conv1.0.0.bias"] = np.asarray(bp["conv1"]["conv"]["bias"])
        put_bn(f"{pre}.conv1.0.1", bp["conv1"], bs["conv1"])
        c = bp["conv1"]["conv"]["kernel"].shape[-1]
        sd[f"{pre}.conv2.0.weight"] = np.zeros((c, c, 3, 3), np.float32)
        sd[f"{pre}.conv2.0.bias"] = np.zeros((c,), np.float32)
        sd[f"{pre}.conv2.1.weight"] = np.ones((c,), np.float32)
        sd[f"{pre}.conv2.1.bias"] = np.zeros((c,), np.float32)
        sd[f"{pre}.conv2.1.running_mean"] = np.zeros((c,), np.float32)
        sd[f"{pre}.conv2.1.running_var"] = np.ones((c,), np.float32)
        sd[f"{pre}.conv2.1.num_batches_tracked"] = np.asarray(0)
    sd[f"{ref}.conv2d_out.weight"] = _inv_conv2d(rp["conv2d_out"]["kernel"])
    sd[f"{ref}.conv2d_out.bias"] = np.asarray(rp["conv2d_out"]["bias"])
    return sd


def load_reference_checkpoint(folder: str, k: int) -> Dict[str, dict]:
    """Load `feature_net.pth` + `stereo_net.pth` from a reference weights
    folder into variables for models.StereoModel:
    {'params': {'feature_net': ..., 'stereo_net': ...}, 'batch_stats': {...}}.
    """
    import torch  # CPU-only deserialization.

    fsd = torch.load(os.path.join(folder, "feature_net.pth"), map_location="cpu")
    ssd = torch.load(os.path.join(folder, "stereo_net.pth"), map_location="cpu")
    fp, fs = import_feature_net_state_dict(fsd, k)
    sp, ss = import_stereo_net_state_dict(ssd)
    return {
        "params": {"feature_net": fp, "stereo_net": sp},
        "batch_stats": {"feature_net": fs, "stereo_net": ss},
    }
