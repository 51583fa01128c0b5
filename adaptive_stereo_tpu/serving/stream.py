"""Stream-ingest stereo depth serving engine.

TPU-native equivalent of the reference ROS node (ros/stereo_depth_node.py:
113-197): per-frame synchronized stereo pair -> jitted eval-mode forward ->
colorized disparity (rate-limited) + disparity->depth -> voxelized colored
point cloud. ROS transport is replaced by plain callbacks; the geometry
pipeline (d = fx*b/z, depth clamp, RGBD backprojection, voxel downsample) is
reimplemented in numpy (Open3D not required).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional, Tuple

import numpy as np


def disparity_to_depth(disp: np.ndarray, fx: float, baseline_m: float,
                       max_depth: float = 100.0) -> np.ndarray:
    """depth = fx * b / disp, clamped to [0, max_depth] (reference :159-160)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        depth = fx * baseline_m / disp
    return np.clip(np.nan_to_num(depth, posinf=max_depth), 0.0, max_depth)


def depth_to_pointcloud(depth: np.ndarray, k_mat: np.ndarray,
                        color: Optional[np.ndarray] = None,
                        depth_trunc: float = 80.0) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Backproject a depth image to camera-frame points (N, 3) (+colors)."""
    h, w = depth.shape[:2]
    fx, fy = k_mat[0, 0], k_mat[1, 1]
    cx, cy = k_mat[0, 2], k_mat[1, 2]
    ys, xs = np.mgrid[0:h, 0:w]
    z = depth.reshape(-1)
    valid = (z > 0) & (z < depth_trunc)
    z = z[valid]
    x = (xs.reshape(-1)[valid] - cx) * z / fx
    y = (ys.reshape(-1)[valid] - cy) * z / fy
    pts = np.stack([x, y, z], axis=-1)
    cols = color.reshape(-1, 3)[valid] if color is not None else None
    return pts, cols


def voxel_downsample(points: np.ndarray, voxel_size: float,
                     colors: Optional[np.ndarray] = None):
    """Average points (and colors) within each voxel (replaces
    open3d.geometry.voxel_down_sample, reference :184). Uses the native C++
    hash-grid when built (native/stereo_native.cpp)."""
    if len(points) == 0:
        return points, colors
    try:
        from ..data import native

        if native.available():
            return native.voxel_downsample_native(points, voxel_size, colors)
    except Exception:
        pass
    keys = np.floor(points / voxel_size).astype(np.int64)
    # Hash voxel coords to group.
    _, inverse, counts = np.unique(keys, axis=0, return_inverse=True, return_counts=True)
    n_vox = counts.shape[0]
    sums = np.zeros((n_vox, 3), np.float64)
    np.add.at(sums, inverse, points)
    out_pts = (sums / counts[:, None]).astype(np.float32)
    out_cols = None
    if colors is not None:
        csum = np.zeros((n_vox, 3), np.float64)
        np.add.at(csum, inverse, colors)
        out_cols = (csum / counts[:, None]).astype(np.float32)
    return out_pts, out_cols


class StereoDepthEngine:
    """Synchronous serving loop: call process(left, right) per frame.

    Callbacks (all optional):
      on_disparity(disp_colorized_hw3, scale, timestamp) — rate-limited to
        publish_disp_hz (reference :154-157).
      on_pointcloud(points_n3, colors_n3, timestamp) — voxelized map per frame.
    """

    def __init__(self, config, variables: Optional[dict] = None,
                 on_disparity: Optional[Callable] = None,
                 on_pointcloud: Optional[Callable] = None):
        import jax
        import jax.numpy as jnp

        from ..engine.checkpoint import load_variables
        from ..models import StereoModel

        self.config = config
        self.on_disparity = on_disparity
        self.on_pointcloud = on_pointcloud

        if variables is None:
            variables = load_variables(config.load_weights_folder)
        self._variables = variables

        model = StereoModel(
            k=config.stereonet_k, input_scale=config.input_scale,
            dtype=jnp.bfloat16 if config.compute_dtype == "bfloat16" else None,
            # Forward-only engine: the fused kernel is a measured strict win
            # on TPU (see ServingConfig.pallas_aggregation); off-TPU the
            # interpreter path would be slower than XLA, so gate on backend.
            pallas_aggregation=(config.pallas_aggregation
                                and jax.default_backend() == "tpu"),
            fused_coarse_head=(config.fused_coarse_head
                               and jax.default_backend() == "tpu"),
        )
        s = config.input_scale

        @jax.jit
        def forward(variables, left, right):
            out = model.apply(variables, left, right, side="l",
                              output_cost_volume=False, train=False)
            return out[f"pred_disp_l/{s}"]

        self._forward = forward
        self._jnp = jnp
        self._jax = jax

        # Intrinsics at the voxel pyramid scale (reference :98-101).
        self.k_voxel = config.camera_intrinsics.copy()
        self.k_voxel[0] /= 2 ** config.voxel_disp_scale
        self.k_voxel[1] /= 2 ** config.voxel_disp_scale
        self._last_publish_disp_time = 0.0
        self.last_inference_sec = None

    def process(self, left_rgb: np.ndarray, right_rgb: np.ndarray,
                timestamp: Optional[float] = None) -> Dict[str, np.ndarray]:
        """Process one synchronized pair (H, W, 3) float in [0,1].

        Returns {'disparity': (H,W), 'depth': (h_v,w_v), 'points': (N,3),
        'colors': (N,3)|None}.
        """
        cfg = self.config
        assert left_rgb.min() >= 0 and left_rgb.max() <= 1.0
        assert right_rgb.min() >= 0 and right_rgb.max() <= 1.0
        ts = time.time() if timestamp is None else timestamp

        t0 = time.perf_counter()
        disp_dev = self._forward(
            self._variables,
            self._jnp.asarray(left_rgb[None], self._jnp.float32),
            self._jnp.asarray(right_rgb[None], self._jnp.float32),
        )
        disp = np.asarray(self._jax.block_until_ready(disp_dev))[0, ..., 0]
        self.last_inference_sec = time.perf_counter() - t0

        # Downsample disparity to the voxel scale; disparity VALUES keep the
        # full-res convention (the voxel intrinsics were scaled instead,
        # reference :145-150,159).
        import cv2 as cv

        vs = 2 ** cfg.voxel_disp_scale
        disp_v = cv.resize(disp, (disp.shape[1] // vs, disp.shape[0] // vs),
                           interpolation=cv.INTER_LINEAR)

        if self.on_disparity is not None:
            if (time.time() - self._last_publish_disp_time) > (1.0 / cfg.publish_disp_hz):
                from ..utils.visualization import apply_disparity_colormap

                self.on_disparity(apply_disparity_colormap(disp_v), cfg.voxel_disp_scale, ts)
                self._last_publish_disp_time = time.time()

        depth = disparity_to_depth(disp_v, self.k_voxel[0, 0],
                                   cfg.stereo_baseline_meters, cfg.max_depth)

        color_v = None
        if cfg.publish_color_point_cloud:
            color_v = cv.resize(left_rgb, (depth.shape[1], depth.shape[0]),
                                interpolation=cv.INTER_LINEAR)
        pts, cols = depth_to_pointcloud(depth, self.k_voxel, color_v)
        pts, cols = voxel_downsample(pts, cfg.voxel_scale_meters, cols)

        if self.on_pointcloud is not None:
            self.on_pointcloud(pts, cols, ts)

        return {"disparity": disp, "depth": depth, "points": pts, "colors": cols}


class AsyncStereoDepthEngine(StereoDepthEngine):
    """Pipelined variant: submit(left, right) dispatches the jitted forward
    and returns immediately; the PREVIOUS frame's result (now complete) is
    post-processed and returned. One-frame latency, ~2x throughput when host
    post-processing (point cloud) overlaps device compute.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._pending = None  # (device disparity, left_rgb, timestamp)

    def submit(self, left_rgb: np.ndarray, right_rgb: np.ndarray,
               timestamp: Optional[float] = None):
        """Dispatch this frame; return the completed PREVIOUS frame's result
        (None on the first call). Call flush() for the last frame."""
        ts = time.time() if timestamp is None else timestamp
        disp_dev = self._forward(
            self._variables,
            self._jnp.asarray(left_rgb[None], self._jnp.float32),
            self._jnp.asarray(right_rgb[None], self._jnp.float32),
        )
        prev, self._pending = self._pending, (disp_dev, left_rgb, ts)
        if prev is None:
            return None
        return self._finish(*prev)

    def flush(self):
        prev, self._pending = self._pending, None
        return self._finish(*prev) if prev is not None else None

    def _finish(self, disp_dev, left_rgb, ts):
        disp = np.asarray(disp_dev)[0, ..., 0]
        return self._postprocess(disp, left_rgb, ts)

    def _postprocess(self, disp, left_rgb, ts):
        cfg = self.config
        import cv2 as cv

        vs = 2 ** cfg.voxel_disp_scale
        disp_v = cv.resize(disp, (disp.shape[1] // vs, disp.shape[0] // vs),
                           interpolation=cv.INTER_LINEAR)
        if self.on_disparity is not None:
            if (time.time() - self._last_publish_disp_time) > (1.0 / cfg.publish_disp_hz):
                from ..utils.visualization import apply_disparity_colormap

                self.on_disparity(apply_disparity_colormap(disp_v),
                                  cfg.voxel_disp_scale, ts)
                self._last_publish_disp_time = time.time()
        depth = disparity_to_depth(disp_v, self.k_voxel[0, 0],
                                   cfg.stereo_baseline_meters, cfg.max_depth)
        color_v = None
        if cfg.publish_color_point_cloud:
            color_v = cv.resize(left_rgb, (depth.shape[1], depth.shape[0]),
                                interpolation=cv.INTER_LINEAR)
        pts, cols = depth_to_pointcloud(depth, self.k_voxel, color_v)
        pts, cols = voxel_downsample(pts, cfg.voxel_scale_meters, cols)
        if self.on_pointcloud is not None:
            self.on_pointcloud(pts, cols, ts)
        return {"disparity": disp, "depth": depth, "points": pts, "colors": cols}


def replay_dataset_stream(engine: StereoDepthEngine, dataset, num_frames: int = -1):
    """Dataset-backed test publisher (replaces ros/test_image_publisher.py):
    feeds dataset pairs through the engine sequentially."""
    n = len(dataset) if num_frames < 0 else min(num_frames, len(dataset))
    results = []
    for i in range(n):
        item = dataset[i]
        results.append(engine.process(item["color_l/0"], item["color_r/0"], timestamp=float(i)))
    return results
