"""Serving: stream-ingest stereo depth engine (ROS-node-shaped API)."""

from .config import ServingConfig
from .stream import (
    StereoDepthEngine,
    AsyncStereoDepthEngine,
    replay_dataset_stream,
    disparity_to_depth,
    depth_to_pointcloud,
    voxel_downsample,
)
