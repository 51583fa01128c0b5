"""Data layer: split-file datasets, image/disparity IO, prefetch pipeline."""

from .io import read_pfm, write_pfm, read_flo, write_flo, read_float3, write_float3
from .loaders import get_disp_loader, DATASET_BASELINES_M, get_intrinsics_normalized
from .splits import read_lines
from .stereo_dataset import StereoDataset, BatchLoader
from .synthetic import generate_synthetic_dataset
