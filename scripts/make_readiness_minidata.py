"""Materialize mini on-disk datasets at the REAL vendored split-manifest
paths so the paper-parity runner executes through the real file loaders with
zero code edits (VERDICT r3 item 4 — real-data readiness drill).

For each requested split this script reads the vendored manifest
(splits/<split>/<subsplit>_lines.txt — the same files a real dataset mount
would use), takes the first N lines, and writes synthetic-but-consistent
stereo frames at those exact relative paths in the reference's on-disk
formats:

  SceneFlow:     PNG RGB pairs + PFM disparities (written via data/io.py —
                 the same writer/reader pair the dataset layer uses;
                 reference dataset_utils.py:27-28)
  VirtualKitti:  JPG RGB pairs + 16-bit depth PNGs in centimeters
                 (disp = baseline*focal/z; reference dataset_utils.py:38-47)
  KittiRaw:      JPG RGB pairs + npy disparities scaled x128 (reference
                 dataset_utils.py:34-35); the vendored manifests carry the
                 original author's ABSOLUTE /home/milo/datasets/... paths,
                 which are rebased exactly as the dataset layer does
                 (data/stereo_dataset.py:_resolve)

The day real data appears, the same run_paper_suite.py command points at the
real mounts instead — nothing else changes.

Usage:
  python scripts/make_readiness_minidata.py --out /tmp/readiness_data [--frames 96]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adaptive_stereo_tpu.data.io import write_pfm  # noqa: E402
from adaptive_stereo_tpu.data.splits import (  # noqa: E402
    default_splits_root,
    read_lines,
    split_lines_path,
)
from adaptive_stereo_tpu.data.synthetic import make_stereo_pair  # noqa: E402

H, W = 64, 96
# VKITTI intrinsics (reference dataset_utils.py:44-45).
VK_BF = 0.532725 * 725.0087


def _frames(split: str, subsplits, n: int):
    """Unique (rgb_l, rgb_r, disp_l, disp_r) relative-path tuples from the
    first n lines of each vendored subsplit manifest."""
    seen = {}
    for subsplit in subsplits:
        path = split_lines_path(default_splits_root(), split, subsplit)
        for line in read_lines(path)[:n]:
            parts = tuple(line.split(" "))
            seen[parts[0]] = parts
    return list(seen.values())


def _write_rgb(path: str, img: np.ndarray):
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path), exist_ok=True)
    imageio.imwrite(path, (np.clip(img, 0, 1) * 255).round().astype(np.uint8))


def _rebase(root: str, p: str) -> str:
    """Mirror data/stereo_dataset.py:_resolve for absolute manifest paths."""
    if os.path.isabs(p):
        marker = "/datasets/"
        if marker in p:
            rel = p.split(marker, 1)[1]
            rel = rel.split("/", 1)[1] if "/" in rel else rel
            return os.path.join(root, rel)
    return os.path.join(root, p)


def materialize_split(root: str, split: str, subsplits, n: int,
                      disp_format: str, seed: int):
    rng = np.random.RandomState(seed)
    frames = _frames(split, subsplits, n)
    for rgb_l, rgb_r, d_l, d_r in frames:
        left, right, dl, dr = make_stereo_pair(rng, H, W, max_disp=16.0)
        _write_rgb(_rebase(root, rgb_l), left)
        _write_rgb(_rebase(root, rgb_r), right)
        for rel, disp in ((d_l, dl), (d_r, dr)):
            out = _rebase(root, rel)
            os.makedirs(os.path.dirname(out), exist_ok=True)
            if disp_format == "pfm":
                write_pfm(out, disp.astype(np.float32))
            elif disp_format == "vkitti_depth":
                import cv2

                depth_cm = np.clip(100.0 * VK_BF / np.maximum(disp, 1e-3),
                                   1, 65000).astype(np.uint16)
                cv2.imwrite(out, depth_cm)
            elif disp_format == "kitti_npy":
                # KITTI-raw contract: npy scaled x128 (dataset_utils.py:34-35).
                np.save(out, (disp * 128.0).astype(np.float32))
            else:
                raise ValueError(disp_format)
    print(f"  {split}: {len(frames)} frames under {root}")
    return len(frames)


def make_weights(folder: str, seed: int):
    import jax
    import jax.numpy as jnp

    from adaptive_stereo_tpu.engine.checkpoint import save_variables
    from adaptive_stereo_tpu.models import StereoModel

    model = StereoModel(k=4, input_scale=0, maxdisp=192)
    dummy = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), dummy, dummy, side="l")
    save_variables(folder, {"params": variables["params"],
                            "batch_stats": variables["batch_stats"]},
                   {"note": "readiness-drill init (untrained)"})
    print(f"  weights: {folder}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=96)
    args = ap.parse_args()
    n = args.frames

    sf_root = os.path.join(args.out, "sceneflow")
    vk_root = os.path.join(args.out, "vkitti")
    kr_root = os.path.join(args.out, "kitti_raw")
    print("Materializing mini datasets at vendored-manifest paths:")
    materialize_split(sf_root, "sceneflow_flying_er_1000", ["val"], n,
                      "pfm", seed=1)
    materialize_split(vk_root, "virtual_kitti_01_adapt", ["train", "val"], n,
                      "vkitti_depth", seed=2)
    materialize_split(vk_root, "virtual_kitti_fog", ["train", "val"], n,
                      "vkitti_depth", seed=3)
    materialize_split(vk_root, "virtual_kitti_clone_er_1000", ["val"], n,
                      "vkitti_depth", seed=4)
    # Full paper breadth (VERDICT r4 item 6): the remaining 8 environments'
    # adaptation splits — VKITTI-20/rain + the three KITTI-raw drives.
    materialize_split(vk_root, "virtual_kitti_20_adapt", ["train", "val"], n,
                      "vkitti_depth", seed=7)
    materialize_split(vk_root, "virtual_kitti_rain", ["train", "val"], n,
                      "vkitti_depth", seed=8)
    materialize_split(kr_root, "kitti_raw_campus_adapt", ["train", "val"], n,
                      "kitti_npy", seed=9)
    materialize_split(kr_root, "kitti_raw_city_adapt", ["train", "val"], n,
                      "kitti_npy", seed=10)
    materialize_split(kr_root, "kitti_raw_road_adapt", ["train", "val"], n,
                      "kitti_npy", seed=11)
    make_weights(os.path.join(args.out, "weights", "sf"), seed=5)
    make_weights(os.path.join(args.out, "weights", "vk"), seed=6)
    print("Done.")


if __name__ == "__main__":
    main()
