"""Vendored split-manifest inventory tests.

Ports the reference's split-length assertions
(/root/reference/test/test_stereo_dataset.py:21-98) against the manifests
vendored at splits/ (the exact membership behind resources/adaptation.csv),
plus the adaptation-split train==val invariant (reference splits/README.md
"Adaptation Splits") and the 4-path line format contract
(reference datasets/stereo_dataset.py:39-48).
"""

import os

import pytest

from adaptive_stereo_tpu.data.splits import (
    default_splits_root,
    read_lines,
    split_lines_path,
)

SPLITS = default_splits_root()

# (split, subsplit) -> expected length. Reference sources:
# test_stereo_dataset.py:21-98 for the asserted ones; `wc -l` over the
# reference's committed manifests for the rest (SURVEY.md §2 inventory).
EXPECTED_LENGTHS = {
    ("sceneflow_flying", "train"): 19031,
    ("sceneflow_flying", "val"): 3359,
    ("sceneflow_flying", "test"): 4370,
    ("sceneflow_driving", "train"): 1540,
    ("sceneflow_driving", "val"): 330,
    ("sceneflow_driving", "test"): 330,
    ("kitti_stereo_2012", "train"): 194,
    ("kitti_stereo_2012", "val"): 194,
    ("kitti_stereo_2012", "test"): 194,
    ("kitti_stereo_2015", "train"): 200,
    ("kitti_stereo_2015", "val"): 200,
    ("kitti_stereo_2015", "test"): 200,
    ("kitti_stereo_2015_adapt", "train"): 200,
    ("kitti_2015_sim2real", "train"): 200,
    ("sceneflow_driving_adapt", "train"): 800,
    ("sceneflow_driving_sim2real", "train"): 2200,
    ("sceneflow_flying_100", "train"): 100,
    ("sceneflow_flying_100", "val"): 100,
    ("sceneflow_flying_debug", "train"): 1,
    ("sceneflow_flying_er_1000", "val"): 1000,
    ("virtual_kitti_01_adapt", "train"): 447,
    ("virtual_kitti_02_adapt", "train"): 233,
    ("virtual_kitti_06_adapt", "train"): 270,
    ("virtual_kitti_20_adapt", "train"): 837,
    ("virtual_kitti_clone", "train"): 1787,
    ("virtual_kitti_clone", "val"): 1787,
    ("virtual_kitti_clone_aug", "train"): 7148,
    ("virtual_kitti_clone_aug", "val"): 1787,
    ("virtual_kitti_clone_er_1000", "val"): 1000,
    ("virtual_kitti_debug", "train"): 1,
    ("virtual_kitti_fog", "train"): 1787,
    ("virtual_kitti_morning", "train"): 1787,
    ("virtual_kitti_overcast", "train"): 1787,
    ("virtual_kitti_rain", "train"): 1787,
    ("virtual_kitti_sunset", "train"): 1787,
    ("kitti_raw_campus_adapt", "train"): 1249,
    ("kitti_raw_city_adapt", "train"): 8307,
    ("kitti_raw_road_adapt", "train"): 5794,
}

# train == val by design for adaptation splits (reference splits/README.md).
ADAPT_SPLITS_TRAIN_EQ_VAL = [
    "virtual_kitti_01_adapt",
    "virtual_kitti_20_adapt",
    "virtual_kitti_fog",
    "virtual_kitti_rain",
    "virtual_kitti_morning",
    "virtual_kitti_overcast",
    "virtual_kitti_sunset",
    "kitti_raw_campus_adapt",
    "kitti_raw_city_adapt",
    "kitti_raw_road_adapt",
    "kitti_stereo_2015_adapt",
    "sceneflow_driving_adapt",
]


@pytest.mark.parametrize("split,subsplit", sorted(EXPECTED_LENGTHS))
def test_split_lengths(split, subsplit):
    lines = read_lines(split_lines_path(SPLITS, split, subsplit))
    assert len(lines) == EXPECTED_LENGTHS[(split, subsplit)]


@pytest.mark.parametrize("split", ADAPT_SPLITS_TRAIN_EQ_VAL)
def test_adapt_splits_train_equals_val(split):
    train = read_lines(split_lines_path(SPLITS, split, "train"))
    val = read_lines(split_lines_path(SPLITS, split, "val"))
    assert train == val


def test_line_format_four_paths():
    for (split, subsplit) in EXPECTED_LENGTHS:
        lines = read_lines(split_lines_path(SPLITS, split, subsplit))
        for line in lines[:5] + lines[-5:]:
            assert len(line.split(" ")) == 4, (split, subsplit, line)


def test_kitti_raw_absolute_path_rebase():
    from adaptive_stereo_tpu.data.stereo_dataset import StereoDataset

    d = StereoDataset.__new__(StereoDataset)
    d.dataset_path = "/data/kitti_raw"
    p = d._resolve(
        "/home/milo/datasets/kitti_data_raw/2011_09_26/"
        "2011_09_26_drive_0001_sync/image_02/data/0000000000.jpg"
    )
    assert p == (
        "/data/kitti_raw/2011_09_26/2011_09_26_drive_0001_sync/"
        "image_02/data/0000000000.jpg"
    )
    # Relative lines join onto the dataset path unchanged.
    assert d._resolve("a/b.png") == "/data/kitti_raw/a/b.png"


def _touch(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("x")


def _load_genmod():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "generate_splits",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "generate_splits.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_generate_kitti_raw_residential(tmp_path):
    """Generator for the mount-missing kitti_raw_residential_adapt manifest
    (reference splits/kitti_raw_residential_adapt/generate_split.py): all 21
    residential drives, sequence order, train == val."""
    gen = _load_genmod()
    root = str(tmp_path / "kitti_raw")
    n_frames = 3
    for seq in gen.KITTI_RAW_RESIDENTIAL_SEQUENCES:
        drive = os.path.join(root, seq[:10], seq)
        for i in range(n_frames):
            _touch(os.path.join(drive, "image_02", "data", f"{i:010d}.jpg"))
            _touch(os.path.join(drive, "image_03", "data", f"{i:010d}.jpg"))
            _touch(os.path.join(drive, "disp_02", "data", f"{i:010d}.npy"))
            _touch(os.path.join(drive, "disp_03", "data", f"{i:010d}.npy"))
    out = str(tmp_path / "split_out")
    gen.gen_kitti_raw_residential(root, out)

    train = read_lines(os.path.join(out, "train_lines.txt"))
    val = read_lines(os.path.join(out, "val_lines.txt"))
    assert train == val
    assert len(train) == 21 * n_frames
    first = train[0].split(" ")
    assert len(first) == 4
    assert "2011_09_26_drive_0019_sync" in first[0]  # sequence order kept
    assert first[0].endswith(".jpg") and first[2].endswith(".npy")
    assert "image_03" in first[1] and "disp_03" in first[3]


def test_generate_vkitti_sim2real(tmp_path):
    """Generator for the mount-missing virtual_kitti_sim2real manifest
    (reference splits/virtual_kitti_sim2real/generate_split.py): 5 scenes x
    10 variations, sorted-order rgb/depth pairing, root-relative paths,
    train manifest only."""
    gen = _load_genmod()
    root = str(tmp_path / "vkitti")
    n_frames = 2
    for scene in gen.VKITTI_SIM2REAL_SCENES:
        for var in gen.VKITTI_SIM2REAL_VARIATIONS:
            frames = os.path.join(root, scene, var, "frames")
            for i in range(n_frames):
                for cam in ("Camera_0", "Camera_1"):
                    _touch(os.path.join(frames, "rgb", cam, f"rgb_{i:05d}.jpg"))
                    _touch(os.path.join(frames, "depth", cam, f"depth_{i:05d}.png"))
    out = str(tmp_path / "split_out")
    gen.gen_vkitti_sim2real(root, out)

    train = read_lines(os.path.join(out, "train_lines.txt"))
    assert len(train) == 5 * 10 * n_frames
    first = train[0].split(" ")
    assert len(first) == 4
    assert not first[0].startswith("/")  # relative to the dataset root
    assert first[0].startswith("Scene01/15-deg-left/frames/rgb/Camera_0/")
    assert first[3].startswith("Scene01/15-deg-left/frames/depth/Camera_1/")

    # Unpaired frames must fail loudly, not silently misalign.
    os.remove(os.path.join(root, "Scene20", "sunset", "frames", "depth",
                           "Camera_1", "depth_00001.png"))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        gen.gen_vkitti_sim2real(root, str(tmp_path / "split_out2"))
