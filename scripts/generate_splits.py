"""Generate dataset split files (the reference's splits/ data contract).

The reference ships 30 split directories of `{train,val,test}_lines.txt`
manifests (4 space-separated paths per line: rgb_l rgb_r disp_l disp_r).
Rather than vendoring those manifests, this script regenerates them from a
dataset root by scanning the canonical directory layouts (reference
splits/README.md + splits/*/generate_split.py behavior):

  sceneflow-flying   : official TRAIN/TEST split; frames_cleanpass +
                       disparity PFMs; val = slice of TEST.
  sceneflow-driving  : 35mm_focallength, forwards+backwards;
                       70/15/15 train/val/test.
  vkitti             : Scene<NN>/<variation> jpg + depth png pairs;
                       adaptation splits (train == val, sequential).
  kitti-raw          : drive folders (image_02/image_03 + exported disp npy);
                       adaptation splits (train == val).
  kitti-stereo-2015  : image_2/image_3 + disp_occ_0; 400/40/200.
  er-subsample       : random N-line subsample of an existing split
                       (experience-replay *_er_1000 splits).

Usage examples:
  python scripts/generate_splits.py sceneflow-flying --dataset_path /data/sf \
      --output splits/sceneflow_flying
  python scripts/generate_splits.py vkitti --dataset_path /data/vkitti \
      --scene 01 --variation clone --output splits/virtual_kitti_01_adapt --adaptation
  python scripts/generate_splits.py er-subsample --source splits/sceneflow_flying \
      --n 1000 --output splits/sceneflow_flying_er_1000
"""

from __future__ import annotations

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_lines(output: str, name: str, lines):
    os.makedirs(output, exist_ok=True)
    path = os.path.join(output, f"{name}_lines.txt")
    with open(path, "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    print(f"wrote {len(lines):6d} lines -> {path}")


def rel_walk(root: str, subdir: str, suffix: str):
    base = os.path.join(root, subdir)
    out = []
    for dirpath, _dirnames, filenames in os.walk(base):
        for fn in sorted(filenames):
            if fn.endswith(suffix):
                out.append(os.path.relpath(os.path.join(dirpath, fn), root))
    return sorted(out)


def gen_sceneflow(dataset_path: str, output: str, subset: str, seed: int):
    """subset: 'flying' (official TRAIN/TEST) or 'driving' (70/15/15)."""
    def lines_for(img_split):
        lefts = [p for p in rel_walk(dataset_path, f"frames_cleanpass/{img_split}", ".png")
                 if "/left/" in p]
        out = []
        for lp in lefts:
            rp = lp.replace("/left/", "/right/")
            dl = lp.replace("frames_cleanpass", "disparity").replace(".png", ".pfm")
            dr = rp.replace("frames_cleanpass", "disparity").replace(".png", ".pfm")
            out.append(f"{lp} {rp} {dl} {dr}")
        return out

    if subset == "flying":
        train = lines_for("TRAIN")
        test = lines_for("TEST")
        rng = random.Random(seed)
        rng.shuffle(test)
        n_val = len(test) * 43 // 100  # reference: 3359 val / 4370 test
        write_lines(output, "train", train)
        write_lines(output, "val", sorted(test[:n_val]))
        write_lines(output, "test", sorted(test[n_val:]))
    else:  # driving: 35mm_focallength, both directions, 70/15/15
        all_lines = [l for l in lines_for("") if "35mm_focallength" in l]
        rng = random.Random(seed)
        rng.shuffle(all_lines)
        n = len(all_lines)
        n_train, n_val = int(0.7 * n), int(0.15 * n)
        write_lines(output, "train", sorted(all_lines[:n_train]))
        write_lines(output, "val", sorted(all_lines[n_train:n_train + n_val]))
        write_lines(output, "test", sorted(all_lines[n_train + n_val:]))


def gen_vkitti(dataset_path: str, output: str, scene: str, variation: str,
               adaptation: bool, cameras=(0,)):
    lines = []
    for cam in cameras:
        rgb_dir = f"Scene{scene}/{variation}/frames/rgb/Camera_{cam}"
        base = os.path.join(dataset_path, rgb_dir)
        if not os.path.isdir(base):
            # Legacy VKITTI-1.3 layout: vkitti_1.3.1_rgb/<scene>/<variation>.
            rgb_dir = f"{scene}/{variation}"
            base = os.path.join(dataset_path, "vkitti_1.3.1_rgb", rgb_dir)
        for fn in sorted(os.listdir(base)):
            if not fn.endswith((".jpg", ".png")):
                continue
            lp = os.path.join(rgb_dir, fn)
            rp = lp.replace("Camera_0", "Camera_1")
            dl = lp.replace("/rgb/", "/depth/").replace("rgb_", "depth_").rsplit(".", 1)[0] + ".png"
            dr = dl.replace("Camera_0", "Camera_1")
            lines.append(f"{lp} {rp} {dl} {dr}")
    write_lines(output, "train", lines)
    # Adaptation splits: train == val (reference splits/README.md).
    write_lines(output, "val", lines if adaptation else lines[-max(1, len(lines) // 10):])
    write_lines(output, "test", lines if adaptation else lines[-max(1, len(lines) // 10):])


def gen_kitti_raw(dataset_path: str, output: str, drives, adaptation: bool = True):
    """drives: list of '<date>/<date>_drive_NNNN_sync' folders. Paths are
    written ABSOLUTE (reference kitti_raw_* splits use absolute paths)."""
    lines = []
    for drive in drives:
        img_dir = os.path.join(dataset_path, drive, "image_02", "data")
        for fn in sorted(os.listdir(img_dir)):
            if not fn.endswith((".jpg", ".png")):
                continue
            lp = os.path.join(dataset_path, drive, "image_02", "data", fn)
            rp = lp.replace("image_02", "image_03")
            stem = fn.rsplit(".", 1)[0]
            dl = os.path.join(dataset_path, drive, "disp_02", "data", stem + ".npy")
            dr = dl.replace("disp_02", "disp_03")
            lines.append(f"{lp} {rp} {dl} {dr}")
    write_lines(output, "train", lines)
    write_lines(output, "val", lines)
    write_lines(output, "test", lines)


# The 21 KITTI-raw "residential" category drives (reference
# splits/kitti_raw_residential_adapt/generate_split.py:4-26; the manifest
# itself is a missing large blob in the mount, so this list is the spec).
KITTI_RAW_RESIDENTIAL_SEQUENCES = [
    "2011_09_26_drive_0019_sync",
    "2011_09_26_drive_0020_sync",
    "2011_09_26_drive_0022_sync",
    "2011_09_26_drive_0023_sync",
    "2011_09_26_drive_0035_sync",
    "2011_09_26_drive_0036_sync",
    "2011_09_26_drive_0039_sync",
    "2011_09_26_drive_0046_sync",
    "2011_09_26_drive_0061_sync",
    "2011_09_26_drive_0064_sync",
    "2011_09_26_drive_0079_sync",
    "2011_09_26_drive_0086_sync",
    "2011_09_26_drive_0087_sync",
    "2011_09_30_drive_0018_sync",
    "2011_09_30_drive_0020_sync",
    "2011_09_30_drive_0027_sync",
    "2011_09_30_drive_0028_sync",
    "2011_09_30_drive_0033_sync",
    "2011_09_30_drive_0034_sync",
    "2011_10_03_drive_0027_sync",
    "2011_10_03_drive_0034_sync",
]

# The sim2real pairing: 5 scenes x 10 weather/viewpoint variations
# (reference splits/virtual_kitti_sim2real/generate_split.py:5-6).
VKITTI_SIM2REAL_SCENES = ["Scene01", "Scene02", "Scene06", "Scene18", "Scene20"]
VKITTI_SIM2REAL_VARIATIONS = [
    "15-deg-left", "15-deg-right", "30-deg-left", "30-deg-right",
    "clone", "fog", "morning", "overcast", "rain", "sunset",
]


def gen_kitti_raw_residential(dataset_path: str, output: str):
    """The kitti_raw_residential_adapt split: every frame of the 21
    residential drives, sequence order, train == val (adaptation split)."""
    drives = [os.path.join(seq[:10], seq)
              for seq in KITTI_RAW_RESIDENTIAL_SEQUENCES]
    gen_kitti_raw(dataset_path, output, drives)


def gen_vkitti_sim2real(dataset_path: str, output: str):
    """The virtual_kitti_sim2real split: ALL frames of 5 scenes x 10
    variations, both cameras' rgb jpg + depth png paired by sorted order,
    paths relative to the dataset root (reference generate_split.py:28-31
    strips the root prefix; train manifest only)."""
    import glob as _glob

    lines = []
    for scene in VKITTI_SIM2REAL_SCENES:
        for var in VKITTI_SIM2REAL_VARIATIONS:
            frames = os.path.join(dataset_path, scene, var, "frames")
            rgb_l = sorted(_glob.glob(os.path.join(frames, "rgb", "Camera_0", "*.jpg")))
            rgb_r = sorted(_glob.glob(os.path.join(frames, "rgb", "Camera_1", "*.jpg")))
            disp_l = sorted(_glob.glob(os.path.join(frames, "depth", "Camera_0", "*.png")))
            disp_r = sorted(_glob.glob(os.path.join(frames, "depth", "Camera_1", "*.png")))
            if not (len(rgb_l) == len(rgb_r) == len(disp_l) == len(disp_r)):
                raise ValueError(
                    f"{scene}/{var}: unpaired frames "
                    f"({len(rgb_l)}/{len(rgb_r)} rgb, {len(disp_l)}/{len(disp_r)} depth)")
            for fl, fr, dl, dr in zip(rgb_l, rgb_r, disp_l, disp_r):
                rel = [os.path.relpath(p, dataset_path) for p in (fl, fr, dl, dr)]
                lines.append(" ".join(rel))
    write_lines(output, "train", lines)


def gen_kitti_stereo_2015(dataset_path: str, output: str, seed: int):
    base = os.path.join(dataset_path, "training")
    lines = []
    for i in range(200):
        lp = f"training/image_2/{i:06d}_10.png"
        rp = f"training/image_3/{i:06d}_10.png"
        d = f"training/disp_occ_0/{i:06d}_10.png"
        lines.append(f"{lp} {rp} {d} {d}")
    rng = random.Random(seed)
    order = list(range(len(lines)))
    rng.shuffle(order)
    n_val = len(lines) // 10
    write_lines(output, "train", [lines[i] for i in sorted(order[n_val:])])
    write_lines(output, "val", [lines[i] for i in sorted(order[:n_val])])
    write_lines(output, "test", lines)


def gen_er_subsample(source: str, output: str, n: int, seed: int):
    with open(os.path.join(source, "train_lines.txt")) as f:
        lines = f.read().splitlines()
    rng = random.Random(seed)
    pick = rng.sample(lines, min(n, len(lines)))
    write_lines(output, "train", pick)
    write_lines(output, "val", pick)
    write_lines(output, "test", pick)


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("family", choices=["sceneflow-flying", "sceneflow-driving",
                                      "vkitti", "kitti-raw",
                                      "kitti-raw-residential",
                                      "vkitti-sim2real",
                                      "kitti-stereo-2015", "er-subsample"])
    p.add_argument("--dataset_path", type=str, default="")
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--scene", type=str, default="01")
    p.add_argument("--variation", type=str, default="clone")
    p.add_argument("--drives", nargs="*", default=[])
    p.add_argument("--adaptation", action="store_true")
    p.add_argument("--source", type=str, default="")
    p.add_argument("--n", type=int, default=1000)
    p.add_argument("--seed", type=int, default=123)
    a = p.parse_args()

    if a.family == "sceneflow-flying":
        gen_sceneflow(a.dataset_path, a.output, "flying", a.seed)
    elif a.family == "sceneflow-driving":
        gen_sceneflow(a.dataset_path, a.output, "driving", a.seed)
    elif a.family == "vkitti":
        gen_vkitti(a.dataset_path, a.output, a.scene, a.variation, a.adaptation)
    elif a.family == "kitti-raw":
        gen_kitti_raw(a.dataset_path, a.output, a.drives)
    elif a.family == "kitti-raw-residential":
        gen_kitti_raw_residential(a.dataset_path, a.output)
    elif a.family == "vkitti-sim2real":
        gen_vkitti_sim2real(a.dataset_path, a.output)
    elif a.family == "kitti-stereo-2015":
        gen_kitti_stereo_2015(a.dataset_path, a.output, a.seed)
    elif a.family == "er-subsample":
        gen_er_subsample(a.source, a.output, a.n, a.seed)


if __name__ == "__main__":
    main()
