"""Synthetic on-disk stereo mini-dataset generator.

Replaces the reference's hard-coded /home/milo dataset paths in tests
(SURVEY.md §4 implication (c)): generates photometrically consistent stereo
pairs with EXACT ground-truth disparity, so end-to-end training/adaptation
tests exercise real geometry:

  L(x, y) = R(x - d(x, y), y)

with R drawn on a wider canvas (no missing pixels) from smooth random
texture, and d a piecewise-constant scene (background plane + floating
boxes). Warping R by the GT disparity reconstructs L exactly (up to PNG
quantization), so the Monodepth photometric loss has its minimum at the true
disparity. A `domain_shift` option applies gamma/color/noise perturbations to
emulate a novel domain for OOD/adaptation tests.
"""

from __future__ import annotations

import os
import numpy as np

from .splits import write_split


def _smooth_texture(rng: np.random.RandomState, h: int, w: int) -> np.ndarray:
    """Smooth colorful texture in [0,1]: random low-frequency sinusoid mix."""
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w, 3), np.float32)
    for c in range(3):
        acc = np.zeros((h, w), np.float32)
        for _ in range(6):
            fx, fy = rng.uniform(0.01, 0.15, 2)
            phase = rng.uniform(0, 2 * np.pi)
            amp = rng.uniform(0.3, 1.0)
            acc += amp * np.sin(2 * np.pi * (fx * x + fy * y) + phase)
        acc = (acc - acc.min()) / (acc.max() - acc.min() + 1e-9)
        img[..., c] = acc
    return 0.1 + 0.8 * img


def _sample_rows(canvas: np.ndarray, sample_x: np.ndarray) -> np.ndarray:
    """Bilinear sample along x for each row; canvas (H, Wc, 3), sample_x (H, W)."""
    wc = canvas.shape[1]
    px = np.clip(sample_x, 0, wc - 1.001)
    x0 = np.floor(px).astype(np.int64)
    frac = (px - x0)[..., None]
    rows = np.arange(canvas.shape[0])[:, None]
    return canvas[rows, x0] * (1 - frac) + canvas[rows, x0 + 1] * frac


def make_stereo_pair(
    rng: np.random.RandomState, h: int, w: int, max_disp: float = 40.0
):
    """Returns (left, right, disp_l, disp_r) with exact L(x)=R(x-d(x))."""
    pad = int(np.ceil(max_disp)) + 2
    canvas = _smooth_texture(rng, h, w + pad)

    # Piecewise-constant left disparity: background plane + 2-4 boxes.
    d_bg = rng.uniform(4.0, 10.0)
    disp_l = np.full((h, w), d_bg, np.float32)
    for _ in range(rng.randint(2, 5)):
        bh, bw = rng.randint(h // 6, h // 2), rng.randint(w // 8, w // 3)
        by, bx = rng.randint(0, h - bh), rng.randint(0, w - bw)
        disp_l[by : by + bh, bx : bx + bw] = rng.uniform(d_bg + 4, max_disp)

    x = np.arange(w, dtype=np.float32)[None, :]
    # Right image = canvas columns [0, w); left samples canvas at x+pad-d... We
    # place the right view at canvas offset 0 and the left view at offset pad,
    # so every left sample x + pad - d lands inside the canvas for d<=max_disp.
    right = canvas[:, :w].copy()
    left = _sample_rows(canvas, x + 0.0 + np.zeros((h, 1), np.float32))  # placeholder
    left = _sample_rows(canvas, (x - disp_l) + pad)
    # Note: right view must correspond to canvas offset pad - ... For
    # L(x) = R(x - d): L samples canvas at (x - d) + pad only if R(u) = canvas
    # at u + pad. So redefine right accordingly:
    right = canvas[:, pad : pad + w].copy()
    left = _sample_rows(canvas, (x - disp_l) + pad)

    # Right-centered disparity via the fixed-point d_r(x) = d_l(x + d_r(x));
    # one iteration from the background estimate is exact for the plane and a
    # close approximation on boxes.
    xi = np.clip((x + d_bg).astype(np.int64), 0, w - 1)
    d0 = disp_l[np.arange(h)[:, None], xi]
    xi = np.clip(np.round(x + d0).astype(np.int64), 0, w - 1)
    disp_r = disp_l[np.arange(h)[:, None], xi].astype(np.float32)

    return left.astype(np.float32), right, disp_l, disp_r


def _apply_domain_shift(img: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """Novel-domain perturbation: gamma + channel gains + fog-like haze + noise."""
    gamma = rng.uniform(1.6, 2.2)
    gains = rng.uniform(0.6, 0.9, size=(1, 1, 3)).astype(np.float32)
    haze = rng.uniform(0.25, 0.4)
    out = (img ** gamma) * gains
    out = (1 - haze) * out + haze * 0.8
    out = out + rng.normal(0, 0.02, img.shape).astype(np.float32)
    return np.clip(out, 0, 1)


def generate_synthetic_dataset(
    root: str,
    name: str = "synthetic",
    num_train: int = 8,
    num_val: int = 4,
    height: int = 96,
    width: int = 160,
    max_disp: float = 24.0,
    domain_shift: bool = False,
    seed: int = 0,
) -> str:
    """Write a synthetic dataset under `root` and a split named `name` with
    train/val/test line files. Returns the dataset root (== `root`).

    Layout: root/{left,right,disp_l,disp_r}/<name>_NNN.(png|npy);
    splits at root/splits/<name>/. Use dataset_name="Synthetic".
    """
    import imageio.v2 as imageio

    rng = np.random.RandomState(seed)
    for sub in ("left", "right", "disp_l", "disp_r"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    n_total = num_train + num_val
    lines = []
    for i in range(n_total):
        left, right, dl, dr = make_stereo_pair(rng, height, width, max_disp)
        if domain_shift:
            shift_rng = np.random.RandomState(seed + 1000 + i)
            left = _apply_domain_shift(left, shift_rng)
            right = _apply_domain_shift(right, shift_rng)
        stem = f"{name}_{i:04d}"
        imageio.imwrite(
            os.path.join(root, "left", stem + ".png"),
            (np.clip(left, 0, 1) * 255).round().astype(np.uint8),
        )
        imageio.imwrite(
            os.path.join(root, "right", stem + ".png"),
            (np.clip(right, 0, 1) * 255).round().astype(np.uint8),
        )
        np.save(os.path.join(root, "disp_l", stem + ".npy"), dl)
        np.save(os.path.join(root, "disp_r", stem + ".npy"), dr)
        lines.append(
            f"left/{stem}.png right/{stem}.png disp_l/{stem}.npy disp_r/{stem}.npy"
        )

    splits_root = os.path.join(root, "splits")
    write_split(splits_root, name, "train", lines[:num_train])
    write_split(splits_root, name, "val", lines[num_train:])
    write_split(splits_root, name, "test", lines[num_train:])
    return root
