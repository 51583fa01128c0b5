"""Split-file-driven stereo dataset + threaded prefetching batch loader.

Behavioral contract from reference datasets/stereo_dataset.py:13-145:
- items come from `<splits_root>/<split>/<subsplit>_lines.txt`;
- random or center crop to (height, width);
- optional joint horizontal flip: swap left/right AND mirror each image
  (reference utils/dataset_utils.py:19-23);
- multiscale pyramid: color and GT disparity bilinearly resized to each scale
  s, disparity VALUES divided by 2^s;
- outputs keyed `color_{l,r}/{s}` (H, W, 3) and `gt_disp_{l,r}/{s}` (H, W, 1),
  float32, NHWC, colors in [0, 1].

TPU-first replacements for torch DataLoader worker processes: a thread-pool
prefetcher with a bounded queue feeding jax.device_put ahead of the step
(batch-1 adaptation is latency-bound without it, SURVEY.md §7).
"""

from __future__ import annotations

import os
import queue
import random
from typing import Dict, List, Optional, Sequence

import numpy as np

from .loaders import get_disp_loader
from .splits import default_splits_root, read_lines, split_lines_path


def _resize_bilinear(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Half-pixel-center bilinear resize (torch F.interpolate
    align_corners=False semantics)."""
    import cv2 as cv

    out = cv.resize(img, (w, h), interpolation=cv.INTER_LINEAR)
    if out.ndim == 2:
        out = out[..., None]
    return out


def _load_rgb(path: str, uint8: bool = False) -> np.ndarray:
    """Decode an RGB image. cv2's decoder releases the GIL for the whole
    libpng/libjpeg pass (PIL only partially), which is what lets the
    BatchLoader threads scale; PIL remains the fallback for exotic formats.

    uint8=True keeps the native 8-bit pixels end-to-end — the streaming
    engines upload uint8 and normalize on-device (flat_stream
    images_uint8), so converting to f32 here would just quadruple the
    decode-thread memory traffic and the host->device transfer.
    """
    import cv2 as cv

    bgr = cv.imread(path, cv.IMREAD_COLOR)
    if bgr is not None:
        rgb = np.ascontiguousarray(bgr[:, :, ::-1])
        return rgb if uint8 else rgb.astype(np.float32) / 255.0
    from PIL import Image

    img = Image.open(path)
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    arr = arr[..., :3]
    return arr if uint8 else arr.astype(np.float32) / 255.0


class StereoDataset:
    """Map-style dataset over a split file. Items are dicts of numpy arrays."""

    def __init__(
        self,
        dataset_path: str,
        dataset_name: str,
        split: str,
        height: int,
        width: int,
        subsplit: str,
        scales: Sequence[int] = (0,),
        do_hflip: bool = False,
        random_crop: bool = False,
        load_disp_left: bool = True,
        load_disp_right: bool = True,
        splits_root: Optional[str] = None,
        seed: int = 123,
        color_uint8: bool = False,
    ):
        self.dataset_path = dataset_path
        self.dataset_name = dataset_name
        self.height = height
        self.width = width
        self.scales = list(scales)
        self.do_hflip = do_hflip
        self.random_crop = random_crop
        self.load_disp_left = load_disp_left
        self.load_disp_right = load_disp_right
        # uint8 colors end-to-end (streaming fast path: the engines'
        # images_uint8 transfer normalizes on-device; f32 here would only
        # inflate decode-thread traffic and the host->device copy 4x).
        self.color_uint8 = color_uint8
        self._rng = random.Random(seed)

        if splits_root is None:
            splits_root = os.path.join(dataset_path, "splits")
            if not os.path.isdir(os.path.join(splits_root, split)):
                # Fall back to the vendored repo-level splits directory (the
                # reference's committed split manifests — splits/README.md).
                splits_root = default_splits_root()
        self.lines = read_lines(split_lines_path(splits_root, split, subsplit))
        self.load_disp_fn = get_disp_loader(dataset_name)

    def __len__(self) -> int:
        return len(self.lines)

    def _transform(self, rgb_l, rgb_r, disp_l, disp_r):
        h_img, w_img = rgb_l.shape[:2]
        if self.height > h_img or self.width > w_img:
            raise ValueError(
                f"crop {self.height}x{self.width} larger than image {h_img}x{w_img}"
            )
        if self.random_crop:
            i = self._rng.randint(0, h_img - self.height)
            j = self._rng.randint(0, w_img - self.width)
        else:
            i = (h_img - self.height) // 2
            j = (w_img - self.width) // 2

        if self.do_hflip and self._rng.random() < 0.5:
            rgb_l, rgb_r = rgb_r[:, ::-1], rgb_l[:, ::-1]
            if disp_l is not None and disp_r is not None:
                disp_l, disp_r = disp_r[:, ::-1], disp_l[:, ::-1]

        sl = np.s_[i : i + self.height, j : j + self.width]
        crop = lambda x: None if x is None else np.ascontiguousarray(x[sl])
        return crop(rgb_l), crop(rgb_r), crop(disp_l), crop(disp_r)

    def _resolve(self, p: str) -> str:
        # The vendored KITTI-raw manifests carry the original author's
        # absolute paths (/home/milo/datasets/kitti_data_raw/...); rebase any
        # absolute prefix up to and including the dataset directory onto our
        # dataset_path (reference keeps them absolute — stereo_dataset.py:85-87).
        if os.path.isabs(p) and not p.startswith(self.dataset_path):
            marker = "/datasets/"
            if marker in p:
                rel = p.split(marker, 1)[1]          # "<dsname>/<rel path>"
                rel = rel.split("/", 1)[1] if "/" in rel else rel
                return os.path.join(self.dataset_path, rel)
        return os.path.join(self.dataset_path, p)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        paths = [self._resolve(p) for p in self.lines[index].split(" ")]
        rgb_l_path, rgb_r_path, disp_l_path, disp_r_path = paths

        rgb_l = _load_rgb(rgb_l_path, uint8=self.color_uint8)
        rgb_r = _load_rgb(rgb_r_path, uint8=self.color_uint8)
        disp_l = self.load_disp_fn(disp_l_path) if self.load_disp_left else None
        disp_r = self.load_disp_fn(disp_r_path) if self.load_disp_right else None

        rgb_l, rgb_r, disp_l, disp_r = self._transform(rgb_l, rgb_r, disp_l, disp_r)

        out: Dict[str, np.ndarray] = {}
        for s in self.scales:
            if s == 0:
                continue
            hs, ws = self.height // 2 ** s, self.width // 2 ** s
            out[f"color_l/{s}"] = _resize_bilinear(rgb_l, hs, ws)
            out[f"color_r/{s}"] = _resize_bilinear(rgb_r, hs, ws)
            if disp_l is not None:
                out[f"gt_disp_l/{s}"] = _resize_bilinear(disp_l, hs, ws) / 2 ** s
            if disp_r is not None:
                out[f"gt_disp_r/{s}"] = _resize_bilinear(disp_r, hs, ws) / 2 ** s

        out["color_l/0"] = rgb_l
        out["color_r/0"] = rgb_r
        if disp_l is not None:
            out["gt_disp_l/0"] = disp_l
        if disp_r is not None:
            out["gt_disp_r/0"] = disp_r
        return out


def _collate(items: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


class BatchLoader:
    """Threaded, order-preserving batch loader with bounded prefetch.

    Replaces torch DataLoader worker processes (reference train.py:184-188):
    image decode + resize release the GIL in PIL/cv2, so threads are enough,
    and batches land in page-locked numpy ready for jax.device_put.
    """

    def __init__(
        self,
        dataset: StereoDataset,
        batch_size: int,
        shuffle: bool = False,
        num_workers: int = 4,
        prefetch: int = 4,
        seed: int = 123,
        drop_last: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        from concurrent.futures import ThreadPoolExecutor

        def load_batch(idxs):
            return _collate([self.dataset[int(i)] for i in idxs])

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending: "queue.Queue" = queue.Queue()
            it = iter(batches)
            for _ in range(min(self.prefetch, len(batches))):
                pending.put(pool.submit(load_batch, next(it)))
            while not pending.empty():
                fut = pending.get()
                try:
                    nxt = next(it)
                except StopIteration:
                    nxt = None
                if nxt is not None:
                    pending.put(pool.submit(load_batch, nxt))
                yield fut.result()
