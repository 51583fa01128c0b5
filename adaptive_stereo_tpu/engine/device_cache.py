"""Device-resident frame caches for the streaming engines.

Motivation (measured): on the remote-dispatch axon TPU backend every
host->device transfer leaks host RSS at roughly 2x the payload bytes
(isolation probe, artifacts/axon_leak.log: 300 steps of device-resident
dispatch grew +0.00 GB while 300 steps of per-step image uploads grew
+1.73 GB; the same program on the CPU backend is flat either way). A
4000-step paper-scale adaptation run uploading full-resolution f32 batches
leaked ~28 MB/step and OOM-killed the host at 130 GB RSS.

The adaptation protocol streams a FINITE dataset (the reference replays a
recorded sequence, adapt.py:214-230), so the TPU-native answer is to ship
the whole stream to HBM once and slice frames on device:

  - colors cached as uint8 (4x smaller than f32): the sources are 8-bit
    images and the stream pipeline is crop/resize-free at the stream scale
    (stream_driver builds its datasets with random_crop=False), so
    uint8 + on-device /255 is BIT-EXACT vs the f32 loader path at
    input_scale 0. At input_scale > 0 the pyramid resize happens in f32,
    so the cache stores f32 there instead (the frames are 4^s smaller).
  - GT disparity cached as f32 (it only feeds the ring-log EPE and evals).

At 320x960 the full 500-frame paper stream is ~0.9 GB of uint8 color +
0.6 GB of f32 GT — comfortably HBM-resident next to the ~8 MB model.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _load_all(dataset, num_workers: int = 8) -> List[dict]:
    with ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
        return list(pool.map(dataset.__getitem__, range(len(dataset))))


class DeviceStreamCache:
    """The adaptation stream (color_l/s, color_r/s, gt_disp_l/s) stacked
    into three device arrays, with a jitted per-frame fetch.

    `dataset` must yield uint8 colors when `uint8_colors` (construct it with
    color_uint8=True); fetches return (1,H,W,3) uint8 / (1,H,W,1) f32 slices
    ready for the flat engine built with images_uint8=uint8_colors.
    """

    def __init__(self, dataset, scale: int, uint8_colors: bool,
                 num_workers: int = 8, items: Optional[List[dict]] = None):
        s = scale
        items = _load_all(dataset, num_workers) if items is None else items
        lk, rk, gk = f"color_l/{s}", f"color_r/{s}", f"gt_disp_l/{s}"
        cdt = np.uint8 if uint8_colors else np.float32
        self.left = jax.device_put(
            np.stack([it[lk] for it in items]).astype(cdt))
        self.right = jax.device_put(
            np.stack([it[rk] for it in items]).astype(cdt))
        if gk in items[0]:
            gt = np.stack([it[gk] for it in items]).astype(np.float32)
        else:
            h, w = items[0][lk].shape[:2]
            gt = np.zeros((len(items), h, w, 1), np.float32)
        self.gt = jax.device_put(gt)
        self.keys = (lk, rk, gk)
        self._fetch = jax.jit(
            lambda l, r, g, i: tuple(
                jax.lax.dynamic_index_in_dim(x, i, 0, keepdims=True)
                for x in (l, r, g)))

    def __len__(self) -> int:
        return self.left.shape[0]

    def fetch(self, index) -> Dict[str, jax.Array]:
        l, r, g = self._fetch(self.left, self.right, self.gt,
                              jnp.asarray(index, jnp.int32))
        lk, rk, gk = self.keys
        return {lk: l, rk: r, gk: g}


class DeviceCachedLoader:
    """A BatchLoader materialized to device once.

    Drop-in for engine.evaluate(): same __len__/batch_size/iteration
    contract, but yields committed device batches — evaluate()'s
    jax.device_put on them is a no-op, so repeated evals cost zero
    host->device transfers (and zero axon RSS leak).
    """

    def __init__(self, loader):
        self.batch_size = loader.batch_size
        self._batches = [
            {k: jax.device_put(np.asarray(v)) for k, v in b.items()}
            for b in loader
        ]

    def __len__(self) -> int:
        return len(self._batches)

    def __iter__(self):
        return iter(self._batches)
