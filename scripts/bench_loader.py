"""Input-pipeline throughput at the paper configuration (VERDICT r1 item 9):
frames/s of BatchLoader alone at 320x960 batch-1, with PIL/cv2 and (if built)
the native C++ decode path. The loader must sustain >= 2x the device step
rate (currently ~14 steps/s) for the device-side work to matter.

Run: python scripts/bench_loader.py  (CPU-only; ~1 min)
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    from adaptive_stereo_tpu.data import (
        BatchLoader,
        StereoDataset,
        generate_synthetic_dataset,
    )

    h, w = 320, 960
    n = 64
    work = tempfile.mkdtemp()
    generate_synthetic_dataset(work, name="synth", num_train=n, num_val=2,
                               height=h, width=w, max_disp=64.0, seed=0)

    results = {}
    for workers in (0, 2, 4, 8):
        ds = StereoDataset(work, "Synthetic", "synth", h, w, "train",
                           scales=[0, 4], do_hflip=False, random_crop=False,
                           load_disp_left=True, load_disp_right=True)
        loader = BatchLoader(ds, 1, shuffle=False, num_workers=workers)
        # warm one epoch (page cache), measure the second
        for _ in loader:
            pass
        t0 = time.perf_counter()
        cnt = 0
        for batch in loader:
            cnt += 1
        dt = time.perf_counter() - t0
        results[workers] = cnt / dt
        print(f"[loader] num_workers={workers}: {cnt / dt:.1f} frames/s "
              f"({1e3 * dt / cnt:.1f} ms/frame) at {h}x{w} b=1 "
              f"scales=[0,4] with both GT disparities")

    best = max(results.values())
    print(f"[loader] best {best:.1f} frames/s — "
          f"{'OK (>=2x the 14.3 steps/s device rate)' if best >= 30 else 'BOTTLENECK'}")


if __name__ == "__main__":
    main()
