"""End-to-end streamed adaptation throughput WITH THE HOST IN THE LOOP.

VERDICT r2 item 3: every committed throughput number streamed device-resident
frames; this measures the real pipeline — PNG decode (BatchLoader threads) ->
uint8 host->device upload -> fused step — at the paper shape for both engine
states:

  IN_PROGRESS: one fused adapt step per frame (the 33-34 steps/s regime)
  DONE:        micro-batched eval dispatch (done_batch frames per program)

Sweeps loader worker counts and reports the end-to-end fps vs the
device-only ceiling for each state.

Usage (real TPU; reuses the paper-scale dataset if present):
  python scripts/bench_stream_e2e.py --data /tmp/paper_scale_synth/novel_domain
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from adaptive_stereo_tpu.utils.compile_cache import enable_persistent_cache


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="/tmp/paper_scale_synth/novel_domain")
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--input_scale", type=int, default=0)
    p.add_argument("--frames", type=int, default=200)
    p.add_argument("--workers", type=int, nargs="*", default=[2, 4, 8, 16])
    p.add_argument("--done_batch", type=int, default=8)
    p.add_argument("--out", default="")
    a = p.parse_args()

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from adaptive_stereo_tpu.data import BatchLoader, StereoDataset, generate_synthetic_dataset
    from adaptive_stereo_tpu.engine import create_train_state
    from adaptive_stereo_tpu.engine.flat_stream import (
        init_flat_stream_state,
        make_flat_streaming_steps,
    )
    from adaptive_stereo_tpu.models import StereoModel

    s, k, h, w = a.input_scale, a.k, a.height, a.width
    if not os.path.exists(os.path.join(a.data, "splits")):
        print(f"[e2e] generating dataset at {a.data}", flush=True)
        generate_synthetic_dataset(a.data, name="synth", num_train=256,
                                   num_val=4, height=h, width=w,
                                   max_disp=64.0, seed=0)

    model = StereoModel(k=k, input_scale=s, dtype=jnp.bfloat16,
                        fused_siamese=True, s2d_refinement=True)
    rng = np.random.RandomState(0)
    dummy = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), dummy, dummy, 5e-5)
    ss0, spec = init_flat_stream_state(
        state.params, state.batch_stats, 5e-5, 16, h, w, 4096, seed=0)
    adapt_step, done_step, _val, make_done_b = make_flat_streaming_steps(
        model, spec, s, k, use_er=True, use_vs=True, ood_threshold=12.76,
        clip_grad_norm=True, images_uint8=True, fused_er_forward=True)
    done_b = make_done_b(a.done_batch)

    # The steps DONATE their state argument, so ss0's device buffers die at
    # the first call; keep a host snapshot and restore it for each phase.
    ss0_host = jax.tree.map(np.asarray, ss0)

    def fresh_ss():
        return jax.tree.map(jax.device_put, ss0_host)

    def u8(x):  # (B,H,W,3) f32 [0,1] -> uint8 device buffer
        return jax.device_put(
            np.clip(np.asarray(x) * 255.0, 0, 255).round().astype(np.uint8))

    gt0 = jnp.zeros((1, h, w, 1), jnp.float32)
    gtN = jnp.zeros((a.done_batch, h, w, 1), jnp.float32)
    idx0 = jnp.asarray(0, jnp.int32)
    idxN = jnp.zeros((a.done_batch,), jnp.int32)

    # --- device-only ceilings (frames resident) ---
    l_res = u8(rng.rand(1, h, w, 3))
    r_res = u8(rng.rand(1, h, w, 3))
    lN = u8(rng.rand(a.done_batch, h, w, 3))
    rN = u8(rng.rand(a.done_batch, h, w, 3))

    ss = fresh_ss()
    ss = adapt_step(ss, l_res, r_res, gt0, l_res, r_res, gt0, idx0)  # compile
    np.asarray(ss.log[:1])
    t0 = time.perf_counter()
    for _ in range(40):
        ss = adapt_step(ss, l_res, r_res, gt0, l_res, r_res, gt0, idx0)
    np.asarray(ss.log[:1])
    ceil_adapt = 40 / (time.perf_counter() - t0)

    ss = done_b(ss, lN, rN, gtN, idxN)  # compile
    np.asarray(ss.log[:1])
    t0 = time.perf_counter()
    for _ in range(20):
        ss = done_b(ss, lN, rN, gtN, idxN)
    np.asarray(ss.log[:1])
    ceil_done = 20 * a.done_batch / (time.perf_counter() - t0)
    print(f"[e2e] device-only ceilings: adapt {ceil_adapt:.1f} fps, "
          f"DONE(batch={a.done_batch}) {ceil_done:.1f} fps", flush=True)

    results = {"ceil_adapt_fps": ceil_adapt, "ceil_done_fps": ceil_done,
               "workers": {}}

    def make_loader(nw):
        # uint8 end-to-end: decode keeps native 8-bit pixels, the engines
        # normalize on-device (images_uint8), so the host never touches f32.
        ds = StereoDataset(a.data, "Synthetic", "synth", h, w, "train",
                           scales=[s], do_hflip=False, random_crop=False,
                           load_disp_left=False, load_disp_right=False,
                           color_uint8=True)
        return BatchLoader(ds, 1, shuffle=False, num_workers=nw,
                           prefetch=max(8, nw * 2), seed=0)

    for nw in a.workers:
        loader = make_loader(nw)

        # loader-only fps (decode ceiling at this worker count)
        n = 0
        t0 = time.perf_counter()
        for batch in loader:
            n += 1
            if n >= a.frames:
                break
        loader_fps = n / (time.perf_counter() - t0)

        # IN_PROGRESS end-to-end: uint8 decode -> upload -> adapt step
        ss = fresh_ss()
        n = 0
        t0 = time.perf_counter()
        for batch in loader:
            left = jax.device_put(batch[f"color_l/{s}"])
            right = jax.device_put(batch[f"color_r/{s}"])
            ss = adapt_step(ss, left, right, gt0, left, right, gt0, idx0)
            n += 1
            if n >= a.frames:
                break
        np.asarray(ss.log[:1])
        adapt_fps = n / (time.perf_counter() - t0)

        # DONE end-to-end: decode -> queue -> batched dispatch
        ss = fresh_ss()
        n = 0
        pend = []
        t0 = time.perf_counter()
        for batch in loader:
            pend.append((batch[f"color_l/{s}"], batch[f"color_r/{s}"]))
            if len(pend) == a.done_batch:
                ss = done_b(ss,
                            jax.device_put(np.concatenate([x[0] for x in pend])),
                            jax.device_put(np.concatenate([x[1] for x in pend])),
                            gtN, idxN)
                pend = []
            n += 1
            if n >= a.frames:
                break
        np.asarray(ss.log[:1])
        done_fps = n / (time.perf_counter() - t0)

        results["workers"][nw] = {
            "loader_only_fps": loader_fps,
            "adapt_e2e_fps": adapt_fps,
            "done_e2e_fps": done_fps,
        }
        print(f"[e2e] workers={nw}: loader {loader_fps:.1f} fps | "
              f"IN_PROGRESS e2e {adapt_fps:.1f} fps "
              f"({100 * adapt_fps / ceil_adapt:.0f}% of device) | "
              f"DONE e2e {done_fps:.1f} fps "
              f"({100 * done_fps / ceil_done:.0f}% of device)", flush=True)

    print(json.dumps(results), flush=True)
    if a.out:
        with open(a.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
