"""Benchmark: adapted-stereo throughput on real TPU hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: fused online-adaptation steps/sec (forward + Monodepth loss
+ FCS + replay forward + backward + masked Adam, one XLA program + update) at
the canonical paper configuration — 320x960, k=4, input_scale=0, batch 1
(reference experiments/adaptation/adapt_vs_er.sh). This is "adapted stereo
fps": every streamed frame gets a full adaptation step.

vs_baseline is measured against the BASELINE.json real-time target of 30 fps
adapted stereo (the reference repo publishes no throughput numbers —
SURVEY.md §6; its timing harness evaluation/stereonet_timing.py:22-75 exists
but has no committed results).

Extra diagnostic metrics (forward-only fps, etc.) go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _time_fn(fn, *args, warmup=3, iters=20):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    import jax
    import jax.numpy as jnp

    from adaptive_stereo_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from adaptive_stereo_tpu.engine import create_train_state
    from adaptive_stereo_tpu.models import StereoModel

    k, s, h, w = 4, 0, 320, 960
    dtype_name = "bfloat16"
    # fused_siamese: one batch-2 feature-tower forward per view pair; with
    # the fused ER forward below, the extractor runs at batch 4 per step.
    # s2d_refinement: space-to-depth tower layout (exact; see
    # models/s2d_refinement.py) — C=32 full-res activations pack 128 lanes.
    model = StereoModel(k=k, input_scale=s, dtype=jnp.bfloat16,
                        fused_siamese=True, s2d_refinement=True)

    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    right = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(1, h, w, 1) * 60, jnp.float32)
    batch = {f"color_l/{s}": left, f"color_r/{s}": right, f"gt_disp_l/{s}": gt}
    er_batch = batch

    state = create_train_state(model, jax.random.PRNGKey(0), left, right, 5e-5)

    from adaptive_stereo_tpu.engine.flat_stream import (
        init_flat_stream_state,
        make_flat_streaming_steps,
    )

    # --- fused flat-state streaming adapt step (headline). One XLA program
    # per frame; host reads the device ring log once every 20 frames (the
    # production drain cadence). Frames are device-resident here — the
    # serving path uploads uint8 frames asynchronously. ---
    ss, spec = init_flat_stream_state(
        state.params, state.batch_stats, 5e-5, 16, h, w, 64, seed=0)
    # warp_precision="default": the bench config is already bf16 compute; the
    # warp's 4e-3 interpolation error sits below the model's bf16 activation
    # noise and buys 2 ms/step (artifacts/exp_warp_precision_r4.log; parity
    # engines keep the exact f32/HIGHEST warp).
    fused = make_flat_streaming_steps(
        model, spec, s, k, use_er=True, use_vs=True,
        ood_threshold=12.76, clip_grad_norm=True, fused_er_forward=True,
        warp_precision="default")
    adapt_step = fused[0]
    idx = jnp.asarray(0, jnp.int32)

    def run_block(n):
        nonlocal ss
        for _ in range(n):
            ss = adapt_step(ss, left, right, gt, left, right, gt, idx)
        return np.asarray(ss.log)  # boundary drain (one readback)

    run_block(5)  # warmup / compile
    # The shared device's throughput varies minute-to-minute (PERFORMANCE.md);
    # the headline stays the best of the FIRST 3 drain-cadence blocks (the
    # achievable rate, comparable round-over-round), and a p50 over >=10
    # blocks rides along so comparisons aren't hostage to device variance
    # (VERDICT r4 item 9).
    drain_every = 20
    n_blocks = 10
    block_times = []
    for _ in range(n_blocks):
        t0 = time.perf_counter()
        run_block(drain_every)
        block_times.append((time.perf_counter() - t0) / drain_every)
    t_adapt = min(block_times[:3])
    adapt_fps = 1.0 / t_adapt
    t_p50 = float(np.median(block_times))
    p50_fps = 1.0 / t_p50

    # Emit the headline JSON IMMEDIATELY — remote compiles for the optional
    # diagnostics below can take minutes and must not cost us the result.
    print(json.dumps({
        "metric": "adapt_steps_per_sec_320x960_k4_b1",
        "value": round(adapt_fps, 2),
        "unit": "steps/s",
        "vs_baseline": round(adapt_fps / 30.0, 3),
        "p50_over_10_blocks": round(p50_fps, 2),
    }), flush=True)
    print(
        f"[bench] adapt_step {1e3*t_adapt:.2f} ms ({adapt_fps:.1f} steps/s) | "
        f"p50 over {n_blocks} blocks {1e3*t_p50:.2f} ms ({p50_fps:.1f} "
        f"steps/s) | config 320x960 k={k} s={s} b=1 dtype={dtype_name}",
        file=sys.stderr, flush=True,
    )

    # --- optional diagnostic: forward-only (serving) fps, bf16 ---
    try:
        fwd = jax.jit(
            lambda v, l, r: model.apply(v, l, r, side="l",
                                        output_cost_volume=True, train=False)
        )
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        t_fwd = _time_fn(fwd, variables, left, right)
        print(f"[bench] forward bf16 {1e3*t_fwd:.2f} ms ({1/t_fwd:.1f} fps)",
              file=sys.stderr, flush=True)
    except Exception as e:  # diagnostics must never fail the benchmark
        print(f"[bench] forward diagnostic skipped: {e}", file=sys.stderr)

    # --- serving headline (VERDICT r4 item 8): DONE-state micro-batched
    # eval fps — the production fleet-serving configuration once the plateau
    # machine parks a stream in DONE. Full DONE semantics per frame (eval
    # forward + Monodepth + FCS/EMA chain + reservoir gate + ring log) at
    # the reference timing harness's two canonical shapes
    # (evaluation/stereonet_timing.py:22-75 uses 320x1216; the paper
    # adaptation shape is 320x960). Written to artifacts/bench_serving.json
    # and stderr; the headline JSON line above stays the adapt step. ---
    try:
        serving = {}
        nb = 8  # done_batch: frames per dispatch (artifacts/exp_done_batch.log)
        for hh, ww in [(320, 960), (320, 1216)]:
            ss_s, spec_s = init_flat_stream_state(
                state.params, state.batch_stats, 5e-5, 4, hh, ww, 256, seed=0)
            steps_s = make_flat_streaming_steps(
                model, spec_s, s, k, use_er=False, use_vs=True,
                ood_threshold=12.76, warp_precision="default")
            done_b = steps_s[3](nb)
            lefts = jnp.asarray(rng.rand(nb, hh, ww, 3), jnp.float32)
            rights = jnp.asarray(rng.rand(nb, hh, ww, 3), jnp.float32)
            gts = jnp.zeros((nb, hh, ww, 1), jnp.float32)
            idxs = jnp.arange(nb, dtype=jnp.int32)

            def serve_block(ss_s, n_calls):
                for _ in range(n_calls):
                    ss_s = done_b(ss_s, lefts, rights, gts, idxs)
                np.asarray(ss_s.log[0])  # completion barrier (readback)
                return ss_s

            ss_s = serve_block(ss_s, 2)  # warmup / compile
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                ss_s = serve_block(ss_s, 4)
                best = min(best, (time.perf_counter() - t0) / (4 * nb))
            serving[f"{hh}x{ww}"] = round(1.0 / best, 1)
            print(f"[bench] serving DONE-state micro-batched (n={nb}) "
                  f"{hh}x{ww}: {1.0/best:.1f} frames/s "
                  f"({1e3*best:.2f} ms/frame)", file=sys.stderr, flush=True)
        with open("artifacts/bench_serving.json", "w") as f:
            json.dump({"done_batch": nb, "unit": "frames/s",
                       "config": f"k={k} s={s} bf16 fused+s2d",
                       "fps": serving}, f, indent=2)
    except Exception as e:
        print(f"[bench] serving diagnostic skipped: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
