"""Round-4 single-stream profile of the bench.py flat adapt step.

Per-HLO breakdown + XLA cost analysis (FLOPs, bytes accessed) so the
roofline/MFU story in PERFORMANCE.md is grounded: the adaptation step is
latency/bandwidth-bound, so `bytes accessed / HBM bandwidth` — not MXU
FLOPs — is the speed-of-light denominator that matters.

Run on TPU: timeout 4000 python scripts/profile_single_r4.py [--warp_precision default] [--pallas_agg]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from profile_fleet_scaling import breakdown  # reuse the trace aggregator


def main():
    import jax
    import jax.numpy as jnp

    from adaptive_stereo_tpu.engine import create_train_state
    from adaptive_stereo_tpu.engine.flat_stream import (
        init_flat_stream_state,
        make_flat_streaming_steps,
    )
    from adaptive_stereo_tpu.models import StereoModel

    ap = argparse.ArgumentParser()
    ap.add_argument("--warp_precision", default="default")
    ap.add_argument("--pallas_agg", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    a = ap.parse_args()

    k, s, h, w = 4, 0, 320, 960
    model = StereoModel(k=k, input_scale=s, dtype=jnp.bfloat16,
                        fused_siamese=True, s2d_refinement=True,
                        pallas_aggregation=a.pallas_agg)
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    right = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(1, h, w, 1) * 60, jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), left, right, 5e-5)
    ss, spec = init_flat_stream_state(
        state.params, state.batch_stats, 5e-5, 16, h, w, 64, seed=0)
    fused = make_flat_streaming_steps(
        model, spec, s, k, use_er=True, use_vs=True, ood_threshold=12.76,
        clip_grad_norm=True, fused_er_forward=True,
        warp_precision=a.warp_precision)
    adapt_step = fused[0]
    idx = jnp.asarray(0, jnp.int32)

    print(f"[single r4] device={jax.devices()[0]} "
          f"warp_precision={a.warp_precision} pallas_agg={a.pallas_agg}",
          flush=True)

    ss = adapt_step(ss, left, right, gt, left, right, gt, idx)
    _ = np.asarray(ss.log)
    t0 = time.perf_counter()
    for _ in range(a.iters):
        ss = adapt_step(ss, left, right, gt, left, right, gt, idx)
    _ = np.asarray(ss.log)
    ms = 1e3 * (time.perf_counter() - t0) / a.iters
    print(f"[single r4] adapt_step {ms:.2f} ms/step "
          f"({1e3 / ms:.1f} steps/s)", flush=True)

    # Cost analysis: FLOPs + bytes accessed of the compiled step.
    try:
        lowered = adapt_step.lower(ss, left, right, gt, left, right, gt, idx)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
        print(f"[single r4] cost analysis: {flops/1e9:.1f} GFLOP, "
              f"{byts/1e9:.2f} GB accessed", flush=True)
        # v5e: ~197 TF/s bf16, ~819 GB/s HBM.
        print(f"[single r4] rooflines: MXU {1e3*flops/197e12:.2f} ms, "
              f"HBM {1e3*byts/819e9:.2f} ms; measured {ms:.2f} ms -> "
              f"MFU {flops/(ms*1e-3)/197e12*100:.1f}%, "
              f"HBM util {byts/(ms*1e-3)/819e9*100:.1f}%", flush=True)
    except Exception as e:
        print(f"[single r4] cost analysis unavailable: {e}", flush=True)

    tdir = "/tmp/trace_single_r4"
    with jax.profiler.trace(tdir):
        for _ in range(a.iters):
            ss = adapt_step(ss, left, right, gt, left, right, gt, idx)
        _ = np.asarray(ss.log)
    breakdown(tdir, a.iters)


if __name__ == "__main__":
    main()
