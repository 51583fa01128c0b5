"""Fleet scaling harness: fused fleet-step throughput at 1..N streams.

Measures adapt-steps/sec/stream of the ONE-program fused fleet step as the
stream count (and mesh size) grows — the ≥80%-linear-scaling measurement of
the BASELINE north star. On real multi-chip hardware the gradient psum rides
ICI; on the virtual CPU mesh (default here) the numbers validate the harness
and the sharding, not interconnect performance.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/bench_fleet_scaling.py --sizes 1 2 4 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="*", default=[1, 2, 4, 8])
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=96)
    p.add_argument("--k", type=int, default=3)
    p.add_argument("--input_scale", type=int, default=1)
    p.add_argument("--iters", type=int, default=10)
    a = p.parse_args()

    # Force an n-device virtual CPU mesh BEFORE backend init (env-only
    # configuration is unreliable in this environment — see PERFORMANCE.md).
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={max(a.sizes)}"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from adaptive_stereo_tpu.engine import create_train_state
    from adaptive_stereo_tpu.models import StereoModel
    from adaptive_stereo_tpu.parallel import (
        data_sharding,
        init_fleet_fcs_ema,
        make_fused_fleet_step,
        make_mesh,
    )

    s, k = a.input_scale, a.k
    hs, ws = a.height // 2 ** s, a.width // 2 ** s
    model = StereoModel(k=k, input_scale=s)
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(1, hs, ws, 3), jnp.float32)
    state0 = create_train_state(model, jax.random.PRNGKey(0), left, left, 5e-5)

    results = {}
    for n in a.sizes:
        if n > len(jax.devices()):
            print(f"skip n={n}: only {len(jax.devices())} devices")
            continue
        mesh = make_mesh(n)
        shard = data_sharding(mesh)
        batch = {
            f"color_l/{s}": jax.device_put(jnp.asarray(rng.rand(n, hs, ws, 3), jnp.float32), shard),
            f"color_r/{s}": jax.device_put(jnp.asarray(rng.rand(n, hs, ws, 3), jnp.float32), shard),
            f"gt_disp_l/{s}": jax.device_put(jnp.asarray(rng.rand(n, hs, ws, 1) * 8, jnp.float32), shard),
        }
        fused = make_fused_fleet_step(model, mesh, s, k, use_er=True, use_vs=True,
                                      ood_threshold=15.0, clip_grad_norm=True)
        state = state0
        ema = init_fleet_fcs_ema(n)
        would = jnp.asarray([False] * n)
        in_prog = jnp.asarray([True] * n)
        state, ema, aux = fused(state, ema, batch, batch, would, in_prog)
        _ = np.asarray(aux["fcs_raw"])  # completion barrier
        t0 = time.perf_counter()
        for _ in range(a.iters):
            state, ema, aux = fused(state, ema, batch, batch, would, in_prog)
        _ = np.asarray(aux["fcs_raw"])
        sec = (time.perf_counter() - t0) / a.iters
        results[n] = {"sec_per_step": sec, "frames_per_sec": n / sec}
        print(f"n={n}: {sec*1e3:.1f} ms/step, {n/sec:.2f} frames/s total")

    if 1 in results:
        base = results[1]["frames_per_sec"]
        for n, r in results.items():
            eff = r["frames_per_sec"] / (base * n)
            r["scaling_efficiency"] = eff
            print(f"n={n}: scaling efficiency {eff:.2f}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
