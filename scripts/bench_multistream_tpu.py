"""Multi-stream-per-chip throughput on the REAL TPU (VERDICT r2 item 4).

The fleet layer's north star is per-chip camera streams (SURVEY §2 C17-C19):
one chip adapts N independent streams by batching their frames through the
shared model (vmap inside the fused fleet step; the mesh has ONE device here,
so every collective is a no-op and the measurement is pure batching
efficiency on the MXU). This is the only multi-chip-adjacent number
measurable in the one-chip environment.

Reports aggregate adapt-steps/s and per-stream latency at the paper shape
(320x960, k=4) for N in --sizes, plus the utilization curve vs N=1.

Usage (real TPU, default backend):
  python scripts/bench_multistream_tpu.py --sizes 1 2 4
  python scripts/bench_multistream_tpu.py --height 160 --width 480 --sizes 1 2 4 8
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
    p.add_argument("--sizes", type=int, nargs="*", default=[1, 2, 4, 8])
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--input_scale", type=int, default=0)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--rounds", type=int, default=4)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--fused", action="store_true", default=True,
                   help="fused_siamese + s2d tower (the bench.py config)")
    p.add_argument("--out", default="")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the merged forward in the backward "
                        "(bn_mode=shared only): trade MXU-idle recompute "
                        "for HBM activation traffic")
    p.add_argument("--bn_mode", default="per_stream",
                   choices=["per_stream", "shared"],
                   help="fleet BN statistics: per_stream (reference batch-1 "
                        "semantics per camera) or shared (merged-batch "
                        "joint statistics — documented fleet-serving "
                        "deviation; avoids the per-stream vmap's layout "
                        "conversions)")
    p.add_argument("--warp_precision", default="default",
                   help="loss-warp MXU precision for the fleet step; the "
                        "bf16 fleet config defaults to 'default' (4e-3 warp "
                        "error under bf16 model noise; 2.4x faster backward "
                        "— artifacts/exp_warp_precision_r4.log). Use "
                        "'highest' for the exact-parity measurement.")
    p.add_argument("--pallas_tower", action="store_true",
                   help="fused Pallas refinement tower (ops/pallas/tower.py);"
                        " at fleet batch sizes the per-call overheads"
                        " amortize over N streams")
    p.add_argument("--certify", action="store_true",
                   help="paper-shape fleet certification: per-stream grads "
                        "from the sharded fleet fwd+bwd == running each "
                        "stream alone, at THIS shape on the real device "
                        "(VERDICT r2 item 6)")
    a = p.parse_args()

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from adaptive_stereo_tpu.engine import create_train_state
    from adaptive_stereo_tpu.models import StereoModel
    from adaptive_stereo_tpu.parallel import (
        init_fleet_fcs_ema,
        make_fused_fleet_step,
        make_mesh,
    )

    s, k = a.input_scale, a.k
    hs, ws = a.height // 2 ** s, a.width // 2 ** s
    dtype = jnp.bfloat16 if a.dtype == "bfloat16" else None
    model = StereoModel(k=k, input_scale=s, dtype=dtype,
                        fused_siamese=a.fused, s2d_refinement=a.fused,
                        pallas_tower=a.pallas_tower)
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(1, hs, ws, 3), jnp.float32)
    state0 = create_train_state(model, jax.random.PRNGKey(0), left, left, 5e-5)
    print(f"[multistream] device={jax.devices()[0]} shape={a.height}x{a.width} "
          f"k={k} dtype={a.dtype} fused={a.fused}", flush=True)

    mesh = make_mesh(1)  # ONE chip; streams batch via vmap inside the step

    if a.certify:
        from adaptive_stereo_tpu.engine import make_adapt_forward_backward
        from adaptive_stereo_tpu.parallel import make_fleet_fwd_bwd

        n = 2
        batch = {
            f"color_l/{s}": jnp.asarray(rng.rand(n, hs, ws, 3), jnp.float32),
            f"color_r/{s}": jnp.asarray(rng.rand(n, hs, ws, 3), jnp.float32),
            f"gt_disp_l/{s}": jnp.asarray(rng.rand(n, hs, ws, 1) * 60,
                                          jnp.float32),
        }
        single = make_adapt_forward_backward(model, s, k, use_er=True)
        fleet = make_fleet_fwd_bwd(single, mesh)
        grads_n, _stats, aux_n = fleet(state0.params, state0.batch_stats,
                                       batch, batch)
        jax.block_until_ready(aux_n["fcs_raw"])
        for i in range(n):
            bi = {key: v[i:i + 1] for key, v in batch.items()}
            g_i, _, aux_i = single(state0.params, state0.batch_stats, bi, bi)
            np.testing.assert_allclose(
                float(aux_i["fcs_raw"]),
                float(np.asarray(aux_n["fcs_raw"])[i]), rtol=1e-4)
            for r, o in zip(jax.tree.leaves(g_i),
                            [np.asarray(x)[i] for x in jax.tree.leaves(grads_n)]):
                np.testing.assert_allclose(np.asarray(r, np.float32), o,
                                           rtol=5e-3, atol=1e-5)
        print(f"[multistream] CERTIFIED at {a.height}x{a.width} k={k} "
              f"dtype={a.dtype}: fleet per-stream grads == single-stream "
              f"grads (both streams), on {jax.devices()[0]}", flush=True)

    # Phase A: compile every size up front. Phase B: INTERLEAVE the timing
    # blocks across sizes, several rounds — the shared device's throughput
    # varies ~10x minute-to-minute, so timing each size in its own
    # multi-minute window (the original design) confounds size with device
    # load; cycling n=1,2,4,8 per round exposes all sizes to the same load.
    results = {}
    ctx = {}
    fused = make_fused_fleet_step(model, mesh, s, k, use_er=True,
                                  use_vs=True, ood_threshold=12.76,
                                  clip_grad_norm=True,
                                  warp_precision=a.warp_precision,
                                  bn_mode=a.bn_mode, remat=a.remat)
    for n in a.sizes:
        batch = {
            f"color_l/{s}": jnp.asarray(rng.rand(n, hs, ws, 3), jnp.float32),
            f"color_r/{s}": jnp.asarray(rng.rand(n, hs, ws, 3), jnp.float32),
            f"gt_disp_l/{s}": jnp.asarray(rng.rand(n, hs, ws, 1) * 60, jnp.float32),
        }
        ema = init_fleet_fcs_ema(n)
        would = jnp.asarray([False] * n)
        in_prog = jnp.asarray([True] * n)
        try:
            t_c0 = time.perf_counter()
            state, ema, aux = fused(state0, ema, batch, batch, would, in_prog)
            _ = np.asarray(aux["fcs_raw"])
            print(f"[multistream] n={n} first step (compile+run) "
                  f"{time.perf_counter() - t_c0:.1f}s", flush=True)
            ctx[n] = [state, ema, batch, would, in_prog, []]
        except Exception as e:
            print(f"[multistream] n={n} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            results[n] = {"error": str(e)[:300]}

    for rnd in range(a.rounds):
        for n, c in ctx.items():
            state, ema, batch, would, in_prog, blocks = c
            t0 = time.perf_counter()
            for _ in range(a.iters):
                state, ema, aux = fused(state, ema, batch, batch, would, in_prog)
            _ = np.asarray(aux["fcs_raw"])
            blocks.append((time.perf_counter() - t0) / a.iters)
            c[0], c[1] = state, ema
            print(f"[multistream] round {rnd} n={n}: "
                  f"{blocks[-1]*1e3:.2f} ms/step", flush=True)

    for n, c in ctx.items():
        blocks = c[5]
        sec = min(blocks)
        results[n] = {"ms_per_step": sec * 1e3,
                      "aggregate_steps_per_sec": n / sec,
                      "per_stream_latency_ms": sec * 1e3,
                      "all_blocks_ms": [b * 1e3 for b in blocks]}
        print(f"[multistream] n={n}: best {sec*1e3:.2f} ms/step -> "
              f"{n/sec:.1f} aggregate adapt-steps/s", flush=True)

    ok = {n: r for n, r in results.items() if "error" not in r}
    if 1 in ok:
        base = ok[1]["aggregate_steps_per_sec"]
        for n, r in ok.items():
            r["utilization_vs_n1"] = r["aggregate_steps_per_sec"] / (base * n)
            print(f"[multistream] n={n}: utilization vs N=1 "
                  f"{r['utilization_vs_n1']:.2f} "
                  f"(aggregate {r['aggregate_steps_per_sec']:.1f} steps/s)",
                  flush=True)
    print(json.dumps({"config": vars(a), "results": results}), flush=True)
    if a.out:
        with open(a.out, "w") as f:
            json.dump({"config": vars(a), "results": results}, f, indent=2)


if __name__ == "__main__":
    main()
