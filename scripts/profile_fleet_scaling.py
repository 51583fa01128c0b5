"""Why does the fused fleet step scale so badly with streams on real TPU?

bench_multistream_tpu.py (artifacts/bench_multistream_r3b.json) measured a
STABLE pathology at 320x960/k=4 bf16: n=1 28.4 ms, n=2 123.1 ms (4.3x),
n=4 329.8 ms (11.6x), n=8 268.0 ms (9.4x, cheaper than n=4!). Not device
noise (interleaved blocks repeat to 0.3%), so it is XLA code generation.

This script names the offending ops: jax.profiler traces of the fleet step
at n=1 and n=2 plus a native-batch-2 fwd+bwd control (same math, stream axis
as a plain batch axis instead of vmap-over-streams), and prints per-category
/ per-fusion diffs.

Run: timeout 4000 python scripts/profile_fleet_scaling.py
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def breakdown(trace_dir, iters):
    path = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/vm.trace.json.gz")))[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    cat = collections.defaultdict(float)
    durs = collections.defaultdict(float)
    cnts = collections.defaultdict(int)
    ex = {}
    tot = 0.0
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") == 3 and "dur" in e:
            a = e.get("args", {})
            c = a.get("hlo_category")
            if c is None:
                continue
            cat[c] += e["dur"]
            tot += e["dur"]
            n = e["name"]
            durs[n] += e["dur"]
            cnts[n] += 1
            if n not in ex:
                ex[n] = a.get("long_name", "")[:160]
    print(f"  total {tot / 1e3 / iters:.2f} ms/step")
    for c, d in sorted(cat.items(), key=lambda kv: -kv[1])[:10]:
        print(f"  {d / 1e3 / iters:8.2f} ms/step  {c}")
    print()
    for n, d in sorted(durs.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {d / 1e3 / iters:7.3f} x{cnts[n] // iters:2d} {n[:26]:26s} "
              f"{ex[n][:110]}")
    print(flush=True)


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    from adaptive_stereo_tpu.engine import create_train_state, make_adapt_forward_backward
    from adaptive_stereo_tpu.models import StereoModel
    from adaptive_stereo_tpu.parallel import (
        init_fleet_fcs_ema,
        make_fused_fleet_step,
        make_mesh,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[1, 2])
    ap.add_argument("--skip_native", action="store_true")
    ap.add_argument("--bn_mode", default="per_stream")
    ap.add_argument("--warp_precision", default="highest")
    args = ap.parse_args()

    k, s, h, w = 4, 0, 320, 960
    model = StereoModel(k=k, input_scale=s, dtype=jnp.bfloat16,
                        fused_siamese=True, s2d_refinement=True)
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    state0 = create_train_state(model, jax.random.PRNGKey(0), left, left, 5e-5)
    mesh = make_mesh(1)
    fused = make_fused_fleet_step(model, mesh, s, k, use_er=True, use_vs=True,
                                  ood_threshold=12.76, clip_grad_norm=True,
                                  bn_mode=args.bn_mode,
                                  warp_precision=args.warp_precision)
    print(f"[profile_fleet] device={jax.devices()[0]} bn_mode={args.bn_mode} "
          f"warp_precision={args.warp_precision}", flush=True)

    for n in args.sizes:
        batch = {
            f"color_l/{s}": jnp.asarray(rng.rand(n, h, w, 3), jnp.float32),
            f"color_r/{s}": jnp.asarray(rng.rand(n, h, w, 3), jnp.float32),
            f"gt_disp_l/{s}": jnp.asarray(rng.rand(n, h, w, 1) * 60, jnp.float32),
        }
        ema = init_fleet_fcs_ema(n)
        would = jnp.asarray([False] * n)
        in_prog = jnp.asarray([True] * n)

        state, ema2, aux = fused(state0, ema, batch, batch, would, in_prog)
        _ = np.asarray(aux["fcs_raw"])
        t0 = time.perf_counter()
        for _ in range(10):
            state, ema2, aux = fused(state, ema2, batch, batch, would, in_prog)
        _ = np.asarray(aux["fcs_raw"])
        print(f"[profile_fleet] fleet n={n}: "
              f"{1e3 * (time.perf_counter() - t0) / 10:.2f} ms/step", flush=True)

        tdir = f"/tmp/trace_fleet_n{n}"
        with jax.profiler.trace(tdir):
            for _ in range(10):
                state, ema2, aux = fused(state, ema2, batch, batch, would, in_prog)
            _ = np.asarray(aux["fcs_raw"])
        breakdown(tdir, 10)

    if args.skip_native:
        return
    # Control: the same fwd+bwd math with the stream axis as a NATIVE batch
    # axis (BN statistics then span streams — wrong fleet semantics, right
    # baseline for "what should batch-2 cost").
    single = make_adapt_forward_backward(model, s, k, use_er=True)
    fb = jax.jit(single)
    n = 2
    batch = {
        f"color_l/{s}": jnp.asarray(rng.rand(n, h, w, 3), jnp.float32),
        f"color_r/{s}": jnp.asarray(rng.rand(n, h, w, 3), jnp.float32),
        f"gt_disp_l/{s}": jnp.asarray(rng.rand(n, h, w, 1) * 60, jnp.float32),
    }
    g, st, aux = fb(state0.params, state0.batch_stats, batch, batch)
    jax.block_until_ready(aux["fcs_raw"])
    t0 = time.perf_counter()
    for _ in range(10):
        g, st, aux = fb(state0.params, state0.batch_stats, batch, batch)
    jax.block_until_ready(aux["fcs_raw"])
    print(f"[profile_fleet] native-batch fwd+bwd B=2: "
          f"{1e3 * (time.perf_counter() - t0) / 10:.2f} ms/call", flush=True)
    tdir = "/tmp/trace_native_b2"
    with jax.profiler.trace(tdir):
        for _ in range(10):
            g, st, aux = fb(state0.params, state0.batch_stats, batch, batch)
        jax.block_until_ready(aux["fcs_raw"])
    breakdown(tdir, 10)


if __name__ == "__main__":
    main()
