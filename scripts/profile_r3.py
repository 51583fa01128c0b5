"""Trace the round-2 headline config (banded warp + matmul pools +
fused_er_forward + fused_siamese) and print the per-op/category breakdown.

Run: timeout 3000 python scripts/profile_r3.py
"""

import collections
import glob
import gzip
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from adaptive_stereo_tpu.engine import create_train_state
    from adaptive_stereo_tpu.engine.flat_stream import (
        init_flat_stream_state,
        make_flat_streaming_steps,
    )
    from adaptive_stereo_tpu.models import StereoModel

    k, s, h, w = 4, 0, 320, 960
    model = StereoModel(k=k, input_scale=s, dtype=jnp.bfloat16,
                        fused_siamese=True, s2d_refinement=True)
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    right = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(1, h, w, 1) * 60, jnp.float32)

    state = create_train_state(model, jax.random.PRNGKey(0), left, right, 5e-5)
    ss, spec = init_flat_stream_state(
        state.params, state.batch_stats, 5e-5, 16, h, w, 64, seed=0)
    adapt_step, _, _, _ = make_flat_streaming_steps(
        model, spec, s, k, use_er=True, use_vs=True,
        ood_threshold=12.76, clip_grad_norm=True, fused_er_forward=True)
    idx = jnp.asarray(0, jnp.int32)
    args = (left, right, gt, left, right, gt, idx)

    def run_block(n, ss):
        for _ in range(n):
            ss = adapt_step(ss, *args)
        np.asarray(ss.log)
        return ss

    ss = run_block(5, ss)
    t0 = time.perf_counter()
    ss = run_block(20, ss)
    print(json.dumps({"ms_per_step": round(1e3 * (time.perf_counter() - t0) / 20, 2)}),
          flush=True)

    with jax.profiler.trace("artifacts/trace_r4"):
        ss = run_block(10, ss)

    path = sorted(glob.glob("artifacts/trace_r4/plugins/profile/*/vm.trace.json.gz"))[-1]
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
                ex[n] = a.get("long_name", "")[:140]
    print(f"total {tot / 1e3 / 10:.2f} ms/step")
    for c, d in sorted(cat.items(), key=lambda kv: -kv[1])[:8]:
        print(f"{d / 1e3 / 10:8.2f} ms/step  {c}")
    print()
    for n, d in sorted(durs.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{d / 1e3 / 10:7.3f} x{cnts[n] // 10} {n[:24]:24s} {ex[n][:120]}")


if __name__ == "__main__":
    main()
