"""Round-2 perf evidence: where do the fused adapt step's milliseconds go?

Produces (stdout, JSON-ish lines) the breakdown VERDICT.md round 1 asked for:
  1. compiled cost_analysis of the EXACT headline adapt step (flops, bytes)
     -> roofline "optimal" time for the hardware;
  2. measured per-step time over chained donated blocks (bench methodology);
  3. a null-step dispatch floor: same FlatStreamState donated and chained,
     near-zero compute -> isolates tunnel/dispatch/state-transfer overhead
     from device compute;
  4. (best effort) a jax.profiler trace of one block, saved to
     artifacts/trace_r2/ for offline inspection.

Compile budget: exactly three XLA programs (adapt step, null step, forward),
each compiled once. Run: timeout 3000 python scripts/profile_r2.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

V5E_BF16_FLOPS = 197e12   # peak bf16 TFLOP/s, TPU v5e
V5E_HBM_BYTES = 819e9     # HBM bandwidth, bytes/s


def report(tag, **kw):
    print(json.dumps({"tag": tag, **kw}), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from adaptive_stereo_tpu.engine import create_train_state
    from adaptive_stereo_tpu.engine.flat_stream import (
        FlatStreamState,
        init_flat_stream_state,
        make_flat_streaming_steps,
    )
    from adaptive_stereo_tpu.models import StereoModel

    report("env", backend=jax.default_backend(),
           device=str(jax.devices()[0]))

    k, s, h, w = 4, 0, 320, 960
    model = StereoModel(k=k, input_scale=s, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    right = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(1, h, w, 1) * 60, jnp.float32)

    state = create_train_state(model, jax.random.PRNGKey(0), left, right, 5e-5)
    ss, spec = init_flat_stream_state(
        state.params, state.batch_stats, 5e-5, 16, h, w, 64, seed=0)
    adapt_step, done_step, _, _ = make_flat_streaming_steps(
        model, spec, s, k, use_er=True, use_vs=True,
        ood_threshold=12.76, clip_grad_norm=True)
    idx = jnp.asarray(0, jnp.int32)

    # ---- 1. cost analysis of the exact headline program ----
    t0 = time.perf_counter()
    lowered = adapt_step.lower(ss, left, right, gt, left, right, gt, idx)
    compiled = lowered.compile()
    report("compile", seconds=round(time.perf_counter() - t0, 1))
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    t_mxu = flops / V5E_BF16_FLOPS
    t_hbm = byts / V5E_HBM_BYTES
    report("cost_analysis", flops=flops, bytes_accessed=byts,
           roofline_ms_mxu=round(1e3 * t_mxu, 3),
           roofline_ms_hbm=round(1e3 * t_hbm, 3),
           roofline_ms=round(1e3 * max(t_mxu, t_hbm), 3))

    # warmup through the compiled executable (donation => rebuild args fresh)
    def run_block(n, step, ss, args):
        for _ in range(n):
            ss = step(ss, *args)
        np.asarray(ss.log)  # readback barrier (block_until_ready unreliable)
        return ss

    args = (left, right, gt, left, right, gt, idx)
    ss = run_block(3, adapt_step, ss, args)

    # ---- 2. measured per-step over chained blocks, several block sizes ----
    for n in (10, 20, 50):
        t0 = time.perf_counter()
        ss = run_block(n, adapt_step, ss, args)
        dt = time.perf_counter() - t0
        report("adapt_block", n=n, ms_per_step=round(1e3 * dt / n, 2),
               steps_per_s=round(n / dt, 2))

    # ---- 3. null-step dispatch floor: identical state pytree, ~zero compute
    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def null_step(ss: FlatStreamState, l, r, g, el, er_, eg, i):
        return ss.replace(theta=ss.theta + 1e-12,
                          log_pos=ss.log_pos + 1)

    ss = run_block(3, null_step, ss, args)
    for n in (20, 50):
        t0 = time.perf_counter()
        ss = run_block(n, null_step, ss, args)
        dt = time.perf_counter() - t0
        report("null_block", n=n, ms_per_step=round(1e3 * dt / n, 2))

    # ---- 4. forward-only (serving path), same process ----
    fwd = jax.jit(lambda v, l, r: model.apply(
        v, l, r, side="l", output_cost_volume=True, train=False))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    t0 = time.perf_counter()
    flow = fwd.lower(variables, left, right).compile()
    report("fwd_compile", seconds=round(time.perf_counter() - t0, 1))
    fca = flow.cost_analysis()
    if isinstance(fca, list):
        fca = fca[0]
    fflops = float(fca.get("flops", 0.0))
    fbytes = float(fca.get("bytes accessed", 0.0))
    report("fwd_cost", flops=fflops, bytes_accessed=fbytes,
           roofline_ms=round(1e3 * max(fflops / V5E_BF16_FLOPS,
                                       fbytes / V5E_HBM_BYTES), 3))
    out = fwd(variables, left, right)
    np.asarray(out["pred_disp_l/0"])
    for n in (10, 20):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fwd(variables, left, right)
        np.asarray(out["pred_disp_l/0"])
        dt = time.perf_counter() - t0
        report("fwd_block", n=n, ms_per_step=round(1e3 * dt / n, 2))

    # ---- 5. best-effort profiler trace of one adapt block ----
    try:
        with jax.profiler.trace("artifacts/trace_r2"):
            ss = run_block(10, adapt_step, ss, args)
        report("trace", ok=True, dir="artifacts/trace_r2")
    except Exception as e:
        report("trace", ok=False, error=str(e)[:200])


if __name__ == "__main__":
    main()
