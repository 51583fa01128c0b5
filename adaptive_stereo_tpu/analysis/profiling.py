"""Profiling: jax.profiler traces + compiled-HLO cost analysis.

The reference's only profiling is wall-clock prints (SURVEY.md §5). Here:
- `trace(...)`: capture a jax.profiler trace (view in TensorBoard/Perfetto);
- `cost_analysis(...)`: XLA's compiled cost model (FLOPs, bytes accessed) for
  a jitted function — the denominator for speed-of-light claims;
- `achieved_flops(...)`: measured wall time vs model FLOPs.
"""

from __future__ import annotations

import time
from typing import Callable, Dict

import numpy as np


def trace(fn: Callable, *args, log_dir: str = "/tmp/jax-trace", iters: int = 3):
    """Run fn under a profiler trace; returns the last output."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    with jax.profiler.trace(log_dir):
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
    return out


def cost_analysis(fn: Callable, *args) -> Dict[str, float]:
    """XLA compiled cost analysis for a jittable fn: flops, bytes accessed."""
    import jax

    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns a per-computation list
        ca = ca[0]
    return {k: float(v) for k, v in ca.items()
            if isinstance(v, (int, float)) and k in
            ("flops", "bytes accessed", "transcendentals",
             "bytes accessed output", "optimal_seconds")}


def achieved_flops(fn: Callable, *args, iters: int = 20) -> Dict[str, float]:
    """Measured seconds/call (with a readback completion barrier — see
    PERFORMANCE.md) against the compiled FLOPs estimate."""
    import jax

    stats = cost_analysis(fn, *args)
    jitted = jax.jit(fn)
    out = jitted(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]

    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    sec = (time.perf_counter() - t0) / iters

    flops = stats.get("flops", 0.0)
    return {
        "seconds_per_call": sec,
        "model_flops": flops,
        "achieved_tflops": flops / sec / 1e12 if sec > 0 else 0.0,
        "bytes_accessed": stats.get("bytes accessed", 0.0),
    }
