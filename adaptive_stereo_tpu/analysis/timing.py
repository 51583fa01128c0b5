"""Timing benchmarks (reference evaluation/stereonet_timing.py:22-75):
N-iteration inference and inference+backprop at 1x320x1216, k=4 — now with
proper device synchronization (block_until_ready) and median statistics."""

from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np


def time_stereonet(n: int = 100, height: int = 320, width: int = 1216,
                   k: int = 4, input_scale: int = 0,
                   compute_dtype: Optional[str] = "bfloat16",
                   include_backprop: bool = True,
                   batch_size: int = 1) -> Dict[str, float]:
    """Returns {'inference_sec', 'inference_hz', 'backprop_sec', 'backprop_hz'}."""
    import jax
    import jax.numpy as jnp

    from ..engine import (
        create_train_state,
        make_adapt_forward_backward,
        make_apply_updates,
    )
    from ..models import StereoModel

    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else None
    model = StereoModel(k=k, input_scale=input_scale, dtype=dtype)
    left = jnp.zeros((batch_size, height, width, 3), jnp.float32)
    right = jnp.zeros((batch_size, height, width, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), left, right, 1e-4)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    fwd = jax.jit(lambda v, l, r: model.apply(
        v, l, r, side="l", output_cost_volume=False, train=False))

    def run_timed(fn):
        out = fn()
        jax.block_until_ready(out)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    results: Dict[str, float] = {}
    t = run_timed(lambda: fwd(variables, left, right))
    results["inference_sec"] = t
    results["inference_hz"] = batch_size / t

    if include_backprop:
        s = input_scale
        batch = {f"color_l/{s}": left, f"color_r/{s}": right}
        fwd_bwd = make_adapt_forward_backward(model, s, k, use_er=False)
        apply_up = make_apply_updates(clip_grad_norm=False)

        def step():
            grads, stats, aux = fwd_bwd(state.params, state.batch_stats, batch, batch)
            return apply_up(state, grads, stats, jnp.asarray(True))

        t = run_timed(step)
        results["backprop_sec"] = t
        results["backprop_hz"] = 1.0 / t
    return results


if __name__ == "__main__":
    r = time_stereonet()
    print("-" * 67)
    print("-- Timing (inference only): %f sec (%f hz)" % (r["inference_sec"], r["inference_hz"]))
    print("-- Timing (inference + backprop): %f sec (%f hz)" % (r["backprop_sec"], r["backprop_hz"]))
    print("-" * 67)
