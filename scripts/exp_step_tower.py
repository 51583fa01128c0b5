"""Full fused adapt-step timing: pallas_tower ON vs OFF (bench config).

Exactly the bench.py headline configuration (320x960, k=4, b=1, bf16,
fused_siamese + s2d + fused ER), chained donated state, min over drain
blocks — the only comparison that decides the shipped default.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from adaptive_stereo_tpu.engine import create_train_state
from adaptive_stereo_tpu.engine.flat_stream import (
    init_flat_stream_state,
    make_flat_streaming_steps,
)
from adaptive_stereo_tpu.models import StereoModel
from adaptive_stereo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

k, s, h, w = 4, 0, 320, 960
rng = np.random.RandomState(0)
left = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
right = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
gt = jnp.asarray(rng.rand(1, h, w, 1) * 60, jnp.float32)
idx = jnp.asarray(0, jnp.int32)


def measure(pallas_tower, blocks=6, drain=20):
    model = StereoModel(k=k, input_scale=s, dtype=jnp.bfloat16,
                        fused_siamese=True, s2d_refinement=True,
                        pallas_tower=pallas_tower)
    state = create_train_state(model, jax.random.PRNGKey(0), left, right, 5e-5)
    ss, spec = init_flat_stream_state(
        state.params, state.batch_stats, 5e-5, 16, h, w, 64, seed=0)
    fused = make_flat_streaming_steps(
        model, spec, s, k, use_er=True, use_vs=True, ood_threshold=12.76,
        clip_grad_norm=True, fused_er_forward=True, warp_precision="default")
    adapt_step = fused[0]

    def run_block(ss, n):
        for _ in range(n):
            ss = adapt_step(ss, left, right, gt, left, right, gt, idx)
        np.asarray(ss.log)
        return ss

    ss = run_block(ss, 3)
    ts = []
    for _ in range(blocks):
        t0 = time.perf_counter()
        ss = run_block(ss, drain)
        ts.append((time.perf_counter() - t0) / drain)
    best, p50 = min(ts), float(np.median(ts))
    print(f"pallas_tower={pallas_tower}: best {1e3*best:.2f} ms "
          f"({1/best:.1f} steps/s) | p50 {1e3*p50:.2f} ms ({1/p50:.1f})",
          flush=True)
    return best


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    # Interleave to ride out shared-device variance.
    a1 = measure(False)
    b1 = measure(True)
    a2 = measure(False)
    b2 = measure(True)
    print(f"OFF best {1e3*min(a1,a2):.2f} ms | ON best {1e3*min(b1,b2):.2f} ms"
          f" | speedup {min(a1,a2)/min(b1,b2):.3f}x")
