"""Measure DONE-state streaming throughput: per-frame vs micro-batched.

The flat engine's DONE path (pure inference + FCS/EMA/reservoir bookkeeping)
historically dispatched one batch-1 program per frame. done_step_batched(n)
amortizes dispatch and fills the MXU with a batch-n eval forward
(engine/flat_stream.py). Paper config: 320x960, k=4, s=0, bf16.

Prints frames/s for n in {1, 4} plus the adapt-step rate for context.

Run: timeout 3000 python scripts/exp_done_batch.py   (TPU; single process)
"""

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

    h, w, k, s = 320, 960, 4, 0
    model = StereoModel(k=k, input_scale=s, dtype=jnp.bfloat16,
                        fused_siamese=True, s2d_refinement=True)
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), left, left, 5e-5)
    ss, spec = init_flat_stream_state(state.params, state.batch_stats, 5e-5,
                                      16, h, w, 64, seed=0)
    _, done1, _, make_batched = make_flat_streaming_steps(
        model, spec, s, k, use_er=False, use_vs=True, ood_threshold=12.76)

    N = 4
    doneN = make_batched(N)
    gt1 = jnp.zeros((1, h, w, 1), jnp.float32)
    right = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    idx1 = jnp.asarray(0, jnp.int32)

    lN = jnp.concatenate([left] * N)
    rN = jnp.concatenate([right] * N)
    gN = jnp.concatenate([gt1] * N)
    idxN = jnp.arange(N, dtype=jnp.int32)

    def timeit(step, args, frames, iters=30):
        nonlocal ss
        for _ in range(3):
            ss = step(ss, *args)
        jax.block_until_ready(ss.ema_value)
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(iters):
                ss = step(ss, *args)
            jax.block_until_ready(ss.ema_value)
            float(ss.ema_value)
            ts.append((time.perf_counter() - t0) / (iters * frames))
        return 1.0 / float(np.min(ts))

    fps1 = timeit(done1, (left, right, gt1, idx1), 1)
    print(json.dumps({"done_fps_per_frame": round(fps1, 2)}))
    fpsN = timeit(doneN, (lN, rN, gN, idxN), N)
    print(json.dumps({"done_fps_per_frame": round(fps1, 2),
                      f"done_fps_batched_{N}": round(fpsN, 2),
                      "speedup": round(fpsN / fps1, 2)}))


if __name__ == "__main__":
    main()
