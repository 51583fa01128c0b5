"""Break down adapt-step time on the real TPU: fwd-only vs fwd_bwd vs apply,
f32 vs bf16, ER on/off. Run: python scripts/profile_adapt.py"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, n=20, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    from adaptive_stereo_tpu.engine import (
        create_train_state,
        make_adapt_forward_backward,
        make_apply_updates,
        make_infer_step,
    )
    from adaptive_stereo_tpu.models import StereoModel

    k, s, h, w = 4, 0, 320, 960
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    right = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(1, h, w, 1) * 60, jnp.float32)
    batch = {f"color_l/{s}": left, f"color_r/{s}": right, f"gt_disp_l/{s}": gt}

    for dtype_name, dtype in [("f32", None), ("bf16", jnp.bfloat16)]:
        model = StereoModel(k=k, input_scale=s, dtype=dtype)
        state = create_train_state(model, jax.random.PRNGKey(0), left, right, 5e-5)
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        fwd = jax.jit(lambda v, l, r: model.apply(
            v, l, r, side="l", output_cost_volume=True, train=False))
        t_fwd = timeit(fwd, variables, left, right)

        fwd_train = jax.jit(lambda v, l, r: model.apply(
            v, l, r, side="l", output_cost_volume=True, train=True,
            mutable=["batch_stats"]))
        t_fwd_train = timeit(fwd_train, variables, left, right)

        infer = make_infer_step(model, s, k)
        t_infer = timeit(infer, state.params, state.batch_stats, batch)

        for use_er in (False, True):
            fb = make_adapt_forward_backward(model, s, k, use_er=use_er)
            t_fb = timeit(fb, state.params, state.batch_stats, batch, batch)
            print(f"[{dtype_name}] fwd_bwd er={use_er}: {t_fb:.2f} ms")

        fb = make_adapt_forward_backward(model, s, k, use_er=True)
        grads, stats, aux = fb(state.params, state.batch_stats, batch, batch)
        ap = make_apply_updates(clip_grad_norm=True)
        t_ap = timeit(ap, state, grads, stats, jnp.asarray(True))

        print(f"[{dtype_name}] fwd eval: {t_fwd:.2f} | fwd train+bn: {t_fwd_train:.2f} | "
              f"infer(loss+fcs): {t_infer:.2f} | apply: {t_ap:.2f} ms")


if __name__ == "__main__":
    main()
