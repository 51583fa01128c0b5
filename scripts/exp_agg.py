"""Micro-experiment: XLA conv3d aggregation stack vs the fused Pallas kernel.

The BASELINE north star names the 3D-conv aggregation as Pallas target #2
(reference stereo_net.py:155-162,185-187). Shapes are the paper config at
320x960 k=4: cost volume (B, 12, 20, 60, 32); B=2 is the fused-ER streaming
path. Measures, per dtype in {bf16, f32}:

  a) XLA: 4x [conv3d+BN(train)+leaky] + conv3d->1  (aggregate_cost_volume_ref)
  b) Pallas fused kernel (aggregate_cost_volume_pallas, same params)
  c) both under fwd+bwd (the kernel's custom VJP rematerializes the twin,
     so its backward should track a)'s fwd+bwd; this quantifies that too)

Also prints the roofline context: useful FLOPs, padded-MXU FLOPs, and HBM
bytes, so BENCH/PERFORMANCE.md can cite speed-of-light fractions.

Run: timeout 3000 python scripts/exp_agg.py  (TPU; single process only)
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, n=50):
    import jax

    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        ts.append((time.perf_counter() - t0) / n)
    return 1e3 * float(np.min(ts))


def main():
    import jax
    import jax.numpy as jnp

    from adaptive_stereo_tpu.ops.pallas.aggregation import (
        aggregate_cost_volume_pallas,
        aggregate_cost_volume_ref,
    )

    B, D, H, W, C = 2, 12, 20, 60, 32
    rng = np.random.RandomState(0)
    params = {
        "kernels": jnp.asarray(rng.randn(4, 3, 3, 3, C, C) * 0.1, jnp.float32),
        "biases": jnp.asarray(rng.randn(4, C) * 0.1, jnp.float32),
        "scales": jnp.asarray(1 + rng.randn(4, C) * 0.1, jnp.float32),
        "bn_biases": jnp.asarray(rng.randn(4, C) * 0.1, jnp.float32),
        "final_kernel": jnp.asarray(rng.randn(3, 3, 3, C, 1) * 0.1, jnp.float32),
        "final_bias": jnp.asarray(rng.randn(1) * 0.1, jnp.float32),
    }
    rs = (jnp.zeros((4, C), jnp.float32), jnp.ones((4, C), jnp.float32))

    useful_flops = 2 * B * D * H * W * C * 27 * (4 * C + 1)
    print(json.dumps({"useful_gflops": useful_flops / 1e9,
                      "volume_mbytes": B * D * H * W * C * 4 / 1e6}))

    from adaptive_stereo_tpu.ops.pallas.aggregation import (
        aggregation_pallas_supported)

    results = {}
    for dtype, tag in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        if not aggregation_pallas_supported((B, D, H, W, C), dtype):
            print(json.dumps({f"skip_{tag}": "exceeds kernel VMEM budget"}))
            continue
        cost = jnp.asarray(rng.randn(B, D, H, W, C), dtype)

        xla_fwd = jax.jit(lambda c, p: aggregate_cost_volume_ref(c, p, rs, True)[0])
        pl_fwd = jax.jit(lambda c, p: aggregate_cost_volume_pallas(c, p, rs, True)[0])
        np.testing.assert_allclose(
            np.asarray(pl_fwd(cost, params), np.float32),
            np.asarray(xla_fwd(cost, params), np.float32),
            rtol=0.1, atol=0.1)

        results[f"a_xla_fwd_{tag}_ms"] = timeit(xla_fwd, cost, params)
        results[f"b_pallas_fwd_{tag}_ms"] = timeit(pl_fwd, cost, params)
        print(json.dumps({k: round(v, 3) for k, v in results.items()}))

    # fwd+bwd (bf16 only — the streaming path)
    cost = jnp.asarray(rng.randn(B, D, H, W, C), jnp.bfloat16)

    def loss_x(c, p):
        return jnp.sum(aggregate_cost_volume_ref(c, p, rs, True)[0]
                       .astype(jnp.float32) ** 2)

    def loss_p(c, p):
        return jnp.sum(aggregate_cost_volume_pallas(c, p, rs, True)[0]
                       .astype(jnp.float32) ** 2)

    xla_fb = jax.jit(jax.grad(loss_x, argnums=(0, 1)))
    pl_fb = jax.jit(jax.grad(loss_p, argnums=(0, 1)))
    results["c_xla_fwdbwd_bf16_ms"] = timeit(xla_fb, cost, params, n=30)
    results["d_pallas_fwdbwd_bf16_ms"] = timeit(pl_fb, cost, params, n=30)
    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
