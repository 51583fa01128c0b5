"""Micro-experiment: how to run the full-res refinement tower fast on TPU.

The r3 trace shows the 7-conv (B,320,960,32) tower + BN + LeakyReLU and its
backward dominate the adapt step; C=32 activations pad to 128 lanes (25%
occupancy). Candidates, all fwd+bwd at batch 2 bf16:

  a) baseline: 6x [conv3x3(32) + BN + leaky + residual] + conv3x3->1
  b) space-to-depth: same FLOP-graph on (B,160,480,128) with 3x3x128x128
     kernels (4x FLOPs from structural zeros, zero lane padding)
  c) eval-BN baseline: (a) with running-stat BN (isolates train-BN cost)
  d) no-BN baseline: (a) without BN entirely

Run: timeout 3000 python scripts/exp_tower.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, n=20):
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
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    B, H, W, C = 2, 320, 960, 32

    class Tower(nn.Module):
        use_bn: str = "train"  # train | eval | none

        @nn.compact
        def __call__(self, x):
            for i in range(6):
                h = nn.Conv(C, (3, 3), padding=[(1, 1)] * 2,
                            dtype=jnp.bfloat16, name=f"c{i}")(x)
                if self.use_bn != "none":
                    h = nn.BatchNorm(
                        use_running_average=self.use_bn == "eval",
                        momentum=0.9, epsilon=1e-5, dtype=jnp.bfloat16,
                        name=f"b{i}")(h)
                x = x + nn.leaky_relu(h, negative_slope=0.2)
            return nn.Conv(1, (3, 3), padding=[(1, 1)] * 2,
                           dtype=jnp.bfloat16, name="out")(x)

    class TowerS2D(nn.Module):
        """Same structure on 2x2 space-to-depth layout, 128 channels."""

        use_bn: bool = True

        @nn.compact
        def __call__(self, x):  # x: (B, H/2, W/2, 128)
            for i in range(6):
                h = nn.Conv(128, (3, 3), padding=[(1, 1)] * 2,
                            dtype=jnp.bfloat16, name=f"c{i}")(x)
                if self.use_bn:
                    # per-original-channel stats: reduce over 4-phase groups
                    h32 = h.reshape(*h.shape[:-1], 4, 32)
                    mu = jnp.mean(h32, axis=(0, 1, 2, 3))
                    var = jnp.var(h32.astype(jnp.float32), axis=(0, 1, 2, 3))
                    h32 = (h32 - mu) * jax.lax.rsqrt(
                        var.astype(h32.dtype) + 1e-5)
                    h = h32.reshape(h.shape)
                x = x + nn.leaky_relu(h, negative_slope=0.2)
            return nn.Conv(4, (3, 3), padding=[(1, 1)] * 2,
                           dtype=jnp.bfloat16, name="out")(x)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, C), jnp.float32)
    x_s2d = jnp.asarray(rng.rand(B, H // 2, W // 2, 128), jnp.float32)

    def bench(name, module, inp, train_bn):
        try:
            variables = module.init(jax.random.PRNGKey(0), inp)
            mutable = ["batch_stats"] if "batch_stats" in variables else False

            def loss(v, inp):
                if mutable:
                    out, _ = module.apply(v, inp, mutable=mutable)
                else:
                    out = module.apply(v, inp)
                return jnp.sum(out.astype(jnp.float32) ** 2)

            g = jax.jit(jax.grad(loss))
            t = timeit(g, variables, inp)
            print(json.dumps({name: round(t, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({name: str(e)[:200]}), flush=True)

    bench("a_baseline_trainbn_ms", Tower(use_bn="train"), x, True)
    bench("b_s2d128_trainbn_ms", TowerS2D(use_bn=True), x_s2d, True)
    bench("c_baseline_evalbn_ms", Tower(use_bn="eval"), x, False)
    bench("d_baseline_nobn_ms", Tower(use_bn="none"), x, False)
    bench("e_s2d128_nobn_ms", TowerS2D(use_bn=False), x_s2d, False)


if __name__ == "__main__":
    main()
