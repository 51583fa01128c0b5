"""Bisect the remaining paper-shape bf16 miscompile: batch axis vs row count.

After the host-built tap matrices fix: small (1,4,6,8,32) passes both
dtypes, paper (2,12,20,60,32) passes f32, fails bf16. Axes to separate:
  A. (2,4,6,8,32)   bf16 — B=2 at the small shape (3-D bf16 scratch, b=1
                           plane base alignment)
  B. (1,12,20,60,32) bf16 — paper shape, single batch
  C. (2,12,20,60,32) bf16 — per-batch error split + per-layer mu/var delta
                            (which layer first diverges, which plane)

Run: timeout 3000 python scripts/debug_agg5.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from adaptive_stereo_tpu.ops.pallas.aggregation import (  # noqa: E402
    aggregate_cost_volume_pallas,
    aggregate_cost_volume_ref,
)


def check(shape, tag, detail=False):
    rng = np.random.RandomState(0)
    B, D, H, W, C = shape
    params = {
        "kernels": jnp.asarray(rng.randn(4, 3, 3, 3, C, C) * 0.1, jnp.float32),
        "biases": jnp.asarray(rng.randn(4, C) * 0.1, jnp.float32),
        "scales": jnp.asarray(1 + rng.randn(4, C) * 0.1, jnp.float32),
        "bn_biases": jnp.asarray(rng.randn(4, C) * 0.1, jnp.float32),
        "final_kernel": jnp.asarray(rng.randn(3, 3, 3, C, 1) * 0.1, jnp.float32),
        "final_bias": jnp.asarray(rng.randn(1) * 0.1, jnp.float32),
    }
    rs = (jnp.zeros((4, C), jnp.float32), jnp.ones((4, C), jnp.float32))
    cost = jnp.asarray(rng.randn(*shape), jnp.bfloat16)

    go, gm, gv = jax.jit(
        lambda c, p: aggregate_cost_volume_pallas(c, p, rs, True))(cost, params)
    wo, wm, wv = jax.jit(
        lambda c, p: aggregate_cost_volume_ref(c, p, rs, True))(cost, params)
    go, wo = np.asarray(go, np.float32), np.asarray(wo, np.float32)
    bad = np.abs(go - wo) > (0.05 + 0.05 * np.abs(wo))
    print(f"{tag} {shape}: {'OK' if not bad.any() else 'MISMATCH'} "
          f"({bad.sum()}/{bad.size}, max|d|={np.abs(go - wo).max():.4f})")
    if detail and bad.any():
        err = np.abs(go - wo)
        for b in range(B):
            print(f"   batch {b}: mean err {err[b].mean():.4f} "
                  f"max {err[b].max():.4f}")
        gm, wm = np.asarray(gm), np.asarray(wm)
        gv, wv = np.asarray(gv), np.asarray(wv)
        for layer in range(4):
            print(f"   layer {layer}: |mu delta| max "
                  f"{np.abs(gm[layer] - wm[layer]).max():.5f}, "
                  f"|var delta| max {np.abs(gv[layer] - wv[layer]).max():.5f}")


def main():
    check((2, 4, 6, 8, 32), "A small-B2")
    check((1, 12, 20, 60, 32), "B paper-B1")
    check((2, 12, 20, 60, 32), "C paper-B2", detail=True)


if __name__ == "__main__":
    main()
