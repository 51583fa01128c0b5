"""Bisect the aggregation-kernel compiled divergence by shape and dtype.

debug_agg.py cleared the individual Mosaic ops in f32; exp_agg.py failed
first in bf16. Run the REAL kernel compiled-vs-twin over a shape/dtype
matrix, plus a bf16 rerun of the unaligned-sublane-read diagnostic
(bf16 tiles are (16,128) — sublane shifts differ from f32's (8,128)).

Run: timeout 2400 python scripts/debug_agg2.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from adaptive_stereo_tpu.ops.pallas.aggregation import (  # noqa: E402
    aggregate_cost_volume_pallas,
    aggregate_cost_volume_ref,
)


def check(shape, dtype, tag):
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
    cost = jnp.asarray(rng.randn(*shape), dtype)

    got = np.asarray(jax.jit(
        lambda c, p: aggregate_cost_volume_pallas(c, p, rs, True)[0]
    )(cost, params), np.float32)
    want = np.asarray(jax.jit(
        lambda c, p: aggregate_cost_volume_ref(c, p, rs, True)[0]
    )(cost, params), np.float32)
    bad = np.abs(got - want) > (0.05 + 0.05 * np.abs(want))
    print(f"{tag} {shape} {np.dtype(dtype).name}: "
          f"{'OK' if not bad.any() else 'MISMATCH'} "
          f"({bad.sum()}/{bad.size}, max|d|={np.abs(got - want).max():.4f})")
    if bad.any():
        # Where: per (d, h, w-phase) error structure of batch 0
        err = np.abs(got - want)[0]
        print("   err by d:", err.mean(axis=(1, 2)).round(3).tolist())
        print("   err by h:", err.mean(axis=(0, 2)).round(3).tolist())
        wp = W // 4
        print("   err by w%4:",
              err.reshape(D, H, wp, 4).mean(axis=(0, 1, 2)).round(3).tolist())
        print("   err by wp (first 8):",
              err.reshape(D, H, wp, 4).mean(axis=(0, 1, 3))[:8].round(3).tolist())
    return not bad.any()


def bf16_sublane_diag():
    rng = np.random.RandomState(0)
    R, LANES = 331, 128
    x = jnp.asarray(rng.randn(R, LANES), jnp.bfloat16)

    def k3(x_ref, out_ref):
        acc = jnp.zeros((64, LANES), jnp.float32)
        for s0 in (1, 7, 15, 23, 37):
            acc = acc + x_ref[s0:s0 + 64].astype(jnp.float32)
        out_ref[:] = acc

    fn = pl.pallas_call(
        k3, out_shape=jax.ShapeDtypeStruct((64, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    got = np.asarray(jax.jit(fn)(x), np.float32)
    xs = np.asarray(x, np.float32)
    want = sum(xs[s0:s0 + 64] for s0 in (1, 7, 15, 23, 37))
    bad = np.abs(got - want) > 1e-2
    print(f"bf16 unaligned sublane reads: {'OK' if not bad.any() else 'MISMATCH'} "
          f"({bad.sum()}/{bad.size})")


def main():
    bf16_sublane_diag()
    check((1, 4, 6, 8, 32), jnp.float32, "small")
    check((1, 4, 6, 8, 32), jnp.bfloat16, "small")
    check((2, 12, 20, 60, 32), jnp.float32, "paper")
    check((2, 12, 20, 60, 32), jnp.bfloat16, "paper")


if __name__ == "__main__":
    main()
