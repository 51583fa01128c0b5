"""Diagnose compiled-vs-interpret divergence in the aggregation kernel.

exp_agg.py showed the fused aggregation kernel is bit-correct in interpreter
mode but 87% wrong compiled on TPU. This script isolates the candidate
Mosaic ops one at a time (small shapes, fast compiles):

  1. a_ref block stores at lane offsets 32/64/96 (tap-matrix build)
  2. a_ref single-column stores (final-layer tap build)
  3. unaligned sublane slice reads (src_ref[b, s0:s0+n], odd s0)
  4. masked buffer + shifted reads (xm path)

Run: timeout 1200 python scripts/debug_agg.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def run(name, kernel, out_shape, inputs, scratch_shapes=()):
    fn = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=list(scratch_shapes),
    )
    got = np.asarray(jax.jit(fn)(*inputs), np.float32)
    ref = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=list(scratch_shapes),
        interpret=True,
    )
    want = np.asarray(jax.jit(ref)(*inputs), np.float32)
    bad = np.abs(got - want) > 1e-2
    print(f"{name}: {'OK' if not bad.any() else 'MISMATCH'} "
          f"({bad.sum()}/{bad.size} wrong, max|d|={np.abs(got - want).max():.4f})")
    return not bad.any()


def main():
    rng = np.random.RandomState(0)
    C, LANES = 32, 128

    # --- 1. block stores at lane offsets ---
    tap = jnp.asarray(rng.randn(3, C, C), jnp.float32)

    def k1(tap_ref, out_ref, a_ref):
        a_ref[:] = jnp.zeros((LANES, LANES), jnp.float32)
        for p in range(4):
            for q in range(4):
                kw = q - p + 1
                if 0 <= kw <= 2:
                    a_ref[q * C:(q + 1) * C, p * C:(p + 1) * C] = tap_ref[kw]
        out_ref[:] = a_ref[:]

    run("1 block stores (lane offsets 32/64/96)", k1,
        jax.ShapeDtypeStruct((LANES, LANES), jnp.float32), [tap],
        [pltpu.VMEM((LANES, LANES), jnp.float32)])

    # --- 2. single-column stores ---
    tapf = jnp.asarray(rng.randn(3, C), jnp.float32)

    def k2(tap_ref, out_ref, a_ref):
        a_ref[:] = jnp.zeros((LANES, LANES), jnp.float32)
        for p in range(4):
            for q in range(4):
                kw = q - p + 1
                if 0 <= kw <= 2:
                    a_ref[q * C:(q + 1) * C, p] = tap_ref[kw]
        out_ref[:] = a_ref[:]

    run("2 single-column stores", k2,
        jax.ShapeDtypeStruct((LANES, LANES), jnp.float32), [tapf],
        [pltpu.VMEM((LANES, LANES), jnp.float32)])

    # --- 3. unaligned sublane reads ---
    R = 331
    x = jnp.asarray(rng.randn(R, LANES), jnp.float32)

    def k3(x_ref, out_ref):
        acc = jnp.zeros((64, LANES), jnp.float32)
        for s0 in (1, 7, 15, 23):
            acc = acc + x_ref[s0:s0 + 64]
        out_ref[:] = acc

    run("3 unaligned sublane reads", k3,
        jax.ShapeDtypeStruct((64, LANES), jnp.float32), [x])

    # --- 4. masked buffer + shifted reads + dot ---
    a = jnp.asarray(rng.randn(LANES, LANES), jnp.float32)

    def k4(x_ref, a_ref, out_ref, xm_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
        mask = ((rows % 15) != 0).astype(jnp.float32)
        xm_ref[:] = x_ref[:] * mask
        out_ref[:] = jnp.dot(xm_ref[17:17 + 64], a_ref[:],
                             preferred_element_type=jnp.float32)

    run("4 masked buffer + shifted dot", k4,
        jax.ShapeDtypeStruct((64, LANES), jnp.float32), [x, a],
        [pltpu.VMEM((R, LANES), jnp.float32)])

    # --- 5. scratch slice-read into dot after partial stores (combined) ---
    def k5(tap_ref, x_ref, out_ref, a_ref):
        a_ref[:] = jnp.zeros((LANES, LANES), jnp.float32)
        for p in range(4):
            for q in range(4):
                kw = q - p + 1
                if 0 <= kw <= 2:
                    a_ref[q * C:(q + 1) * C, p * C:(p + 1) * C] = tap_ref[kw]
        out_ref[:] = jnp.dot(x_ref[5:5 + 64], a_ref[:],
                             preferred_element_type=jnp.float32)

    run("5 partial stores then dot", k5,
        jax.ShapeDtypeStruct((64, LANES), jnp.float32), [tap, x],
        [pltpu.VMEM((LANES, LANES), jnp.float32)])


if __name__ == "__main__":
    main()
