"""Pinpoint the bf16-specific Mosaic miscompile in the aggregation kernel.

debug_agg2.py: compiled kernel exact in f32, uniformly wrong in bf16.
Candidates (all bf16-only paths):
  T1 block stores into a bf16 (128,128) scratch at 32-offsets
  T2 single-column stores into bf16 scratch
  T3 strided unaligned-sublane writes into a bf16 scratch (dst_ref pattern)
  T4 f32 -> bf16 astype then unaligned store + read-back
  T5 bf16 masked multiply into scratch then shifted dot

Run: timeout 2400 python scripts/debug_agg3.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

C, LANES = 32, 128
BF = jnp.bfloat16


def run(name, kernel, out_shape, inputs, scratch_shapes=()):
    def mk(interpret):
        return pl.pallas_call(
            kernel, out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=list(scratch_shapes), interpret=interpret)

    got = np.asarray(jax.jit(mk(False))(*inputs), np.float32)
    want = np.asarray(jax.jit(mk(True))(*inputs), np.float32)
    bad = np.abs(got - want) > 1e-2
    print(f"{name}: {'OK' if not bad.any() else 'MISMATCH'} "
          f"({bad.sum()}/{bad.size}, max|d|={np.abs(got - want).max():.4f})")


def main():
    rng = np.random.RandomState(0)
    tap = jnp.asarray(rng.randn(3, C, C), BF)

    def k1(tap_ref, out_ref, a_ref):
        a_ref[:] = jnp.zeros((LANES, LANES), BF)
        for p in range(4):
            for q in range(4):
                kw = q - p + 1
                if 0 <= kw <= 2:
                    a_ref[q * C:(q + 1) * C, p * C:(p + 1) * C] = tap_ref[kw]
        out_ref[:] = a_ref[:].astype(jnp.float32)

    run("T1 bf16 block stores", k1,
        jax.ShapeDtypeStruct((LANES, LANES), jnp.float32), [tap],
        [pltpu.VMEM((LANES, LANES), BF)])

    tapf = jnp.asarray(rng.randn(3, C), BF)

    def k2(tap_ref, out_ref, a_ref):
        a_ref[:] = jnp.zeros((LANES, LANES), BF)
        for p in range(4):
            for q in range(4):
                kw = q - p + 1
                if 0 <= kw <= 2:
                    a_ref[q * C:(q + 1) * C, p] = tap_ref[kw]
        out_ref[:] = a_ref[:].astype(jnp.float32)

    print("T2 bf16 single-column stores: COMPILE ERROR (tpu.reshape "
          "bf16 vector<1x32> -> <32x1> unsupported) — confirmed previously")

    R = 97
    x = jnp.asarray(rng.randn(R, LANES), BF)

    def k3(x_ref, out_ref, buf_ref):
        buf_ref[:] = jnp.zeros((R, LANES), BF)
        # dst_ref pattern: interior writes at odd sublane offsets
        for r0 in (1, 13, 27, 41):
            buf_ref[r0:r0 + 9] = x_ref[r0:r0 + 9]
        out_ref[:] = buf_ref[:].astype(jnp.float32)

    run("T3 bf16 unaligned strided writes", k3,
        jax.ShapeDtypeStruct((R, LANES), jnp.float32), [x],
        [pltpu.VMEM((R, LANES), BF)])

    def k4(x_ref, out_ref, buf_ref):
        buf_ref[:] = jnp.zeros((R, LANES), BF)
        acc = x_ref[:].astype(jnp.float32) * 1.5
        y = acc.astype(BF)
        buf_ref[3:3 + 50] = y[10:10 + 50]
        out_ref[:] = buf_ref[:].astype(jnp.float32)

    run("T4 bf16 astype + offset copy", k4,
        jax.ShapeDtypeStruct((R, LANES), jnp.float32), [x],
        [pltpu.VMEM((R, LANES), BF)])

    a = jnp.asarray(rng.randn(LANES, LANES), BF)

    def k5(x_ref, a_ref, out_ref, xm_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
        mask = ((rows % 15) != 0).astype(BF)
        xm_ref[:] = x_ref[:] * mask
        out_ref[:] = jnp.dot(xm_ref[17:17 + 64], a_ref[:],
                             preferred_element_type=jnp.float32)

    run("T5 bf16 masked + shifted dot", k5,
        jax.ShapeDtypeStruct((64, LANES), jnp.float32), [x, a],
        [pltpu.VMEM((R, LANES), BF)])

    # T6: bf16 dot from a scratch built by block stores (T1 + dot)
    def k6(tap_ref, x_ref, out_ref, a_ref):
        a_ref[:] = jnp.zeros((LANES, LANES), BF)
        for p in range(4):
            for q in range(4):
                kw = q - p + 1
                if 0 <= kw <= 2:
                    a_ref[q * C:(q + 1) * C, p * C:(p + 1) * C] = tap_ref[kw]
        out_ref[:] = jnp.dot(x_ref[5:5 + 64], a_ref[:],
                             preferred_element_type=jnp.float32)

    run("T6 bf16 stores then dot", k6,
        jax.ShapeDtypeStruct((64, LANES), jnp.float32), [tap, x],
        [pltpu.VMEM((LANES, LANES), BF)])


if __name__ == "__main__":
    main()
