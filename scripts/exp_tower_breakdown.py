"""Cost breakdown of one mid-layer fwd tower kernel: which part eats time?

Variants of a single (B=1, 320x960 -> H2=160, W2=480) mid-layer pass:
  full       : epilogue + masks + 9 taps + stats (the real kernel)
  nomask     : skip mask construction/multiplies
  noepi      : skip the BN/lrelu/residual epilogue (conv of raw x)
  nostats    : skip stat sums
  taps1      : single tap instead of 9 (slice+matmul cost scaling)
  aligned9   : 9 matmuls all from the SAME (aligned) slice — isolates the
               unaligned-slice cost from the matmul cost
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adaptive_stereo_tpu.ops.pallas import tower as tw

B, H2, W2 = 1, 160, 480
cdtype = jnp.bfloat16
Rh, T, PW, Hp = tw._geometry(H2, W2, 2, False)
RhP = Rh * PW
G = tw._guard(PW)
E = RhP + 2 * G
print(f"Rh={Rh} T={T} PW={PW} RhP={RhP} E={E}")


def make_kernel(variant):
    def kern(xp, xc, xn, yp, yc, yn, w_ref, vec_ref, y_out, s1_ref, s2_ref):
        t = pl.program_id(1)
        first = (pl.program_id(0) == 0) & (t == 0)
        y_ext = tw._assemble(yp, yc, yn, t, T, G)
        if variant != "noepi":
            nrm = vec_ref[1][None, :]
            shift = vec_ref[2][None, :]
            act = y_ext * nrm + shift
            act = jnp.where(act >= 0, act, tw._LEAKY * act)
            xr_ext = tw._assemble(xp, xc, xn, t, T, G)
            x_ext = xr_ext + act
            x_ext = x_ext.astype(cdtype).astype(jnp.float32)
            if variant != "nomask":
                x_ext = x_ext * tw._masks(t, RhP, PW, H2, W2, E, G)
        else:
            x_ext = y_ext

        if variant == "taps1":
            sl = x_ext[G:G + RhP].astype(cdtype)
            acc = jax.lax.dot_general(
                sl, w_ref[1, 1], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif variant == "aligned9":
            sl = x_ext[G:G + RhP].astype(cdtype)
            acc = jnp.zeros((RhP, 128), jnp.float32)
            for ty in range(3):
                for tx in range(3):
                    acc = acc + jax.lax.dot_general(
                        sl, w_ref[ty, tx],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
        else:
            acc = tw._conv_taps(x_ext, w_ref, 1, PW, RhP, cdtype)
        acc = acc + vec_ref[0][None, :]
        if variant != "nomask":
            acc = acc * tw._masks(t, RhP, PW, H2, W2, RhP, 0)
        y = acc.astype(cdtype)
        y_out[0] = y
        if variant != "nostats":
            yf = y.astype(jnp.float32)
            s1 = jnp.sum(yf, axis=0, keepdims=True)
            s2 = jnp.sum(yf * yf, axis=0, keepdims=True)

            @pl.when(first)
            def _():
                s1_ref[...] = s1
                s2_ref[...] = s2

            @pl.when(jnp.logical_not(first))
            def _():
                s1_ref[...] += s1
                s2_ref[...] += s2
    return kern


def run(variant):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, Hp * PW, 128), cdtype)
    y = jnp.asarray(rng.rand(B, Hp * PW, 128), cdtype)
    w = jnp.asarray(rng.randn(3, 3, 128, 128) * 0.05, cdtype)
    vec = jnp.asarray(rng.rand(3, 128), jnp.float32)

    def band(i):
        return pl.BlockSpec((1, RhP, 128),
                            lambda b, t, i=i: (b, jnp.clip(t + i, 0, T - 1), 0),
                            memory_space=pltpu.VMEM)

    full = lambda s: pl.BlockSpec(s, lambda b, t: (0,) * len(s),
                                  memory_space=pltpu.VMEM)

    f = pl.pallas_call(
        make_kernel(variant),
        grid=(B, T),
        in_specs=[band(-1), band(0), band(1), band(-1), band(0), band(1),
                  full((3, 3, 128, 128)), full((3, 128))],
        out_specs=(pl.BlockSpec((1, RhP, 128), lambda b, t: (b, t, 0),
                                memory_space=pltpu.VMEM),
                   full((1, 128)), full((1, 128))),
        out_shape=(jax.ShapeDtypeStruct((B, Hp * PW, 128), cdtype),
                   jax.ShapeDtypeStruct((1, 128), jnp.float32),
                   jax.ShapeDtypeStruct((1, 128), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=tw._VMEM_LIMIT),
    )
    def chain(a, b_, c, d):
        yy = b_
        for _ in range(8):
            out = f(a, a, a, yy, yy, yy, c, d)
            yy = out[0]
        return out

    jf = jax.jit(chain)
    out = jf(x, y, w, vec)
    np.asarray(out[1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        yy = y
        for _ in range(10):
            out = jf(x, yy, w, vec)
            yy = out[0]
        np.asarray(out[1])
        best = min(best, (time.perf_counter() - t0) / 80)
    print(f"  {variant:9s} {best*1e3:7.3f} ms/layer")
    return best


def run_geom(variant, Rh_override=None, drop_halo=False):
    """Timing-only variants: custom band height / cur-only (no halo) reads."""
    Rh = Rh_override or tw._geometry(H2, W2, 2, False)[0]
    T2 = Hp // Rh
    RhP2 = Rh * PW
    E2 = RhP2 + 2 * G

    def kern(*refs):
        if drop_halo:
            (xc, yc, w_ref, vec_ref, y_out, s1_ref, s2_ref) = refs
            xp = xn = xc
            yp = yn = yc
        else:
            (xp, xc, xn, yp, yc, yn, w_ref, vec_ref,
             y_out, s1_ref, s2_ref) = refs
        t = pl.program_id(1)
        first = (pl.program_id(0) == 0) & (t == 0)
        y_ext = tw._assemble(yp, yc, yn, t, T2, G)
        nrm = vec_ref[1][None, :]
        shift = vec_ref[2][None, :]
        act = y_ext * nrm + shift
        act = jnp.where(act >= 0, act, tw._LEAKY * act)
        xr_ext = tw._assemble(xp, xc, xn, t, T2, G)
        x_ext = (xr_ext + act).astype(cdtype).astype(jnp.float32)
        x_ext = x_ext * tw._masks(t, RhP2, PW, H2, W2, E2, G)
        acc = tw._conv_taps(x_ext, w_ref, 1, PW, RhP2, cdtype)
        acc = acc + vec_ref[0][None, :]
        acc = acc * tw._masks(t, RhP2, PW, H2, W2, RhP2, 0)
        y = acc.astype(cdtype)
        y_out[0] = y
        yf = y.astype(jnp.float32)
        s1 = jnp.sum(yf, axis=0, keepdims=True)
        s2 = jnp.sum(yf * yf, axis=0, keepdims=True)

        @pl.when(first)
        def _():
            s1_ref[...] = s1
            s2_ref[...] = s2

        @pl.when(jnp.logical_not(first))
        def _():
            s1_ref[...] += s1
            s2_ref[...] += s2

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, Hp * PW, 128), cdtype)
    y = jnp.asarray(rng.rand(B, Hp * PW, 128), cdtype)
    w = jnp.asarray(rng.randn(3, 3, 128, 128) * 0.05, cdtype)
    vec = jnp.asarray(rng.rand(3, 128), jnp.float32)

    def band(i):
        return pl.BlockSpec((1, RhP2, 128),
                            lambda b, t, i=i: (b, jnp.clip(t + i, 0, T2 - 1), 0),
                            memory_space=pltpu.VMEM)

    full = lambda s: pl.BlockSpec(s, lambda b, t: (0,) * len(s),
                                  memory_space=pltpu.VMEM)

    if drop_halo:
        in_specs = [band(0), band(0), full((3, 3, 128, 128)), full((3, 128))]
        wrap = lambda a, b_, c, d: f(a, b_, c, d)
    else:
        in_specs = [band(-1), band(0), band(1), band(-1), band(0), band(1),
                    full((3, 3, 128, 128)), full((3, 128))]
        wrap = lambda a, b_, c, d: f(a, a, a, b_, b_, b_, c, d)

    f = pl.pallas_call(
        kern, grid=(B, T2), in_specs=in_specs,
        out_specs=(pl.BlockSpec((1, RhP2, 128), lambda b, t: (b, t, 0),
                                memory_space=pltpu.VMEM),
                   full((1, 128)), full((1, 128))),
        out_shape=(jax.ShapeDtypeStruct((B, Hp * PW, 128), cdtype),
                   jax.ShapeDtypeStruct((1, 128), jnp.float32),
                   jax.ShapeDtypeStruct((1, 128), jnp.float32)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=tw._VMEM_LIMIT),
    )
    # 8 chained layer calls inside ONE jit: amortize the ~1 ms tunnel
    # dispatch cost; report per-layer device time.
    def chain(a, b_, c, d):
        yy = b_
        for _ in range(8):
            out = wrap(a, yy, c, d)
            yy = out[0]
        return out

    jf = jax.jit(chain)
    out = jf(x, y, w, vec)
    np.asarray(out[1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        yy = y
        for _ in range(10):
            out = jf(x, yy, w, vec)
            yy = out[0]
        np.asarray(out[1])
        best = min(best, (time.perf_counter() - t0) / 80)
    print(f"  {variant:16s} Rh={Rh:2d} {best*1e3:7.3f} ms/layer")
    return best


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    for v in ["full", "nomask", "noepi", "nostats", "taps1", "aligned9"]:
        run(v)
    run_geom("full-geom")
    run_geom("rh24", Rh_override=24)
    run_geom("rh28", Rh_override=28)
    run_geom("curonly", drop_halo=True)
    run_geom("curonly-rh24", Rh_override=24, drop_halo=True)
