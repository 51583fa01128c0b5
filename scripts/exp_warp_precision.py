"""Warp precision/dtype experiment (round 4, VERDICT item 3/1).

The n=8 fleet trace (artifacts/profile_fleet_r4.log) shows the banded-warp
einsum at Precision.HIGHEST f32 costing 28.7 ms/step — 21% of the whole
fleet step — because HIGHEST f32 runs multi-pass on the MXU and the band
weight tensor is materialized at f32. This measures value error (vs the
f32 gather oracle) and fwd/fwd+bwd time for precision x dtype variants at
the paper shape, B in {1, 8}.

Run on TPU: timeout 4000 python scripts/exp_warp_precision.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from adaptive_stereo_tpu.ops.warp import linear_warp

    h, w, d = 320, 960, 192
    rng = np.random.RandomState(0)
    print(f"device={jax.devices()[0]}", flush=True)

    for b in (1, 8):
        img = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
        disp = jnp.asarray(rng.rand(b, h, w) * d, jnp.float32)

        ref, _ = jax.jit(lambda i, p: linear_warp(
            i, p, max_disp=None, implementation="gather"))(img, disp)
        ref = np.asarray(ref)

        def loss_of(warp_kwargs):
            def f(i, p):
                out, mask = linear_warp(i, p, max_disp=d, **warp_kwargs)
                return jnp.sum(jnp.where(mask, out, 0.0) ** 2)
            return f

        variants = [
            ("f32/HIGHEST (current default)", dict()),
            ("f32/HIGH", dict(precision="high")),
            ("f32/DEFAULT", dict(precision="default")),
            ("bf16/DEFAULT", dict(precision="default", band_dtype="bfloat16")),
            ("bf16/HIGHEST", dict(band_dtype="bfloat16")),
        ]
        for name, kw in variants:
            try:
                fwd = jax.jit(lambda i, p, kw=kw: linear_warp(
                    i, p, max_disp=d, **kw)[0])
                out = np.asarray(fwd(img, disp))
                err = np.abs(out - ref).max()
                # fwd timing
                jax.block_until_ready(fwd(img, disp))
                t0 = time.perf_counter()
                for _ in range(20):
                    o = fwd(img, disp)
                jax.block_until_ready(o)
                t_fwd = (time.perf_counter() - t0) / 20 * 1e3
                # fwd+bwd timing
                g = jax.jit(jax.grad(loss_of(kw), argnums=(0, 1)))
                jax.block_until_ready(g(img, disp))
                t0 = time.perf_counter()
                for _ in range(20):
                    gs = g(img, disp)
                jax.block_until_ready(gs)
                t_bwd = (time.perf_counter() - t0) / 20 * 1e3
                print(f"B={b} {name:32s} max|err|={err:.3e} "
                      f"fwd {t_fwd:7.2f} ms  fwd+bwd {t_bwd:7.2f} ms",
                      flush=True)
            except Exception as e:
                print(f"B={b} {name:32s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
