"""Experiment: which TPU formulation of the horizontal bilinear warp wins?

The round-1 trace showed the warp's flat 1-D gather costs 11.3 ms per call
(2 calls = 22.6 ms of the 112 ms adapt step). Candidates measured here, all
implementing: out(x) = (1-wx)*img_v(x0) + wx*img_v(x1) per row.

Run: timeout 3000 python scripts/exp_warp_variants.py
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

B, H, W, C = 1, 320, 960, 3
MAXD = 194  # shift budget: maxdisp=192 (+2 for the half-pixel and ceil)


def timeit(fn, *args, n=30, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    # chained-block timing with a readback barrier (PERFORMANCE.md)
    ts = []
    for _ in range(5):
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

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, C), jnp.float32)
    disp = jnp.asarray(rng.rand(B, H, W) * 60, jnp.float32)

    def precompute(img, disp):
        x = jnp.arange(W, dtype=jnp.float32)
        sample_x = x[None, None, :] - disp
        px = jnp.clip(sample_x - 0.5, 0.0, W - 1.0)
        x0 = jnp.floor(px)
        wx = px - x0
        x0i = x0.astype(jnp.int32)
        x1i = jnp.minimum(x0i + 1, W - 1)
        avg = 0.5 * (img[:, :-1] + img[:, 1:])
        img_v = jnp.concatenate([img[:, :1], avg], axis=1)
        return img_v, px, x0i, x1i, wx

    # --- 1. current: take_along_axis on axis=2 (channels minor) ---
    def v1(img, disp):
        img_v, px, x0i, x1i, wx = precompute(img, disp)
        x0g = jnp.broadcast_to(x0i[..., None], (B, H, W, C))
        x1g = jnp.broadcast_to(x1i[..., None], (B, H, W, C))
        l = jnp.take_along_axis(img_v, x0g, axis=2)
        r = jnp.take_along_axis(img_v, x1g, axis=2)
        return l + wx[..., None] * (r - l)

    # --- 2. gather along the LAST axis (W minor) ---
    def v2(img, disp):
        img_v, px, x0i, x1i, wx = precompute(img, disp)
        imgt = jnp.moveaxis(img_v, -1, 1)  # (B, C, H, W)
        x0g = jnp.broadcast_to(x0i[:, None], (B, C, H, W))
        x1g = jnp.broadcast_to(x1i[:, None], (B, C, H, W))
        l = jnp.take_along_axis(imgt, x0g, axis=3)
        r = jnp.take_along_axis(imgt, x1g, axis=3)
        out = l + jnp.broadcast_to(wx[:, None], (B, C, H, W)) * (r - l)
        return jnp.moveaxis(out, 1, -1)

    # --- 3. XLA shift-sum over a bounded disparity range ---
    def v3(img, disp):
        img_v, px, x0i, x1i, wx = precompute(img, disp)
        pad = MAXD
        imgp = jnp.pad(img_v, ((0, 0), (0, 0), (pad, 0), (0, 0)), mode="edge")
        x = jnp.arange(W, dtype=jnp.float32)[None, None, :]
        out = jnp.zeros_like(img_v)
        for s in range(MAXD):
            wgt = jnp.maximum(1.0 - jnp.abs(px - (x - s)), 0.0)
            out = out + wgt[..., None] * imgp[:, :, pad - s:pad - s + W, :]
        return out

    # --- 4. one-hot einsum (gather as matmul) ---
    def v4(img, disp):
        img_v, px, x0i, x1i, wx = precompute(img, disp)
        xi = jnp.arange(W, dtype=jnp.float32)
        m = jnp.maximum(1.0 - jnp.abs(px[..., None] - xi), 0.0)  # (B,H,W,Wi)
        return jnp.einsum("bhxi,bhic->bhxc", m, img_v)

    # --- 5. Pallas lane-gather kernel ---
    def make_v5():
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        ROWS = 8

        def kernel(img_ref, idx0_ref, idx1_ref, wx_ref, out_ref):
            # img_ref: (C, ROWS, W); idx/wx: (ROWS, W); out: (C, ROWS, W)
            i0 = idx0_ref[:]
            i1 = idx1_ref[:]
            wxv = wx_ref[:]
            for c in range(C):
                row = img_ref[c]
                l = jnp.take_along_axis(row, i0, axis=1)
                r = jnp.take_along_axis(row, i1, axis=1)
                out_ref[c] = l + wxv * (r - l)

        @jax.jit
        def v5(img, disp):
            img_v, px, x0i, x1i, wx = precompute(img, disp)
            imgt = jnp.moveaxis(img_v, -1, 1).reshape(B * C, H, W)
            imgt = jnp.swapaxes(imgt.reshape(C, H, W), 0, 0)  # (C,H,W)
            out = pl.pallas_call(
                kernel,
                grid=(H // ROWS,),
                in_specs=[
                    pl.BlockSpec((C, ROWS, W), lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((ROWS, W), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((ROWS, W), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((ROWS, W), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((C, ROWS, W), lambda i: (0, i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((C, H, W), jnp.float32),
            )(imgt, x0i[0], x1i[0], wx[0])
            return jnp.moveaxis(out, 0, -1)[None]

        return v5

    ref = None
    results = {}
    for name, fn in [("v1_gather_ch_minor", v1),
                     ("v2_gather_w_minor", v2),
                     ("v3_shift_sum", v3),
                     ("v4_onehot_einsum", v4)]:
        jf = jax.jit(fn)
        try:
            out = jf(img, disp)
            out = np.asarray(out)
            if ref is None:
                ref = out
            err = float(np.abs(out - ref).max())
            t_f = timeit(jf, img, disp)

            # fwd+bwd: grad wrt both img and disp of sum(out)
            gf = jax.jit(jax.grad(
                lambda i, d: jnp.sum(fn(i, d) ** 2), argnums=(0, 1)))
            gout = gf(img, disp)
            t_g = timeit(gf, img, disp)
            results[name] = dict(fwd_ms=round(t_f, 3), fwdbwd_ms=round(t_g, 3),
                                 max_err=err)
        except Exception as e:
            results[name] = dict(error=str(e)[:200])
        print(json.dumps({name: results[name]}), flush=True)

    try:
        v5 = make_v5()
        out = np.asarray(v5(img, disp))
        err = float(np.abs(out - ref).max())
        t_f = timeit(v5, img, disp)
        results["v5_pallas_lane_gather"] = dict(fwd_ms=round(t_f, 3), max_err=err)
    except Exception as e:
        results["v5_pallas_lane_gather"] = dict(error=str(e)[:300])
    print(json.dumps({"v5_pallas_lane_gather": results["v5_pallas_lane_gather"]}),
          flush=True)


if __name__ == "__main__":
    main()
