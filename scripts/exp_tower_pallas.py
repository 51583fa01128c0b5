"""TPU verification + timing of the fused Pallas refinement tower.

1. Parity (compiled, real TPU) vs the s2d module path at the paper shape,
   f32 and bf16, train and eval, fwd and grads.
2. Isolated tower timing: module path vs fused kernels, fwd and fwd+bwd.

Usage: python scripts/exp_tower_pallas.py [--quick]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from adaptive_stereo_tpu.models.s2d_refinement import EdgeAwareRefinementS2D


def parity(B, H, W, dtype_name, train):
    dt = jnp.bfloat16 if dtype_name == "bf16" else None
    rng = np.random.RandomState(0)
    coarse = jnp.asarray(rng.rand(B, H // 16, W // 16) * 8, jnp.float32)
    guide = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    mod_ref = EdgeAwareRefinementS2D(dtype=dt, pallas_tower=False)
    mod_pl = EdgeAwareRefinementS2D(dtype=dt, pallas_tower=True)
    vars_ = mod_ref.init(jax.random.PRNGKey(0), coarse, guide, True)

    @jax.jit
    def f_ref(v):
        return mod_ref.apply(v, coarse, guide, train, mutable=["batch_stats"])

    @jax.jit
    def f_pl(v):
        return mod_pl.apply(v, coarse, guide, train, mutable=["batch_stats"])

    (o1, m1), (o2, m2) = f_ref(vars_), f_pl(vars_)
    o1f = np.asarray(o1, np.float32)
    o2f = np.asarray(o2, np.float32)
    d = np.abs(o1f - o2f)
    scale = np.abs(o1f).mean() + 1e-6
    tol = 5e-3 if dtype_name == "f32" else 0.1
    n_bad = int((d > tol * (np.abs(o1f) + scale)).sum())
    print(f"[parity {dtype_name} B={B} {H}x{W} train={train}] "
          f"max|d|={d.max():.4f} mean|o|={scale:.3f} "
          f"pixels>band={n_bad}/{o1f.size}")
    ok = n_bad <= max(4, o1f.size // 100000)
    if train:
        def loss(mod):
            def f(v):
                out, _ = mod.apply(v, coarse, guide, True,
                                   mutable=["batch_stats"])
                return jnp.mean(out.astype(jnp.float32) ** 2)
            return jax.jit(jax.grad(f))

        g1 = loss(mod_ref)(vars_)
        g2 = loss(mod_pl)(vars_)
        f1 = jax.tree.leaves(g1["params"])
        f2 = jax.tree.leaves(g2["params"])
        gmax = max(np.abs(np.asarray(a, np.float32)).max() for a in f1)
        worst = max(np.abs(np.asarray(a, np.float32)
                           - np.asarray(b, np.float32)).max()
                    for a, b in zip(f1, f2))
        rel = worst / (gmax + 1e-9)
        gtol = 1e-3 if dtype_name == "f32" else 0.05
        print(f"  grads: worst|d|={worst:.3e} scale={gmax:.3f} rel={rel:.3e}"
              f" {'OK' if rel < gtol else 'FAIL'}")
        ok = ok and rel < gtol
    return ok


def timing(B, H, W, dtype_name, iters=30):
    dt = jnp.bfloat16 if dtype_name == "bf16" else None
    rng = np.random.RandomState(0)
    coarse = jnp.asarray(rng.rand(B, H // 16, W // 16) * 8, jnp.float32)
    guide = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    results = {}
    for name, flag in [("module", False), ("pallas", True)]:
        mod = EdgeAwareRefinementS2D(dtype=dt, pallas_tower=flag)
        vars_ = mod.init(jax.random.PRNGKey(0), coarse, guide, True)

        @jax.jit
        def fwd(v):
            out, _ = mod.apply(v, coarse, guide, True,
                               mutable=["batch_stats"])
            return out

        @jax.jit
        def fwdbwd(v):
            def f(p):
                out, _ = mod.apply({"params": p,
                                    "batch_stats": v["batch_stats"]},
                                   coarse, guide, True,
                                   mutable=["batch_stats"])
                return jnp.mean(out.astype(jnp.float32) ** 2)
            return jax.grad(f)(v["params"])

        for tag, fn in [("fwd", fwd), ("fwd+bwd", fwdbwd)]:
            out = fn(vars_)
            jax.block_until_ready(out)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = fn(vars_)
                jax.block_until_ready(out)
                best = min(best, (time.perf_counter() - t0) / iters)
            results[f"{name}/{tag}"] = best * 1e3
            print(f"  [{dtype_name} B={B}] {name:7s} {tag:8s} "
                  f"{best*1e3:8.3f} ms")
    for tag in ("fwd", "fwd+bwd"):
        m, p = results[f"module/{tag}"], results[f"pallas/{tag}"]
        print(f"  => {tag}: pallas {p:.2f} ms vs module {m:.2f} ms "
              f"({m/p:.2f}x)")
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    print("backend:", jax.default_backend())

    all_ok = True
    all_ok &= parity(1, 320, 960, "f32", True)
    all_ok &= parity(1, 320, 960, "bf16", True)
    if not args.quick:
        all_ok &= parity(2, 320, 960, "bf16", True)
        all_ok &= parity(1, 320, 960, "bf16", False)
        all_ok &= parity(1, 320, 1216, "bf16", True)
    print("PARITY:", "PASS" if all_ok else "FAIL")

    if not args.quick:
        timing(1, 320, 960, "bf16")
        timing(2, 320, 960, "bf16")
