"""Bring-up script for the fused Pallas refinement tower (ops/pallas/tower.py).

CPU interpret-mode parity at a small shape: module path (pallas_tower=False)
vs kernel path (pallas_tower=True), forward + grads + running stats.
Run: JAX_PLATFORMS=cpu python scripts/debug_tower.py [f32|bf16]
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adaptive_stereo_tpu.models.s2d_refinement import EdgeAwareRefinementS2D


def run(dtype_name="f32", H=16, W=32, B=2, train=True):
    dt = jnp.bfloat16 if dtype_name == "bf16" else None
    rng = np.random.RandomState(0)
    coarse = jnp.asarray(rng.rand(B, H // 4, W // 4) * 5, jnp.float32)
    guide = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)

    mod_ref = EdgeAwareRefinementS2D(dtype=dt, pallas_tower=False)
    mod_pl = EdgeAwareRefinementS2D(dtype=dt, pallas_tower=True)
    vars_ = mod_ref.init(jax.random.PRNGKey(0), coarse, guide, True)
    # Make running stats non-trivial so eval mode is a real test.
    vars_ = jax.tree.map(lambda x: x, vars_)

    def fwd(mod, v):
        out, mut = mod.apply(v, coarse, guide, train,
                             mutable=["batch_stats"])
        return out, mut["batch_stats"]

    o1, bs1 = fwd(mod_ref, vars_)
    o2, bs2 = fwd(mod_pl, vars_)
    o1f, o2f = np.asarray(o1, np.float32), np.asarray(o2, np.float32)
    print(f"[{dtype_name} train={train}] fwd max|d| =",
          np.abs(o1f - o2f).max(), " mean|o| =", np.abs(o1f).mean())
    d1 = jax.tree.leaves(jax.tree.map(
        lambda a, b: np.abs(np.asarray(a) - np.asarray(b)).max(), bs1, bs2))
    print("  batch_stats max|d| =", max(d1) if d1 else 0.0)

    if train:
        def loss(mod):
            def f(v):
                out, _ = mod.apply(v, coarse, guide, True,
                                   mutable=["batch_stats"])
                return jnp.sum(out.astype(jnp.float32) ** 2)
            return f

        g1 = jax.grad(loss(mod_ref))({"params": vars_["params"],
                                      "batch_stats": vars_["batch_stats"]})
        g2 = jax.grad(loss(mod_pl))({"params": vars_["params"],
                                     "batch_stats": vars_["batch_stats"]})
        flat1 = jax.tree.leaves(g1["params"])
        flat2 = jax.tree.leaves(g2["params"])
        paths = jax.tree_util.tree_flatten_with_path(g1["params"])[0]
        worst = 0.0
        for (p, a), b in zip(paths, flat2):
            d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))
            scale = np.abs(np.asarray(a, np.float32)).max() + 1e-6
            rel = d.max() / scale
            if rel > worst:
                worst = rel
                worst_p = jax.tree_util.keystr(p)
        print(f"  grad worst rel |d| = {worst:.3e} at {worst_p}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "f32"
    run(which, train=True)
    run(which, train=False)
