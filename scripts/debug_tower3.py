"""Backward check: kernel custom-VJP grads vs jax autodiff of the raw twin.

Both compute the SAME f32 math (batch-stat BN chain), so gradients should
agree to float-reassociation noise on every input: x0, kernels, biases,
gammas, betas.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adaptive_stereo_tpu.models.s2d_refinement import (
    _TOWER_DILATIONS, _tower_ref_raw, scatter_kernel_s2d)
from adaptive_stereo_tpu.ops.pallas import tower as tw

rng = np.random.RandomState(0)
B, H2, W2 = 2, 8, 16
xs = jnp.asarray(rng.rand(B, H2, W2, 16), jnp.float32)
kernels = [jnp.asarray(rng.randn(3, 3, 4, 32) * 0.2, jnp.float32)] + \
    [jnp.asarray(rng.randn(3, 3, 32, 32) * 0.1, jnp.float32) for _ in range(6)] + \
    [jnp.asarray(rng.randn(3, 3, 32, 1) * 0.1, jnp.float32)]
biases = [jnp.asarray(rng.randn(c) * 0.1, jnp.float32) for c in [32] * 7 + [1]]
gammas = jnp.asarray(1 + 0.1 * rng.randn(7, 32), jnp.float32)
betas = jnp.asarray(0.1 * rng.randn(7, 32), jnp.float32)
rmeans = jnp.zeros((7, 32)); rvars = jnp.ones((7, 32))
PW = W2 + 8


def loss_ref(args):
    xs_, ks, bs_, g_, be_ = args
    res, _, _ = _tower_ref_raw(xs_, ks, bs_, g_, be_, rmeans, rvars, True)
    return jnp.sum(res.astype(jnp.float32) ** 2)


def loss_kernel(args):
    xs_, ks, bs_, g_, be_ = args
    ws, bst = [], []
    for p in range(8):
        k2, _ = scatter_kernel_s2d(ks[p], _TOWER_DILATIONS[p])
        cin, cout = k2.shape[2], k2.shape[3]
        ws.append(jnp.pad(k2, [(0, 0), (0, 0), (0, 128 - cin), (0, 128 - cout)]))
        bst.append(jnp.pad(jnp.tile(bs_[p], 4), (0, 128 - 4 * bs_[p].shape[0])))
    tile = lambda a: jnp.tile(a, (1, 4))
    x0p = jnp.pad(xs_, [(0, 0), (4, 4), (4, 4), (0, 112)]).reshape(
        B, (H2 + 8) * PW, 128)
    y7, mu_t, var_t = tw.tower_pallas(
        x0p, jnp.stack(ws), jnp.stack(bst), tile(g_), tile(be_),
        tile(rmeans), tile(rvars), True, True, H2, W2)
    res = y7.reshape(B, H2 + 8, PW, 128)[:, 4:4 + H2, 4:4 + W2, :4]
    return jnp.sum(res.astype(jnp.float32) ** 2)


args = (xs, kernels, biases, gammas, betas)
l1, l2 = loss_ref(args), loss_kernel(args)
print(f"loss ref {l1:.6f} kernel {l2:.6f} rel {abs(l1-l2)/abs(l1):.2e}")
g1 = jax.grad(loss_ref)(args)
g2 = jax.grad(loss_kernel)(args)

names = ["xs"] + [f"k{p}" for p in range(8)] + [f"b{p}" for p in range(8)] + \
    ["gammas", "betas"]
flat1 = [g1[0]] + list(g1[1]) + list(g1[2]) + [g1[3], g1[4]]
flat2 = [g2[0]] + list(g2[1]) + list(g2[2]) + [g2[3], g2[4]]
gmax = max(np.abs(np.asarray(a, np.float32)).max() for a in flat1)
print(f"global grad scale {gmax:.3f}")
ok = True
for n, a, b in zip(names, flat1, flat2):
    d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max()
    rel = d / gmax
    flag = "" if rel < 1e-4 else "  <-- LARGE"
    if rel >= 1e-4:
        ok = False
    print(f"  {n:8s} max|d|={d:.3e} rel-to-global={rel:.3e}{flag}")
print("PASS" if ok else "FAIL")
