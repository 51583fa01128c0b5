"""Layer-by-layer stat comparison: kernel chain vs raw jnp twin."""
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
biases = [jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
          for c in [32] * 7 + [1]]
gammas = jnp.asarray(1 + 0.1 * rng.randn(7, 32), jnp.float32)
betas = jnp.asarray(0.1 * rng.randn(7, 32), jnp.float32)
rmeans = jnp.zeros((7, 32)); rvars = jnp.ones((7, 32))

res_ref, mu_ref, var_ref = _tower_ref_raw(
    xs, kernels, biases, gammas, betas, rmeans, rvars, True)

ws, bs = [], []
for p in range(8):
    k2, _ = scatter_kernel_s2d(kernels[p], _TOWER_DILATIONS[p])
    cin, cout = k2.shape[2], k2.shape[3]
    ws.append(jnp.pad(k2, [(0, 0), (0, 0), (0, 128 - cin), (0, 128 - cout)]))
    bs.append(jnp.pad(jnp.tile(biases[p], 4), (0, 128 - 4 * biases[p].shape[0])))
wstack, bias_t = jnp.stack(ws), jnp.stack(bs)
tile = lambda a: jnp.tile(a, (1, 4))
x0p = jnp.pad(xs, [(0, 0), (4, 4), (4, 4), (0, 112)]).reshape(B, (H2 + 8) * (W2 + 8), 128)

y7, mu_t, var_t, xbufs, ybufs = tw.tower_forward(
    x0p, wstack, bias_t, tile(gammas), tile(betas), tile(rmeans), tile(rvars),
    True, B, H2, W2, jnp.float32, True)

print("per-layer stat diffs (kernel vs raw twin):")
for p in range(7):
    print(f"  L{p}: mu {np.abs(np.asarray(mu_t[p][:32] - mu_ref[p])).max():.3e}"
          f"  var {np.abs(np.asarray(var_t[p][:32] - var_ref[p])).max():.3e}")

# Compare y0 buffers directly: unflatten kernel ybuf[0].
PW = W2 + 8
y0k = ybufs[0].reshape(B, H2 + 8, PW, 128)[:, 4:4 + H2, 4:4 + W2, :]
# raw twin layer-0 conv:
k2, dil2 = scatter_kernel_s2d(kernels[0], 1)
y0r = jax.lax.conv_general_dilated(
    xs, k2, (1, 1), [(dil2, dil2)] * 2, rhs_dilation=(dil2, dil2),
    dimension_numbers=("NHWC", "HWIO", "NHWC")) + jnp.tile(biases[0], 4)
print("y0 max|d| =", np.abs(np.asarray(y0k - y0r)).max())
mu0_direct = jnp.mean(y0r.astype(jnp.float32).reshape(-1, 4, 32), axis=(0, 1))
print("mu0 twin-vs-direct:", np.abs(np.asarray(mu_ref[0] - mu0_direct)).max())
