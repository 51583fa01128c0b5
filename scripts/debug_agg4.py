"""Paper-shape bf16 noise floor: interpret-kernel vs bf16 twin vs f32 twin."""
import sys; sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from adaptive_stereo_tpu.ops.pallas.aggregation import (
    aggregate_cost_volume_pallas, aggregate_cost_volume_ref)

rng = np.random.RandomState(0)
B,D,H,W,C = 2,12,20,60,32
params = {
    "kernels": jnp.asarray(rng.randn(4,3,3,3,C,C)*0.1, jnp.float32),
    "biases": jnp.asarray(rng.randn(4,C)*0.1, jnp.float32),
    "scales": jnp.asarray(1+rng.randn(4,C)*0.1, jnp.float32),
    "bn_biases": jnp.asarray(rng.randn(4,C)*0.1, jnp.float32),
    "final_kernel": jnp.asarray(rng.randn(3,3,3,C,1)*0.1, jnp.float32),
    "final_bias": jnp.asarray(rng.randn(1)*0.1, jnp.float32),
}
rs = (jnp.zeros((4,C),jnp.float32), jnp.ones((4,C),jnp.float32))
cost = jnp.asarray(rng.randn(B,D,H,W,C), jnp.bfloat16)

want = np.asarray(jax.jit(lambda c,p: aggregate_cost_volume_ref(c,p,rs,True)[0])(cost,params), np.float32)
cost32 = cost.astype(jnp.float32)
w32 = np.asarray(jax.jit(lambda c,p: aggregate_cost_volume_ref(c,p,rs,True)[0])(cost32,params), np.float32)
bad2 = np.abs(want-w32) > (0.05 + 0.05*np.abs(w32))
print(f"twin bf16 vs twin f32:       {bad2.sum()}/{bad2.size} over tol, max|d|={np.abs(want-w32).max():.4f}")
print(f"output scale: |w32| mean={np.abs(w32).mean():.3f} max={np.abs(w32).max():.3f}", flush=True)

got = np.asarray(jax.jit(lambda c,p: aggregate_cost_volume_pallas(c,p,rs,True,1e-5,True)[0])(cost,params), np.float32)
bad = np.abs(got-want) > (0.05 + 0.05*np.abs(want))
print(f"interpret bf16 vs twin bf16: {bad.sum()}/{bad.size} over tol, max|d|={np.abs(got-want).max():.4f}")
