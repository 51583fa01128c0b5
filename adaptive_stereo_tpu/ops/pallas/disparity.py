"""Pallas TPU kernel: fused softmax + soft-argmin + FCS epilogue.

One pass over the (small, static) disparity axis produces BOTH the expected
disparity and the Feature Contrast Score per pixel — the reference computes
these as separate softmax/sort passes (stereo_net.py:190-192 +
feature_contrast.py:12-23). The top-2 extraction is sort-free: second max =
max over the volume with the FIRST occurrence of the max masked out (exactly
torch.sort's tie behavior: a duplicated max value is its own runner-up).

Golden twins: ops.soft_argmin + ops.feature_contrast_mean.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(cost_ref, disp_ref, fcs_ref, *, num_disp: int):
    cost = cost_ref[0].astype(jnp.float32)           # (D, T)
    d = num_disp

    m1 = jnp.max(cost, axis=0)                        # (T,)
    total = jnp.sum(cost, axis=0)

    # First occurrence of the max along D.
    row = jax.lax.broadcasted_iota(jnp.int32, cost.shape, 0)
    first_idx = jnp.min(jnp.where(cost == m1[None, :], row, d), axis=0)
    masked = jnp.where(row == first_idx[None, :], -jnp.inf, cost)
    m2 = jnp.max(masked, axis=0)

    fcs_ref[0] = m1 - (total - m1 - m2) / (d - 2)

    # Numerically stable softmax expectation. (tpu.iota only emits integer
    # vectors — cast after.)
    p = jnp.exp(cost - m1[None, :])
    z = jnp.sum(p, axis=0)
    dvals = row.astype(jnp.float32)
    disp_ref[0] = jnp.sum(p * dvals, axis=0) / z


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def soft_argmin_fcs_pallas(cost: jnp.ndarray, interpret=None):
    """Fused soft-argmin + FCS (differentiable through the disparity output;
    FCS carries stop-gradient semantics like the reference's no_grad FCS).

    Args: cost (B, D, H, W) pre-softmax. Returns (disp (B, H, W),
    fcs (B, H, W)), both float32.
    """
    return _forward(cost, interpret)


def _forward(cost, interpret):
    if interpret is None:  # auto: interpreter off-TPU (tests on CPU)
        interpret = jax.default_backend() != "tpu"
    b, d, h, w = cost.shape
    hw = h * w
    cost2 = cost.reshape(b, d, hw)

    disp, fcs = pl.pallas_call(
        functools.partial(_kernel, num_disp=d),
        out_shape=(
            jax.ShapeDtypeStruct((b, hw), jnp.float32),
            jax.ShapeDtypeStruct((b, hw), jnp.float32),
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, d, hw), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, hw), lambda bi: (bi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw), lambda bi: (bi, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(cost2)
    return disp.reshape(b, h, w), fcs.reshape(b, h, w)


def _fwd(cost, interpret):
    disp, fcs = _forward(cost, interpret)
    return (disp, fcs), (cost, disp)


def _bwd(interpret, res, cotangents):
    """d disp / d cost_j = p_j * (j - disp); FCS is stop-gradient
    (the reference computes it under no_grad, feature_contrast.py:14)."""
    cost, disp = res
    g_disp, _g_fcs = cotangents
    cost32 = cost.astype(jnp.float32)
    p = jax.nn.softmax(cost32, axis=1)
    d = cost.shape[1]
    dvals = jnp.arange(d, dtype=jnp.float32).reshape(1, d, 1, 1)
    g_cost = g_disp[:, None] * p * (dvals - disp[:, None])
    return (g_cost.astype(cost.dtype),)


soft_argmin_fcs_pallas.defvjp(_fwd, _bwd)
