"""Flax integration of the fused Pallas cost-aggregation kernel.

Declares the EXACT parameter/batch_stats tree of the standard aggregation
stack (4x ConvBN3D `filter_i` + nn.Conv `conv3d_alone`, see
models/stereo_net.py and reference stereo_net.py:155-162,185-187) —
module/param names, shapes, initializers — so checkpoints, the torch importer
and every engine work unchanged; the Pallas path is purely a compute choice
(StereoModel(pallas_aggregation=True)).

`apply_pallas_aggregation` is called from inside StereoNet's compact
__call__, so the twin submodules (filter_0..3, conv3d_alone) are declared
directly on StereoNet — no extra scope level. The running-stat update (flax
momentum 0.9) happens here, from the batch statistics the kernel computes
in-VMEM; the kernel itself is stateless.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.pallas.aggregation import (
    aggregate_cost_volume_pallas,
    aggregate_cost_volume_ref,
    aggregation_pallas_supported,
)
from ..ops.pallas.coarse_head import (
    coarse_head_pallas,
    coarse_head_pallas_supported,
    coarse_head_ref,
)

_MOMENTUM = 0.9
_EPS = 1e-5


class _Conv3DVars(nn.Module):
    """nn.Conv(3x3x3) parameter twin: kernel (lecun_normal) + bias (zeros)."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 3, self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _BN3DVars(nn.Module):
    """nn.BatchNorm parameter/batch_stats twin (scale/bias + mean/var f32)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32))
        return scale, bias, ra_mean, ra_var


class _ConvBN3DVars(nn.Module):
    """Declares ConvBN3D's tree (children conv/bn) and returns the values plus
    the mutable running-stat Variable handles."""

    features: int = 32
    in_features: int = 32

    @nn.compact
    def __call__(self):
        kernel, bias = _Conv3DVars(self.features, self.in_features,
                                   name="conv")()
        scale, bn_bias, ra_mean, ra_var = _BN3DVars(self.features, name="bn")()
        return kernel, bias, scale, bn_bias, ra_mean, ra_var


def _declare_stack_vars(mdl: nn.Module):
    """Declare the aggregation stack's twin parameter tree on `mdl` and
    return (params dict, run_stats tuple, running-stat Variable handles)."""
    layers = [_ConvBN3DVars(name=f"filter_{i}")() for i in range(4)]
    fk, fb = _Conv3DVars(1, 32, name="conv3d_alone")()
    params = {
        "kernels": jnp.stack([l[0] for l in layers]),
        "biases": jnp.stack([l[1] for l in layers]),
        "scales": jnp.stack([l[2] for l in layers]),
        "bn_biases": jnp.stack([l[3] for l in layers]),
        "final_kernel": fk,
        "final_bias": fb,
    }
    run_stats = (jnp.stack([l[4].value for l in layers]),
                 jnp.stack([l[5].value for l in layers]))
    return params, run_stats, layers


def _update_running_stats(layers, mu, var):
    for i, l in enumerate(layers):
        l[4].value = _MOMENTUM * l[4].value + (1 - _MOMENTUM) * mu[i]
        l[5].value = _MOMENTUM * l[5].value + (1 - _MOMENTUM) * var[i]


def apply_pallas_coarse_head(mdl: nn.Module, left_features, right_features,
                             num_disp: int, train: bool):
    """Run the ENTIRE coarse head (cost volume + aggregation + soft-argmin +
    FCS) via the fused Pallas kernel (ops/pallas/coarse_head.py).

    Must be called from within StereoNet's compact __call__ (declares the
    same filter_i/conv3d_alone twin tree as apply_pallas_aggregation, so
    checkpoints and the torch importer work unchanged). Returns
    (disp (B, h, w) f32, fcs (B, h, w) f32).
    """
    params, run_stats, layers = _declare_stack_vars(mdl)

    if (coarse_head_pallas_supported(left_features.shape, num_disp,
                                     left_features.dtype)
            and not mdl.is_initializing()):
        disp, fcs, mu, var = coarse_head_pallas(
            left_features, right_features, params, run_stats, num_disp,
            train, _EPS)
    else:
        disp, fcs, mu, var = coarse_head_ref(
            left_features, right_features, params, run_stats, train,
            num_disp, _EPS)

    if train and not mdl.is_initializing():
        _update_running_stats(layers, mu, var)
    return disp, fcs


def apply_pallas_aggregation(mdl: nn.Module, cost: jnp.ndarray,
                             train: bool) -> jnp.ndarray:
    """Run the 5-layer aggregation stack via the fused Pallas kernel.

    Must be called from within StereoNet's compact __call__ so the twin
    submodules land at stereo_net/filter_i and stereo_net/conv3d_alone.
    Returns the pre-softmax cost (B, D, H, W, 1) — same rank contract as the
    standard nn.Conv path.
    """
    params, run_stats, layers = _declare_stack_vars(mdl)

    if (aggregation_pallas_supported(cost.shape, cost.dtype)
            and not mdl.is_initializing()):
        out, mu, var = aggregate_cost_volume_pallas(
            cost, params, run_stats, train, _EPS)
    else:
        # Shapes the kernel does not cover (and module init, where compiling
        # the kernel would be wasted work) take the golden twin.
        out, mu, var = aggregate_cost_volume_ref(
            cost, params, run_stats, train, _EPS)

    if train and not mdl.is_initializing():
        _update_running_stats(layers, mu, var)
    return out[..., None]
