"""Space-to-depth (2x2) formulation of the edge-aware refinement tower.

WHY: the refinement head runs 7 full-resolution 3x3 convolutions on C=32
activations (reference stereo_net.py:88-121). On TPU, 32-channel NHWC
activations occupy 32 of 128 vector lanes — every elementwise op, BatchNorm
reduction and convolution pass wastes 75% of the memory system. Measured on
v5e (scripts/exp_tower.py): the tower fwd+bwd at batch 2 costs 49.3 ms in the
native layout and 24.7 ms on a 2x2 space-to-depth layout with 128 channels.

WHAT: an exactly-equivalent compute graph on (B, H/2, W/2, 4C) activations:
- every original 3x3 conv (dilation d in {1,2,4,8}) becomes one 3x3 conv on
  the s2d layout with a phase-structured (3,3,4Cin,4Cout) kernel scattered
  from the ORIGINAL (3,3,Cin,Cout) weights (structural zeros elsewhere) and
  s2d dilation d//2 (d even) or 1 (d odd). Same taps, same sums — equal up
  to float reassociation.
- BatchNorm statistics reduce over phase groups, so they remain per-ORIGINAL-
  channel over the same value set as the reference semantics.
- The parameter/batch_stats tree is IDENTICAL to EdgeAwareRefinement's
  (module/param names, shapes, initializers), so checkpoints, the torch
  importer and every engine work unchanged; the layout is purely a compute-
  path choice (StereoModel(s2d_refinement=True)).

Derivation of the kernel scatter (per axis): an output pixel y = 2Y + oy
reads original taps y + (t-1)*d. Writing u = oy + (t-1)*d, the tap lives in
s2d row Y + (u - u%2)/2, input phase u%2. For d even the phase never changes
and offsets are +-d/2; for d = 1 offsets span {-1, 0, 1}. Both give a 3-tap
s2d kernel with dilation max(d//2, 1).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel index = (py*2+px)*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of space_to_depth: (B, H/2, W/2, 4C) -> (B, H, W, C)."""
    b, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h2, w2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h2 * 2, w2 * 2, c)


def scatter_kernel_s2d(kernel: jnp.ndarray, dilation: int):
    """(3, 3, Cin, Cout) original conv kernel -> ((3, 3, 4Cin, 4Cout), s2d
    dilation) phase-structured equivalent for the 2x2 s2d layout."""
    kh, kw, cin, cout = kernel.shape
    assert kh == 3 and kw == 3, (kh, kw)
    d = dilation
    dil2 = d // 2 if d % 2 == 0 else 1

    def axis_map(o, t):
        u = o + (t - 1) * d
        phase = u % 2
        tap = (u - phase) // 2 // dil2 + 1
        return tap, phase

    k2 = jnp.zeros((3, 3, 4 * cin, 4 * cout), kernel.dtype)
    for oy in range(2):
        for ox in range(2):
            for ty in range(3):
                for tx in range(3):
                    t2y, iy = axis_map(oy, ty)
                    t2x, ix = axis_map(ox, tx)
                    ib = (iy * 2 + ix) * cin
                    ob = (oy * 2 + ox) * cout
                    k2 = k2.at[t2y, t2x, ib:ib + cin, ob:ob + cout].set(
                        kernel[ty, tx])
    return k2, dil2


class _ConvS2D(nn.Module):
    """Conv2d on the s2d layout holding ORIGINAL-shape parameters (same
    names/shapes/initializers as nn.Conv, so state dicts are identical)."""

    features: int
    dilation: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xs):
        cin = xs.shape[-1] // 4
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k = kernel if self.dtype is None else kernel.astype(self.dtype)
        k2, dil2 = scatter_kernel_s2d(k, self.dilation)
        y = jax.lax.conv_general_dilated(
            xs, k2, (1, 1), [(dil2, dil2)] * 2,
            rhs_dilation=(dil2, dil2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + jnp.tile(bias.astype(y.dtype), 4)


class _BatchNormS2D(nn.Module):
    """BatchNorm over phase groups: per-ORIGINAL-channel statistics on the
    s2d layout. Parameter/batch_stats names, shapes, initializers and the
    momentum/eps/f32-stats semantics mirror flax nn.BatchNorm exactly."""

    dtype: Optional[Dtype] = None
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, xs, train: bool):
        c = xs.shape[-1] // 4
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))

        x4 = xs.reshape(*xs.shape[:-1], 4, c)
        if train:
            xf = x4.astype(jnp.float32)
            mu = jnp.mean(xf, axis=tuple(range(xf.ndim - 1)))
            mu2 = jnp.mean(xf * xf, axis=tuple(range(xf.ndim - 1)))
            var = mu2 - mu * mu
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mu)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        else:
            mu, var = ra_mean.value, ra_var.value

        dt = x4.dtype if self.dtype is not None else jnp.promote_types(
            x4.dtype, jnp.float32)
        y = (x4.astype(dt) - mu.astype(dt)) * jax.lax.rsqrt(
            var.astype(dt) + self.epsilon)
        y = y * scale.astype(dt) + bias.astype(dt)
        return y.reshape(xs.shape).astype(xs.dtype)


class _ConvBNS2D(nn.Module):
    """ConvBN twin on the s2d layout (children named conv/bn like ConvBN)."""

    features: int
    dilation: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xs, train: bool):
        xs = _ConvS2D(self.features, self.dilation, self.dtype, name="conv")(xs)
        return _BatchNormS2D(self.dtype, name="bn")(xs, train)


class _BasicBlockS2D(nn.Module):
    """BasicBlock twin: x + leaky_relu(convbn(x)) on the s2d layout."""

    features: int
    dilation: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xs, train: bool):
        out = _ConvBNS2D(self.features, self.dilation, self.dtype,
                         name="conv1")(xs, train)
        return xs + nn.leaky_relu(out, negative_slope=0.2)


class EdgeAwareRefinementS2D(nn.Module):
    """Drop-in EdgeAwareRefinement (reference stereo_net.py:88-121) computing
    on the 2x2 space-to-depth layout. Identical parameter tree; outputs equal
    to the native-layout module up to float reassociation."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, coarse_disparity, guidance_rgb, train: bool = True):
        from .stereo_net import resize_bilinear

        h, w = guidance_rgb.shape[1], guidance_rgb.shape[2]
        assert h % 2 == 0 and w % 2 == 0, (
            "s2d refinement needs even guidance dims")
        up = resize_bilinear(coarse_disparity[..., None], (h, w))
        scale_factor = guidance_rgb.shape[2] / coarse_disparity.shape[2]
        up = up * scale_factor

        x = jnp.concatenate([up.astype(guidance_rgb.dtype), guidance_rgb],
                            axis=-1)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        xs = space_to_depth(x)  # (B, H/2, W/2, 16)
        xs = _ConvBNS2D(32, 1, self.dtype, name="conv2d_feature")(xs, train)
        xs = nn.leaky_relu(xs, negative_slope=0.2)
        for i, di in enumerate([1, 2, 4, 8, 1, 1]):
            xs = _BasicBlockS2D(32, di, self.dtype, name=f"astrous_{i}")(xs, train)
        res_s2d = _ConvS2D(1, 1, self.dtype, name="conv2d_out")(xs)
        residual = depth_to_space(res_s2d)
        return nn.relu(up + residual.astype(up.dtype))
