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


# --------------------------------------------------------------------------
# Twin parameter declarations for the fused Pallas tower (same names/shapes/
# initializers as the module path above, so checkpoints / the torch importer
# / every engine work unchanged — pattern of models/pallas_aggregation.py).
# --------------------------------------------------------------------------

_TOWER_DILATIONS = (1, 1, 2, 4, 8, 1, 1, 1)   # original dilations, layers 0..7


class _ConvVars(nn.Module):
    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _BNVars(nn.Module):
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,), jnp.float32))
        return scale, bias, mean, var


class _ConvBNVars(nn.Module):
    features: int = 32
    in_features: int = 32

    @nn.compact
    def __call__(self):
        k, b = _ConvVars(self.features, self.in_features, name="conv")()
        return (k, b) + _BNVars(self.features, name="bn")()


class _BlockVars(nn.Module):
    @nn.compact
    def __call__(self):
        return _ConvBNVars(name="conv1")()


def _tower_ref_raw(xs, kernels, biases, gammas, betas, rmeans, rvars, train,
                   eps=1e-5):
    """jnp golden twin of the fused tower on RAW parameters: same graph as
    the module path, with the BN epilogue in f32 (the kernel's numerics —
    the bf16 module path differs at one-ULP scale; tests band both).
    Returns (residual_s2d (B,H2,W2,4), mu (7,32), var (7,32))."""
    h = None
    mus, vars_ = [], []
    x = xs
    for p in range(8):
        k2, dil2 = scatter_kernel_s2d(kernels[p].astype(xs.dtype),
                                      _TOWER_DILATIONS[p])
        y = jax.lax.conv_general_dilated(
            x, k2, (1, 1), [(dil2, dil2)] * 2, rhs_dilation=(dil2, dil2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.tile(biases[p].astype(xs.dtype), 4)
        if p == 7:
            return y, jnp.stack(mus), jnp.stack(vars_)
        yf = y.astype(jnp.float32).reshape(*y.shape[:-1], 4, 32)
        if train:
            ax = tuple(range(yf.ndim - 1))
            mu = jnp.mean(yf, axis=ax)
            var = jnp.mean(yf * yf, axis=ax) - mu * mu
        else:
            mu, var = rmeans[p], rvars[p]
        mus.append(mu)
        vars_.append(var)
        yn = (yf - mu) * jax.lax.rsqrt(var + eps) * gammas[p] + betas[p]
        act = nn.leaky_relu(yn.reshape(y.shape), 0.2).astype(xs.dtype)
        x = act if p == 0 else x + act


class EdgeAwareRefinementS2D(nn.Module):
    """Drop-in EdgeAwareRefinement (reference stereo_net.py:88-121) computing
    on the 2x2 space-to-depth layout. Identical parameter tree; outputs equal
    to the native-layout module up to float reassociation.

    pallas_tower=True runs all 8 layers through the fused Pallas kernels
    (ops/pallas/tower.py — one HBM round-trip per activation, fwd AND bwd as
    custom VJP) with the same parameter tree; unsupported shapes and module
    init fall back to the raw-parameter jnp twin."""

    dtype: Optional[Dtype] = None
    pallas_tower: bool = False

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

        if self.pallas_tower:
            residual = self._apply_pallas_tower(xs, train)
            return nn.relu(up + residual.astype(up.dtype))

        xs = _ConvBNS2D(32, 1, self.dtype, name="conv2d_feature")(xs, train)
        xs = nn.leaky_relu(xs, negative_slope=0.2)
        for i, di in enumerate([1, 2, 4, 8, 1, 1]):
            xs = _BasicBlockS2D(32, di, self.dtype, name=f"astrous_{i}")(xs, train)
        res_s2d = _ConvS2D(1, 1, self.dtype, name="conv2d_out")(xs)
        residual = depth_to_space(res_s2d)
        return nn.relu(up + residual.astype(up.dtype))

    def _apply_pallas_tower(self, xs, train: bool):
        """Declare the twin parameter tree, build the phase-scattered weight
        stacks, and run the fused kernel chain (or the raw jnp twin at
        unsupported shapes / during init). Returns the (B,H,W,1) residual."""
        import jax as _jax

        from ..ops.pallas.tower import tower_pallas, tower_pallas_supported

        feat = _ConvBNVars(32, 4, name="conv2d_feature")()
        blocks = [_BlockVars(name=f"astrous_{i}")() for i in range(6)]
        k_out, b_out = _ConvVars(1, 32, name="conv2d_out")()

        layers = [feat] + blocks                      # 7 x (k, b, g, be, m, v)
        kernels = [l[0] for l in layers] + [k_out]
        biases = [l[1] for l in layers] + [b_out]
        gammas = jnp.stack([l[2] for l in layers])     # (7, 32)
        betas = jnp.stack([l[3] for l in layers])
        rmeans = jnp.stack([l[4].value for l in layers])
        rvars = jnp.stack([l[5].value for l in layers])

        B, H2, W2, _ = xs.shape
        use_kernel = tower_pallas_supported(H2, W2) \
            and not self.is_initializing()

        if not use_kernel:
            res_s2d, mu, var = _tower_ref_raw(
                xs, kernels, biases, gammas, betas, rmeans, rvars, train)
        else:
            cdt = xs.dtype
            ws, bs = [], []
            for p in range(8):
                k2, _ = scatter_kernel_s2d(kernels[p].astype(cdt),
                                           _TOWER_DILATIONS[p])
                cin, cout = k2.shape[2], k2.shape[3]
                k2 = jnp.pad(k2, [(0, 0), (0, 0), (0, 128 - cin),
                                  (0, 128 - cout)])
                ws.append(k2)
                bs.append(jnp.pad(jnp.tile(biases[p].astype(jnp.float32), 4),
                                  (0, 128 - 4 * biases[p].shape[0])))
            wstack = jnp.stack(ws)
            bias_t = jnp.stack(bs)
            tile = lambda a: jnp.tile(a.astype(jnp.float32), (1, 4))
            x0p = jnp.pad(xs, [(0, 0), (4, 4), (4, 4), (0, 112)])
            x0p = x0p.reshape(B, (H2 + 8) * (W2 + 8), 128)
            interpret = _jax.default_backend() != "tpu"
            y7, mu_t, var_t = tower_pallas(
                x0p, wstack, bias_t, tile(gammas), tile(betas),
                tile(rmeans), tile(rvars), train, interpret, H2, W2)
            res_s2d = y7.reshape(B, H2 + 8, W2 + 8, 128)[
                :, 4:4 + H2, 4:4 + W2, :4]
            mu, var = mu_t[:, :32], var_t[:, :32]

        if train and not self.is_initializing():
            for i, l in enumerate(layers):
                l[4].value = 0.9 * l[4].value + 0.1 * mu[i]
                l[5].value = 0.9 * l[5].value + 0.1 * var[i]
        return depth_to_space(res_s2d)
