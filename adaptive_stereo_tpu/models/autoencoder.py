"""Convolutional autoencoder + VAE — legacy reconstruction-based OOD baselines.

Behavioral re-implementation of reference models/autoencoder.py:5-105 and
models/vae.py:24-91 (the graveyard AE/VAE OOD approach superseded by FCS —
SURVEY.md §2 G1; kept as optional baselines).

Divergence documented: the reference ConvolutionalEncoder crashes at
construction (`self.decoder.apply(...)` on a class with no decoder,
autoencoder.py:40) — we implement the evident intent (zero-init biases).

Transposed convolutions use exact torch ConvTranspose2d semantics
(lhs-dilated conv with padding k-1-p) so torch graveyard checkpoints could be
imported if ever needed.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class TorchConvTranspose(nn.Module):
    """ConvTranspose2d(k, stride, padding) with torch output-size semantics:
    out = (in - 1) * stride - 2 * padding + k."""

    features: int
    kernel_size: int
    stride: int = 2
    padding: int = 2

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k, s, p = self.kernel_size, self.stride, self.padding
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, k, in_ch, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(1, 1),
            padding=[(k - 1 - p, k - 1 - p)] * 2,
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias


class ConvolutionalEncoder(nn.Module):
    """Stride-2 conv pyramid: channels [in, 8, 12, 16, 16, 16...] then a 3x3
    head to `output_channels` (reference autoencoder.py:5-47)."""

    output_channels: int
    downsample_stages: int

    @nn.compact
    def __call__(self, x):
        channels = [8, 12, 16, 16, 16]
        for stage in range(self.downsample_stages):
            c = channels[min(stage, len(channels) - 1)]
            x = nn.Conv(c, (5, 5), strides=(2, 2), padding=[(2, 2)] * 2,
                        bias_init=nn.initializers.zeros)(x)
            x = nn.relu(x)
            x = nn.Conv(c, (5, 5), padding=[(2, 2)] * 2,
                        bias_init=nn.initializers.zeros)(x)
            x = nn.relu(x)
        return nn.Conv(self.output_channels, (3, 3), padding=[(1, 1)] * 2,
                       bias_init=nn.initializers.zeros)(x)


class ConvolutionalDecoder(nn.Module):
    """Transposed-conv pyramid back to image space with sigmoid output
    (reference autoencoder.py:50-105)."""

    output_channels: int
    upsample_stages: int

    @nn.compact
    def __call__(self, x):
        for _ in range(self.upsample_stages):
            x = TorchConvTranspose(16, 6, stride=2, padding=2)(x)
            x = nn.relu(x)
            x = TorchConvTranspose(16, 5, stride=1, padding=2)(x)
            x = nn.relu(x)
        x = nn.Conv(self.output_channels, (5, 5), padding=[(2, 2)] * 2,
                    bias_init=nn.initializers.zeros)(x)
        return nn.sigmoid(x)


class Autoencoder(nn.Module):
    """Encoder + decoder reconstruction model for OOD scoring."""

    latent_channels: int = 32
    stages: int = 4
    image_channels: int = 3

    @nn.compact
    def __call__(self, x):
        z = ConvolutionalEncoder(self.latent_channels, self.stages, name="encoder")(x)
        return ConvolutionalDecoder(self.image_channels, self.stages, name="decoder")(z)


class VAE(nn.Module):
    """Vanilla VAE (reference models/vae.py:24-78): 4x stride-2 conv encoder
    (32/64/128/256), FC bottleneck to z_dim, 4x transposed-conv decoder."""

    z_dim: int = 32
    input_height: int = 64
    input_width: int = 64
    image_channels: int = 3

    @nn.compact
    def __call__(self, x, rng=None, sample: bool = True):
        b = x.shape[0]
        for c in (32, 64, 128, 256):
            x = nn.Conv(c, (5, 5), strides=(2, 2), padding=[(2, 2)] * 2)(x)
            x = nn.relu(x)
        h = x.reshape(b, -1)

        mu = nn.Dense(self.z_dim, name="fc1")(h)
        logvar = nn.Dense(self.z_dim, name="fc2")(h)
        if sample:
            if rng is None:
                rng = self.make_rng("latent")
            std = jnp.exp(0.5 * logvar)
            z = mu + std * jax.random.normal(rng, mu.shape, mu.dtype)
        else:
            z = mu

        h_dim = 256 * (self.input_height // 16) * (self.input_width // 16)
        y = nn.Dense(h_dim, name="fc3")(z)
        y = y.reshape(b, self.input_height // 16, self.input_width // 16, 256)
        for c in (128, 64, 32):
            y = TorchConvTranspose(c, 6, stride=2, padding=2)(y)
            y = nn.relu(y)
        y = TorchConvTranspose(self.image_channels, 6, stride=2, padding=2)(y)
        return nn.sigmoid(y), mu, logvar


def vae_loss(x_true: jnp.ndarray, x_pred: jnp.ndarray, mu: jnp.ndarray,
             logvar: jnp.ndarray, beta_kl: float = 0.001) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """L1 reconstruction + beta-weighted KL to N(0, I)
    (reference vae.py:81-91)."""
    l_re = jnp.mean(jnp.abs(x_pred - x_true))
    l_kl = -0.5 * jnp.mean(1 + logvar - mu ** 2 - jnp.exp(logvar))
    return l_re + beta_kl * l_kl, l_re, beta_kl * l_kl
