"""Reconstruction-based OOD baselines (the reference's deprecated graveyard
approach: adaptive_stereo/graveyard/{train_autoencoder.py,adapt_vae.py} —
superseded by FCS; kept as optional baselines per SURVEY.md §2 G1).

Provides a compact trainer for the AE/VAE image-reconstruction models and the
reconstruction-loss OOD score (high reconstruction error => novel), plus the
same PR analysis as the FCS path so the two signals can be compared.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.autoencoder import VAE, Autoencoder, vae_loss


def train_autoencoder(
    loader,
    input_scale: int = 0,
    num_steps: int = 1000,
    learning_rate: float = 1e-4,
    latent_channels: int = 32,
    stages: int = 4,
    use_vae: bool = False,
    image_hw: Optional[Tuple[int, int]] = None,
    seed: int = 123,
):
    """Train an AE (L1 reconstruction) or VAE (L1 + beta-KL) on left images.

    Returns (model, variables, losses list).
    """
    first = next(iter(loader))
    img = jnp.asarray(first[f"color_l/{input_scale}"])
    h, w = img.shape[1], img.shape[2]
    if use_vae:
        model = VAE(z_dim=latent_channels, input_height=h, input_width=w)
        variables = model.init(
            {"params": jax.random.PRNGKey(seed), "latent": jax.random.PRNGKey(seed + 1)},
            img)
    else:
        model = Autoencoder(latent_channels=latent_channels, stages=stages)
        variables = model.init(jax.random.PRNGKey(seed), img)

    tx = optax.adam(learning_rate)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            if use_vae:
                recon, mu, logvar = model.apply({"params": p}, batch,
                                                rngs={"latent": rng})
                total, l_re, l_kl = vae_loss(batch, recon, mu, logvar)
                return total
            recon = model.apply({"params": p}, batch)
            return jnp.mean(jnp.abs(recon - batch))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables["params"]
    losses = []
    rng = jax.random.PRNGKey(seed + 2)
    it = iter(loader)
    for i in range(num_steps):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            batch = next(it)
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(batch[f"color_l/{input_scale}"]), sub)
        losses.append(float(loss))
    return model, {"params": params}, losses


def reconstruction_scores(model, variables, loader, input_scale: int = 0,
                          use_vae: bool = False,
                          max_batches: Optional[int] = None) -> np.ndarray:
    """Per-image reconstruction L1 error — the graveyard OOD signal
    (HIGH error => novel, the opposite sign convention from FCS)."""

    @jax.jit
    def score(params, batch):
        if use_vae:
            recon, _mu, _lv = model.apply({"params": params}, batch, sample=False)
        else:
            recon = model.apply({"params": params}, batch)
        return jnp.mean(jnp.abs(recon - batch), axis=(1, 2, 3))

    out = []
    for i, batch in enumerate(loader):
        if max_batches is not None and i >= max_batches:
            break
        out.append(np.asarray(score(variables["params"],
                                    jnp.asarray(batch[f"color_l/{input_scale}"]))))
    return np.concatenate(out)


def reconstruction_precision_recall(train_scores: np.ndarray,
                                    novel_scores: np.ndarray,
                                    cutoff: float) -> Dict[str, float]:
    """PR for the classifier 'novel iff reconstruction error >= cutoff'."""
    tp = int((novel_scores >= cutoff).sum())
    fn = int((novel_scores < cutoff).sum())
    fp = int((train_scores >= cutoff).sum())
    pr = tp / (tp + fp) if (tp + fp) > 0 else 1.0
    re = tp / (tp + fn)
    return {"precision": pr, "recall": re}
