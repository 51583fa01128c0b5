"""AE / VAE shape + loss tests (reference test/test_autoencoder.py:13-46,
test_vae.py:14-26 upgraded with value checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_stereo_tpu.models.autoencoder import (
    Autoencoder,
    ConvolutionalEncoder,
    TorchConvTranspose,
    VAE,
    vae_loss,
)


def test_conv_transpose_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    x = rng.rand(1, 5, 7, 4).astype(np.float32)

    for k, s, p in [(6, 2, 2), (5, 1, 2)]:
        ref = torch.nn.ConvTranspose2d(4, 3, k, stride=s, padding=p)
        m = TorchConvTranspose(3, k, stride=s, padding=p)
        variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        # torch weight (in, out, kh, kw) -> flip spatial -> (kh, kw, in, out)
        w = ref.weight.detach().numpy()[:, :, ::-1, ::-1]
        variables = {"params": {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 0, 1)).copy()),
            "bias": jnp.asarray(ref.bias.detach().numpy()),
        }}
        ours = np.asarray(m.apply(variables, jnp.asarray(x)))
        with torch.no_grad():
            theirs = ref(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()
        np.testing.assert_allclose(np.moveaxis(ours, -1, 1), theirs, atol=1e-5)


@pytest.mark.parametrize("stages", [2, 4])
@pytest.mark.slow
def test_autoencoder_roundtrip_shapes(stages):
    h, w = 32, 64
    m = Autoencoder(latent_channels=32, stages=stages)
    x = jnp.zeros((2, h, w, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (2, h, w, 3)
    assert float(y.min()) >= 0 and float(y.max()) <= 1

    enc = ConvolutionalEncoder(32, stages)
    z = enc.apply(enc.init(jax.random.PRNGKey(0), x), x)
    assert z.shape == (2, h // 2 ** stages, w // 2 ** stages, 32)


@pytest.mark.slow
def test_vae_forward_and_loss():
    h, w = 32, 32
    m = VAE(z_dim=16, input_height=h, input_width=w)
    x = jnp.asarray(np.random.RandomState(0).rand(2, h, w, 3), jnp.float32)
    variables = m.init({"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)}, x)
    y, mu, logvar = m.apply(variables, x, rngs={"latent": jax.random.PRNGKey(2)})
    assert y.shape == x.shape
    assert mu.shape == (2, 16) and logvar.shape == (2, 16)
    total, l_re, l_kl = vae_loss(x, y, mu, logvar, beta_kl=0.001)
    assert float(total) > 0 and np.isfinite(float(total))
    # Deterministic (mean) path is reproducible.
    y1, _, _ = m.apply(variables, x, sample=False)
    y2, _, _ = m.apply(variables, x, sample=False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
