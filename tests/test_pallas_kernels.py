"""Pallas kernels vs their jnp golden twins (interpreter mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from adaptive_stereo_tpu.ops import (
    difference_cost_volume,
    feature_contrast_mean,
    soft_argmin,
)
from adaptive_stereo_tpu.ops.pallas import (
    difference_cost_volume_pallas,
    soft_argmin_fcs_pallas,
)

RNG = np.random.RandomState(0)


@pytest.mark.parametrize("b,h,w,c,d", [(1, 4, 12, 8, 5), (2, 8, 60, 32, 12)])
def test_cost_volume_kernel_matches_jnp(b, h, w, c, d):
    fl = jnp.asarray(RNG.randn(b, h, w, c), jnp.float32)
    fr = jnp.asarray(RNG.randn(b, h, w, c), jnp.float32)
    ref = difference_cost_volume(fl, fr, d)
    out = difference_cost_volume_pallas(fl, fr, d, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-6)


def test_cost_volume_kernel_disp_beyond_width():
    # d >= W: slice must be all zeros (reference empty-write semantics).
    fl = jnp.asarray(RNG.randn(1, 4, 6, 4), jnp.float32)
    fr = jnp.asarray(RNG.randn(1, 4, 6, 4), jnp.float32)
    ref = difference_cost_volume(fl, fr, 8)
    out = difference_cost_volume_pallas(fl, fr, 8, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-6)
    assert np.abs(np.asarray(out)[:, 6:]).max() == 0


@pytest.mark.parametrize("b,d,h,w", [(2, 12, 8, 16), (1, 6, 20, 60)])
def test_soft_argmin_fcs_kernel_matches_jnp(b, d, h, w):
    cost = jnp.asarray(RNG.randn(b, d, h, w) * 5, jnp.float32)
    disp, fcs = soft_argmin_fcs_pallas(cost, interpret=True)
    np.testing.assert_allclose(np.asarray(disp),
                               np.asarray(soft_argmin(cost, axis=1)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fcs),
                               np.asarray(feature_contrast_mean(cost)),
                               rtol=1e-5, atol=1e-5)


def test_soft_argmin_fcs_kernel_duplicate_max():
    # Duplicated max: torch.sort top-2 are both the max; FCS must match.
    cost = np.zeros((1, 6, 2, 2), np.float32)
    cost[:, 2] = 3.0
    cost[:, 4] = 3.0
    cost = jnp.asarray(cost)
    _, fcs = soft_argmin_fcs_pallas(cost, interpret=True)
    np.testing.assert_allclose(np.asarray(fcs),
                               np.asarray(feature_contrast_mean(cost)),
                               atol=1e-6)


def test_pallas_kernels_vjp_matches_jnp():
    """Gradients through the pallas ops (custom VJPs) match the jnp twins."""
    import jax

    fl = jnp.asarray(RNG.randn(1, 4, 12, 8), jnp.float32)
    fr = jnp.asarray(RNG.randn(1, 4, 12, 8), jnp.float32)

    def f_ref(fl, fr):
        return jnp.sum(jnp.sin(difference_cost_volume(fl, fr, 5)))

    def f_pal(fl, fr):
        return jnp.sum(jnp.sin(difference_cost_volume_pallas(fl, fr, 5, True)))

    g_ref = jax.grad(f_ref, argnums=(0, 1))(fl, fr)
    g_pal = jax.grad(f_pal, argnums=(0, 1))(fl, fr)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    cost = jnp.asarray(RNG.randn(1, 6, 4, 8) * 3, jnp.float32)

    def s_ref(c):
        return jnp.sum(soft_argmin(c, axis=1) ** 2)

    def s_pal(c):
        disp, _fcs = soft_argmin_fcs_pallas(c, True)
        return jnp.sum(disp ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(s_ref)(cost)), np.asarray(jax.grad(s_pal)(cost)),
        rtol=1e-4, atol=1e-5)


def test_model_with_pallas_matches_without():
    """Full StereoModel forward + adaptation gradient parity with
    use_pallas=True (interpreter-mode kernels on CPU)."""
    import jax

    from adaptive_stereo_tpu.engine import create_train_state, make_adapt_forward_backward
    from adaptive_stereo_tpu.models import StereoModel

    K, S, H, W = 3, 1, 32, 64
    rng = np.random.RandomState(5)
    left = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    right = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(1, H, W, 1) * 8, jnp.float32)
    batch = {f"color_l/{S}": left, f"color_r/{S}": right, f"gt_disp_l/{S}": gt}

    m0 = StereoModel(k=K, input_scale=S)
    m1 = StereoModel(k=K, input_scale=S, use_pallas=True)
    state = create_train_state(m0, jax.random.PRNGKey(0), left, right, 1e-4)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    out0 = m0.apply(variables, left, right, output_cost_volume=True, train=False)
    out1 = m1.apply(variables, left, right, output_cost_volume=True, train=False)
    for key in out0:
        np.testing.assert_allclose(np.asarray(out0[key]), np.asarray(out1[key]),
                                   rtol=1e-4, atol=1e-5, err_msg=key)
    assert f"fcs_l/{S + K}" in out1  # fused epilogue output

    fb0 = make_adapt_forward_backward(m0, S, K, use_er=False)
    fb1 = make_adapt_forward_backward(m1, S, K, use_er=False)
    g0, _, a0 = fb0(state.params, state.batch_stats, batch, batch)
    g1, _, a1 = fb1(state.params, state.batch_stats, batch, batch)
    np.testing.assert_allclose(float(a0["fcs_raw"]), float(a1["fcs_raw"]), rtol=1e-4)
    # Per-leaf tolerance with an absolute floor: some bias gradients are
    # ~exactly 0 by construction (BN mean removal; the difference cost
    # volume cancels a shared feature bias), so pure relative error is
    # meaningless there.
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))) -
        5e-3 * (float(jnp.max(jnp.abs(a))) + 1e-3), g0, g1)
    assert max(jax.tree.leaves(diffs)) < 0, diffs
