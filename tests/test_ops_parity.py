"""Numerical parity of ops/ against the reference torch implementation (CPU).

Each test evaluates the reference function (imported in place from
/root/reference via reference_shim) and our jnp implementation on identical
random inputs and compares to tight tolerances. NHWC <-> NCHW conversions
happen only at the test boundary.
"""

import numpy as np
import pytest

from reference_shim import REFERENCE_AVAILABLE

if REFERENCE_AVAILABLE:
    import torch
    from adaptive_stereo.utils import loss_functions as ref_losses
    from adaptive_stereo.utils.feature_contrast import (
        feature_contrast_mean as ref_fcs_mean,
        feature_contrast_median as ref_fcs_median,
    )
    from adaptive_stereo.models.linear_warping import LinearWarping as RefLinearWarping
    from adaptive_stereo.utils.ema import online_ema as ref_online_ema

import jax.numpy as jnp

from adaptive_stereo_tpu import ops

pytestmark = pytest.mark.skipif(not REFERENCE_AVAILABLE, reason="reference mount missing")

RNG = np.random.RandomState(42)


def nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(np.moveaxis(x_nhwc, -1, 1)))


def test_khamis_robust_loss_parity():
    pred = RNG.rand(2, 16, 24, 1).astype(np.float32) * 20
    gt = RNG.rand(2, 16, 24, 1).astype(np.float32) * 20
    gt[gt < 5] = 0.0  # invalid pixels
    ref = ref_losses.khamis_robust_loss(nchw(pred), nchw(gt)).item()
    ours = float(ops.khamis_robust_loss(jnp.asarray(pred), jnp.asarray(gt)))
    assert abs(ref - ours) < 1e-5


def test_khamis_loss_all_invalid():
    pred = RNG.rand(1, 8, 8, 1).astype(np.float32)
    gt = np.zeros((1, 8, 8, 1), np.float32)
    ours = float(ops.khamis_robust_loss(jnp.asarray(pred), jnp.asarray(gt)))
    assert ours == 0.0


def test_ssim_parity():
    x = RNG.rand(2, 20, 30, 3).astype(np.float32)
    y = RNG.rand(2, 20, 30, 3).astype(np.float32)
    ref = ref_losses.SSIM(nchw(x), nchw(y)).numpy()
    ours = np.moveaxis(np.asarray(ops.ssim(jnp.asarray(x), jnp.asarray(y))), -1, 1)
    np.testing.assert_allclose(ref, ours, atol=1e-5)


def test_smoothness_parity():
    disp = RNG.rand(2, 20, 30, 1).astype(np.float32) * 10
    img = RNG.rand(2, 20, 30, 3).astype(np.float32)
    ref = ref_losses.monodepth_edge_aware_smoothness_loss(nchw(disp), nchw(img)).numpy()
    ours = np.moveaxis(
        np.asarray(ops.monodepth_edge_aware_smoothness_loss(jnp.asarray(disp), jnp.asarray(img))),
        -1, 1,
    )
    np.testing.assert_allclose(ref, ours, atol=1e-5)


def test_monodepth_loss_parity():
    disp = RNG.rand(2, 20, 30, 1).astype(np.float32) * 10
    img = RNG.rand(2, 20, 30, 3).astype(np.float32)
    warped = RNG.rand(2, 20, 30, 3).astype(np.float32)
    ref_total, ref_l1, ref_ssim, ref_smooth = ref_losses.monodepth_loss(
        nchw(disp), nchw(img), nchw(warped), smoothness_weight=1e-3
    )
    total, l1, ss, smooth = ops.monodepth_loss(
        jnp.asarray(disp), jnp.asarray(img), jnp.asarray(warped), 1e-3
    )
    np.testing.assert_allclose(ref_total.numpy(), np.moveaxis(np.asarray(total), -1, 1), atol=1e-5)
    np.testing.assert_allclose(ref_l1.numpy(), np.moveaxis(np.asarray(l1), -1, 1), atol=1e-6)
    np.testing.assert_allclose(ref_smooth.numpy(), np.moveaxis(np.asarray(smooth), -1, 1), atol=1e-5)


def test_linear_warp_parity():
    h, w = 24, 40
    img = RNG.rand(2, h, w, 3).astype(np.float32)
    disp = (RNG.rand(2, h, w, 1) * 8).astype(np.float32)

    warper = RefLinearWarping(h, w, torch.device("cpu"))
    for right_to_left in (True, False):
        ref_out, ref_mask = warper(nchw(img), nchw(disp), right_to_left=right_to_left)
        ours, mask = ops.linear_warp(jnp.asarray(img), jnp.asarray(disp), right_to_left=right_to_left)
        np.testing.assert_allclose(
            ref_out.numpy(), np.moveaxis(np.asarray(ours), -1, 1), atol=1e-5
        )
        np.testing.assert_array_equal(
            ref_mask.numpy().astype(bool), np.moveaxis(np.asarray(mask), -1, 1)
        )


def test_linear_warp_gradient_flows():
    import jax

    img = jnp.asarray(RNG.rand(1, 8, 16, 3).astype(np.float32))
    disp = jnp.asarray((RNG.rand(1, 8, 16, 1) * 3).astype(np.float32))

    def f(d):
        warped, _ = ops.linear_warp(img, d, right_to_left=True)
        return jnp.sum(warped ** 2)

    g = jax.grad(f)(disp)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0


def test_fcs_mean_parity():
    cv = RNG.randn(2, 12, 10, 14).astype(np.float32) * 5
    ref = ref_fcs_mean(torch.from_numpy(cv)).numpy()
    ours = np.asarray(ops.feature_contrast_mean(jnp.asarray(cv)))
    np.testing.assert_allclose(ref, ours, atol=1e-5)


def test_fcs_median_parity():
    cv = RNG.randn(2, 12, 10, 14).astype(np.float32) * 5
    ref = ref_fcs_median(torch.from_numpy(cv)).numpy()
    ours = np.asarray(ops.feature_contrast_median(jnp.asarray(cv)))
    np.testing.assert_allclose(ref, ours, atol=1e-5)


def test_cost_volume_matches_reference_loop():
    """Oracle re-states the reference construction (stereo_net.py:173-182)."""
    b, h, w, c, d = 2, 6, 20, 4, 5
    fl = RNG.randn(b, h, w, c).astype(np.float32)
    fr = RNG.randn(b, h, w, c).astype(np.float32)

    ref_cost = np.zeros((b, c, d, h, w), np.float32)
    fl_t, fr_t = np.moveaxis(fl, -1, 1), np.moveaxis(fr, -1, 1)
    for i in range(d):
        if i > 0:
            ref_cost[:, :, i, :, i:] = fl_t[:, :, :, i:] - fr_t[:, :, :, :-i]
        else:
            ref_cost[:, :, i, :, :] = fl_t - fr_t

    ours = np.asarray(ops.difference_cost_volume(jnp.asarray(fl), jnp.asarray(fr), d))
    # ours: (B, D, H, W, C) -> (B, C, D, H, W)
    ours_t = np.transpose(ours, (0, 4, 1, 2, 3))
    np.testing.assert_allclose(ref_cost, ours_t, atol=1e-6)


def test_soft_argmin_analytic():
    # One-hot cost at disparity 3 with large magnitude -> soft-argmin ~ 3.
    cost = np.full((1, 8, 4, 4), -50.0, np.float32)
    cost[:, 3] = 50.0
    out = np.asarray(ops.soft_argmin(jnp.asarray(cost), axis=1))
    np.testing.assert_allclose(out, 3.0, atol=1e-5)
    # Uniform cost -> expectation (D-1)/2.
    cost = np.zeros((1, 8, 4, 4), np.float32)
    out = np.asarray(ops.soft_argmin(jnp.asarray(cost), axis=1))
    np.testing.assert_allclose(out, 3.5, atol=1e-5)


def test_online_ema_parity():
    s = 1.0
    ours = 1.0
    for v in [2.0, 5.0, -1.0]:
        s = ref_online_ema(s, v, weight=0.9)
        ours = ops.online_ema(ours, v, weight=0.9)
    assert abs(s - ours) < 1e-12


def test_convert_disp_to_flow_parity():
    """ops.convert_disp_to_flow vs the reference's functional torch version
    (linear_warping.py:88-121; the DispToFlow module there is dead code —
    returns an undefined valid_mask at :85)."""
    from adaptive_stereo.models.linear_warping import convert_disp_to_flow as ref_fn

    rng = np.random.RandomState(3)
    b, h, w = 2, 12, 20
    disp = rng.rand(b, h, w, 1).astype(np.float32) * 6.0

    ours = np.asarray(ops.convert_disp_to_flow(jnp.asarray(disp), h, w))
    ref = ref_fn(nchw(disp), h, w).numpy()  # (b, h, w, 2) already channel-last
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)
