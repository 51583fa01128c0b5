"""Per-dataset disparity loader format tests (reference
utils/dataset_utils.py:26-57 contracts) + bf16 eval parity."""

import numpy as np
import pytest

from adaptive_stereo_tpu.data import get_disp_loader


def test_kitti_stereo_uint16_png_loader(tmp_path):
    """KITTI stereo GT: uint16 PNG, value = 256 * disparity."""
    import imageio.v2 as imageio

    disp = np.random.RandomState(0).rand(16, 24).astype(np.float32) * 100
    path = str(tmp_path / "d.png")
    imageio.imwrite(path, (disp * 256).round().astype(np.uint16))
    out = get_disp_loader("KittiStereo2015")(path)
    assert out.shape == (16, 24, 1)
    np.testing.assert_allclose(out[..., 0], disp, atol=1 / 256 + 1e-3)


def test_kitti_raw_npy_loader(tmp_path):
    """KITTI raw GT: uint16 npy, value = 128 * disparity
    (scripts/export_kitti_raw_gt.py output format)."""
    disp = np.random.RandomState(1).rand(8, 12).astype(np.float32) * 80
    path = str(tmp_path / "d.npy")
    np.save(path, (disp * 128).astype(np.uint16))
    out = get_disp_loader("KittiRaw")(path)
    np.testing.assert_allclose(out[..., 0], disp, atol=1 / 128 + 1e-3)


def test_vkitti_depth_png_loader(tmp_path):
    """VKITTI GT: 16-bit depth PNG in centimeters -> d = b*f/z."""
    import cv2 as cv

    from adaptive_stereo_tpu.data.loaders import VKITTI_BASELINE_M, VKITTI_FOCAL_PX

    depth_m = np.random.RandomState(2).rand(8, 12).astype(np.float64) * 50 + 2
    path = str(tmp_path / "depth.png")
    cv.imwrite(path, (depth_m * 100).round().astype(np.uint16))
    out = get_disp_loader("VirtualKitti")(path)
    expected = VKITTI_BASELINE_M * VKITTI_FOCAL_PX / depth_m
    np.testing.assert_allclose(out[..., 0], expected, rtol=2e-3)


def test_sceneflow_pfm_loader(tmp_path):
    from adaptive_stereo_tpu.data import write_pfm

    disp = np.random.RandomState(3).rand(10, 14).astype(np.float32) * 60
    path = str(tmp_path / "d.pfm")
    write_pfm(path, disp)
    out = get_disp_loader("SceneFlowFlying")(path)
    np.testing.assert_array_equal(out[..., 0], disp)


def test_bfloat16_eval_epe_close_to_f32():
    """bf16 compute (the bench/serving path) must track f32 EPE closely —
    validates ModelConfig.compute_dtype='bfloat16' as a deployment choice."""
    import jax
    import jax.numpy as jnp

    from adaptive_stereo_tpu.engine import create_train_state, make_eval_step
    from adaptive_stereo_tpu.models import StereoModel

    K, S, H, W = 3, 1, 64, 96
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    right = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(1, H // 2, W // 2, 1) * 10, jnp.float32)
    batch = {f"color_l/{S}": left[:, ::2, ::2], f"color_r/{S}": right[:, ::2, ::2],
             f"gt_disp_l/{S}": gt}

    m32 = StereoModel(k=K, input_scale=S)
    m16 = StereoModel(k=K, input_scale=S, dtype=jnp.bfloat16)
    state = create_train_state(m32, jax.random.PRNGKey(0), left, right, 1e-4)

    e32 = make_eval_step(m32, S, K)(state.params, state.batch_stats, batch)
    e16 = make_eval_step(m16, S, K)(state.params, state.batch_stats, batch)
    epe32, epe16 = float(e32["EPE"]), float(e16["EPE"])
    assert abs(epe16 - epe32) < 0.05 * max(epe32, 1.0), (epe32, epe16)
    assert abs(float(e16["FCS"]) - float(e32["FCS"])) < 0.2 * abs(float(e32["FCS"])) + 0.1
