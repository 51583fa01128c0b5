"""Data layer tests: IO formats, synthetic dataset geometry, loader contract."""

import os

import numpy as np
import pytest

from adaptive_stereo_tpu.data import (
    BatchLoader,
    StereoDataset,
    generate_synthetic_dataset,
    read_pfm,
    write_pfm,
    read_flo,
    write_flo,
)


def test_pfm_roundtrip(tmp_path):
    img = np.random.RandomState(0).rand(12, 17).astype(np.float32) * 50
    p = str(tmp_path / "x.pfm")
    write_pfm(p, img)
    back, scale = read_pfm(p)
    np.testing.assert_array_equal(img, back)


def test_pfm_reads_reference_golden():
    """The reference ships a SceneFlow disparity PFM as a fixture
    (resources/0008.pfm) — read it and sanity-check plausible disparities."""
    path = "/root/reference/resources/0008.pfm"
    if not os.path.exists(path):
        pytest.skip("reference mount missing")
    disp, scale = read_pfm(path)
    assert disp.ndim == 2
    assert disp.shape[0] > 100 and disp.shape[1] > 100
    assert np.isfinite(disp).all()
    assert 0 < np.median(disp) < 300  # plausible SceneFlow disparities


def test_flo_roundtrip(tmp_path):
    flow = np.random.RandomState(0).rand(6, 9, 2).astype(np.float32)
    p = str(tmp_path / "x.flo")
    write_flo(p, flow)
    np.testing.assert_array_equal(flow, read_flo(p))


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    generate_synthetic_dataset(root, name="synth", num_train=6, num_val=3,
                               height=64, width=96, max_disp=16.0, seed=0)
    return root


def test_synthetic_photometric_consistency(synth_root):
    """Warping the right image by GT disparity must reconstruct the left —
    validates the generator's geometry (up to PNG quantization + the
    reference warp's half-pixel quirk)."""
    import jax.numpy as jnp

    from adaptive_stereo_tpu.ops import linear_warp

    ds = StereoDataset(synth_root, "Synthetic", "synth", 64, 96, "train",
                       scales=[0], splits_root=os.path.join(synth_root, "splits"))
    item = ds[0]
    left = jnp.asarray(item["color_l/0"])[None]
    right = jnp.asarray(item["color_r/0"])[None]
    disp = jnp.asarray(item["gt_disp_l/0"])[None]
    def warp_err(d):
        warped, mask = linear_warp(right, d, right_to_left=True)
        e = np.abs(np.asarray(warped - left))[np.asarray(mask)[..., 0] != 0]
        return e.mean()

    err_gt = warp_err(disp)
    err_wrong = warp_err(disp + 4.0)
    # The reference warp samples at a half-pixel offset (see ops/warp.py), so
    # even GT disparity has a blur-floor error; geometry is validated by the
    # GT error being far below a wrong-disparity error and below an absolute
    # cap that generator bugs (~0.1+) would blow through.
    assert err_gt < 0.07, err_gt
    assert err_gt < 0.5 * err_wrong, (err_gt, err_wrong)


def test_dataset_pyramid_contract(synth_root):
    ds = StereoDataset(synth_root, "Synthetic", "synth", 64, 96, "train",
                       scales=[1, 4], splits_root=os.path.join(synth_root, "splits"))
    item = ds[0]
    assert item["color_l/0"].shape == (64, 96, 3)
    assert item["color_l/1"].shape == (32, 48, 3)
    assert item["color_l/4"].shape == (4, 6, 3)
    # Disparity values divided by 2^s (reference stereo_dataset.py:114-122).
    r = item["gt_disp_l/0"].mean() / item["gt_disp_l/1"].mean()
    assert 1.8 < r < 2.2
    assert item["gt_disp_l/4"].shape == (4, 6, 1)


def test_dataset_hflip_swaps_and_mirrors(synth_root):
    ds = StereoDataset(synth_root, "Synthetic", "synth", 64, 96, "train",
                       scales=[0], do_hflip=True, splits_root=os.path.join(synth_root, "splits"),
                       seed=3)
    base = StereoDataset(synth_root, "Synthetic", "synth", 64, 96, "train",
                         scales=[0], splits_root=os.path.join(synth_root, "splits"))
    flipped = None
    for _ in range(20):  # 50% per draw; find a flipped sample
        item = ds[0]
        ref = base[0]
        if not np.allclose(item["color_l/0"], ref["color_l/0"]):
            flipped = (item, ref)
            break
    assert flipped is not None
    item, ref = flipped
    np.testing.assert_allclose(item["color_l/0"], ref["color_r/0"][:, ::-1])
    np.testing.assert_allclose(item["color_r/0"], ref["color_l/0"][:, ::-1])


def test_batch_loader_shapes_and_order(synth_root):
    ds = StereoDataset(synth_root, "Synthetic", "synth", 64, 96, "train",
                       scales=[1], splits_root=os.path.join(synth_root, "splits"))
    loader = BatchLoader(ds, batch_size=4, shuffle=False, num_workers=2)
    batches = list(loader)
    assert len(batches) == len(loader) == 2  # 6 items -> 4 + 2
    assert batches[0]["color_l/1"].shape == (4, 32, 48, 3)
    assert batches[1]["color_l/1"].shape == (2, 32, 48, 3)
    # Order-preserving (no shuffle): first batch first item == dataset[0].
    np.testing.assert_allclose(batches[0]["color_l/1"][0], ds[0]["color_l/1"])


def test_dataset_color_uint8_fast_path(synth_root):
    """color_uint8=True keeps native 8-bit pixels end-to-end; values match
    the f32 path exactly (f32 = uint8 / 255)."""
    kw = dict(scales=[0], load_disp_left=False, load_disp_right=False,
              splits_root=os.path.join(synth_root, "splits"))
    ds8 = StereoDataset(synth_root, "Synthetic", "synth", 64, 96, "train",
                        color_uint8=True, **kw)
    dsf = StereoDataset(synth_root, "Synthetic", "synth", 64, 96, "train", **kw)
    a8, af = ds8[0], dsf[0]
    assert a8["color_l/0"].dtype == np.uint8
    assert af["color_l/0"].dtype == np.float32
    for key in ("color_l/0", "color_r/0"):
        np.testing.assert_allclose(
            a8[key].astype(np.float32) / 255.0, af[key], atol=1e-7)
