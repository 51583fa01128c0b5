"""Native C++ data-path parity vs the python implementations."""

import numpy as np
import pytest

from adaptive_stereo_tpu.data import native, read_pfm, write_pfm

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_native_pfm_matches_python(tmp_path):
    img = (np.random.RandomState(0).rand(20, 33).astype(np.float32) * 80)
    p = str(tmp_path / "d.pfm")
    write_pfm(p, img)
    py, _ = read_pfm(p)
    nat, _ = native.pfm_read_native(p)
    np.testing.assert_array_equal(py, nat)


def test_native_pfm_reads_reference_golden():
    import os

    path = "/root/reference/resources/0008.pfm"
    if not os.path.exists(path):
        pytest.skip("reference mount missing")
    py, _ = read_pfm(path)
    nat, _ = native.pfm_read_native(path)
    np.testing.assert_array_equal(py, nat)


def test_native_resize_matches_cv2():
    import cv2 as cv

    img = np.random.RandomState(1).rand(37, 53, 3).astype(np.float32)
    for oh, ow in [(18, 26), (74, 106), (37, 53)]:
        ref = cv.resize(img, (ow, oh), interpolation=cv.INTER_LINEAR)
        nat = native.resize_bilinear_native(img, oh, ow)
        np.testing.assert_allclose(ref, nat, atol=2e-5)


def test_native_voxel_matches_python():
    from adaptive_stereo_tpu.serving.stream import voxel_downsample

    rng = np.random.RandomState(2)
    pts = rng.rand(5000, 3).astype(np.float32) * 4
    cols = rng.rand(5000, 3).astype(np.float32)

    nat_pts, nat_cols = native.voxel_downsample_native(pts, 0.25, cols)

    # Python reference (bypass the native fast path inside voxel_downsample).
    keys = np.floor(pts / 0.25).astype(np.int64)
    uniq = np.unique(keys, axis=0)
    assert len(nat_pts) == len(uniq)
    # Same voxel set: every averaged point maps back into its voxel.
    back = np.floor(nat_pts / 0.25 + 1e-4).astype(np.int64)
    assert set(map(tuple, back)) == set(map(tuple, uniq))
    assert nat_cols.shape == nat_pts.shape
