"""Serving engine tests: geometry pipeline + stream API."""

import numpy as np

from adaptive_stereo_tpu.serving import (
    ServingConfig,
    StereoDepthEngine,
    depth_to_pointcloud,
    disparity_to_depth,
    voxel_downsample,
)


def test_disparity_to_depth_clamps():
    disp = np.array([[0.0, 1.0, 10.0]], np.float32)
    depth = disparity_to_depth(disp, fx=100.0, baseline_m=0.5, max_depth=80.0)
    np.testing.assert_allclose(depth, [[80.0, 50.0, 5.0]])


def test_backprojection_geometry():
    k = np.array([[10.0, 0, 2.0], [0, 10.0, 1.0], [0, 0, 1]], np.float64)
    depth = np.full((3, 5), 10.0, np.float32)
    pts, _ = depth_to_pointcloud(depth, k)
    assert pts.shape == (15, 3)
    # Principal point pixel (x=2, y=1) backprojects to the optical axis.
    idx = 1 * 5 + 2
    np.testing.assert_allclose(pts[idx], [0.0, 0.0, 10.0], atol=1e-6)
    # One pixel right of center: x = (3-2)*10/10 = 1.
    np.testing.assert_allclose(pts[idx + 1], [1.0, 0.0, 10.0], atol=1e-6)


def test_voxel_downsample_merges():
    pts = np.array([[0.01, 0.01, 0.01], [0.02, 0.02, 0.02], [1.0, 1.0, 1.0]], np.float64)
    cols = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float64)
    out_pts, out_cols = voxel_downsample(pts, 0.1, cols)
    assert out_pts.shape == (2, 3)
    merged = out_pts[np.argmin(out_pts[:, 0])]
    np.testing.assert_allclose(merged, [0.015, 0.015, 0.015], atol=1e-6)


def test_stream_engine_end_to_end():
    import jax
    import jax.numpy as jnp

    from adaptive_stereo_tpu.models import StereoModel

    h, w = 32, 64
    cfg = ServingConfig(
        model_input_height=h, model_input_width=w, stereonet_k=3, input_scale=0,
        compute_dtype="float32", voxel_disp_scale=2,
        camera_intrinsics=np.array([[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1.0]]),
    )
    model = StereoModel(k=3, input_scale=0)
    rng = np.random.RandomState(0)
    left = rng.rand(h, w, 3).astype(np.float32)
    right = rng.rand(h, w, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(left[None]),
                           jnp.asarray(right[None]), train=False)

    published = {"disp": 0, "cloud": 0}
    engine = StereoDepthEngine(
        cfg, variables=variables,
        on_disparity=lambda img, s, ts: published.__setitem__("disp", published["disp"] + 1),
        on_pointcloud=lambda p, c, ts: published.__setitem__("cloud", published["cloud"] + 1),
    )
    out = engine.process(left, right)
    assert out["disparity"].shape == (h, w)
    assert out["depth"].shape == (h // 4, w // 4)
    assert out["points"].ndim == 2 and out["points"].shape[1] == 3
    assert out["colors"] is not None
    assert published["disp"] == 1 and published["cloud"] == 1
    assert engine.last_inference_sec is not None


def test_async_engine_pipelines():
    import jax
    import jax.numpy as jnp

    from adaptive_stereo_tpu.models import StereoModel
    from adaptive_stereo_tpu.serving import AsyncStereoDepthEngine

    h, w = 32, 64
    cfg = ServingConfig(
        model_input_height=h, model_input_width=w, stereonet_k=3, input_scale=0,
        compute_dtype="float32", voxel_disp_scale=2,
        camera_intrinsics=np.array([[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1.0]]),
    )
    model = StereoModel(k=3, input_scale=0)
    rng = np.random.RandomState(0)
    frames = [(rng.rand(h, w, 3).astype(np.float32),
               rng.rand(h, w, 3).astype(np.float32)) for _ in range(3)]
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(frames[0][0][None]),
                           jnp.asarray(frames[0][1][None]), train=False)

    engine = AsyncStereoDepthEngine(cfg, variables=variables)
    results = []
    for l, r in frames:
        out = engine.submit(l, r)
        if out is not None:
            results.append(out)
    results.append(engine.flush())
    assert len(results) == 3
    for out in results:
        assert out["disparity"].shape == (h, w)
        assert out["points"].shape[1] == 3

    # Pipelined results match the synchronous engine frame-for-frame.
    sync = StereoDepthEngine(cfg, variables=variables)
    ref = sync.process(*frames[0])
    np.testing.assert_allclose(ref["disparity"], results[0]["disparity"], atol=1e-5)
