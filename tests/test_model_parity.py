"""End-to-end StereoNet forward parity vs the reference torch model.

Randomly initializes the reference FeatureExtractorNetwork + StereoNet on CPU,
exports their state dicts, imports them through models.torch_import, and
compares the full forward pass (eval mode and train mode) output-by-output.
This validates: cost volume, 3D aggregation, soft-argmin, bilinear
upsampling semantics, edge-aware refinement, BatchNorm parity, and the
checkpoint importer itself.
"""

import numpy as np
import pytest

from reference_shim import REFERENCE_AVAILABLE

if REFERENCE_AVAILABLE:
    import torch
    from adaptive_stereo.models.stereo_net import (
        FeatureExtractorNetwork as RefFeatureNet,
        StereoNet as RefStereoNet,
    )

import jax.numpy as jnp

from adaptive_stereo_tpu.models import (
    StereoModel,
    import_feature_net_state_dict,
    import_stereo_net_state_dict,
)

pytestmark = pytest.mark.skipif(not REFERENCE_AVAILABLE, reason="reference mount missing")


def _build_pair(k, input_scale, h, w, seed=7):
    torch.manual_seed(seed)
    ref_feat = RefFeatureNet(k)
    ref_stereo = RefStereoNet(k, 1, input_scale, maxdisp=192)

    rng = np.random.RandomState(seed)
    left = rng.rand(2, h, w, 3).astype(np.float32)
    right = rng.rand(2, h, w, 3).astype(np.float32)

    fp, fs = import_feature_net_state_dict(ref_feat.state_dict(), k)
    sp, ss = import_stereo_net_state_dict(ref_stereo.state_dict())
    variables = {
        "params": {"feature_net": fp, "stereo_net": sp},
        "batch_stats": {"feature_net": fs, "stereo_net": ss},
    }
    return ref_feat, ref_stereo, variables, left, right


def _ref_forward(ref_feat, ref_stereo, left, right, train):
    if train:
        ref_feat.train(); ref_stereo.train()
    else:
        ref_feat.eval(); ref_stereo.eval()
    with torch.no_grad():
        lt = torch.from_numpy(np.moveaxis(left, -1, 1).copy())
        rt = torch.from_numpy(np.moveaxis(right, -1, 1).copy())
        fl, fr = ref_feat(lt), ref_feat(rt)
        return ref_stereo(lt, fl, fr, "l", output_cost_volume=True)


@pytest.mark.parametrize("k,input_scale", [(3, 1), (4, 0)])
def test_forward_parity_eval(k, input_scale):
    h, w = 64, 96
    ref_feat, ref_stereo, variables, left, right = _build_pair(k, input_scale, h, w)
    ref_out = _ref_forward(ref_feat, ref_stereo, left, right, train=False)

    model = StereoModel(k=k, input_scale=input_scale)
    ours = model.apply(
        variables, jnp.asarray(left), jnp.asarray(right),
        side="l", output_cost_volume=True, train=False,
    )

    coarse = input_scale + k
    for key, ref_t in ref_out.items():
        ref_np = ref_t.numpy()
        mine = np.asarray(ours[key])
        if key.startswith("pred_disp"):
            mine = np.moveaxis(mine, -1, 1)  # NHWC disp (B,H,W,1) -> (B,1,H,W)
        np.testing.assert_allclose(
            ref_np, mine, atol=2e-3, rtol=1e-4,
            err_msg=f"mismatch for output {key} (k={k}, s={input_scale})",
        )
    assert f"cost_volume_l/{coarse}" in ours


def test_forward_parity_train_mode_batchnorm():
    """Train-mode BN (batch statistics) parity — the mode used during online
    adaptation with batch_size=1 (reference adapt.py:313-314)."""
    k, input_scale, h, w = 3, 1, 64, 96
    ref_feat, ref_stereo, variables, left, right = _build_pair(k, input_scale, h, w)
    ref_out = _ref_forward(ref_feat, ref_stereo, left, right, train=True)

    model = StereoModel(k=k, input_scale=input_scale)
    ours, _mutated = model.apply(
        variables, jnp.asarray(left), jnp.asarray(right),
        side="l", output_cost_volume=True, train=True,
        mutable=["batch_stats"],
    )

    for key, ref_t in ref_out.items():
        ref_np = ref_t.numpy()
        mine = np.asarray(ours[key])
        if key.startswith("pred_disp"):
            mine = np.moveaxis(mine, -1, 1)
        np.testing.assert_allclose(
            ref_np, mine, atol=5e-3, rtol=1e-3,
            err_msg=f"train-mode mismatch for output {key}",
        )


def test_feature_net_state_dict_round_trip():
    """flax -> torch export inverts the importer (live tensors exactly; dead
    conv2 zero-filled for strict loading)."""
    from adaptive_stereo_tpu.models.torch_import import (
        export_feature_net_state_dict,
        import_feature_net_state_dict,
    )

    torch.manual_seed(11)
    ref = RefFeatureNet(3)
    sd0 = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats = import_feature_net_state_dict(sd0, 3)
    sd1 = export_feature_net_state_dict(params, stats, 3)
    for key, v0 in sd0.items():
        if ".conv2." in key:
            continue  # dead tensors; export zero-fills
        np.testing.assert_array_equal(v0, sd1[key], err_msg=key)
    # Exported dict loads strictly into a fresh torch model.
    ref2 = RefFeatureNet(3)
    ref2.load_state_dict({k: torch.from_numpy(np.asarray(v).copy())
                          for k, v in sd1.items()}, strict=True)


def test_stereo_net_state_dict_round_trip():
    from adaptive_stereo_tpu.models.torch_import import (
        export_stereo_net_state_dict,
        import_stereo_net_state_dict,
    )

    torch.manual_seed(12)
    ref = RefStereoNet(3, 1, 1, maxdisp=192)
    sd0 = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats = import_stereo_net_state_dict(sd0)
    sd1 = export_stereo_net_state_dict(params, stats)
    for key, v0 in sd0.items():
        if ".conv2." in key:
            continue
        np.testing.assert_array_equal(v0, sd1[key], err_msg=key)
    ref2 = RefStereoNet(3, 1, 1, maxdisp=192)
    ref2.load_state_dict({k: torch.from_numpy(np.asarray(v).copy())
                          for k, v in sd1.items()}, strict=True)


@pytest.mark.slow
def test_forward_parity_eval_full_paper_resolution():
    """Forward parity at the PAPER configuration — 320x960, k=4, s=0
    (experiments/adaptation/adapt_vs_er.sh) — where the refinement/upsample
    paths traverse the full interpolation extents (VERDICT r1 item 3a).
    Batch 1, eval mode, imported torch weights."""
    k, input_scale, h, w = 4, 0, 320, 960
    ref_feat, ref_stereo, variables, left, right = _build_pair(
        k, input_scale, h, w)
    left, right = left[:1], right[:1]
    ref_out = _ref_forward(ref_feat, ref_stereo, left, right, train=False)

    model = StereoModel(k=k, input_scale=input_scale)
    ours = model.apply(
        variables, jnp.asarray(left), jnp.asarray(right),
        side="l", output_cost_volume=True, train=False,
    )
    for key, ref_t in ref_out.items():
        ref_np = ref_t.numpy()
        mine = np.asarray(ours[key])
        if key.startswith("pred_disp"):
            mine = np.moveaxis(mine, -1, 1)
        np.testing.assert_allclose(
            ref_np, mine, atol=5e-3, rtol=1e-4,
            err_msg=f"full-res mismatch for output {key}",
        )


@pytest.mark.slow
def test_bf16_vs_f32_disparity_delta_full_resolution():
    """Quantify the bfloat16-compute disparity delta at the paper resolution
    (VERDICT r1 item 3b / ROADMAP item 4): same imported weights, same input,
    dtype=bfloat16 vs float32 forwards; the refined disparity must stay
    within a sub-pixel envelope of the f32 path."""
    k, input_scale, h, w = 4, 0, 320, 960
    _, _, variables, left, right = _build_pair(k, input_scale, h, w)
    left, right = left[:1], right[:1]

    preds = {}
    for name, dtype in (("f32", None), ("bf16", jnp.bfloat16)):
        model = StereoModel(k=k, input_scale=input_scale, dtype=dtype)
        out = model.apply(
            variables, jnp.asarray(left), jnp.asarray(right),
            side="l", output_cost_volume=False, train=False,
        )
        preds[name] = np.asarray(out[f"pred_disp_l/{input_scale}"],
                                 np.float32)

    delta = np.abs(preds["bf16"] - preds["f32"])
    mean_d, p99_d, max_d = (float(delta.mean()),
                            float(np.percentile(delta, 99)),
                            float(delta.max()))
    print(f"\n[bf16-delta @320x960 k=4] mean={mean_d:.4f}px "
          f"p99={p99_d:.4f}px max={max_d:.4f}px "
          f"(disp range {preds['f32'].min():.2f}..{preds['f32'].max():.2f})")
    # Random-weight disparities span ~tens of px; bf16 wobble must stay
    # sub-pixel in the mean and low single-pixel at the tail.
    assert mean_d < 0.5, mean_d
    assert p99_d < 2.0, p99_d
