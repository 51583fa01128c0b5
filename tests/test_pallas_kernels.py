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

# Heavy engine/kernel runs: the slow tier (see README 'Running the tests').
pytestmark = pytest.mark.slow


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


# ---------------------------------------------------------------------------
# Fused 3D-conv aggregation stack (ops/pallas/aggregation.py)
# Reference: adaptive_stereo/models/stereo_net.py:155-162,185-187.
# ---------------------------------------------------------------------------

def _agg_params(rng, scale=0.1):
    return {
        "kernels": jnp.asarray(rng.randn(4, 3, 3, 3, 32, 32) * scale, jnp.float32),
        "biases": jnp.asarray(rng.randn(4, 32) * scale, jnp.float32),
        "scales": jnp.asarray(1 + rng.randn(4, 32) * scale, jnp.float32),
        "bn_biases": jnp.asarray(rng.randn(4, 32) * scale, jnp.float32),
        "final_kernel": jnp.asarray(rng.randn(3, 3, 3, 32, 1) * scale, jnp.float32),
        "final_bias": jnp.asarray(rng.randn(1) * scale, jnp.float32),
    }


def _agg_run_stats(rng):
    return (jnp.asarray(rng.randn(4, 32) * 0.05, jnp.float32),
            jnp.asarray(1 + rng.rand(4, 32) * 0.1, jnp.float32))


@pytest.mark.parametrize("b,d,h,w", [(1, 12, 4, 8), (2, 12, 6, 12)])
@pytest.mark.parametrize("train", [True, False])
def test_aggregation_kernel_matches_jnp(b, d, h, w, train):
    from adaptive_stereo_tpu.ops.pallas import (
        aggregate_cost_volume_pallas, aggregate_cost_volume_ref)

    rng = np.random.RandomState(b * 100 + d)
    params = _agg_params(rng)
    rs = _agg_run_stats(rng)
    cost = jnp.asarray(rng.randn(b, d, h, w, 32), jnp.float32)

    o_ref, mu_r, var_r = aggregate_cost_volume_ref(cost, params, rs, train)
    o_pl, mu_p, var_p = aggregate_cost_volume_pallas(cost, params, rs, train)
    np.testing.assert_allclose(np.asarray(o_pl), np.asarray(o_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mu_p), np.asarray(mu_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var_p), np.asarray(var_r),
                               rtol=1e-4, atol=1e-5)
    if not train:  # eval echoes the running stats exactly
        np.testing.assert_array_equal(np.asarray(mu_p), np.asarray(rs[0]))


def test_aggregation_kernel_vjp_matches_jnp():
    """Gradients through the custom VJP == jax.grad of the golden twin, for
    the cost volume and every parameter leaf."""
    import jax
    from adaptive_stereo_tpu.ops.pallas import (
        aggregate_cost_volume_pallas, aggregate_cost_volume_ref)

    rng = np.random.RandomState(7)
    params = _agg_params(rng)
    rs = _agg_run_stats(rng)
    cost = jnp.asarray(rng.randn(1, 12, 4, 8, 32), jnp.float32)

    def loss_p(c, p):
        return jnp.sum(aggregate_cost_volume_pallas(c, p, rs, True)[0] ** 2)

    def loss_r(c, p):
        return jnp.sum(aggregate_cost_volume_ref(c, p, rs, True)[0] ** 2)

    gc_p, gp_p = jax.grad(loss_p, argnums=(0, 1))(cost, params)
    gc_r, gp_r = jax.grad(loss_r, argnums=(0, 1))(cost, params)
    np.testing.assert_allclose(np.asarray(gc_p), np.asarray(gc_r),
                               rtol=1e-3, atol=1e-4)
    for key in params:
        np.testing.assert_allclose(np.asarray(gp_p[key]), np.asarray(gp_r[key]),
                                   rtol=1e-3, atol=2e-3, err_msg=key)


def test_aggregation_kernel_unsupported_shapes_raise():
    from adaptive_stereo_tpu.ops.pallas import (
        aggregate_cost_volume_pallas, aggregation_pallas_supported)

    rng = np.random.RandomState(1)
    params = _agg_params(rng)
    rs = _agg_run_stats(rng)
    bad = jnp.asarray(rng.randn(1, 4, 4, 6, 32), jnp.float32)  # W % 4 != 0
    assert not aggregation_pallas_supported(bad.shape, bad.dtype)
    with pytest.raises(ValueError):
        aggregate_cost_volume_pallas(bad, params, rs, True)
    # Working sets beyond the VMEM budget are rejected (the model falls back
    # to the golden twin for these).
    assert not aggregation_pallas_supported((8, 12, 40, 120, 32), jnp.float32)
    assert aggregation_pallas_supported((2, 12, 20, 60, 32), jnp.bfloat16)


@pytest.mark.parametrize("train", [True, False])
def test_model_with_pallas_aggregation_matches_without(train):
    """StereoModel(pallas_aggregation=True): identical variable tree and
    init values; forward outputs and batch-stat updates match the standard
    stack in both BN modes."""
    import jax
    from adaptive_stereo_tpu.models import StereoModel

    rng = np.random.RandomState(3)
    K, S, H, W = 3, 1, 32, 64
    left = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    right = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    m0 = StereoModel(k=K, input_scale=S)
    m1 = StereoModel(k=K, input_scale=S, pallas_aggregation=True)
    v0 = m0.init(jax.random.PRNGKey(0), left, right, train=False)
    v1 = m1.init(jax.random.PRNGKey(0), left, right, train=False)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    o0, mut0 = m0.apply(v0, left, right, train=train, output_cost_volume=True,
                        mutable=["batch_stats"])
    o1, mut1 = m1.apply(v0, left, right, train=train, output_cost_volume=True,
                        mutable=["batch_stats"])
    for key in o0:
        np.testing.assert_allclose(np.asarray(o0[key]), np.asarray(o1[key]),
                                   rtol=1e-4, atol=2e-4, err_msg=key)
    for a, b in zip(jax.tree.leaves(mut0), jax.tree.leaves(mut1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


FUSED_HEAD_DOC = """
Fused coarse head (ops/pallas/coarse_head.py): cost-volume build +
aggregation + soft-argmin + FCS in one kernel.
Reference: stereo_net.py:169-192 + feature_contrast.py:12-23.
"""


@pytest.mark.parametrize("b,d,h,w", [(1, 12, 8, 16), (2, 5, 6, 12)])
@pytest.mark.parametrize("train", [True, False])
def test_coarse_head_kernel_matches_aggregation_kernel(b, d, h, w, train):
    """The fused head must add ZERO numerics on top of the (already
    parity-tested) aggregation kernel: its in-kernel cost-volume build and
    soft-argmin/FCS epilogue match the composed ops exactly. (Drift vs the
    pure-XLA twin is the aggregation stack's known f32 reassociation band,
    bounded separately below.)"""
    from adaptive_stereo_tpu.ops.pallas import (
        aggregate_cost_volume_pallas, coarse_head_pallas)

    rng = np.random.RandomState(b * 10 + d)
    params = _agg_params(rng)
    rs = _agg_run_stats(rng)
    fl = jnp.asarray(rng.randn(b, h, w, 32), jnp.float32)
    fr = jnp.asarray(rng.randn(b, h, w, 32), jnp.float32)

    disp, fcs, mu, var = coarse_head_pallas(fl, fr, params, rs, d, train)
    cost5 = difference_cost_volume(fl, fr, d)
    out, mu2, var2 = aggregate_cost_volume_pallas(cost5, params, rs, train)
    cost = out.astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(disp),
                               np.asarray(soft_argmin(cost, axis=1)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fcs),
                               np.asarray(feature_contrast_mean(cost)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(mu), np.asarray(mu2))
    np.testing.assert_array_equal(np.asarray(var), np.asarray(var2))


def test_coarse_head_kernel_vjp_matches_jnp():
    """Disparity gradients == jax.grad of the XLA twin (the VJP remats it);
    FCS is stop-gradient; run_stats get zeros."""
    import jax
    from adaptive_stereo_tpu.ops.pallas import coarse_head_pallas, coarse_head_ref

    rng = np.random.RandomState(11)
    params = _agg_params(rng)
    rs = _agg_run_stats(rng)
    fl = jnp.asarray(rng.randn(1, 8, 16, 32), jnp.float32)
    fr = jnp.asarray(rng.randn(1, 8, 16, 32), jnp.float32)

    def loss_p(fl, fr, p):
        return jnp.sum(coarse_head_pallas(fl, fr, p, rs, 12, True)[0] ** 2)

    def loss_r(fl, fr, p):
        return jnp.sum(coarse_head_ref(fl, fr, p, rs, True, 12)[0] ** 2)

    g_p = jax.grad(loss_p, argnums=(0, 1, 2))(fl, fr, params)
    g_r = jax.grad(loss_r, argnums=(0, 1, 2))(fl, fr, params)
    # The forward values feeding the cotangent differ by the aggregation
    # stack's reassociation band (rtol 1e-4), which the squared loss doubles.
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-3)


def test_coarse_head_unsupported_shapes_raise():
    from adaptive_stereo_tpu.ops.pallas import (
        coarse_head_pallas, coarse_head_pallas_supported)

    rng = np.random.RandomState(2)
    params = _agg_params(rng)
    rs = _agg_run_stats(rng)
    assert not coarse_head_pallas_supported((1, 4, 6, 32), 4)   # W % 4
    assert not coarse_head_pallas_supported((1, 4, 8, 32), 2)   # D < 3
    assert not coarse_head_pallas_supported((8, 40, 120, 32), 12)  # VMEM
    assert coarse_head_pallas_supported((1, 20, 60, 32), 12, jnp.bfloat16)
    bad = jnp.asarray(rng.randn(1, 4, 6, 32), jnp.float32)
    with pytest.raises(ValueError):
        coarse_head_pallas(bad, bad, params, rs, 4, True)


@pytest.mark.parametrize("train", [True, False])
def test_model_with_fused_coarse_head_matches_without(train):
    """StereoModel(fused_coarse_head=True): identical variable tree/init;
    forward outputs (incl. the fused FCS map) and batch-stat updates match
    the standard path within the aggregation stack's parity band."""
    import jax
    from adaptive_stereo_tpu.models import StereoModel
    from adaptive_stereo_tpu.ops import feature_contrast_mean as fcs_ref

    rng = np.random.RandomState(3)
    K, S, H, W = 3, 1, 32, 64
    left = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    right = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    m0 = StereoModel(k=K, input_scale=S)
    m1 = StereoModel(k=K, input_scale=S, fused_coarse_head=True)
    v0 = m0.init(jax.random.PRNGKey(0), left, right, train=False)
    v1 = m1.init(jax.random.PRNGKey(0), left, right, train=False)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    o0, mut0 = m0.apply(v0, left, right, train=train, output_cost_volume=True,
                        mutable=["batch_stats"])
    o1, mut1 = m1.apply(v0, left, right, train=train,
                        mutable=["batch_stats"])
    cs = S + K
    np.testing.assert_allclose(
        np.asarray(o1[f"fcs_l/{cs}"]),
        np.asarray(fcs_ref(o0[f"cost_volume_l/{cs}"])),
        rtol=1e-4, atol=2e-4)
    for key in o1:
        if key.startswith("fcs"):
            continue
        np.testing.assert_allclose(np.asarray(o0[key]), np.asarray(o1[key]),
                                   rtol=1e-4, atol=2e-4, err_msg=key)
    for a, b in zip(jax.tree.leaves(mut0), jax.tree.leaves(mut1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_aggregation_kernel_eval_bf16_consistent_stats():
    """Eval-mode bf16 parity under CONSISTENT running stats (the serving
    regime: rs ~ the activation distribution). With arbitrary rs the
    normalization stops bounding layer-to-layer growth and legitimate bf16
    noise amplifies exponentially in both paths — that regime is outside the
    serving contract (measured: random rs -> maxd 1.6 vs consistent rs ->
    0.094 at paper shape; scripts/exp_agg_eval.py for the TPU run)."""
    from adaptive_stereo_tpu.ops.pallas import (
        aggregate_cost_volume_pallas, aggregate_cost_volume_ref)

    rng = np.random.RandomState(3)
    params = _agg_params(rng)
    cost = jnp.asarray(rng.randn(1, 12, 4, 8, 32), jnp.bfloat16)
    # rs := this data's own batch statistics (what training would converge to)
    _, mu, var = aggregate_cost_volume_ref(
        cost, params, (jnp.zeros((4, 32)), jnp.ones((4, 32))), True)

    o_ref = np.asarray(
        aggregate_cost_volume_ref(cost, params, (mu, var), False)[0], np.float32)
    o_pl = np.asarray(
        aggregate_cost_volume_pallas(cost, params, (mu, var), False)[0], np.float32)
    tol = 0.05 + 0.05 * np.abs(o_ref)
    bad = int((np.abs(o_pl - o_ref) > tol).sum())
    assert bad == 0, (bad, float(np.abs(o_pl - o_ref).max()))
