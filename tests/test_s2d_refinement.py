"""Space-to-depth refinement tower equivalence (models/s2d_refinement.py):
identical parameter tree, forward/backward equal to the native-layout
EdgeAwareRefinement up to float reassociation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_stereo_tpu.models import StereoModel
from adaptive_stereo_tpu.models.s2d_refinement import (
    EdgeAwareRefinementS2D,
    depth_to_space,
    scatter_kernel_s2d,
    space_to_depth,
)
from adaptive_stereo_tpu.models.stereo_net import EdgeAwareRefinement

K, S, H, W = 3, 1, 64, 96


def test_space_to_depth_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 8, 12, 5), jnp.float32)
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x))),
                                  np.asarray(x))


def test_scattered_kernel_matches_native_conv():
    """A conv with the phase-scattered s2d kernel on the s2d layout equals
    the native conv for every dilation used by the tower."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 32, 48, 6), jnp.float32)
    for dil in (1, 2, 4, 8):
        k = jnp.asarray(rng.rand(3, 3, 6, 7) - 0.5, jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), [(dil, dil)] * 2, rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        k2, dil2 = scatter_kernel_s2d(k, dil)
        got = jax.lax.conv_general_dilated(
            space_to_depth(x), k2, (1, 1), [(dil2, dil2)] * 2,
            rhs_dilation=(dil2, dil2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(depth_to_space(got)),
                                   np.asarray(ref), atol=2e-5, rtol=1e-5,
                                   err_msg=f"dilation {dil}")


@pytest.mark.slow
def test_refinement_s2d_equivalence():
    rng = np.random.RandomState(0)
    coarse = jnp.asarray(rng.rand(1, 8, 12) * 6, jnp.float32)
    guide = jnp.asarray(rng.rand(1, 64, 96, 3), jnp.float32)
    m0, m1 = EdgeAwareRefinement(), EdgeAwareRefinementS2D()
    v = m0.init(jax.random.PRNGKey(1), coarse, guide, train=False)
    # identical parameter trees
    v1 = m1.init(jax.random.PRNGKey(1), coarse, guide, train=False)
    assert (jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v1))
    assert jax.tree.map(lambda a: a.shape, v) == jax.tree.map(lambda a: a.shape, v1)

    o0 = m0.apply(v, coarse, guide, train=False)
    o1 = m1.apply(v, coarse, guide, train=False)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                               atol=1e-3, rtol=1e-5)

    def loss(m, variables, c, g):
        return jnp.sum(m.apply(variables, c, g, train=False) ** 2)

    gp0 = jax.grad(lambda p: loss(m0, {**v, "params": p}, coarse, guide))(v["params"])
    gp1 = jax.grad(lambda p: loss(m1, {**v, "params": p}, coarse, guide))(v["params"])
    for a, b in zip(jax.tree.leaves(gp0), jax.tree.leaves(gp1)):
        ad = float(jnp.abs(a - b).max())
        am = float(jnp.abs(a).max())
        assert ad <= 1e-4 * max(am, 1e-6), (ad, am)


def test_full_model_s2d_forward_and_stats():
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    right = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    m0 = StereoModel(k=K, input_scale=S)
    m1 = StereoModel(k=K, input_scale=S, s2d_refinement=True)
    v = m0.init(jax.random.PRNGKey(0), left, right, train=False)
    assert (jax.tree_util.tree_structure(v) ==
            jax.tree_util.tree_structure(
                m1.init(jax.random.PRNGKey(0), left, right, train=False)))

    for train in (False, True):
        kw = dict(mutable=["batch_stats"]) if train else {}
        o0 = m0.apply(v, left, right, side="l", train=train, **kw)
        o1 = m1.apply(v, left, right, side="l", train=train, **kw)
        if train:
            (o0, mut0), (o1, mut1) = o0, o1
            for a, b in zip(jax.tree.leaves(mut0["batch_stats"]),
                            jax.tree.leaves(mut1["batch_stats"])):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-3, rtol=1e-4)
        for key in o0:
            np.testing.assert_allclose(np.asarray(o0[key]), np.asarray(o1[key]),
                                       atol=1e-3, rtol=1e-4, err_msg=key)
