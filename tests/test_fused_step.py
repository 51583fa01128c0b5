"""The fused single-dispatch adapt step must be numerically identical to the
two-phase (fwd_bwd + apply) reference path, for both gate outcomes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_stereo_tpu.engine import (
    create_train_state,
    init_fcs_ema,
    make_adapt_forward_backward,
    make_apply_updates,
    make_fused_adapt_step,
)
from adaptive_stereo_tpu.models import StereoModel

K, S, H, W = 3, 1, 32, 64


@pytest.fixture(scope="module")
def setup():
    model = StereoModel(k=K, input_scale=S)
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    right = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(1, H, W, 1) * 8, jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), left, right, 1e-4)
    batch = {f"color_l/{S}": left, f"color_r/{S}": right, f"gt_disp_l/{S}": gt}
    return model, state, batch


def tree_equal(a, b):
    return all(jax.tree.leaves(jax.tree.map(lambda x, y: bool(jnp.all(x == y)), a, b)))


def copy_state(state):
    """The fused step donates its input state; tests keep an original."""
    return state.replace(
        step=jnp.copy(state.step),
        params=jax.tree.map(jnp.copy, state.params),
        batch_stats=jax.tree.map(jnp.copy, state.batch_stats),
        opt_state=jax.tree.map(jnp.copy, state.opt_state),
    )


@pytest.mark.slow
def test_fused_matches_two_phase_update(setup):
    model, state, batch = setup

    fwd_bwd = make_adapt_forward_backward(model, S, K, use_er=True)
    apply_up = make_apply_updates(clip_grad_norm=True)
    grads, stats, aux2 = fwd_bwd(state.params, state.batch_stats, batch, batch)
    ref_state = apply_up(state, grads, stats, jnp.asarray(True))

    fused = make_fused_adapt_step(model, S, K, use_er=True, use_vs=True,
                                  ood_threshold=-1e9,  # nothing is novel
                                  clip_grad_norm=True)
    new_state, ema, aux = fused(copy_state(state), init_fcs_ema(), batch, batch,
                                jnp.asarray(False))

    # Different XLA programs may reorder float ops; require near-identity.
    def tree_close(a, b, tol=1e-6):
        diffs = jax.tree.map(
            lambda x, y: float(jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32)))), a, b)
        return max(jax.tree.leaves(diffs)) <= tol

    assert tree_close(new_state.params, ref_state.params)
    assert tree_close(new_state.batch_stats, ref_state.batch_stats)
    np.testing.assert_allclose(float(aux["Monodepth/total_loss"]),
                               float(aux2["Monodepth/total_loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(aux["fcs_raw"]), float(aux2["fcs_raw"]), rtol=1e-6)
    assert bool(aux["do_update"]) is True
    assert bool(aux["novel"]) is False


@pytest.mark.slow
def test_fused_gate_skips_update_on_novel_add(setup):
    model, state, batch = setup
    fused = make_fused_adapt_step(model, S, K, use_er=False, use_vs=True,
                                  ood_threshold=1e9,  # everything is novel
                                  clip_grad_norm=False)
    new_state, ema, aux = fused(copy_state(state), init_fcs_ema(), batch, batch,
                                jnp.asarray(True))
    assert bool(aux["novel"]) is True
    assert bool(aux["did_add"]) is True
    assert bool(aux["do_update"]) is False
    # Params untouched; BN stats still advanced (reference semantics).
    assert tree_equal(new_state.params, state.params)
    changed = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                           new_state.batch_stats, state.batch_stats)
    assert max(jax.tree.leaves(changed)) > 0


@pytest.mark.slow
def test_fused_ema_chains(setup):
    model, state, batch = setup
    fused = make_fused_adapt_step(model, S, K, use_er=False, use_vs=True,
                                  ood_threshold=-1e9, fcs_ema_weight=0.9)
    ema = init_fcs_ema()
    s1, ema, aux1 = fused(copy_state(state), ema, batch, batch, jnp.asarray(False))
    assert float(aux1["fcs_smoothed"]) == pytest.approx(float(aux1["fcs_raw"]), rel=1e-6)
    s2, ema, aux2 = fused(s1, ema, batch, batch, jnp.asarray(False))
    expected = 0.9 * float(aux1["fcs_smoothed"]) + 0.1 * float(aux2["fcs_raw"])
    assert float(aux2["fcs_smoothed"]) == pytest.approx(expected, rel=1e-5)


def test_fused_siamese_feature_tower_eval_exact(setup):
    """fused_siamese=True matches in eval mode to conv-retiling noise (BN
    uses running stats, so batching left+right changes nothing semantically;
    XLA tiles the batch-2 convolutions differently -> ~1e-7 wobble) and
    produces matching predictions in train mode up to BN batching."""
    model, state, batch = setup
    fused_model = StereoModel(k=K, input_scale=S, fused_siamese=True)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    left, right = batch[f"color_l/{S}"], batch[f"color_r/{S}"]
    out_a = model.apply(variables, left, right, side="l",
                        output_cost_volume=True, train=False)
    out_b = fused_model.apply(variables, left, right, side="l",
                              output_cost_volume=True, train=False)
    for key in out_a:
        np.testing.assert_allclose(np.asarray(out_a[key]),
                                   np.asarray(out_b[key]),
                                   atol=1e-4, rtol=1e-4, err_msg=key)

    # Train mode: same keys, finite outputs, close predictions (batch stats
    # now mix the two views — documented deviation).
    out_c, _ = fused_model.apply(variables, left, right, side="l",
                                 output_cost_volume=True, train=True,
                                 mutable=["batch_stats"])
    pred_a, _ = model.apply(variables, left, right, side="l",
                            output_cost_volume=True, train=True,
                            mutable=["batch_stats"])
    # Untrained random BN makes train-mode batch statistics the dominant
    # term; predictions still agree to ~10% relative.
    np.testing.assert_allclose(np.asarray(out_c[f"pred_disp_l/{S}"]),
                               np.asarray(pred_a[f"pred_disp_l/{S}"]),
                               rtol=0.15, atol=1.0)
