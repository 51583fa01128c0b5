"""Engine step-function tests: shapes, masked updates, determinism."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adaptive_stereo_tpu.engine import (
    create_train_state,
    make_adapt_forward_backward,
    make_apply_updates,
    make_eval_step,
    make_infer_step,
    make_ovs_validate_step,
    make_train_step,
)
from adaptive_stereo_tpu.models import StereoModel

K, S = 3, 1
H, W = 32, 64


@pytest.fixture(scope="module")
def setup():
    model = StereoModel(k=K, input_scale=S)
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    right = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), left, right, learning_rate=1e-4)

    def batch(with_gt=True):
        b = {f"color_l/{S}": left, f"color_r/{S}": right}
        if with_gt:
            b[f"gt_disp_l/{S}"] = jnp.asarray(rng.rand(1, H, W, 1) * 10, jnp.float32)
        return b

    return model, state, batch


def test_train_step_decreases_loss(setup):
    model, state, batch = setup
    b = batch()
    step = make_train_step(model, state.tx, S, [S, S + K], clip_grad_norm=True)
    state1, losses1 = step(state, b)
    for _ in range(4):
        state1, losses = step(state1, b)
    assert float(losses["total_loss"]) < float(losses1["total_loss"])
    assert int(state1.step) == 5


@pytest.mark.slow
def test_adapt_fwd_bwd_and_masked_update(setup):
    model, state, batch = setup
    b = batch()
    er = batch()
    fwd_bwd = make_adapt_forward_backward(model, S, K, use_er=True)
    apply_up = make_apply_updates(clip_grad_norm=True)

    grads, new_stats, aux = fwd_bwd(state.params, state.batch_stats, b, er)
    assert "Monodepth/total_loss" in aux and "Replay/total_loss" in aux
    assert "fcs_raw" in aux and "EPE" in aux
    assert np.isfinite(float(aux["Monodepth/total_loss"]))

    # do_update=True changes params; do_update=False leaves them bit-identical.
    s_up = apply_up(state, grads, new_stats, jnp.asarray(True))
    s_skip = apply_up(state, grads, new_stats, jnp.asarray(False))

    diff = jax.tree.map(lambda a, b_: float(jnp.max(jnp.abs(a - b_))), s_up.params, state.params)
    assert max(jax.tree.leaves(diff)) > 0
    same = jax.tree.map(
        lambda a, b_: bool(jnp.all(a == b_)), s_skip.params, state.params
    )
    assert all(jax.tree.leaves(same))
    # BN stats updated in both cases (mirrors reference train-mode forwards).
    changed = jax.tree.map(
        lambda a, b_: float(jnp.max(jnp.abs(a - b_))), s_skip.batch_stats, state.batch_stats
    )
    assert max(jax.tree.leaves(changed)) > 0


def test_infer_step_no_mutation(setup):
    model, state, batch = setup
    infer = make_infer_step(model, S, K)
    aux, pred = infer(state.params, state.batch_stats, batch())
    assert pred.shape == (1, H, W, 1)
    assert np.isfinite(float(aux["fcs_raw"]))


def test_eval_step_metrics(setup):
    model, state, batch = setup
    ev = make_eval_step(model, S, K)
    metrics = ev(state.params, state.batch_stats, batch())
    for k in ("EPE", "FCS", "D1_all_2px", "D1_all_3px", "D1_all_4px", "D1_all_5px"):
        assert k in metrics
        assert np.isfinite(float(metrics[k]))
    assert 0.0 <= float(metrics["D1_all_3px"]) <= 1.0


def test_ovs_validate_batched_matches_single(setup):
    model, state, batch = setup
    rng = np.random.RandomState(3)
    lefts = jnp.asarray(rng.rand(4, H, W, 3), jnp.float32)
    rights = jnp.asarray(rng.rand(4, H, W, 3), jnp.float32)
    validate = make_ovs_validate_step(model, S)
    losses = validate(state.params, state.batch_stats, lefts, rights)
    assert losses.shape == (4,)

    infer = make_infer_step(model, S, K)
    for i in range(4):
        aux, _ = infer(
            state.params, state.batch_stats,
            {f"color_l/{S}": lefts[i : i + 1], f"color_r/{S}": rights[i : i + 1]},
        )
        np.testing.assert_allclose(
            float(aux["Monodepth/total_loss"]), float(losses[i]), rtol=2e-4
        )
