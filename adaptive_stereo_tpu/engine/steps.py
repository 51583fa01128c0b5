"""Jitted step functions — each hot loop body is ONE XLA program.

The reference's adaptation loop body (forward + photometric loss + FCS +
replay forward + backward + Adam, reference adapt.py:290-396) is fused here
into a single value_and_grad step. The only host round-trip per step is the
scalar FCS (the OOD/reservoir gate is host logic by design — it owns python
RNG and the image buffer). Parameter updates are applied by a second tiny
jitted function with a traced `do_update` mask, so OOD-gated skip steps reuse
the same compiled executable (no recompilation; SURVEY.md §7 "recompilation
discipline").

BatchNorm semantics mirror the reference exactly: train-mode forwards update
running stats on EVERY forward (including replay forwards and steps whose
gradient update is skipped); eval/DONE-state forwards use running stats and
do not mutate them (reference adapt.py:309-314).
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import optax

from ..ops import (
    feature_contrast_mean,
    khamis_robust_loss,
    khamis_robust_loss_multiscale,
    monodepth_leftright_loss,
    monodepth_single_loss,
)


def mean_fcs_from_outputs(outputs, side: str, coarse: int) -> jnp.ndarray:
    """Mean image FCS: prefers the Pallas fused epilogue's per-pixel map
    (outputs['fcs_<side>/<coarse>']) and falls back to deriving it from the
    cost volume."""
    key = f"fcs_{side}/{coarse}"
    if key in outputs:
        return jnp.mean(outputs[key])
    return jnp.mean(feature_contrast_mean(outputs[f"cost_volume_{side}/{coarse}"]))


def clip_stereo_net_grads(grads: Any, max_norm: float = 1.0) -> Any:
    """Clip ONLY the stereo_net parameter gradients to a global norm.

    Reference quirk preserved: both engines clip stereo_net.parameters() and
    never feature_net's (train.py:220-222, adapt.py:391-392). torch semantics:
    scale by max_norm / (total_norm + 1e-6) when that is < 1.
    """
    sub = grads["stereo_net"]
    leaves = jax.tree.leaves(sub)
    total_norm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
    scale = jnp.minimum(max_norm / (total_norm + 1e-6), 1.0)
    clipped = jax.tree.map(lambda g: g * scale, sub)
    return {**grads, "stereo_net": clipped}


def _epe(pred_disp: jnp.ndarray, gt_disp: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute disparity error over gt > 0 (reference train.py:103)."""
    mask = (gt_disp > 0).astype(jnp.float32)
    err = jnp.abs(pred_disp - gt_disp) * mask
    return jnp.sum(err) / jnp.maximum(jnp.sum(mask), 1.0)


def make_train_step(model, tx, input_scale: int, scales: Sequence[int], clip_grad_norm: bool,
                    train_bn: bool = True):
    """Supervised training step: multiscale Khamis loss + Adam
    (reference train.py:204-223). train_bn=False freezes BatchNorm on running
    stats (used by the exact data-parallel invariant test)."""

    @jax.jit
    def train_step(state, batch):
        left = batch[f"color_l/{input_scale}"]
        right = batch[f"color_r/{input_scale}"]

        def loss_fn(params):
            if train_bn:
                outputs, mut = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    left, right, side="l", output_cost_volume=False, train=True,
                    mutable=["batch_stats"],
                )
                new_stats = mut["batch_stats"]
            else:
                outputs = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    left, right, side="l", output_cost_volume=False,
                    train=False,
                )
                new_stats = state.batch_stats
            losses = khamis_robust_loss_multiscale(
                batch, outputs, scales=scales, gt_disp_scale=input_scale
            )
            return losses["total_loss"], (losses, new_stats)

        (_, (losses, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        if clip_grad_norm:
            grads = clip_stereo_net_grads(grads)
        updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, losses

    return train_step


def make_eval_step(model, input_scale: int, k: int):
    """Per-batch eval metrics — the comparison contract (reference
    train.py:74-126 / SURVEY §3.4): EPE over gt>0, D1-all at 2/3/4/5 px,
    mean image FCS."""
    coarse = input_scale + k

    @jax.jit
    def eval_step(params, batch_stats, batch):
        left = batch[f"color_l/{input_scale}"]
        right = batch[f"color_r/{input_scale}"]
        outputs = model.apply(
            {"params": params, "batch_stats": batch_stats},
            left, right, side="l", output_cost_volume=True, train=False,
        )
        pred = outputs[f"pred_disp_l/{input_scale}"]
        gt = batch[f"gt_disp_l/{input_scale}"]
        mask = (gt > 0)
        maskf = mask.astype(jnp.float32)
        n_valid = jnp.maximum(jnp.sum(maskf), 1.0)
        abs_err = jnp.abs(pred - gt)

        metrics = {"EPE": jnp.sum(abs_err * maskf) / n_valid}
        for t in (2, 3, 4, 5):
            metrics[f"D1_all_{t}px"] = (
                jnp.sum(maskf * (abs_err > t)) / jnp.sum(maskf)
            )
        metrics["FCS"] = mean_fcs_from_outputs(outputs, "l", coarse)
        return metrics

    return eval_step


def make_viz_step(model, input_scale: int):
    """Eval-mode forward returning the raw output dict — feeds the
    TensorBoard image panels (reference train.py:44-71 log_images). Compiled
    lazily on first use, so runs with image logging disabled pay nothing."""

    @jax.jit
    def viz_step(params, batch_stats, batch):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch[f"color_l/{input_scale}"], batch[f"color_r/{input_scale}"],
            side="l", output_cost_volume=False, train=False,
        )

    return viz_step


def make_adapt_loss(
    model,
    input_scale: int,
    k: int,
    smoothness_weight: float = 1e-3,
    er_loss_weight: float = 0.05,
    use_er: bool = False,
    warp_precision: str = "highest",
):
    """The adaptation loss as a pure function of params (reference
    adapt.py:327-396 loop body): main train-mode forward + Monodepth loss
    (+ optional replay forward + Khamis loss), BN stats chained main -> replay
    exactly like the sequential torch forwards.

    Returns loss(params, batch_stats, batch, er_batch) ->
    (total, (losses_dict, new_batch_stats, fcs_raw, pred_disp)).
    Shared by make_adapt_forward_backward (value_and_grad per call) and the
    fused fleet step (parallel/fleet.py), which vmaps it per stream and
    differentiates the gate-weighted SUM instead of per-stream grads.
    """
    coarse = input_scale + k
    # Static disparity bound for the warp's banded one-hot matmul
    # (ops/warp.py): model maxdisp expressed at the loss scale.
    warp_max_disp = -(-model.maxdisp // 2 ** input_scale)

    def loss_fn(p, batch_stats, batch, er_batch):
        left = batch[f"color_l/{input_scale}"]
        right = batch[f"color_r/{input_scale}"]
        outputs, mut = model.apply(
            {"params": p, "batch_stats": batch_stats},
            left, right, side="l", output_cost_volume=True, train=True,
            mutable=["batch_stats"],
        )
        stats = mut["batch_stats"]
        mono_loss, _warped = monodepth_single_loss(
            left, right, outputs[f"pred_disp_l/{input_scale}"], smoothness_weight,
            max_disp=warp_max_disp, warp_precision=warp_precision,
        )
        losses = {"Monodepth/total_loss": mono_loss}
        total = mono_loss
        if use_er:
            er_outputs, mut2 = model.apply(
                {"params": p, "batch_stats": stats},
                er_batch[f"color_l/{input_scale}"],
                er_batch[f"color_r/{input_scale}"],
                side="l", output_cost_volume=False, train=True,
                mutable=["batch_stats"],
            )
            stats = mut2["batch_stats"]
            replay = khamis_robust_loss(
                er_outputs[f"pred_disp_l/{input_scale}"],
                er_batch[f"gt_disp_l/{input_scale}"],
            )
            losses["Replay/total_loss"] = replay
            total = total + er_loss_weight * replay

        fcs_raw = mean_fcs_from_outputs(outputs, "l", coarse)
        pred = outputs[f"pred_disp_l/{input_scale}"]
        return total, (losses, stats, fcs_raw, pred)

    return loss_fn


def make_adapt_forward_backward(
    model,
    input_scale: int,
    k: int,
    smoothness_weight: float = 1e-3,
    er_loss_weight: float = 0.05,
    use_er: bool = False,
    warp_precision: str = "highest",
):
    """Fused adaptation forward+backward (reference adapt.py:327-396 loop body).

    Returns (grads, new_batch_stats, aux) where aux carries every scalar the
    host loop needs: Monodepth loss, optional Replay loss, raw FCS, EPE vs the
    stream's GT (for logging). Train-mode BN: main forward updates stats, then
    the replay forward updates them again, in that order (matching the
    sequential torch forwards).
    """
    loss = make_adapt_loss(model, input_scale, k,
                           smoothness_weight=smoothness_weight,
                           er_loss_weight=er_loss_weight, use_er=use_er,
                           warp_precision=warp_precision)

    @jax.jit
    def fwd_bwd(params, batch_stats, batch, er_batch):
        (_, (losses, new_stats, fcs_raw, pred)), grads = jax.value_and_grad(
            loss, has_aux=True
        )(params, batch_stats, batch, er_batch)

        aux = dict(losses)
        aux["fcs_raw"] = fcs_raw
        gt_key = f"gt_disp_l/{input_scale}"
        if gt_key in batch:
            aux["EPE"] = _epe(pred, batch[gt_key])
        return grads, new_stats, aux

    return fwd_bwd


def make_infer_step(
    model, input_scale: int, k: int, smoothness_weight: float = 1e-3,
    warp_precision: str = "highest",
):
    """Eval-mode stream step for the DONE state (reference adapt.py:309-311):
    forward + Monodepth loss + FCS, no gradients, no BN mutation."""
    coarse = input_scale + k
    # Static disparity bound for the warp's banded one-hot matmul
    # (ops/warp.py): model maxdisp expressed at the loss scale.
    warp_max_disp = -(-model.maxdisp // 2 ** input_scale)

    @jax.jit
    def infer(params, batch_stats, batch):
        left = batch[f"color_l/{input_scale}"]
        right = batch[f"color_r/{input_scale}"]
        outputs = model.apply(
            {"params": params, "batch_stats": batch_stats},
            left, right, side="l", output_cost_volume=True, train=False,
        )
        pred = outputs[f"pred_disp_l/{input_scale}"]
        mono_loss, _ = monodepth_single_loss(left, right, pred, smoothness_weight,
                                             max_disp=warp_max_disp,
                warp_precision=warp_precision)
        aux = {
            "Monodepth/total_loss": mono_loss,
            "fcs_raw": mean_fcs_from_outputs(outputs, "l", coarse),
        }
        gt_key = f"gt_disp_l/{input_scale}"
        if gt_key in batch:
            aux["EPE"] = _epe(pred, batch[gt_key])
        return aux, pred

    return infer


def make_apply_updates(clip_grad_norm: bool):
    """Masked Adam update: do_update=False keeps params and optimizer state
    bit-identical while reusing the same compiled step (the reference instead
    python-branches around optimizer.step(), adapt.py:380-396)."""

    @jax.jit
    def apply(state, grads, new_batch_stats, do_update):
        if clip_grad_norm:
            grads = clip_stereo_net_grads(grads)
        updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        def select(new, old):
            return jax.tree.map(
                lambda n, o: jnp.where(do_update, n, o), new, old
            )

        return state.replace(
            step=state.step + 1,
            params=select(new_params, state.params),
            opt_state=select(new_opt_state, state.opt_state),
            batch_stats=new_batch_stats,
        )

    return apply


def make_fused_adapt_step(
    model,
    input_scale: int,
    k: int,
    smoothness_weight: float = 1e-3,
    er_loss_weight: float = 0.05,
    use_er: bool = False,
    use_vs: bool = False,
    ood_threshold: float = 15.0,
    fcs_ema_weight: float = 0.999,
    clip_grad_norm: bool = False,
    use_leftright: bool = False,
    consistency_weight: float = 1e-3,
    gate: str = "fcs",
    gate_apply=None,
    warp_precision: str = "highest",
):
    """The WHOLE adaptation step as ONE XLA program: forward + Monodepth loss
    + FCS + replay + backward + OOD gate + masked Adam update.

    Dispatch-bound profiling on the TPU tunnel showed a separate apply call
    costs ~4 ms of pure overhead; fusing removes it. To make the update mask
    computable on device, the FCS EMA lives on device ((value, initialized)
    scalars) and the reservoir's accept/reject decision — which depends only
    on stream state, never on this frame's FCS — is pre-drawn on the host and
    passed in as `would_add_if_novel`:

        novel     = smoothed_fcs < ood_threshold          (VS modes only)
        did_add   = novel & would_add_if_novel
        do_update = ~did_add

    The host commits the reservoir mutation after reading back `did_add`
    (one scalar sync per step, overlapped with device compute). This
    executable serves the IN_PROGRESS state; DONE uses make_infer_step.

    use_leftright: the left-right consistency variant — the INTENT of the
    reference's broken L-R path (predict both views via the flipped-batch
    trick, adapt.py:40-62, with the fixed occlusion-masked loss
    ops.monodepth_leftright_loss; the committed reference version is dead
    code, see ops/losses.py). FCS comes from the left-centered half of the
    batched cost volume.

    gate: novelty signal feeding the OOD gate (VS modes).
      "fcs" (default): novel iff smoothed FCS < ood_threshold (the live
      reference path, adapt.py:351-378).
      "reconstruction": novel iff an image-reconstruction score EXCEEDS
      ood_threshold (the reference's deprecated graveyard approach,
      graveyard/adapt_vae.py ~:400-420: `recon_loss.item() > opt.ood_threshold`,
      raw — no EMA smoothing). Requires gate_apply(gate_params, left_image)
      -> scalar reconstruction loss (see engine.adapt.make_reconstruction_gate)
      and the returned step takes gate_params as a trailing argument. The FCS
      EMA is still computed and logged for comparison.

    Returns step(state, ema, batch, er_batch, would_add_if_novel[, gate_params])
      -> (new_state, new_ema, aux) where ema = (value, initialized) and aux
      holds fcs_raw/fcs_smoothed/novel/did_add/losses/EPE scalars (plus
      gate_score under the reconstruction gate).
    """
    if gate not in ("fcs", "reconstruction"):
        raise ValueError(f"unknown gate {gate!r}")
    if gate == "reconstruction" and gate_apply is None:
        raise ValueError("gate='reconstruction' requires gate_apply")
    coarse = input_scale + k
    # Static disparity bound for the warp's banded one-hot matmul
    # (ops/warp.py): model maxdisp expressed at the loss scale.
    warp_max_disp = -(-model.maxdisp // 2 ** input_scale)

    def step_body(state, ema, batch, er_batch, would_add_if_novel, gate_params):
        left = batch[f"color_l/{input_scale}"]
        right = batch[f"color_r/{input_scale}"]

        def loss_fn(p):
            if use_leftright:
                # Flipped-batch trick (reference adapt.py:47-58): one siamese
                # forward predicts the left view and the mirrored right view.
                flip = lambda x: x[:, :, ::-1, :]
                left_b = jnp.concatenate([left, flip(right)], axis=0)
                right_b = jnp.concatenate([right, flip(left)], axis=0)
                outputs, mut = model.apply(
                    {"params": p, "batch_stats": state.batch_stats},
                    left_b, right_b, side="x", output_cost_volume=True, train=True,
                    mutable=["batch_stats"],
                )
                stats = mut["batch_stats"]
                both = outputs[f"pred_disp_x/{input_scale}"]
                pred = both[0:1]
                pred_r = flip(both[1:2])
                mono_loss, _ = monodepth_leftright_loss(
                    left, right, pred, pred_r,
                    smoothness_weight, consistency_weight,
                    max_disp=warp_max_disp,
                warp_precision=warp_precision)
                # Left-centered half of the batched cost volume drives FCS.
                cv = outputs[f"cost_volume_x/{coarse}"][0:1]
                fcs_raw_lr = jnp.mean(feature_contrast_mean(cv))
            else:
                outputs, mut = model.apply(
                    {"params": p, "batch_stats": state.batch_stats},
                    left, right, side="l", output_cost_volume=True, train=True,
                    mutable=["batch_stats"],
                )
                stats = mut["batch_stats"]
                pred = outputs[f"pred_disp_l/{input_scale}"]
                mono_loss, _ = monodepth_single_loss(
                    left, right, pred, smoothness_weight,
                    max_disp=warp_max_disp, warp_precision=warp_precision
                )
                fcs_raw_lr = None
            losses = {"Monodepth/total_loss": mono_loss}
            total = mono_loss
            if use_er:
                er_outputs, mut2 = model.apply(
                    {"params": p, "batch_stats": stats},
                    er_batch[f"color_l/{input_scale}"],
                    er_batch[f"color_r/{input_scale}"],
                    side="l", output_cost_volume=False, train=True,
                    mutable=["batch_stats"],
                )
                stats = mut2["batch_stats"]
                replay = khamis_robust_loss(
                    er_outputs[f"pred_disp_l/{input_scale}"],
                    er_batch[f"gt_disp_l/{input_scale}"],
                )
                losses["Replay/total_loss"] = replay
                total = total + er_loss_weight * replay
            if fcs_raw_lr is not None:
                fcs_raw = fcs_raw_lr
            else:
                fcs_raw = mean_fcs_from_outputs(outputs, "l", coarse)
            return total, (losses, stats, fcs_raw, pred)

        (_, (losses, new_stats, fcs_raw, pred)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        # --- device-side FCS EMA + OOD gate ---
        ema_value, ema_init = ema
        smoothed = jnp.where(
            ema_init,
            ema_value * fcs_ema_weight + (1.0 - fcs_ema_weight) * fcs_raw,
            fcs_raw,
        )
        new_ema = (smoothed, jnp.ones((), bool))
        gate_score = None
        if gate == "reconstruction":
            gate_score = gate_apply(gate_params, left)
        if use_vs:
            if gate == "reconstruction":
                # Graveyard direction: HIGH reconstruction error => novel.
                novel = gate_score > ood_threshold
            else:
                novel = smoothed < ood_threshold
            did_add = jnp.logical_and(novel, would_add_if_novel)
        else:
            novel = jnp.zeros((), bool)
            did_add = jnp.zeros((), bool)
        do_update = jnp.logical_not(did_add)

        # --- masked Adam update (same executable) ---
        if clip_grad_norm:
            grads = clip_stereo_net_grads(grads)
        updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        def select(new, old):
            return jax.tree.map(lambda n, o: jnp.where(do_update, n, o), new, old)

        new_state = state.replace(
            step=state.step + 1,
            params=select(new_params, state.params),
            opt_state=select(new_opt_state, state.opt_state),
            batch_stats=new_stats,
        )

        aux = {n: v for n, v in losses.items()}
        aux["fcs_raw"] = fcs_raw
        aux["fcs_smoothed"] = smoothed
        aux["novel"] = novel
        aux["did_add"] = did_add
        aux["do_update"] = do_update
        if gate_score is not None:
            aux["gate_score"] = gate_score
        gt_key = f"gt_disp_l/{input_scale}"
        if gt_key in batch:
            aux["EPE"] = _epe(pred, batch[gt_key])
        return new_state, new_ema, aux

    if gate == "reconstruction":
        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, ema, batch, er_batch, would_add_if_novel, gate_params):
            return step_body(state, ema, batch, er_batch, would_add_if_novel,
                             gate_params)
    else:
        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, ema, batch, er_batch, would_add_if_novel):
            return step_body(state, ema, batch, er_batch, would_add_if_novel,
                             None)

    return step


def init_fcs_ema():
    """Fresh device-side FCS EMA state for make_fused_adapt_step."""
    return (jnp.zeros(()), jnp.zeros((), bool))


def make_ovs_validate_step(model, input_scale: int, smoothness_weight: float = 1e-3,
                           warp_precision: str = "highest"):
    """Recompute the Monodepth loss for every OVS pair in ONE batched
    eval-mode forward (the reference loops per-image, adapt.py:122-142).
    Returns a (N,) vector of per-pair losses."""
    warp_max_disp = -(-model.maxdisp // 2 ** input_scale)

    @jax.jit
    def validate(params, batch_stats, left_stack, right_stack):
        outputs = model.apply(
            {"params": params, "batch_stats": batch_stats},
            left_stack, right_stack, side="l", output_cost_volume=False, train=False,
        )
        pred = outputs[f"pred_disp_l/{input_scale}"]

        def per_item(l, r, p):
            loss, _ = monodepth_single_loss(l[None], r[None], p[None], smoothness_weight,
                                            max_disp=warp_max_disp,
                warp_precision=warp_precision)
            return loss

        return jax.vmap(per_item)(left_stack, right_stack, pred)

    return validate
