"""Flat-state streaming adaptation — minimal-dispatch-payload engine.

Measurement on the remote-dispatch TPU environment: a jitted call's overhead
scales with the NUMBER of argument/result buffers (~0.3 ms each); the fused
pytree step carries ~400 leaves -> ~115 ms/dispatch, dwarfing the ~2 ms of
actual compute. This engine collapses ALL state into a handful of flat f32
vectors:

    theta (P,)  — all parameters, [feature_net | stereo_net] order
    m, v  (P,)  — Adam moments (masked updates preserve skip semantics)
    bn    (B,)  — BatchNorm running stats
    + scalars (count, ema, log ring, reservoir buffers)

Inside the program the vectors are unraveled to pytrees (pure on-device
reshapes/slices, fused by XLA); Adam runs directly on the flat vectors —
torch-parity math (bias correction, eps outside sqrt) with the
stereo-net-only gradient clip expressed as an index-range mask.

Semantics are identical to engine/stream_adapt.py (same device reservoir,
OOD gate, ring log); parity is asserted in tests against the pytree engines.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.flatten_util import ravel_pytree

from ..ops import (
    khamis_robust_loss,
    monodepth_leftright_loss,
    monodepth_single_loss,
)
from .device_reservoir import (
    DeviceReservoir,
    init_device_reservoir,
    reservoir_average_value,
    reservoir_maybe_add,
    reservoir_set_values,
)
from .steps import _epe, mean_fcs_from_outputs
from .stream_adapt import LOG_COLS

ADAM_B1, ADAM_B2, ADAM_EPS = 0.9, 0.999, 1e-8


@struct.dataclass
class FlatStreamState:
    theta: jnp.ndarray       # (P,) parameters
    m: jnp.ndarray           # (P,) Adam first moment
    v: jnp.ndarray           # (P,) Adam second moment
    count: jnp.ndarray       # () int32 Adam step count (applied updates)
    lr: jnp.ndarray          # () f32 learning rate (host-settable)
    bn: jnp.ndarray          # (B,) BatchNorm running stats
    ema_value: jnp.ndarray   # () f32 FCS EMA
    ema_init: jnp.ndarray    # () bool
    reservoir: DeviceReservoir
    log: jnp.ndarray         # (chunk, len(LOG_COLS))
    log_pos: jnp.ndarray     # () int32


class FlatSpec(NamedTuple):
    unravel_params: callable
    unravel_bn: callable
    n_params: int
    n_feature: int           # params [0, n_feature) = feature_net


def make_flat_spec(params, batch_stats) -> FlatSpec:
    flat, unravel_params = ravel_pytree(params)
    feat_flat, _ = ravel_pytree(params["feature_net"])
    bn_flat, unravel_bn = ravel_pytree(batch_stats)
    return FlatSpec(unravel_params, unravel_bn, flat.shape[0], feat_flat.shape[0])


def init_flat_stream_state(params, batch_stats, learning_rate: float,
                           capacity: int, h: int, w: int, log_chunk: int,
                           seed: int = 123) -> Tuple[FlatStreamState, FlatSpec]:
    spec = make_flat_spec(params, batch_stats)
    theta, _ = ravel_pytree(params)
    bn, _ = ravel_pytree(batch_stats)
    return FlatStreamState(
        theta=theta,
        m=jnp.zeros_like(theta),
        v=jnp.zeros_like(theta),
        count=jnp.zeros((), jnp.int32),
        lr=jnp.asarray(learning_rate, jnp.float32),
        bn=bn,
        ema_value=jnp.zeros(()),
        ema_init=jnp.zeros((), bool),
        reservoir=init_device_reservoir(capacity, h, w, 3, seed),
        log=jnp.zeros((log_chunk, len(LOG_COLS)), jnp.float32),
        log_pos=jnp.zeros((), jnp.int32),
    ), spec


def flat_state_to_variables(ss: FlatStreamState, spec: FlatSpec) -> dict:
    return {"params": spec.unravel_params(ss.theta),
            "batch_stats": spec.unravel_bn(ss.bn)}


def make_flat_streaming_steps(
    model,
    spec: FlatSpec,
    input_scale: int,
    k: int,
    smoothness_weight: float = 1e-3,
    er_loss_weight: float = 0.05,
    use_er: bool = False,
    use_vs: bool = False,
    ood_threshold: float = 15.0,
    fcs_ema_weight: float = 0.999,
    clip_grad_norm: bool = False,
    images_uint8: bool = False,
    fused_er_forward: bool = False,
    use_leftright: bool = False,
    consistency_weight: float = 1e-3,
    warp_precision: str = "highest",
    loss_dtype=None,
):
    """Returns (adapt_step, done_step, validate_step, make_done_step_batched)
    over FlatStreamState.

    adapt_step(ss, left, right, gt, er_left, er_right, er_gt, frame_idx)
      — all image args are single (1,H,W,3)/(1,H,W,1) buffers (7 leaves
      total), uint8-transferable with images_uint8=True.

    fused_er_forward: run the stream frame and the replay frame as ONE
      batch-2 siamese forward instead of two sequential batch-1 forwards.
      Same losses and gradients up to BatchNorm batching: batch statistics
      are computed over both frames jointly and running stats update once
      per step (the reference runs two sequential batch-1 train-mode
      forwards, adapt.py:327-349). Documented deviation; substantially
      better MXU utilization on the latency-bound streaming path.

    use_leftright: left-right consistency Monodepth loss via the
      flipped-batch trick (one batch-2 siamese forward predicts the left
      view and the mirrored right view), matching the classic engine's
      make_fused_adapt_step(use_leftright=True) — the INTENT of the
      reference's broken L-R path (adapt.py:316-326 is dead code; see
      ops/losses.py). FCS and the OVS reservoir use the left-centered half
      of the batched outputs. With fused_er_forward the replay frame rides
      the same forward as a third batch row (batch-3; same documented
      BN-batching deviation as above).
    """
    coarse = input_scale + k
    s = input_scale
    # Static disparity bound for the warp's banded one-hot matmul
    # (ops/warp.py): model maxdisp expressed at the loss scale.
    warp_max_disp = -(-model.maxdisp // 2 ** input_scale)

    # loss_dtype (e.g. "bfloat16"): compute the single-sided Monodepth loss
    # pipeline (warp, SSIM pools, smoothness — full-resolution maps) in a
    # reduced dtype. The round-4 roofline analysis showed the adapt step AT
    # its HBM roofline with ~8 ms of f32 full-res loss loop fusions
    # (artifacts/profile_single_r4.log); halving those bytes is a
    # bytes-floor lever for the bf16 production config. None = f32 (parity).
    # Exposed via AdaptConfig.loss_dtype / --loss_dtype (ADVICE r4).
    if loss_dtype is not None and use_leftright:
        # The L-R consistency loss goes through monodepth_leftright_loss,
        # which has no reduced-dtype variant — silently ignoring the option
        # there would misreport the numerics of the run (ADVICE r4, low).
        raise ValueError("loss_dtype is only implemented for the "
                         "single-sided Monodepth path; it cannot be "
                         "combined with use_leftright")
    _loss_dt = jnp.dtype(loss_dtype) if loss_dtype is not None else None

    def mono_loss_cfg(l, r, p):
        if _loss_dt is not None:
            l, r, p = (l.astype(_loss_dt), r.astype(_loss_dt),
                       p.astype(_loss_dt))
        loss, aux = monodepth_single_loss(l, r, p, smoothness_weight,
                                          max_disp=warp_max_disp,
                                          warp_precision=warp_precision)
        return loss.astype(jnp.float32), aux

    def dec(img):
        if images_uint8:
            return img.astype(jnp.float32) / 255.0
        return img

    # Stereo-net-only clip mask over the flat gradient (torch semantics:
    # scale = 1/(norm+1e-6) when norm > 1; reference train.py:220-222).
    stereo_slice = slice(spec.n_feature, spec.n_params)

    def clip_flat(g):
        if not clip_grad_norm:
            return g
        gs = g[stereo_slice]
        norm = jnp.sqrt(jnp.sum(gs * gs))
        scale = jnp.minimum(1.0 / (norm + 1e-6), 1.0)
        return g.at[stereo_slice].multiply(scale)

    def adam_masked(ss, g, do_update):
        new_count = ss.count + 1
        m = ADAM_B1 * ss.m + (1 - ADAM_B1) * g
        v = ADAM_B2 * ss.v + (1 - ADAM_B2) * g * g
        c = new_count.astype(jnp.float32)
        mhat = m / (1 - ADAM_B1 ** c)
        vhat = v / (1 - ADAM_B2 ** c)
        theta = ss.theta - ss.lr * mhat / (jnp.sqrt(vhat) + ADAM_EPS)
        keep = jnp.logical_not(do_update)
        return (
            jnp.where(keep, ss.theta, theta),
            jnp.where(keep, ss.m, m),
            jnp.where(keep, ss.v, v),
            jnp.where(keep, ss.count, new_count),
        )

    def write_log(log, pos, row):
        chunk = log.shape[0]
        return jax.lax.dynamic_update_index_in_dim(log, row, pos % chunk, 0), pos + 1

    @functools.partial(jax.jit, donate_argnums=(0,))
    def adapt_step(ss: FlatStreamState, left_u, right_u, gt, er_left_u,
                   er_right_u, er_gt, frame_idx):
        left, right = dec(left_u), dec(right_u)

        def loss_fn(theta):
            params = spec.unravel_params(theta)
            stats = spec.unravel_bn(ss.bn)
            if use_leftright:
                # Flipped-batch trick (classic engine steps.py:394-415): one
                # siamese forward predicts left and mirrored-right views;
                # with fused ER the replay frame is a third batch row.
                flip = lambda x: x[:, :, ::-1, :]
                rows_l = [left, flip(right)]
                rows_r = [right, flip(left)]
                if use_er and fused_er_forward:
                    rows_l.append(dec(er_left_u))
                    rows_r.append(dec(er_right_u))
                outputs, mut = model.apply(
                    {"params": params, "batch_stats": stats},
                    jnp.concatenate(rows_l, axis=0),
                    jnp.concatenate(rows_r, axis=0),
                    side="l", output_cost_volume=True, train=True,
                    mutable=["batch_stats"],
                )
                stats = mut["batch_stats"]
                preds = outputs[f"pred_disp_l/{s}"]
                pred = preds[0:1]
                mono, _ = monodepth_leftright_loss(
                    left, right, pred, flip(preds[1:2]),
                    smoothness_weight, consistency_weight,
                    max_disp=warp_max_disp,
                warp_precision=warp_precision)
                total = mono
                replay = jnp.zeros(())
                if use_er and fused_er_forward:
                    replay = khamis_robust_loss(preds[2:3], er_gt)
                    total = total + er_loss_weight * replay
                elif use_er:
                    er_out, mut2 = model.apply(
                        {"params": params, "batch_stats": stats},
                        dec(er_left_u), dec(er_right_u),
                        side="l", output_cost_volume=False, train=True,
                        mutable=["batch_stats"],
                    )
                    stats = mut2["batch_stats"]
                    replay = khamis_robust_loss(er_out[f"pred_disp_l/{s}"], er_gt)
                    total = total + er_loss_weight * replay
                # Left-centered rows of the batched outputs drive FCS.
                fcs_outputs = {key: v[0:1] for key, v in outputs.items()}
                fcs_raw = mean_fcs_from_outputs(fcs_outputs, "l", coarse)
                bn_flat, _ = ravel_pytree(stats)
                return total, (mono, replay, bn_flat, fcs_raw, pred)
            if use_er and fused_er_forward:
                # ONE batch-2 siamese forward: [stream frame; replay frame].
                left_b = jnp.concatenate([left, dec(er_left_u)], axis=0)
                right_b = jnp.concatenate([right, dec(er_right_u)], axis=0)
                outputs, mut = model.apply(
                    {"params": params, "batch_stats": stats},
                    left_b, right_b, side="l", output_cost_volume=True,
                    train=True, mutable=["batch_stats"],
                )
                stats = mut["batch_stats"]
                pred_b = outputs[f"pred_disp_l/{s}"]
                mono, _ = mono_loss_cfg(left, right, pred_b[0:1])
                replay = khamis_robust_loss(pred_b[1:2], er_gt)
                total = mono + er_loss_weight * replay
                # Stream-frame half of the batched cost volume drives FCS.
                fcs_outputs = {
                    key: v[0:1] for key, v in outputs.items()}
                fcs_raw = mean_fcs_from_outputs(fcs_outputs, "l", coarse)
                bn_flat, _ = ravel_pytree(stats)
                return total, (mono, replay, bn_flat, fcs_raw, pred_b[0:1])

            outputs, mut = model.apply(
                {"params": params, "batch_stats": stats},
                left, right, side="l", output_cost_volume=True, train=True,
                mutable=["batch_stats"],
            )
            stats = mut["batch_stats"]
            mono, _ = mono_loss_cfg(left, right, outputs[f"pred_disp_l/{s}"])
            total = mono
            replay = jnp.zeros(())
            if use_er:
                er_out, mut2 = model.apply(
                    {"params": params, "batch_stats": stats},
                    dec(er_left_u), dec(er_right_u),
                    side="l", output_cost_volume=False, train=True,
                    mutable=["batch_stats"],
                )
                stats = mut2["batch_stats"]
                replay = khamis_robust_loss(er_out[f"pred_disp_l/{s}"], er_gt)
                total = total + er_loss_weight * replay
            fcs_raw = mean_fcs_from_outputs(outputs, "l", coarse)
            bn_flat, _ = ravel_pytree(stats)
            return total, (mono, replay, bn_flat, fcs_raw,
                           outputs[f"pred_disp_l/{s}"])

        (_, (mono, replay, new_bn, fcs_raw, pred)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(ss.theta)

        epe = _epe(pred, gt)

        smoothed = jnp.where(
            ss.ema_init,
            ss.ema_value * fcs_ema_weight + (1 - fcs_ema_weight) * fcs_raw,
            fcs_raw)
        novel = (smoothed < ood_threshold) if use_vs else jnp.zeros((), bool)
        res, did_add = reservoir_maybe_add(
            ss.reservoir, left, right, mono, frame_idx, novel)
        do_update = jnp.logical_not(did_add)

        theta, m, v, count = adam_masked(ss, clip_flat(g), do_update)

        row = jnp.stack([
            fcs_raw, smoothed, mono, replay, epe,
            novel.astype(jnp.float32), did_add.astype(jnp.float32),
            do_update.astype(jnp.float32)])
        log, pos = write_log(ss.log, ss.log_pos, row)

        return FlatStreamState(
            theta=theta, m=m, v=v, count=count, lr=ss.lr, bn=new_bn,
            ema_value=smoothed, ema_init=jnp.ones((), bool),
            reservoir=res, log=log, log_pos=pos)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def done_step(ss: FlatStreamState, left_u, right_u, gt, frame_idx):
        left, right = dec(left_u), dec(right_u)
        outputs = model.apply(
            {"params": spec.unravel_params(ss.theta),
             "batch_stats": spec.unravel_bn(ss.bn)},
            left, right, side="l", output_cost_volume=True, train=False)
        pred = outputs[f"pred_disp_l/{s}"]
        mono, _ = mono_loss_cfg(left, right, pred)
        fcs_raw = mean_fcs_from_outputs(outputs, "l", coarse)
        epe = _epe(pred, gt)

        smoothed = jnp.where(
            ss.ema_init,
            ss.ema_value * fcs_ema_weight + (1 - fcs_ema_weight) * fcs_raw,
            fcs_raw)
        novel = (smoothed < ood_threshold) if use_vs else jnp.zeros((), bool)
        res, did_add = reservoir_maybe_add(
            ss.reservoir, left, right, mono, frame_idx, novel)

        row = jnp.stack([
            fcs_raw, smoothed, mono, jnp.zeros(()), epe,
            novel.astype(jnp.float32), did_add.astype(jnp.float32),
            jnp.zeros(())])
        log, pos = write_log(ss.log, ss.log_pos, row)
        return ss.replace(ema_value=smoothed, ema_init=jnp.ones((), bool),
                          reservoir=res, log=log, log_pos=pos)

    def make_done_step_batched(n: int):
        """Micro-batched DONE-state inference: N streamed frames in ONE
        dispatch/compiled program (ROADMAP item 6 — the per-frame done_step
        leaves the MXU idle between batch-1 forwards and pays N dispatches).

        Bit-equivalent to N sequential `done_step` calls: the batch-N forward
        runs in eval mode (per-sample independent), per-frame losses/FCS/EPE
        come from a vmap, and the sequential state (FCS EMA chain, reservoir
        adds, ring-log rows) is replayed in order by a lax.scan."""

        def per_sample_fcs(outputs):
            key = f"fcs_l/{coarse}"
            if key in outputs:
                fmap = outputs[key]
            else:
                from ..ops import feature_contrast_mean
                fmap = feature_contrast_mean(outputs[f"cost_volume_l/{coarse}"])
            return jnp.mean(fmap.reshape(fmap.shape[0], -1), axis=1)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def done_step_batched(ss: FlatStreamState, lefts_u, rights_u, gts,
                              frame_idxs):
            lefts, rights = dec(lefts_u), dec(rights_u)  # (N, H, W, 3)
            outputs = model.apply(
                {"params": spec.unravel_params(ss.theta),
                 "batch_stats": spec.unravel_bn(ss.bn)},
                lefts, rights, side="l", output_cost_volume=True, train=False)
            preds = outputs[f"pred_disp_l/{s}"]  # (N, h, w, 1)
            fcs_all = per_sample_fcs(outputs)    # (N,)

            def metrics(l, r, p, g):
                mono, _ = mono_loss_cfg(l[None], r[None], p[None])
                return mono, _epe(p[None], g[None])

            monos, epes = jax.vmap(metrics)(lefts, rights, preds, gts)

            def body(carry, x):
                ema_value, ema_init, res, log, pos = carry
                fcs_raw, mono, epe, l, r, idx = x
                smoothed = jnp.where(
                    ema_init,
                    ema_value * fcs_ema_weight + (1 - fcs_ema_weight) * fcs_raw,
                    fcs_raw)
                novel = (smoothed < ood_threshold) if use_vs \
                    else jnp.zeros((), bool)
                res, did_add = reservoir_maybe_add(res, l, r, mono, idx, novel)
                row = jnp.stack([
                    fcs_raw, smoothed, mono, jnp.zeros(()), epe,
                    novel.astype(jnp.float32), did_add.astype(jnp.float32),
                    jnp.zeros(())])
                log, pos = write_log(log, pos, row)
                return (smoothed, jnp.ones((), bool), res, log, pos), None

            (ema_value, ema_init, res, log, pos), _ = jax.lax.scan(
                body,
                (ss.ema_value, ss.ema_init, ss.reservoir, ss.log, ss.log_pos),
                (fcs_all, monos, epes, lefts, rights, frame_idxs),
                length=n)
            return ss.replace(ema_value=ema_value, ema_init=ema_init,
                              reservoir=res, log=log, log_pos=pos)

        return done_step_batched

    @jax.jit
    def validate_step(ss: FlatStreamState):
        res = ss.reservoir
        outputs = model.apply(
            {"params": spec.unravel_params(ss.theta),
             "batch_stats": spec.unravel_bn(ss.bn)},
            res.left, res.right, side="l", output_cost_volume=False, train=False)
        pred = outputs[f"pred_disp_l/{s}"]

        def per_item(l, r, p):
            loss, _ = mono_loss_cfg(l[None], r[None], p[None])
            return loss

        losses = jax.vmap(per_item)(res.left, res.right, pred)
        cap = losses.shape[0]
        mask = jnp.arange(cap) < res.size
        new_res = reservoir_set_values(res, jnp.where(mask, losses, res.values))
        ss = ss.replace(reservoir=new_res)
        # Mean |disparity| over the filled OVS entries: the guard's second
        # channel. The round-4 paper-scale guard study measured that
        # photometric-consistent collapse (train EPE 107) keeps the OVS
        # loss FLAT at ~0.218 — self-supervised validation is blind to it —
        # while the prediction magnitudes explode
        # (artifacts/paper_scale_r4/ANALYSIS.md).
        mean_disp = (
            jnp.sum(jnp.where(mask[:, None, None, None], jnp.abs(pred), 0.0))
            / jnp.maximum(jnp.sum(mask.astype(jnp.float32))
                          * pred.shape[1] * pred.shape[2] * pred.shape[3], 1.0))
        return ss, reservoir_average_value(new_res), new_res.size, mean_disp

    return adapt_step, done_step, validate_step, make_done_step_batched
