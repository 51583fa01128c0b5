"""Streaming adaptation engine v2 — zero per-step host synchronization.

The portable engine (engine/adapt.py) mirrors the reference loop with one
scalar readback per step. On hardware where a blocking readback costs ~30 ms
(remote TPU dispatch), that sync dominates. This engine moves EVERY per-step
decision into device state so the host only dispatches:

  - FCS EMA + OOD gate: on device (as in the fused step);
  - the OVS reservoir: device-resident (engine/device_reservoir.py) — the
    novel-gated Algorithm-R add, image storage, dedup and RNG all happen
    inside the step;
  - per-step scalars (losses, FCS, EPE, gate decisions): written to a
    device-side ring log, drained by the host in ONE readback per
    validation/logging boundary.

Host work per boundary (every ovs_validate_hz steps): one batched OVS
validation (device) + one scalar readback for the plateau transition; plus a
ring-log drain for TensorBoard/trials bookkeeping.

Semantic deltas vs the reference protocol (all documented, all bounded):
  - reservoir randomness comes from a jax PRNG (identical distribution);
  - while DONE, a novel frame still enters the OVS on device, but the
    RESTART takes effect at the next boundary (bounded lag <= ovs_validate_hz
    frames) instead of the same frame;
  - per-frame console prints become per-boundary summaries.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

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
from .steps import _epe, clip_stereo_net_grads, mean_fcs_from_outputs
import optax

# Ring-log column layout.
LOG_COLS = (
    "fcs_raw", "fcs_smoothed", "mono_loss", "replay_loss", "epe",
    "novel", "did_add", "do_update",
)


@struct.dataclass
class StreamAdaptState:
    train: "TrainState"          # engine.state.TrainState
    ema_value: jnp.ndarray       # () f32
    ema_init: jnp.ndarray        # () bool
    reservoir: DeviceReservoir
    log: jnp.ndarray             # (chunk, len(LOG_COLS)) f32 ring
    log_pos: jnp.ndarray         # () int32


def init_stream_state(train_state, capacity: int, h: int, w: int,
                      log_chunk: int, seed: int = 123) -> StreamAdaptState:
    return StreamAdaptState(
        train=train_state,
        ema_value=jnp.zeros(()),
        ema_init=jnp.zeros((), bool),
        reservoir=init_device_reservoir(capacity, h, w, 3, seed),
        log=jnp.zeros((log_chunk, len(LOG_COLS)), jnp.float32),
        log_pos=jnp.zeros((), jnp.int32),
    )


def make_streaming_steps(
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
    warp_precision: str = "highest",
):
    """Returns (adapt_step, done_step, validate_step):

    adapt_step(ss, batch, er_batch, frame_idx) -> ss      [IN_PROGRESS]
    done_step(ss, batch, frame_idx) -> ss                 [DONE: eval fwd,
        EMA + gated reservoir add still device-side; no param/BN updates]
    validate_step(ss) -> (ss, avg_loss, size, mean_|disp|) [batched OVS pass]
    """
    coarse = input_scale + k
    s = input_scale
    # Static disparity bound for the warp's banded one-hot matmul
    # (ops/warp.py): model maxdisp expressed at the loss scale.
    warp_max_disp = -(-model.maxdisp // 2 ** input_scale)

    def gate_and_log(ss, losses, fcs_raw, epe, left, right, frame_idx,
                     mono_loss):
        smoothed = jnp.where(
            ss.ema_init,
            ss.ema_value * fcs_ema_weight + (1 - fcs_ema_weight) * fcs_raw,
            fcs_raw,
        )
        if use_vs:
            novel = smoothed < ood_threshold
        else:
            novel = jnp.zeros((), bool)
        res, did_add = reservoir_maybe_add(
            ss.reservoir, left, right, mono_loss, frame_idx, novel)
        return smoothed, novel, res, did_add

    def write_log(ss_log, ss_pos, row):
        chunk = ss_log.shape[0]
        log = jax.lax.dynamic_update_index_in_dim(
            ss_log, row, ss_pos % chunk, 0)
        return log, ss_pos + 1

    @functools.partial(jax.jit, donate_argnums=(0,))
    def adapt_step(ss: StreamAdaptState, batch, er_batch, frame_idx):
        train = ss.train
        left = batch[f"color_l/{s}"]
        right = batch[f"color_r/{s}"]

        def loss_fn(p):
            if use_leftright:
                # Flipped-batch trick — see flat_stream.py / steps.py; FCS
                # and the reservoir use the left-centered batch row.
                flip = lambda x: x[:, :, ::-1, :]
                outputs, mut = model.apply(
                    {"params": p, "batch_stats": train.batch_stats},
                    jnp.concatenate([left, flip(right)], axis=0),
                    jnp.concatenate([right, flip(left)], axis=0),
                    side="l", output_cost_volume=True, train=True,
                    mutable=["batch_stats"],
                )
                stats = mut["batch_stats"]
                preds = outputs[f"pred_disp_l/{s}"]
                mono, _ = monodepth_leftright_loss(
                    left, right, preds[0:1], flip(preds[1:2]),
                    smoothness_weight, consistency_weight,
                    max_disp=warp_max_disp,
                warp_precision=warp_precision)
                outputs = {key: v[0:1] for key, v in outputs.items()}
            else:
                outputs, mut = model.apply(
                    {"params": p, "batch_stats": train.batch_stats},
                    left, right, side="l", output_cost_volume=True, train=True,
                    mutable=["batch_stats"],
                )
                stats = mut["batch_stats"]
                mono, _ = monodepth_single_loss(
                    left, right, outputs[f"pred_disp_l/{s}"], smoothness_weight,
                    max_disp=warp_max_disp,
                warp_precision=warp_precision)
            total = mono
            replay = jnp.zeros(())
            if use_er:
                er_out, mut2 = model.apply(
                    {"params": p, "batch_stats": stats},
                    er_batch[f"color_l/{s}"], er_batch[f"color_r/{s}"],
                    side="l", output_cost_volume=False, train=True,
                    mutable=["batch_stats"],
                )
                stats = mut2["batch_stats"]
                replay = khamis_robust_loss(
                    er_out[f"pred_disp_l/{s}"], er_batch[f"gt_disp_l/{s}"])
                total = total + er_loss_weight * replay
            fcs_raw = mean_fcs_from_outputs(outputs, "l", coarse)
            return total, (mono, replay, stats, fcs_raw, outputs[f"pred_disp_l/{s}"])

        (_, (mono, replay, new_stats, fcs_raw, pred)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(train.params)

        gt_key = f"gt_disp_l/{s}"
        epe = _epe(pred, batch[gt_key]) if gt_key in batch else jnp.zeros(())

        smoothed, novel, res, did_add = gate_and_log(
            ss, None, fcs_raw, epe, left, right, frame_idx, mono)
        do_update = jnp.logical_not(did_add)

        if clip_grad_norm:
            grads = clip_stereo_net_grads(grads)
        updates, new_opt = train.tx.update(grads, train.opt_state, train.params)
        new_params = optax.apply_updates(train.params, updates)

        def select(new, old):
            return jax.tree.map(lambda n, o: jnp.where(do_update, n, o), new, old)

        new_train = train.replace(
            step=train.step + 1,
            params=select(new_params, train.params),
            opt_state=select(new_opt, train.opt_state),
            batch_stats=new_stats,
        )
        row = jnp.stack([
            fcs_raw, smoothed, mono, replay, epe,
            novel.astype(jnp.float32), did_add.astype(jnp.float32),
            do_update.astype(jnp.float32),
        ])
        log, pos = write_log(ss.log, ss.log_pos, row)
        return StreamAdaptState(
            train=new_train, ema_value=smoothed, ema_init=jnp.ones((), bool),
            reservoir=res, log=log, log_pos=pos)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def done_step(ss: StreamAdaptState, batch, frame_idx):
        train = ss.train
        left = batch[f"color_l/{s}"]
        right = batch[f"color_r/{s}"]
        outputs = model.apply(
            {"params": train.params, "batch_stats": train.batch_stats},
            left, right, side="l", output_cost_volume=True, train=False)
        pred = outputs[f"pred_disp_l/{s}"]
        mono, _ = monodepth_single_loss(left, right, pred, smoothness_weight,
                                        max_disp=warp_max_disp,
                warp_precision=warp_precision)
        fcs_raw = mean_fcs_from_outputs(outputs, "l", coarse)
        gt_key = f"gt_disp_l/{s}"
        epe = _epe(pred, batch[gt_key]) if gt_key in batch else jnp.zeros(())

        smoothed, novel, res, did_add = gate_and_log(
            ss, None, fcs_raw, epe, left, right, frame_idx, mono)
        row = jnp.stack([
            fcs_raw, smoothed, mono, jnp.zeros(()), epe,
            novel.astype(jnp.float32), did_add.astype(jnp.float32),
            jnp.zeros(()),
        ])
        log, pos = write_log(ss.log, ss.log_pos, row)
        return StreamAdaptState(
            train=train.replace(step=train.step + 1),
            ema_value=smoothed, ema_init=jnp.ones((), bool),
            reservoir=res, log=log, log_pos=pos)

    @jax.jit
    def validate_step(ss: StreamAdaptState):
        """Batched eval-mode Monodepth loss over the (padded) OVS buffer;
        updates per-slot values on device, returns (ss, avg, size)."""
        train = ss.train
        res = ss.reservoir
        outputs = model.apply(
            {"params": train.params, "batch_stats": train.batch_stats},
            res.left, res.right, side="l", output_cost_volume=False, train=False)
        pred = outputs[f"pred_disp_l/{s}"]

        def per_item(l, r, p):
            loss, _ = monodepth_single_loss(l[None], r[None], p[None],
                                            smoothness_weight,
                                            max_disp=warp_max_disp,
                warp_precision=warp_precision)
            return loss

        losses = jax.vmap(per_item)(res.left, res.right, pred)
        cap = losses.shape[0]
        mask = jnp.arange(cap) < res.size
        new_values = jnp.where(mask, losses, res.values)
        new_res = reservoir_set_values(res, new_values)
        ss = ss.replace(reservoir=new_res)
        mean_disp = (
            jnp.sum(jnp.where(mask[:, None, None, None], jnp.abs(pred), 0.0))
            / jnp.maximum(jnp.sum(mask.astype(jnp.float32))
                          * pred.shape[1] * pred.shape[2] * pred.shape[3], 1.0))
        return ss, reservoir_average_value(new_res), new_res.size, mean_disp

    return adapt_step, done_step, validate_step
