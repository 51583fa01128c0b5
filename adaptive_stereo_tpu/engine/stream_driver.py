"""Driver for the zero-sync streaming adaptation engine (stream_adapt.py).

Same protocol and outputs as engine/adapt.py (state machine modes, trials.csv,
checkpoints, TensorBoard series) but with host<->device synchronization only
at boundaries:
  - ring-log drain (one readback) at every log/validation/eval boundary;
  - one scalar readback per OVS validation for the plateau transition.

Use this engine for production throughput; engine/adapt.py remains the
step-for-step reference-parity engine.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import BatchLoader, StereoDataset
from ..models import StereoModel
from ..utils.logging_utils import MetricsWriter, TrialsLog, write_opt_json
from .adapt import State
from .checkpoint import load_variables
from .config import ExperimentConfig
from .evaluate import evaluate
from .state import create_train_state
from .steps import make_eval_step
from .stream_adapt import LOG_COLS, init_stream_state, make_streaming_steps


class _PlateauMachine:
    """Host mirror of the DONE/IN_PROGRESS plateau logic (the heavy state —
    EMA, reservoir — lives on device)."""

    def __init__(self, initial: State, val_improve_retries: int):
        self.state = initial
        self.initial = initial
        self.retries = val_improve_retries
        self.prev_loss = float("inf")
        self.ovs_did_change = True
        self.iters_without_improvement = 0

    def transition(self, avg_loss: float) -> State:
        print(f"[ OVS ] VALIDATION LOSS | PREVIOUS={self.prev_loss} | UPDATED={avg_loss}")
        if avg_loss >= self.prev_loss and not self.ovs_did_change:
            self.iters_without_improvement += 1
            if self.iters_without_improvement >= self.retries:
                print("[ OVS ] Transitioned to DONE!")
                self.state = State.DONE
                self.prev_loss = float("inf")
        else:
            self.ovs_did_change = False
            self.iters_without_improvement = 0
            self.prev_loss = avg_loss
        return self.state

    def restart(self):
        print("[ OVS ] RESTARTING adaptation!")
        self.state = self.initial


def adapt_streaming(cfg: ExperimentConfig, variables: Optional[dict] = None,
                    splits_root: Optional[str] = None,
                    train_splits_root: Optional[str] = None,
                    log_chunk: int = 512, engine: str = "flat",
                    transfer_uint8: bool = False,
                    fused_er_forward: bool = False,
                    done_batch: int = 1,
                    device_cache: bool = False) -> Dict:
    """engine='flat' (default): minimal-dispatch-payload flat-state engine
    (engine/flat_stream.py) — fastest on remote-dispatch TPUs.
    engine='pytree': the structured stream engine (engine/stream_adapt.py).

    transfer_uint8 (flat engine only): upload stream frames as uint8 and
    normalize on device — 4x less host->device bandwidth per frame, at the
    cost of re-quantizing the resized pyramid colors (<=0.5/255 noise; the
    source images are 8-bit anyway).

    done_batch (flat engine only): micro-batch DONE-state frames into one
    batch-N eval forward per N frames (amortizes dispatch, fills the MXU).
    Frames queue on the host and flush at every sync boundary (log drain /
    validation / eval), so state-machine semantics — including the
    bounded-lag DONE->restart on novel frames — are unchanged; the lag bound
    stays the drain cadence, which done_batch never exceeds.

    device_cache (flat engine, batch_size 1): ship the whole finite
    adaptation stream, the ER pool, and both val sets to HBM ONCE and slice
    frames on device — zero per-step host->device transfers. Bit-exact vs
    the upload path at input_scale 0 (see engine/device_cache.py). This is
    both the fast path and the REQUIRED path for long runs on the axon
    remote backend, whose per-transfer host RSS leak otherwise OOMs the
    host over thousands of streamed steps (measured: ~2x payload bytes
    leaked per upload; artifacts/axon_leak.log)."""
    mc, ac, dc, oc = cfg.model, cfg.adapt, cfg.data, cfg.optim
    # The ring must cover the longest possible gap between drains.
    log_chunk = max(log_chunk, 2 * cfg.log_frequency, 2 * max(ac.ovs_validate_hz, 1))
    s, k = mc.input_scale, mc.k
    log_path = os.path.join(cfg.log_dir, cfg.model_name)
    write_opt_json(log_path, cfg)

    model = StereoModel(
        k=k, input_scale=s, maxdisp=mc.maxdisp,
        dtype=jnp.bfloat16 if mc.compute_dtype == "bfloat16" else None,
        fused_siamese=mc.fused_siamese, s2d_refinement=mc.s2d_refinement,
    )
    if variables is None:
        if cfg.load_weights_folder is None:
            raise ValueError("adapt_streaming() needs pretrained weights")
        variables = load_variables(cfg.load_weights_folder)
    hs, ws = dc.height // 2 ** s, dc.width // 2 ** s
    dummy = jnp.zeros((1, hs, ws, 3), jnp.float32)
    train_state = create_train_state(
        model, jax.random.PRNGKey(cfg.seed), dummy, dummy,
        learning_rate=oc.learning_rate, variables=variables)

    image_scales = [s, s + k]
    mk = dict(scales=image_scales, do_hflip=False, random_crop=False, splits_root=splits_root)
    adapt_dataset = StereoDataset(dc.dataset_path, dc.dataset_name, dc.split,
                                  dc.height, dc.width, "train",
                                  load_disp_left=True, load_disp_right=True, **mk)
    adapt_val_dataset = StereoDataset(dc.dataset_path, dc.dataset_name, dc.split,
                                      dc.height, dc.width, "val",
                                      load_disp_left=True, load_disp_right=False, **mk)
    # The training-domain (replay / train-val) dataset lives under a
    # DIFFERENT root than the adaptation stream; a shared splits_root
    # override would resolve its split against the wrong tree, so it gets
    # its own override (default: auto-resolve under its dataset root).
    mk_train = dict(mk, splits_root=train_splits_root)
    train_val_dataset = StereoDataset(ac.train_dataset_path or dc.dataset_path,
                                      ac.train_dataset_name or dc.dataset_name,
                                      ac.train_split or dc.split,
                                      dc.height, dc.width, "val",
                                      load_disp_left=True, load_disp_right=False,
                                      **mk_train)
    adapt_loader = BatchLoader(adapt_dataset, dc.batch_size, shuffle=False,
                               num_workers=dc.num_workers, seed=cfg.seed)
    adapt_val_loader = BatchLoader(adapt_val_dataset, min(6, max(1, len(adapt_val_dataset))),
                                   shuffle=False, num_workers=dc.num_workers, seed=cfg.seed)
    train_val_loader = BatchLoader(train_val_dataset, min(6, max(1, len(train_val_dataset))),
                                   shuffle=False, num_workers=dc.num_workers, seed=cfg.seed)

    adapt_writer = MetricsWriter(os.path.join(log_path, "adapt"))
    train_writer = MetricsWriter(os.path.join(log_path, "train"))

    use_er = ac.adapt_mode in ("ER", "VS+ER")
    use_vs = ac.adapt_mode not in ("NONSTOP", "ER", "NONE")
    if ac.leftright_consistency:
        raise NotImplementedError(
            "left-right consistency is served by the classic engine "
            "(engine.adapt.adapt); the streaming engines are single-sided")
    if use_vs and dc.batch_size != 1:
        raise ValueError("VS adaptation modes require batch_size=1")

    stream_cache = er_cache = None
    if device_cache:
        if engine != "flat":
            raise ValueError("device_cache requires engine='flat'")
        if dc.batch_size != 1:
            raise ValueError("device_cache requires batch_size=1")
        from .device_cache import DeviceCachedLoader, DeviceStreamCache

        cache_u8 = s == 0  # uint8 is bit-exact only pre-pyramid-resize
        transfer_uint8 = cache_u8
        stream_ds = StereoDataset(dc.dataset_path, dc.dataset_name, dc.split,
                                  dc.height, dc.width, "train",
                                  load_disp_left=True, load_disp_right=False,
                                  color_uint8=cache_u8, **mk)
        stream_cache = DeviceStreamCache(stream_ds, s, cache_u8,
                                         num_workers=dc.num_workers)
        if use_er:
            er_ds = StereoDataset(
                ac.train_dataset_path or dc.dataset_path,
                ac.train_dataset_name or dc.dataset_name,
                ac.train_split or dc.split, dc.height, dc.width, "val",
                load_disp_left=True, load_disp_right=False,
                color_uint8=cache_u8, **mk_train)
            er_cache = DeviceStreamCache(er_ds, s, cache_u8,
                                         num_workers=dc.num_workers)
        adapt_val_loader = DeviceCachedLoader(adapt_val_loader)
        train_val_loader = DeviceCachedLoader(train_val_loader)

    step_kwargs = dict(
        smoothness_weight=ac.smoothness_weight,
        er_loss_weight=ac.er_loss_weight, use_er=use_er, use_vs=use_vs,
        ood_threshold=ac.ood_threshold, fcs_ema_weight=ac.fcs_ema_weight,
        clip_grad_norm=oc.clip_grad_norm)
    eval_step = make_eval_step(model, s, k)

    if engine == "flat":
        from .flat_stream import (
            flat_state_to_variables,
            init_flat_stream_state,
            make_flat_streaming_steps,
        )

        ss, spec = init_flat_stream_state(
            train_state.params, train_state.batch_stats, oc.learning_rate,
            ac.ovs_buffer_size, hs, ws, log_chunk, seed=cfg.seed)
        f_adapt, f_done, validate_step, make_done_batched = \
            make_flat_streaming_steps(
                model, spec, s, k, images_uint8=transfer_uint8,
                fused_er_forward=fused_er_forward, **step_kwargs)
        f_done_b = make_done_batched(done_batch) if done_batch > 1 else None

        def current_variables(ss):
            return flat_state_to_variables(ss, spec)

        def color(batch, key):
            # `batch` values are HOST numpy here when transfer_uint8 (the
            # driver skips the f32 upload for color keys in that mode);
            # device_cache slices arrive device-resident and correctly typed.
            img = batch[key]
            if transfer_uint8 and not isinstance(img, jax.Array):
                img = jax.device_put(
                    np.clip(np.asarray(img) * 255.0, 0, 255).round().astype(np.uint8))
            return img

        def adapt_step(ss, batch, er_batch, idx):
            return f_adapt(ss, color(batch, f"color_l/{s}"), color(batch, f"color_r/{s}"),
                           batch.get(f"gt_disp_l/{s}",
                                     jnp.zeros((1, hs, ws, 1))),
                           color(er_batch, f"color_l/{s}"), color(er_batch, f"color_r/{s}"),
                           er_batch.get(f"gt_disp_l/{s}",
                                        jnp.zeros((1, hs, ws, 1))), idx)

        def done_step(ss, batch, idx):
            return f_done(ss, color(batch, f"color_l/{s}"), color(batch, f"color_r/{s}"),
                          batch.get(f"gt_disp_l/{s}",
                                    jnp.zeros((1, hs, ws, 1))), idx)
    else:
        if done_batch > 1:
            raise ValueError("done_batch > 1 requires engine='flat'")
        f_done_b = None
        adapt_step, done_step, validate_step = make_streaming_steps(
            model, s, k, **step_kwargs)
        ss = init_stream_state(train_state, ac.ovs_buffer_size, hs, ws,
                               log_chunk, seed=cfg.seed)

        def current_variables(ss):
            return {"params": ss.train.params, "batch_stats": ss.train.batch_stats}
    machine = _PlateauMachine(
        State.DONE if ac.adapt_mode == "NONE" else State.IN_PROGRESS,
        ac.val_improve_retries)

    # --- OVS trust-region guard (AdaptConfig.ovs_guard_tolerance) ---------
    # Snapshot/restore of the MODEL state only (params, Adam moments/count,
    # BN running stats); observations (FCS EMA, reservoir, ring log) are
    # never rolled back. Copies are deliberate on both sides: the streaming
    # steps donate their state buffers, so an aliased snapshot would be
    # deleted by the next dispatch.
    if engine == "flat":
        _GUARD_FIELDS = ("theta", "m", "v", "count", "bn")

        def guard_snapshot(ss):
            return {f: jnp.copy(getattr(ss, f)) for f in _GUARD_FIELDS}

        def guard_restore(ss, snap):
            return ss.replace(**{f: jnp.copy(snap[f]) for f in _GUARD_FIELDS})
    else:
        def guard_snapshot(ss):
            return jax.tree.map(jnp.copy, ss.train)

        def guard_restore(ss, snap):
            return ss.replace(train=jax.tree.map(jnp.copy, snap))

    guard_tol = float(ac.ovs_guard_tolerance)
    guard_best = [float("inf")]
    guard_snap = [None]
    guard_rollbacks = [0]

    def guard_check(ss, avg_loss: float):
        """Called at each non-empty OVS validation; returns (ss, rolled)."""
        if guard_tol <= 0.0:
            return ss, False
        if avg_loss < guard_best[0]:
            guard_best[0] = avg_loss
            guard_snap[0] = guard_snapshot(ss)
            return ss, False
        if guard_snap[0] is not None and \
                avg_loss > guard_best[0] * (1.0 + guard_tol):
            guard_rollbacks[0] += 1
            print(f"[ OVS-GUARD ] validation {avg_loss:.5f} exceeds best "
                  f"{guard_best[0]:.5f} by more than {guard_tol:.0%}; "
                  "rolling back to the best snapshot "
                  f"(rollback #{guard_rollbacks[0]})")
            return guard_restore(ss, guard_snap[0]), True
        return ss, False

    trials = TrialsLog(os.path.join(log_path, "trials.csv"))

    def run_eval():
        v = current_variables(ss)
        ma = evaluate(eval_step, v["params"], v["batch_stats"],
                      adapt_val_loader, cfg.fast_eval, ac.num_steps)
        mt = evaluate(eval_step, v["params"], v["batch_stats"],
                      train_val_loader, cfg.fast_eval, ac.num_steps)
        return ma, mt

    def save_ckpt(tag):
        import json as _json

        from flax import serialization

        v = current_variables(ss)
        folder = os.path.join(log_path, "models", f"weights_{tag}")
        os.makedirs(folder, exist_ok=True)
        payload = {"step": np.asarray(tag), "params": jax.device_get(v["params"]),
                   "batch_stats": jax.device_get(v["batch_stats"])}
        with open(os.path.join(folder, "state.msgpack"), "wb") as fo:
            fo.write(serialization.to_bytes(payload))
        with open(os.path.join(folder, "meta.json"), "w") as fo:
            _json.dump({"config": cfg.to_json(),
                        "gradient_updates": gradient_updates}, fo)

    if not ac.skip_initial_eval:
        ma, mt = run_eval()
        adapt_writer.log_scalars(ma, {}, 0, 0, 0)
        train_writer.log_scalars(mt, {}, 0, 0, 0)
        trials.append(ma, mt, {}, step=-1)

    gradient_updates = 0
    drained_through = 0
    epoch, step = 0, 0
    final_metrics: Dict = {}
    t_start = time.time()

    # DONE-state micro-batch queue: (left, right, gt, frame_idx) device
    # buffers awaiting one batched eval dispatch. Flushed whenever full and
    # at every sync boundary (drain), so the ring log always covers
    # [0, step) before any readback.
    pending = []

    def flush_pending():
        nonlocal ss
        while f_done_b is not None and len(pending) >= done_batch:
            chunk = [pending.pop(0) for _ in range(done_batch)]
            ss = f_done_b(
                ss,
                jnp.concatenate([c[0] for c in chunk], axis=0),
                jnp.concatenate([c[1] for c in chunk], axis=0),
                jnp.concatenate([c[2] for c in chunk], axis=0),
                jnp.asarray([c[3] for c in chunk], jnp.int32))
        while pending:  # tail < done_batch: reuse the compiled 1-frame program
            l, r, g, i = pending.pop(0)
            ss = f_done(ss, l, r, g, jnp.asarray(i, jnp.int32))

    def drain(upto_step: int):
        """One readback of the ring log covering [drained_through, upto_step)."""
        nonlocal drained_through, gradient_updates
        flush_pending()
        n = upto_step - drained_through
        if n <= 0:
            return
        assert n <= log_chunk, "log_chunk too small for the drain cadence"
        rows = np.asarray(ss.log)
        idx = [(drained_through + i) % log_chunk for i in range(n)]
        data = rows[idx]  # (n, len(LOG_COLS))
        col = {name: data[:, j] for j, name in enumerate(LOG_COLS)}
        for i in range(n):
            t = drained_through + i
            adapt_writer.add_scalar("fcs/raw", col["fcs_raw"][i], t)
            adapt_writer.add_scalar("fcs/smoothed", col["fcs_smoothed"][i], t)
        gradient_updates += int(col["do_update"].sum())
        added = int(col["did_add"].sum())
        if added:
            machine.ovs_did_change = True
            print(f"[ OVS ] {added} pair(s) entered the OVS in steps "
                  f"[{drained_through}, {upto_step})")
        novel_count = int(col["novel"].sum())
        if novel_count and machine.state == State.DONE:
            # Bounded-lag restart (see module docstring).
            machine.restart()
        last = n - 1
        if (upto_step - 1) % cfg.log_frequency == 0 and upto_step > 1:
            adapt_writer.log_scalars(
                {"EPE": float(col["epe"][last])},
                {"Monodepth/total_loss": float(col["mono_loss"][last]),
                 "Replay/total_loss": float(col["replay_loss"][last])},
                0, epoch, upto_step - 1)
        drained_through = upto_step

    if device_cache:
        steps_per_epoch = len(stream_cache)

        def epoch_batches():
            for i in range(steps_per_epoch):
                yield stream_cache.fetch(i)
    else:
        steps_per_epoch = len(adapt_loader)

        def epoch_batches():
            return iter(adapt_loader)

    for epoch in range(cfg.num_epochs):
        if ac.num_steps > 0 and step >= ac.num_steps:
            break
        for batch_idx, raw_batch in enumerate(epoch_batches()):
            if step % ac.ovs_validate_hz == 0 and step > 0:
                drain(step)
                if machine.state == State.IN_PROGRESS:
                    ss, avg, size = validate_step(ss)
                    if int(size) > 0 and use_vs:
                        ss, _rolled = guard_check(ss, float(avg))
                        machine.transition(float(avg))

            if device_cache:
                batch = raw_batch  # already device-resident slices
            elif engine == "flat" and transfer_uint8:
                # Colors go up as uint8 inside color(); upload only the rest.
                batch = {key: (v if key.startswith("color") else
                               jax.device_put(jnp.asarray(v)))
                         for key, v in raw_batch.items()}
            else:
                batch = {key: jax.device_put(jnp.asarray(v)) for key, v in raw_batch.items()}
            if machine.state == State.IN_PROGRESS:
                if use_er and device_cache:
                    er_batch = er_cache.fetch(step % len(er_cache))
                elif use_er:
                    it = train_val_dataset[step % len(train_val_dataset)]
                    if engine == "flat" and transfer_uint8:
                        er_batch = {key: (v[None] if key.startswith("color") else
                                          jax.device_put(jnp.asarray(v)[None]))
                                    for key, v in it.items()}
                    else:
                        er_batch = {key: jax.device_put(jnp.asarray(v)[None])
                                    for key, v in it.items()}
                else:
                    er_batch = batch
                ss = adapt_step(ss, batch, er_batch, jnp.asarray(batch_idx, jnp.int32))
            elif f_done_b is not None:
                pending.append((
                    color(batch, f"color_l/{s}"), color(batch, f"color_r/{s}"),
                    batch.get(f"gt_disp_l/{s}", jnp.zeros((1, hs, ws, 1))),
                    batch_idx))
                if len(pending) >= done_batch:
                    flush_pending()
            else:
                ss = done_step(ss, batch, jnp.asarray(batch_idx, jnp.int32))
            step += 1

            if step % cfg.log_frequency == 0:
                drain(step)

            mid_eval = ac.eval_hz > 0 and step % ac.eval_hz == 0
            end_eval = ac.eval_hz <= 0 and batch_idx == steps_per_epoch - 1
            if mid_eval or end_eval:
                drain(step)
                adapt_writer.add_scalar("GRADIENT_UPDATES", gradient_updates, step)
                if guard_tol > 0.0:
                    adapt_writer.add_scalar("OVS_GUARD_ROLLBACKS",
                                            guard_rollbacks[0], step)
                ma, mt = run_eval()
                adapt_writer.log_scalars(ma, {}, 0, epoch, step)
                train_writer.log_scalars(mt, {}, 0, epoch, step)
                save_ckpt(step)
                trials.append(ma, mt, {"GRADIENT_UPDATES": gradient_updates}, step)
                final_metrics = {"adapt": ma, "train": mt}

            if ac.num_steps > 0 and step >= ac.num_steps:
                break

    drain(step)
    total = time.time() - t_start
    adapt_writer.close()
    train_writer.close()
    return {
        "steps": step,
        "gradient_updates": gradient_updates,
        "guard_rollbacks": guard_rollbacks[0],
        "steps_per_sec": step / max(total, 1e-9),
        "final_metrics": final_metrics,
        "final_state": machine.state.name,
        "stream_state": ss,
    }
