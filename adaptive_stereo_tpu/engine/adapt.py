"""Online adaptation engine — the signature workload (reference adapt.py).

Functional-core / stateful-shell split (SURVEY.md §7): the fused jitted step
(engine/steps.py) does forward + Monodepth loss + FCS + replay + backward;
this module is the thin host shell: the DONE/IN_PROGRESS state machine, the
FCS EMA + OOD gate, the reservoir-sampled online validation set, trials.csv,
and checkpointing. Modes: NONSTOP | VS | ER | VS+ER | NONE
(reference train.py:289).

TPU-specific design points:
- One compiled adapt step for all gating outcomes: skip-update steps run the
  same executable with a traced do_update=False mask (no recompiles).
- OVS validation is one batched eval forward over a padded max_size stack
  (single compilation, vs. the reference's per-image loop adapt.py:133-138).
- The DONE state uses a separate compiled eval-mode step (matching the
  reference's .eval() semantics, adapt.py:309-311) — exactly two executables
  total.
- The only per-step host sync is the FCS scalar, which the OOD gate needs
  before deciding whether this frame becomes validation data.
"""

from __future__ import annotations

import os
import random
import time
from enum import Enum
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import BatchLoader, StereoDataset
from ..models import StereoModel
from ..ops import online_ema
from ..utils.logging_utils import MetricsWriter, TrialsLog, write_opt_json
from ..utils.stereo_reservoir import StereoReservoir
from .checkpoint import load_variables, save_checkpoint
from .config import ExperimentConfig
from .evaluate import evaluate
from .state import create_train_state
from .steps import (
    init_fcs_ema,
    make_eval_step,
    make_fused_adapt_step,
    make_infer_step,
    make_ovs_validate_step,
    make_viz_step,
)


class State(Enum):
    DONE = 0          # Adaptation finished; no gradient updates.
    IN_PROGRESS = 1   # Adaptation in progress.
    VALIDATION = 2    # Validating (no gradients) — used transiently.


class _PriorityQueueOVS:
    """Adapter exposing the reservoir interface over the bounded max-heap
    (keeps the WORST-loss pairs). Framework-defined policy: the reference
    builds the priority queue but never wires it (SURVEY §2 C11); here novel
    frames always divert from the gradient update and heap admission is
    decided by loss at commit time."""

    def __init__(self, max_size: int):
        from ..utils.stereo_priority_queue import StereoPriorityQueue

        self._pq = StereoPriorityQueue(max_size, min_heap=False)
        self.max_size = max_size

    @property
    def buf(self):
        m = self._pq.multiplier
        return [[m * it[0], it[1], it[2], it[3]] for it in self._pq.buf]

    def add(self, img_l, img_r, value, img_index) -> bool:
        return bool(self._pq.add(img_l, img_r, float(value), img_index))

    def pre_decide(self, img_index):
        from ..utils.stereo_reservoir import PreDecision

        return PreDecision(add=True, slot=-1)

    def commit(self, pre, img_l, img_r, value, img_index) -> bool:
        return bool(self._pq.add(img_l, img_r, float(value), img_index))

    def update_value(self, buf_index: int, new_value: float) -> None:
        import heapq

        self._pq.buf[buf_index][0] = self._pq.multiplier * float(new_value)
        heapq.heapify(self._pq.buf)

    def size(self) -> int:
        return self._pq.size()

    def average_value(self) -> float:
        return self._pq.average_value()


class StateMachine:
    """DONE/IN_PROGRESS state machine with an OVS reservoir
    (reference adapt.py:89-172)."""

    def __init__(self, initial_state: State, ovs_buffer_size: int,
                 validate_fn, pad_shape, rng: Optional[random.Random] = None,
                 ovs_policy: str = "reservoir"):
        self.initial_state = initial_state
        self.current_state = initial_state
        if ovs_policy == "priority_queue":
            # Alternative OVS policy: keep the WORST-loss pairs (max-heap on
            # loss) instead of a uniform sample — the reference builds this
            # buffer (utils/stereo_priority_queue.py) but never wires it in;
            # here it is a first-class choice.
            self.ovs = _PriorityQueueOVS(ovs_buffer_size)
        else:
            self.ovs = StereoReservoir(ovs_buffer_size, rng=rng)
        self.prev_ovs_loss = float("inf")
        self.ovs_did_change = True
        self.ovs_iters_without_improvement = 0
        self._validate_fn = validate_fn
        self._pad_shape = pad_shape  # (H, W) at input scale

    def add_to_ovs(self, left_img, right_img, loss: float, batch_idx: int) -> bool:
        did_add = self.ovs.add(left_img, right_img, float(loss), batch_idx)
        if did_add:
            print(f"[ OVS ] ADDED a new pair to the OVS (INDEX={batch_idx} LOSS={loss})")
            self.ovs_did_change = True
        # A novel frame arriving while DONE restarts adaptation — even if the
        # reservoir declined to store it (reference adapt.py:111-114).
        if self.current_state == State.DONE:
            self.restart()
        return did_add

    def commit_novel(self, pre, left_img, right_img, loss: float, batch_idx: int) -> bool:
        """Fused-step variant of add_to_ovs: applies a pre-drawn reservoir
        decision for a frame the device gate flagged as novel."""
        did_add = self.ovs.commit(pre, left_img, right_img, float(loss), batch_idx)
        if did_add:
            print(f"[ OVS ] ADDED a new pair to the OVS (INDEX={batch_idx} LOSS={loss})")
            self.ovs_did_change = True
        if self.current_state == State.DONE:
            self.restart()
        return did_add

    def restart(self) -> None:
        self.current_state = self.initial_state
        print("[ OVS ] RESTARTING adaptation!")

    def validate(self, params, batch_stats) -> None:
        """Recompute each OVS pair's Monodepth loss with current weights in
        ONE padded batched eval forward (single compiled executable)."""
        n = self.ovs.size()
        if n == 0:
            return
        h, w = self._pad_shape
        cap = self.ovs.max_size

        def stack(slot):
            parts = [self.ovs.buf[i][slot] for i in range(n)]
            if n < cap:  # pad to max_size so ONE executable serves all fills
                parts.append(jnp.zeros((cap - n, h, w, 3), jnp.float32))
            return jnp.concatenate(parts, axis=0)

        losses = np.asarray(self._validate_fn(params, batch_stats, stack(2), stack(3)))
        for i in range(n):
            self.ovs.update_value(i, float(losses[i]))

    def transition(self, val_improve_retries: int) -> State:
        ovs_loss = self.ovs.average_value()
        print("\n[ OVS ] -----------------------------------------")
        print(f"[ OVS ] VALIDATION LOSS | PREVIOUS={self.prev_ovs_loss} | UPDATED={ovs_loss}")
        print("[ OVS ] -----------------------------------------\n")

        if ovs_loss >= self.prev_ovs_loss and self.ovs_did_change is False:
            self.ovs_iters_without_improvement += 1
            if self.ovs_iters_without_improvement >= val_improve_retries:
                print(f"[ OVS ] Transitioned to DONE! Loss didn't improve in the last "
                      f"{self.ovs_iters_without_improvement} evaluations")
                self.current_state = State.DONE
                self.prev_ovs_loss = float("inf")
        else:
            self.ovs_did_change = False
            self.ovs_iters_without_improvement = 0
            self.prev_ovs_loss = ovs_loss
            print("[ OVS ] Transitioned to IN_PROGRESS. Loss improved or buffer changed.")
        return self.current_state

    def state(self) -> State:
        return self.current_state

    def ovs_buffer_size(self) -> int:
        return self.ovs.size()


def make_reconstruction_gate(gate_model, kind: str = "ae"):
    """Gate-score fn for gate='reconstruction': mean-L1 reconstruction error
    of the left image under a pretrained AE/VAE (the graveyard OOD signal,
    reference graveyard/adapt_vae.py ~:400: `torch.abs(decoded - input).mean()`).

    The VAE decodes from the posterior MEAN (no sampling) so the gate is
    deterministic inside jit. Returns gate_apply(params, left) -> () f32.
    """
    if kind == "vae":
        def gate_apply(params, left):
            recon, _mu, _logvar = gate_model.apply(
                {"params": params}, left, sample=False)
            return jnp.mean(jnp.abs(recon - left))
    else:
        def gate_apply(params, left):
            recon = gate_model.apply({"params": params}, left)
            return jnp.mean(jnp.abs(recon - left))
    return gate_apply


def adapt(cfg: ExperimentConfig, variables: Optional[dict] = None,
          splits_root: Optional[str] = None,
          train_splits_root: Optional[str] = None,
          gate_model=None, gate_variables: Optional[dict] = None,
          gate_kind: str = "ae", step_hook=None) -> Dict:
    """Run online adaptation per the reference protocol (adapt.py:187-443).

    Args:
      cfg: experiment configuration (see config.regression_adapt_config).
      variables: optional pre-loaded {'params','batch_stats'}; otherwise
        loaded from cfg.load_weights_folder (torch or native format).
      splits_root: optional override for the splits directory.
      gate_model / gate_variables / gate_kind: when cfg.adapt.gate ==
        'reconstruction', the pretrained AE ('ae') or VAE ('vae') whose
        image-reconstruction error replaces FCS as the novelty signal
        (reference graveyard/adapt_vae.py; see analysis.reconstruction_ood
        for the trainer). Novel iff recon loss > cfg.adapt.ood_threshold.
      step_hook: optional callable(step, record) invoked once per stream
        frame with the step's observables — fcs_raw, fcs_smoothed, novel,
        did_add, do_update, mono_loss, replay_loss, epe, state. Used by the
        lockstep differential harness (tests/test_lockstep_reference.py)
        and available for user instrumentation.

    Returns a summary dict (final metrics, gradient_updates, steps/sec).
    """
    mc, ac, dc, oc = cfg.model, cfg.adapt, cfg.data, cfg.optim
    s, k = mc.input_scale, mc.k
    log_path = os.path.join(cfg.log_dir, cfg.model_name)
    write_opt_json(log_path, cfg)

    rng = random.Random(cfg.seed)
    np.random.seed(cfg.seed)

    model = StereoModel(
        k=k, input_scale=s, maxdisp=mc.maxdisp,
        dtype=jnp.bfloat16 if mc.compute_dtype == "bfloat16" else None,
        fused_siamese=mc.fused_siamese, s2d_refinement=mc.s2d_refinement,
    )
    if variables is None:
        if cfg.load_weights_folder is None:
            raise ValueError("adapt() needs pretrained weights")
        variables = load_variables(cfg.load_weights_folder)
    dummy = jnp.zeros((1, dc.height // 2 ** s, dc.width // 2 ** s, 3), jnp.float32)
    state = create_train_state(
        model, jax.random.PRNGKey(cfg.seed), dummy, dummy,
        learning_rate=oc.learning_rate, variables=variables,
    )

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

    print("-" * 70)
    print(f"DATASET SIZES:\n  ADAPT={len(adapt_dataset)} VAL={len(adapt_val_dataset)} "
          f"TRAIN_VAL={len(train_val_dataset)}")
    print("-" * 70)

    adapt_writer = MetricsWriter(os.path.join(log_path, "adapt"))
    train_writer = MetricsWriter(os.path.join(log_path, "train"))

    use_er = ac.adapt_mode in ("ER", "VS+ER")
    use_vs = ac.adapt_mode not in ("NONSTOP", "ER", "NONE")
    if use_vs and dc.batch_size != 1:
        # The OVS stores per-FRAME pairs; all published configurations
        # (experiments/adaptation/*.sh) use batch_size=1, and the reference's
        # own >1 behavior (a whole batch stored as one reservoir entry) has
        # no meaningful semantics. Fail loudly instead of silently diverging.
        raise ValueError("VS adaptation modes require batch_size=1")

    use_recon_gate = ac.gate == "reconstruction"
    gate_apply = None
    gate_params = None
    if use_recon_gate:
        if gate_model is None or gate_variables is None:
            raise ValueError(
                "cfg.adapt.gate='reconstruction' requires gate_model and "
                "gate_variables (see analysis.reconstruction_ood.train_autoencoder)")
        gate_apply = make_reconstruction_gate(gate_model, gate_kind)
        gate_params = gate_variables["params"]
    fused_step = make_fused_adapt_step(
        model, s, k, smoothness_weight=ac.smoothness_weight,
        er_loss_weight=ac.er_loss_weight, use_er=use_er, use_vs=use_vs,
        ood_threshold=ac.ood_threshold, fcs_ema_weight=ac.fcs_ema_weight,
        clip_grad_norm=oc.clip_grad_norm,
        use_leftright=ac.leftright_consistency,
        consistency_weight=ac.consistency_weight,
        gate=ac.gate, gate_apply=gate_apply,
        warp_precision=ac.warp_precision,
    )
    gate_score_fn = jax.jit(gate_apply) if use_recon_gate else None
    infer = make_infer_step(model, s, k, smoothness_weight=ac.smoothness_weight,
                            warp_precision=ac.warp_precision)
    eval_step = make_eval_step(model, s, k)
    viz_step = make_viz_step(model, s) if cfg.log_images else None
    validate_fn = make_ovs_validate_step(model, s, smoothness_weight=ac.smoothness_weight,
                                         warp_precision=ac.warp_precision)

    initial_state = State.DONE if ac.adapt_mode == "NONE" else State.IN_PROGRESS
    hs, ws = dc.height // 2 ** s, dc.width // 2 ** s
    sm = StateMachine(initial_state, ac.ovs_buffer_size, validate_fn, (hs, ws),
                      rng=rng, ovs_policy=ac.ovs_policy)

    trials = TrialsLog(os.path.join(log_path, "trials.csv"))

    def run_eval():
        metrics_adapt = evaluate(eval_step, state.params, state.batch_stats,
                                 adapt_val_loader, cfg.fast_eval, ac.num_steps)
        metrics_train = evaluate(eval_step, state.params, state.batch_stats,
                                 train_val_loader, cfg.fast_eval, ac.num_steps)
        return metrics_adapt, metrics_train

    if not ac.skip_initial_eval:
        print("=" * 25 + " PRE-ADAPTATION EVALUATION " + "=" * 25)
        metrics_adapt, metrics_train = run_eval()
        adapt_writer.log_scalars(metrics_adapt, {}, 0, 0, 0)
        train_writer.log_scalars(metrics_train, {}, 0, 0, 0)
        trials.append(metrics_adapt, metrics_train, {}, step=-1)

    def device_batch(b):
        return {key: jax.device_put(jnp.asarray(v)) for key, v in b.items()}

    def er_item(step_idx):
        it = train_val_dataset[step_idx % len(train_val_dataset)]
        return {key: jax.device_put(jnp.asarray(v)[None]) for key, v in it.items()}

    epoch, step, gradient_updates = 0, 0, 0
    fcs_smoothed = None           # host mirror of the device EMA
    ema = init_fcs_ema()          # device-side EMA for the fused step
    final_metrics: Dict = {}
    t_start = time.time()

    for epoch in range(cfg.num_epochs):
        if ac.num_steps > 0 and step >= ac.num_steps:
            break
        t0_epoch = time.time()

        for batch_idx, raw_batch in enumerate(adapt_loader):
            do_validation = (step % ac.ovs_validate_hz == 0)
            if do_validation and sm.ovs_buffer_size() > 0 and sm.state() == State.IN_PROGRESS:
                sm.validate(state.params, state.batch_stats)
                if use_vs:
                    sm.transition(ac.val_improve_retries)

            t0 = time.time()
            batch = device_batch(raw_batch)
            in_progress = sm.state() == State.IN_PROGRESS

            if in_progress:
                # ONE dispatch: fwd+bwd+FCS+OOD gate+masked Adam. The
                # reservoir decision is pre-drawn (FCS-independent); the
                # device gate applies it only if the frame is novel.
                pre = sm.ovs.pre_decide(batch_idx) if use_vs else None
                er_batch = er_item(step) if use_er else batch
                step_args = (state, ema, batch, er_batch,
                             jnp.asarray(pre.add if pre else False))
                if use_recon_gate:
                    step_args = step_args + (gate_params,)
                state, ema, aux = fused_step(*step_args)
                fcs_raw = float(aux["fcs_raw"])
                fcs_smoothed = float(aux["fcs_smoothed"])
                image_is_novel = bool(aux["novel"])
                did_add_to_ovs = False
                if use_vs and image_is_novel:
                    if use_recon_gate:
                        print(f"[ OOD ] Novel image detected! "
                              f"recon_loss={float(aux['gate_score']):.5f} "
                              f"threshold={ac.ood_threshold:.5f}")
                    else:
                        print(f"[ OOD ] Novel image detected! fcs_raw={fcs_raw:.3f} "
                              f"fcs_smoothed={fcs_smoothed:.3f} threshold={ac.ood_threshold:.3f}")
                    did_add_to_ovs = sm.commit_novel(
                        pre, batch[f"color_l/{s}"], batch[f"color_r/{s}"],
                        float(aux["Monodepth/total_loss"]), batch_idx)
                # Count what the DEVICE actually did: the fused step masks the
                # Adam update with the pre-drawn add decision, so a novel frame
                # skips its update even when the buffer later declines to store
                # it (possible under ovs_policy='priority_queue'; the reservoir
                # pre-draw always matches its commit).
                if bool(aux["do_update"]):
                    gradient_updates += 1
                else:
                    print("[ ADAPT ] Skipping gradient update because image "
                          "was diverted to the OVS.")
            else:
                aux, _pred = infer(state.params, state.batch_stats, batch)
                fcs_raw = float(aux["fcs_raw"])
                fcs_smoothed = fcs_raw if fcs_smoothed is None else online_ema(
                    fcs_smoothed, fcs_raw, ac.fcs_ema_weight)
                # Keep the device EMA consistent for a possible restart.
                ema = (jnp.asarray(fcs_smoothed, jnp.float32), jnp.ones((), bool))
                if use_recon_gate:
                    gate_score = float(gate_score_fn(
                        gate_params, batch[f"color_l/{s}"]))
                    image_is_novel = gate_score > ac.ood_threshold
                else:
                    image_is_novel = fcs_smoothed < ac.ood_threshold
                if use_vs and image_is_novel:
                    if use_recon_gate:
                        print(f"[ OOD ] Novel image detected! "
                              f"recon_loss={gate_score:.5f} "
                              f"threshold={ac.ood_threshold:.5f}")
                    else:
                        print(f"[ OOD ] Novel image detected! fcs_raw={fcs_raw:.3f} "
                              f"fcs_smoothed={fcs_smoothed:.3f} threshold={ac.ood_threshold:.3f}")
                    # DONE state: classic add path (restarts adaptation).
                    sm.add_to_ovs(batch[f"color_l/{s}"], batch[f"color_r/{s}"],
                                  float(aux["Monodepth/total_loss"]), batch_idx)

            adapt_writer.add_scalar("fcs/raw", fcs_raw, step)
            adapt_writer.add_scalar("fcs/smoothed", fcs_smoothed, step)

            if step_hook is not None:
                step_hook(step, {
                    "fcs_raw": fcs_raw,
                    "fcs_smoothed": fcs_smoothed,
                    "novel": bool(image_is_novel) if use_vs else False,
                    "did_add": bool(did_add_to_ovs) if in_progress else False,
                    "do_update": bool(aux["do_update"]) if in_progress else False,
                    "mono_loss": float(aux["Monodepth/total_loss"]),
                    "replay_loss": (float(aux["Replay/total_loss"])
                                    if "Replay/total_loss" in aux else None),
                    "epe": float(aux["EPE"]) if "EPE" in aux else None,
                    "state": sm.state().name,
                })

            elapsed = time.time() - t0
            if (step % cfg.log_frequency) == 0 and step > 0:
                metrics = {}
                if "EPE" in aux:
                    metrics["EPE"] = float(aux["EPE"])
                losses = {n: float(v) for n, v in aux.items() if "loss" in n}
                adapt_writer.log_scalars(metrics, losses,
                                         dc.batch_size / max(elapsed, 1e-9), epoch, step)
                if viz_step is not None:
                    outputs = viz_step(state.params, state.batch_stats, batch)
                    adapt_writer.log_images(batch, outputs, step)

            step += 1

            mid_eval = ac.eval_hz > 0 and step % ac.eval_hz == 0
            end_eval = ac.eval_hz <= 0 and batch_idx == len(adapt_loader) - 1
            if mid_eval or end_eval:
                print(f"=== MID-ADAPTATION EVALUATION (step {step}) ===")
                adapt_writer.add_scalar("GRADIENT_UPDATES", gradient_updates, step)
                metrics_adapt, metrics_train = run_eval()
                adapt_writer.log_scalars(metrics_adapt, {}, 0, epoch, step)
                train_writer.log_scalars(metrics_train, {}, 0, epoch, step)
                save_checkpoint(log_path, state, step,
                                {"config": cfg.to_json(), "gradient_updates": gradient_updates})
                trials.append(metrics_adapt, metrics_train,
                              {"GRADIENT_UPDATES": gradient_updates}, step)
                final_metrics = {"adapt": metrics_adapt, "train": metrics_train}

            if ac.num_steps > 0 and step >= ac.num_steps:
                break

        elapsed_epoch = time.time() - t0_epoch
        print(f"Finished {len(adapt_loader)} adaptation steps in {elapsed_epoch:.2f}s "
              f"({len(adapt_loader) / max(elapsed_epoch, 1e-9):.2f} examples/s)")

    total_time = time.time() - t_start
    adapt_writer.close()
    train_writer.close()
    return {
        "steps": step,
        "gradient_updates": gradient_updates,
        "steps_per_sec": step / max(total_time, 1e-9),
        "final_metrics": final_metrics,
        "final_state": sm.state().name,
        "state": state,
    }
