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


class TrustRegionGuard:
    """Divergence guard, four channels (framework-new; no reference
    counterpart). Keeps a snapshot of the model/optimizer state and rolls
    back to it when a channel flags the current trajectory as diverged.
    Each channel is independently optional; all off = exact reference
    behavior. The channel design is grounded in the round-4 and round-5
    paper-scale guard studies (artifacts/paper_scale_r4/ANALYSIS.md,
    artifacts/gtfree_study_r5/ANALYSIS.md), which measured which signals
    can and cannot see real divergence:

    1. ``tol`` — OVS-loss trust region: rollback when a validation
       regresses past ``best * (1 + tol)`` or comes back NON-FINITE
       (naive comparisons are False for NaN; ADVICE r3, medium). OVS
       churn (``mark_churn()``): losses on a changed buffer are not
       comparable to ``best``, so the next validation re-baselines with a
       one-band ratchet and only a CATASTROPHIC (``CHURN_HARD_FACTOR``)
       or non-finite loss rolls back (ADVICE r3: spurious rollbacks under
       churn). MEASURED LIMITATION: photometric-consistent collapse keeps
       the OVS loss flat (~0.218 while train EPE walks to 107) — this
       channel cannot see the divergence mode that actually occurs.
    2. ``disp_band`` — prediction-scale plausibility band over the OVS
       mean |disparity| (see check()). MEASURED LIMITATION: under severe
       domain shift the pre-adaptation model is itself scale-degenerate,
       so the reference scale does not separate healthy from collapsed.
    3. ``train_epe_factor`` — GT-supervised forgetting containment at
       eval boundaries (see check_train_epe()). The first channel measured
       to contain the collapse: diverged fused-VS restored to the exact
       pre-adaptation train EPE (5.434 vs 106.6 unguarded).
    4. ``lr_factor`` — GT-FREE L-R cross-consistency vs its pre-adaptation
       value (see check_lr()). Round-5 measurement: healthy VS+ER repairs
       cross-view geometry (29.2 -> 5.6) while the collapse breaks it
       (-> 30-44, photometric loss flat); 5.3x late-stage separation.
    """

    CHURN_HARD_FACTOR = 10.0

    def __init__(self, tol: float, snapshot_fn, restore_fn,
                 disp_band: float = 0.0, train_epe_factor: float = 0.0,
                 lr_factor: float = 0.0):
        self.tol = float(tol)
        self.disp_band = float(disp_band)
        self.train_epe_factor = float(train_epe_factor)
        self.lr_factor = float(lr_factor)
        self.snapshot_fn = snapshot_fn
        self.restore_fn = restore_fn
        self.best = float("inf")
        # Per-channel snapshots (ADVICE r4, medium): `snap` belongs to the
        # loss/disp channels and is always PAIRED with `best` (it is only
        # replaced together with a `best` update, or by the armed channels'
        # own pin policies before any validation ran). The train-EPE
        # channel's in-band refresh writes `epe_snap` instead, so it can
        # never silently break that pairing.
        self.snap = None
        self.epe_snap = None
        self.lr_snap = None
        self.stale = False
        self.rollbacks = 0
        self.disp_ref = None
        self.train_epe_ref = None
        self.lr_ref = None

    @property
    def enabled(self) -> bool:
        return self.tol > 0.0 or self.disp_band > 0.0 or \
            self.train_epe_factor > 0.0 or self.lr_factor > 0.0

    def mark_churn(self):
        self.stale = True

    def check_train_epe(self, ss, train_epe: float, factor: float):
        """Third channel, evaluated at EVAL boundaries (GT-supervised):
        roll back when the TRAIN-domain EPE exceeds factor x its
        pre-adaptation value. This is catastrophic-forgetting containment —
        the exact quantity the ER method exists to protect (reference
        adaptation.csv rows) — and the only signal measured to be
        UN-blindable by photometric-consistent collapse: the round-4 study
        found both OVS-loss thresholds (loss stays flat at 0.218) and
        prediction-scale bands (the pre-adaptation model on a severe shift
        is itself scale-degenerate, mean |disp| 59.9) miss the collapse,
        while train EPE blows 5.4 -> 24.7 by the first eval
        (artifacts/paper_scale_r4/ANALYSIS.md). Returns (ss, rolled)."""
        if factor <= 0.0:
            return ss, False
        if self.train_epe_ref is None:
            if np.isfinite(train_epe):
                self.train_epe_ref = float(train_epe)
                self.epe_snap = self.snapshot_fn(ss)
                if self.snap is None:
                    # Also seed the loss/disp channels' snapshot so a
                    # non-finite validation before their own first pin has
                    # a rollback target; `best` is still inf, so the
                    # pairing invariant (snap achieved <= best) holds.
                    self.snap = self.epe_snap
            return ss, False
        if not np.isfinite(train_epe) or \
                train_epe > self.train_epe_ref * factor:
            target = self.epe_snap if self.epe_snap is not None else self.snap
            if target is None:
                return ss, False
            self.rollbacks += 1
            print(f"[ OVS-GUARD ] train-domain EPE {train_epe:.3f} exceeds "
                  f"{factor:.1f}x its pre-adaptation value "
                  f"{self.train_epe_ref:.3f} (catastrophic forgetting / "
                  f"collapse); rolling back to the last certified "
                  f"non-forgetting snapshot (rollback #{self.rollbacks})")
            # The restored trajectory invalidates the loss channel's
            # baseline (its `best` was measured on the discarded one);
            # re-baseline at the next validation via the churn ratchet
            # (ADVICE r4: re-baseline `best` whenever another channel's
            # rollback changes the model under it).
            self.stale = True
            return self.restore_fn(ss, target), True
        # In-band eval: this model is certified non-forgetting — refresh
        # THIS channel's snapshot so its rollbacks restore the latest
        # healthy state. The loss channel's `snap`/`best` pairing is
        # untouched (ADVICE r4, medium).
        self.epe_snap = self.snapshot_fn(ss)
        return ss, False

    def check_lr(self, ss, lr_cons: float):
        """Fourth channel (GT-FREE; round-5 study
        artifacts/gtfree_study_r5/ANALYSIS.md): L-R cross-consistency
        relative to its PRE-ADAPTATION value. Healthy adaptation REPAIRS
        cross-view geometric agreement (measured 29.2 -> 5.6 over 4000
        steps) while photometric-consistent collapse breaks it (-> 30-44
        with the photometric loss flat at 0.22) — direction-awareness is
        what lets this channel see past a degenerate starting model, which
        blinds the absolute disparity-scale band (round-4 finding 3).
        Rolls back when lr_cons exceeds factor x the pinned reference (or
        is non-finite); in-band checks refresh this channel's own
        snapshot. Returns (ss, rolled)."""
        if self.lr_factor <= 0.0:
            return ss, False
        if self.lr_ref is None:
            if np.isfinite(lr_cons):
                self.lr_ref = max(float(lr_cons), 1e-6)
                self.lr_snap = self.snapshot_fn(ss)
                if self.snap is None:
                    self.snap = self.lr_snap
            return ss, False
        if not np.isfinite(lr_cons) or \
                lr_cons > self.lr_ref * self.lr_factor:
            target = self.lr_snap if self.lr_snap is not None else self.snap
            if target is None:
                return ss, False
            self.rollbacks += 1
            print(f"[ OVS-GUARD ] L-R cross-consistency {lr_cons:.3f} "
                  f"exceeds {self.lr_factor:.2f}x its pre-adaptation value "
                  f"{self.lr_ref:.3f} (geometric disagreement under a flat "
                  f"photometric loss = collapse signature); rolling back "
                  f"(rollback #{self.rollbacks})")
            self.stale = True   # re-baseline the loss channel (ADVICE r4)
            return self.restore_fn(ss, target), True
        self.lr_snap = self.snapshot_fn(ss)
        return ss, False

    def pin_initial(self, ss, mean_disp: float):
        """Pin the plausible prediction scale AND an initial snapshot from
        the PRE-ADAPTATION model. The round-4 paper-scale study showed
        collapse can complete before the first OVS validation (EPE 59 by
        step 1000, first validation at step 200 already degenerate,
        artifacts/paper_scale_r4/ANALYSIS.md), so a first-validation
        reference — and a snapshotless first rollback opportunity — both
        arrive too late."""
        self.disp_ref = max(float(mean_disp), 1e-3)
        self.snap = self.snapshot_fn(ss)

    def check(self, ss, avg_loss: float, mean_disp: Optional[float] = None):
        """Returns (ss, rolled_back).

        mean_disp: mean |predicted disparity| over the OVS (second guard
        channel, active when disp_band > 0). The round-4 paper-scale study
        measured that photometric-consistent collapse — train EPE 107 with
        the OVS loss FLAT at ~0.218 — is INVISIBLE to any loss threshold
        (artifacts/paper_scale_r4/ANALYSIS.md), while the disparity scale
        explodes; a validation whose mean |disp| leaves
        [ref/band, ref*band] of the FIRST validation's scale rolls back.
        OVS churn cannot plausibly move the mean prediction scale, so this
        channel ignores churn staleness.
        """
        if not self.enabled:
            return ss, False
        nonfinite = not np.isfinite(avg_loss)
        disp_bad = False
        if self.disp_band > 0.0 and mean_disp is not None:
            if not np.isfinite(mean_disp):
                disp_bad = True
            elif self.disp_ref is not None:
                disp_bad = (mean_disp > self.disp_ref * self.disp_band or
                            mean_disp < self.disp_ref / self.disp_band)
        if self.snap is not None and (disp_bad or nonfinite):
            self.rollbacks += 1
            if nonfinite:
                why = "is non-finite"
            elif not np.isfinite(mean_disp) or self.disp_ref is None:
                # disp_ref can legitimately still be None here (pin_initial
                # not called, snapshot pinned by another channel, first
                # validation's scale already non-finite — ADVICE r4, low).
                why = f"has non-finite mean |disp| ({mean_disp})"
            else:
                why = (f"mean |disp| {mean_disp:.3f} left the plausibility "
                       f"band [{self.disp_ref / self.disp_band:.3f}, "
                       f"{self.disp_ref * self.disp_band:.3f}]")
            print(f"[ OVS-GUARD ] validation {avg_loss:.5f} {why}; rolling "
                  f"back to the best snapshot (rollback #{self.rollbacks})")
            return self.restore_fn(ss, self.snap), True
        if self.tol > 0.0 and self.snap is not None and not nonfinite:
            limit = self.best * (self.CHURN_HARD_FACTOR if self.stale
                                 else (1.0 + self.tol))
            if avg_loss > limit:
                self.rollbacks += 1
                why = (f"exceeds the {'churn-hardened ' if self.stale else ''}"
                       f"limit {limit:.5f} (best {self.best:.5f})")
                print(f"[ OVS-GUARD ] validation {avg_loss:.5f} {why}; rolling "
                      f"back to the best snapshot (rollback #{self.rollbacks})")
                return self.restore_fn(ss, self.snap), True
        # Snapshot acceptance: with the disparity channel armed, only models
        # comfortably INSIDE the band (inner band sqrt(disp_band)) may become
        # the snapshot — the collapse LOWERS the photometric loss, so
        # best-loss snapshots would otherwise track the collapse itself.
        disp_ok = True
        if self.disp_band > 0.0 and self.disp_ref is not None and \
                mean_disp is not None and np.isfinite(mean_disp):
            inner = float(np.sqrt(self.disp_band))
            disp_ok = (self.disp_ref / inner <= mean_disp
                       <= self.disp_ref * inner)
        if not nonfinite:
            if self.disp_ref is None and self.disp_band > 0.0 and \
                    mean_disp is not None and np.isfinite(mean_disp):
                # Fallback when pin_initial was not called: the first
                # validation pins the plausible prediction scale.
                self.disp_ref = max(float(mean_disp), 1e-3)
            if not disp_ok:
                return ss, False
            if self.tol <= 0.0:
                # Loss channel disabled: check() must not touch the
                # snapshot (a churned-validation refresh here silently made
                # the rollback target track the collapse — measured:
                # guard4 fused run restored to EPE 33.6 instead of the
                # pretrained 5.4, artifacts/paper_scale_r4/run_guard4.log).
                # Only the armed channels' own policies (pin_initial,
                # check_train_epe in-band refresh) manage it; a pure
                # disp-band guard without pin_initial keeps its FIRST
                # in-band validation as the snapshot.
                if self.snap is None:
                    self.snap = self.snapshot_fn(ss)
                self.stale = False
                return ss, False
            if self.stale:
                # First validation on a churned buffer: re-baseline, but
                # ratchet `best` upward by at most one tolerance band per
                # churn so slow divergence under constant churn cannot hide
                # behind repeated re-baselining; only snapshot models that
                # are within the band (never pair `best` with a worse model).
                cap = self.best * (1.0 + self.tol)
                if avg_loss <= cap:
                    self.best = avg_loss
                    self.snap = self.snapshot_fn(ss)
                else:
                    self.best = cap
                self.stale = False
            elif avg_loss < self.best:
                self.best = avg_loss
                self.snap = self.snapshot_fn(ss)
        return ss, False


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


def save_stream_checkpoint(folder: str, ss, host_state: dict,
                           guard_snap=None, guard_epe_snap=None,
                           guard_lr_snap=None) -> None:
    """Serialize the FULL streaming-adaptation state (VERDICT r3 item 6 —
    framework-new; the reference's only resume artifact is trials.csv,
    adapt.py:247-256): the flat device state (params, Adam moments/count,
    BN stats, FCS EMA, OVS reservoir contents incl. its PRNG key, ring log)
    plus the host-side plateau machine / trust-region guard / counters.
    A resumed run continues bit-identically (tests/test_stream_engine.py::
    test_streaming_checkpoint_resume)."""
    import json as _json

    from flax import serialization

    payload = {"ss": jax.device_get(serialization.to_state_dict(ss))}
    if guard_snap is not None:
        payload["guard_snap"] = jax.device_get(guard_snap)
    if guard_epe_snap is not None:
        payload["guard_epe_snap"] = jax.device_get(guard_epe_snap)
    if guard_lr_snap is not None:
        payload["guard_lr_snap"] = jax.device_get(guard_lr_snap)
    with open(os.path.join(folder, "stream_state.msgpack"), "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    with open(os.path.join(folder, "host_state.json"), "w") as f:
        _json.dump(host_state, f, indent=2)


def load_stream_checkpoint(folder: str, ss_template):
    """Restore (ss, host_state, guard_snap, guard_epe_snap) written by
    save_stream_checkpoint. `ss_template` provides the pytree structure/
    shapes (built by the same config that produced the checkpoint)."""
    import json as _json

    from flax import serialization

    with open(os.path.join(folder, "stream_state.msgpack"), "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    ss = serialization.from_state_dict(ss_template, payload["ss"])
    ss = jax.tree.map(jnp.asarray, ss)

    def _snap(key):
        snap = payload.get(key)
        if snap is not None:
            snap = {k: jnp.asarray(v) for k, v in snap.items()}
        return snap

    with open(os.path.join(folder, "host_state.json")) as f:
        host_state = _json.load(f)
    return (ss, host_state, _snap("guard_snap"), _snap("guard_epe_snap"),
            _snap("guard_lr_snap"))


def adapt_streaming(cfg: ExperimentConfig, variables: Optional[dict] = None,
                    splits_root: Optional[str] = None,
                    train_splits_root: Optional[str] = None,
                    log_chunk: int = 512, engine: str = "flat",
                    transfer_uint8: bool = False,
                    fused_er_forward: bool = False,
                    done_batch: int = 1,
                    device_cache: bool = False,
                    resume_from: Optional[str] = None,
                    probe_hook=None) -> Dict:
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

    resume_from (flat engine only): path to a weights_<step> checkpoint
    folder holding stream_state.msgpack/host_state.json (written at every
    eval boundary); restores the complete streaming state — device state,
    OVS reservoir (contents AND its PRNG key), FCS EMA, plateau machine,
    trust-region guard, update counters — and fast-forwards the stream to
    the saved step, continuing bit-identically with the uninterrupted run.

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
        clip_grad_norm=oc.clip_grad_norm,
        use_leftright=ac.leftright_consistency,
        consistency_weight=ac.consistency_weight,
        warp_precision=ac.warp_precision)
    if getattr(ac, "loss_dtype", ""):
        if engine != "flat":
            raise ValueError("loss_dtype requires engine='flat'")
        step_kwargs["loss_dtype"] = ac.loss_dtype
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

    guard = TrustRegionGuard(
        ac.ovs_guard_tolerance, guard_snapshot, guard_restore,
        disp_band=getattr(ac, "ovs_guard_disp_band", 0.0),
        train_epe_factor=getattr(ac, "ovs_guard_train_epe_factor", 0.0),
        lr_factor=getattr(ac, "ovs_guard_lr_factor", 0.0))

    lr_probe = None
    if guard.lr_factor > 0.0:
        # GT-free L-R cross-consistency probe on a FIXED adapt-val pair
        # (eval mode — the round-5 study's measurement verbatim;
        # artifacts/gtfree_study_r5/ANALYSIS.md). One flipped-batch forward
        # per OVS validation.
        from ..ops import linear_warp

        first_val = next(iter(adapt_val_loader))
        _pl = jax.device_put(jnp.asarray(first_val[f"color_l/{s}"])[:1])
        _pr = jax.device_put(jnp.asarray(first_val[f"color_r/{s}"])[:1])

        @jax.jit
        def _lr_probe(params, bstats):
            flip = lambda x: x[:, :, ::-1, :]
            outs = model.apply(
                {"params": params, "batch_stats": bstats},
                jnp.concatenate([_pl, flip(_pr)], 0),
                jnp.concatenate([_pr, flip(_pl)], 0), side="l",
                train=False)
            pred = outs[f"pred_disp_l/{s}"]
            d_l, d_r = pred[0:1], flip(pred[1:2])
            warped, mask = linear_warp(d_r, d_l, max_disp=mc.maxdisp)
            return (jnp.sum(jnp.abs(warped - d_l) * mask)
                    / jnp.maximum(jnp.sum(mask), 1.0))

        def lr_probe(ss):
            v = current_variables(ss)
            return float(_lr_probe(v["params"], v["batch_stats"]))

    resume_step = 0
    if resume_from is not None:
        if engine != "flat":
            raise ValueError("resume_from requires engine='flat'")
        ss, host, guard.snap, guard.epe_snap, guard.lr_snap = \
            load_stream_checkpoint(resume_from, ss)
        machine.state = State[host["machine_state"]]
        machine.prev_loss = float(host["prev_loss"])
        machine.ovs_did_change = bool(host["ovs_did_change"])
        machine.iters_without_improvement = int(host["iters_without_improvement"])
        guard.best = float(host["guard"]["best"])
        guard.stale = bool(host["guard"]["stale"])
        guard.rollbacks = int(host["guard"]["rollbacks"])
        if host["guard"].get("disp_ref") is not None:
            guard.disp_ref = float(host["guard"]["disp_ref"])
        if host["guard"].get("train_epe_ref") is not None:
            guard.train_epe_ref = float(host["guard"]["train_epe_ref"])
        if host["guard"].get("lr_ref") is not None:
            guard.lr_ref = float(host["guard"]["lr_ref"])
        resume_step = int(host["step"])
        print(f"[ RESUME ] restored streaming state at step {resume_step} "
              f"(machine={machine.state.name}, OVS size={int(ss.reservoir.size)})")

    if guard.disp_band > 0.0 and resume_from is None:
        # Pin the disparity-plausibility reference + initial snapshot from
        # the PRE-ADAPTATION model (see TrustRegionGuard.pin_initial): one
        # eval forward over the first adapt-val batch.
        first = next(iter(adapt_val_loader))
        v0 = current_variables(ss)
        pred0 = jax.jit(
            lambda p, bs, l, r: model.apply(
                {"params": p, "batch_stats": bs}, l, r, side="l",
                train=False)[f"pred_disp_l/{s}"]
        )(v0["params"], v0["batch_stats"],
          jax.device_put(jnp.asarray(first[f"color_l/{s}"])),
          jax.device_put(jnp.asarray(first[f"color_r/{s}"])))
        guard.pin_initial(ss, float(jnp.mean(jnp.abs(pred0))))
        print(f"[ OVS-GUARD ] pre-adaptation mean |disp| = "
              f"{guard.disp_ref:.3f}; plausibility band "
              f"[{guard.disp_ref / guard.disp_band:.3f}, "
              f"{guard.disp_ref * guard.disp_band:.3f}]")

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
        if engine == "flat":
            # Full streaming state alongside the weights: makes every eval
            # boundary a faithful resume point (see save_stream_checkpoint).
            save_stream_checkpoint(
                folder, ss,
                {"machine_state": machine.state.name,
                 "prev_loss": machine.prev_loss,
                 "ovs_did_change": machine.ovs_did_change,
                 "iters_without_improvement": machine.iters_without_improvement,
                 "guard": {"best": guard.best, "stale": guard.stale,
                           "rollbacks": guard.rollbacks,
                           "disp_ref": guard.disp_ref,
                           "train_epe_ref": guard.train_epe_ref,
                           "lr_ref": guard.lr_ref},
                 "step": int(tag), "gradient_updates": gradient_updates},
                guard_snap=guard.snap, guard_epe_snap=guard.epe_snap,
                guard_lr_snap=guard.lr_snap)

    if guard.lr_factor > 0.0 and resume_from is None:
        # Pin the pre-adaptation L-R cross-consistency (fourth channel's
        # direction-aware reference) before the stream starts.
        ss, _ = guard.check_lr(ss, lr_probe(ss))
        print(f"[ OVS-GUARD ] pre-adaptation L-R cross-consistency = "
              f"{guard.lr_ref:.3f}; rollback above "
              f"{guard.lr_ref * guard.lr_factor:.3f}")

    if guard.train_epe_factor > 0.0 and resume_from is None:
        # Pin the pre-adaptation train-domain EPE (the forgetting-guard
        # reference) regardless of skip_initial_eval — the paper VS
        # protocol skips the initial eval, and by the first mid-run eval a
        # collapsing model has already blown the metric
        # (artifacts/paper_scale_r4/ANALYSIS.md).
        v0 = current_variables(ss)
        mt0 = evaluate(eval_step, v0["params"], v0["batch_stats"],
                       train_val_loader, cfg.fast_eval, ac.num_steps)
        if "EPE" in mt0:
            ss, _ = guard.check_train_epe(ss, float(mt0["EPE"]),
                                          guard.train_epe_factor)
            print(f"[ OVS-GUARD ] pre-adaptation train-domain EPE = "
                  f"{guard.train_epe_ref:.3f}; forgetting limit "
                  f"{guard.train_epe_ref * guard.train_epe_factor:.3f}")

    if not ac.skip_initial_eval and resume_from is None:
        ma, mt = run_eval()
        adapt_writer.log_scalars(ma, {}, 0, 0, 0)
        train_writer.log_scalars(mt, {}, 0, 0, 0)
        trials.append(ma, mt, {}, step=-1)

    gradient_updates = 0
    drained_through = 0
    epoch, step = 0, 0
    if resume_from is not None:
        import json as _json

        with open(os.path.join(resume_from, "host_state.json")) as _f:
            gradient_updates = int(_json.load(_f)["gradient_updates"])
        step = resume_step
        drained_through = resume_step
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
            # Losses measured on the new buffer contents are not directly
            # comparable to the guard's best measured on the old ones
            # (ADVICE r3); the guard re-baselines at its next check.
            guard.mark_churn()
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
            if epoch * steps_per_epoch + batch_idx < resume_step:
                continue  # fast-forward the stream to the resume point
            if step % ac.ovs_validate_hz == 0 and step > 0:
                drain(step)
                if machine.state == State.IN_PROGRESS:
                    ss, avg, size, mean_disp = validate_step(ss)
                    if int(size) > 0 and use_vs:
                        ss, rolled = guard.check(ss, float(avg),
                                                 float(mean_disp))
                        if not rolled and guard.lr_factor > 0.0:
                            ss, rolled = guard.check_lr(ss, lr_probe(ss))
                        if rolled:
                            # A rolled-back validation does not feed the
                            # plateau machine: the regressed loss belongs to
                            # the discarded trajectory, and counting it would
                            # let a single guard trigger simultaneously roll
                            # back AND park the restored snapshot in DONE
                            # (ADVICE r3). The restored model keeps adapting;
                            # the next validation judges it on its own merits.
                            machine.iters_without_improvement = 0
                        else:
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
                if probe_hook is not None:
                    # Observability side channel (e.g. the GT-free divergence
                    # study, scripts/run_gtfree_guard_study.py): read-only
                    # access to the live model at drain boundaries. Must not
                    # mutate ss; pure readbacks do not perturb the
                    # deterministic trajectory.
                    probe_hook(step, lambda: current_variables(ss))

            mid_eval = ac.eval_hz > 0 and step % ac.eval_hz == 0
            end_eval = ac.eval_hz <= 0 and batch_idx == steps_per_epoch - 1
            if mid_eval or end_eval:
                drain(step)
                adapt_writer.add_scalar("GRADIENT_UPDATES", gradient_updates, step)
                if guard.enabled:
                    adapt_writer.add_scalar("OVS_GUARD_ROLLBACKS",
                                            guard.rollbacks, step)
                ma, mt = run_eval()
                if guard.train_epe_factor > 0.0 and "EPE" in mt:
                    ss, rolled_epe = guard.check_train_epe(
                        ss, float(mt["EPE"]), guard.train_epe_factor)
                    if rolled_epe:
                        # Log/record the RESTORED model, not the discarded
                        # trajectory the rollback just rejected.
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
        "guard_rollbacks": guard.rollbacks,
        "steps_per_sec": step / max(total, 1e-9),
        "final_metrics": final_metrics,
        "final_state": machine.state.name,
        "stream_state": ss,
    }
