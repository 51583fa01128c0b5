"""Fleet adaptation: N camera streams adapt one shared model.

Design (framework-new; BASELINE.json north star — no reference counterpart):

- The stream batch has a leading `stream` axis of size N, sharded across the
  mesh's "data" axis: each chip runs the fused forward+backward for its own
  camera frame locally.
- Per-stream FCS scalars come back to the host, which runs one OOD gate /
  reservoir / state machine PER STREAM (decisions stay reproducible
  per-stream, SURVEY.md §7 "hard parts").
- The apply step combines gradients as a do_update-weighted mean — a psum
  over ICI that XLA inserts from the sharding annotations — and performs one
  masked Adam update on the replicated params. Streams whose frame was
  diverted to their OVS (or that are DONE) contribute zero weight.
- BatchNorm: each stream's forward uses its OWN batch statistics (exactly the
  reference's batch-size-1 train-mode BN, adapt.py:313-314); the shared
  running stats are updated with the across-stream mean of the per-stream
  updates. This "local-BN, averaged-stats" choice is an explicit, tested
  policy (SURVEY.md §7).

Both phases are plain jit with NamedShardings — no hand-written collectives;
XLA schedules the psum on ICI.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.steps import clip_stereo_net_grads
from ..ops import online_ema


def _shard_map(fn, mesh, in_specs, out_specs):
    """jax.shard_map with fallback to the deprecated experimental location."""
    try:
        from jax import shard_map as sm  # jax >= 0.8

        return sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_vma=False)
    except (ImportError, TypeError):
        from jax.experimental.shard_map import shard_map as sm

        return sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=False)


def make_fleet_fwd_bwd(single_fwd_bwd, mesh: Mesh, axis_name: str = "data"):
    """Per-stream fused fwd+bwd over the mesh via shard_map: each device runs
    the vmapped step for ITS streams locally (replicated params, stream axis
    sharded). Returns per-stream grads (stacked, sharded) and per-stream aux.

    shard_map (not jit+with_sharding_constraint) is deliberate: the GSPMD
    partitioner miscompiled the vmapped cost-volume backward on the virtual
    CPU mesh (zero stereo-net grads for every shard but the first); explicit
    per-device locality also guarantees no accidental resharding of the
    batch.
    """

    def per_stream(params, batch_stats, batch, er_batch):
        add_b = lambda t: jax.tree.map(lambda x: x[None], t)
        return single_fwd_bwd(params, batch_stats, add_b(batch), add_b(er_batch))

    vmapped = jax.vmap(per_stream, in_axes=(None, None, 0, 0))
    local = _shard_map(
        vmapped, mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name), P(axis_name)),
    )
    return jax.jit(local)


def make_fleet_apply_updates(clip_grad_norm: bool):
    """Combine per-stream grads with a do_update-weighted mean (psum over ICI)
    and apply one masked Adam update to the shared replicated params."""

    @jax.jit
    def apply(state, grads_n, stats_n, do_update_n):
        w = do_update_n.astype(jnp.float32)            # (N,)
        denom = jnp.maximum(jnp.sum(w), 1.0)

        def wmean(g):
            return jnp.tensordot(w, g, axes=(0, 0)) / denom

        grads = jax.tree.map(wmean, grads_n)
        if clip_grad_norm:
            grads = clip_stereo_net_grads(grads)
        any_update = jnp.sum(w) > 0

        updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        def select(new, old):
            return jax.tree.map(lambda n, o: jnp.where(any_update, n, o), new, old)

        # Shared running BN stats: mean of per-stream updated stats.
        new_stats = jax.tree.map(lambda s: jnp.mean(s, axis=0), stats_n)

        return state.replace(
            step=state.step + 1,
            params=select(new_params, state.params),
            opt_state=select(new_opt_state, state.opt_state),
            batch_stats=new_stats,
        )

    return apply


def make_fused_fleet_step(
    model,
    mesh: Mesh,
    input_scale: int,
    k: int,
    smoothness_weight: float = 1e-3,
    er_loss_weight: float = 0.05,
    use_er: bool = False,
    use_vs: bool = False,
    ood_threshold: float = 15.0,
    fcs_ema_weight: float = 0.999,
    clip_grad_norm: bool = False,
    axis_name: str = "data",
    warp_precision: str = "highest",
    bn_mode: str = "per_stream",
    remat: bool = False,
):
    """The whole fleet adaptation step as ONE XLA program over the mesh.

    Per stream (leading axis, sharded over chips): fused fwd+bwd + FCS EMA +
    OOD gate with a pre-drawn per-stream reservoir decision. Then the shared
    update: do_update-weighted mean of per-stream grads (psum over ICI) +
    one masked Adam update on the replicated params; shared BN running stats
    take the across-stream mean of per-stream updates.

    bn_mode:
      "per_stream" (default): each stream's forward normalizes with its OWN
      batch statistics — exactly the reference's batch-1 train-mode BN
      (adapt.py:313-314) replicated per camera. Implemented as a vmapped
      per-stream loss; XLA materializes stream-split <-> merged layout
      conversions around every BN, measured at ~35% overhead over the
      merged-batch control at N=2 (artifacts/profile_fleet_r4.log).
      "shared": ONE merged forward over all local streams; BN batch
      statistics span the whole local fleet batch. Documented deviation
      (same family as the engines' fused_er_forward BN batching): streams
      couple through normalization statistics — acceptable for production
      fleet serving, where cross-camera stats are typically MORE stable
      than batch-1 stats; per-stream losses/FCS/gating are unchanged.

    step(state, ema_n, batch_n, er_batch_n, would_add_n, in_progress_n)
      -> (new_state, new_ema_n, aux_n)
    where ema_n = ((N,) values, (N,) init flags), in_progress_n masks streams
    whose state machine is DONE (they contribute no gradient; in per_stream
    mode their BN stats update is also masked out — shared mode's joint
    statistics cannot exclude them, documented above).
    """
    from ..engine.steps import _epe, make_adapt_loss
    from ..ops import feature_contrast_mean, khamis_robust_loss
    from ..ops import monodepth_single_loss as _mono_loss

    if bn_mode not in ("per_stream", "shared"):
        raise ValueError(f"unknown bn_mode {bn_mode!r}")

    loss_one = make_adapt_loss(
        model, input_scale, k, smoothness_weight=smoothness_weight,
        er_loss_weight=er_loss_weight, use_er=use_er,
        warp_precision=warp_precision,
    )

    def per_stream_loss(params, batch_stats, batch, er_batch):
        add_b = lambda t: jax.tree.map(lambda x: x[None], t)
        return loss_one(params, batch_stats, add_b(batch), add_b(er_batch))

    if remat:
        # Rematerialize the per-stream loss too, so remat=True means the
        # same thing in BOTH bn_modes (ADVICE r4: it used to silently do
        # nothing on the default per_stream path, which only ever went
        # through vloss below — _apply_train serves merged_loss alone).
        per_stream_loss = jax.checkpoint(per_stream_loss)

    # vmap the per-stream LOSS (not the per-stream grad): per-stream BN batch
    # statistics are exactly the reference's batch-1 semantics, but the
    # backward differentiates the gate-weighted SUM of per-stream losses in
    # ONE pass. Mathematically identical to the do_update-weighted sum of
    # per-stream grads (the gate weights are constants w.r.t. params), but
    # XLA then emits ordinary batched weight-gradient contractions instead
    # of per-stream grouped convolutions — measured 2.1x faster at 2 streams
    # per chip on TPU v5e (artifacts/profile_fleet_r3.log: vmap-of-grad
    # 121.6 ms vs 58.1 ms native; n=1 28.4 ms).
    vloss = jax.vmap(per_stream_loss, in_axes=(None, None, 0, 0))

    coarse = input_scale + k
    warp_max_disp = -(-model.maxdisp // 2 ** input_scale)

    def _apply_train(p, batch_stats, left, right, output_cost_volume):
        fn = lambda p_, bs_, l_, r_: model.apply(
            {"params": p_, "batch_stats": bs_}, l_, r_, side="l",
            output_cost_volume=output_cost_volume, train=True,
            mutable=["batch_stats"])
        if remat:
            # Rematerialize the forward in the backward pass (trade
            # recompute for stashed-activation HBM traffic). MEASURED AND
            # REJECTED as a default at the paper shape: ~20% SLOWER across
            # N=1/8/16 — the recompute pays its own bandwidth here
            # (artifacts/bench_multistream_r4d.json vs r4c). Kept as an
            # option for memory-capacity-bound fleet sizes.
            fn = jax.checkpoint(fn)
        return fn(p, batch_stats, left, right)

    def merged_loss(p, batch_stats, batch_n, er_batch_n):
        """bn_mode='shared': one merged forward, per-stream loss vector.
        Returns the same (totals_n, (losses_n, stats, fcs_n, pred_n))
        contract as vloss, except `stats` has no leading stream axis."""
        left_n = batch_n[f"color_l/{input_scale}"]
        right_n = batch_n[f"color_r/{input_scale}"]
        outputs, mut = _apply_train(p, batch_stats, left_n, right_n, True)
        stats = mut["batch_stats"]
        pred_n = outputs[f"pred_disp_l/{input_scale}"]

        def per_stream_mono(l, r, pd):
            return _mono_loss(l[None], r[None], pd[None], smoothness_weight,
                              max_disp=warp_max_disp,
                              warp_precision=warp_precision)[0]

        mono_n = jax.vmap(per_stream_mono)(left_n, right_n, pred_n)
        losses_n = {"Monodepth/total_loss": mono_n}
        totals_n = mono_n
        if use_er:
            er_out, mut2 = _apply_train(
                p, stats,
                er_batch_n[f"color_l/{input_scale}"],
                er_batch_n[f"color_r/{input_scale}"], False)
            stats = mut2["batch_stats"]
            er_pred_n = er_out[f"pred_disp_l/{input_scale}"]
            er_gt_n = er_batch_n[f"gt_disp_l/{input_scale}"]
            rep_n = jax.vmap(
                lambda pd, gt: khamis_robust_loss(pd[None], gt[None]))(
                    er_pred_n, er_gt_n)
            losses_n["Replay/total_loss"] = rep_n
            totals_n = totals_n + er_loss_weight * rep_n
        fkey = f"fcs_l/{coarse}"
        fmap = (outputs[fkey] if fkey in outputs else
                feature_contrast_mean(outputs[f"cost_volume_l/{coarse}"]))
        fcs_n = jnp.mean(fmap.reshape(fmap.shape[0], -1), axis=1)
        # pred_n with a per-stream singleton batch axis, matching vloss.
        return totals_n, (losses_n, stats, fcs_n, pred_n[:, None])

    def local_step(params, batch_stats, opt_state, ema_n, batch_n, er_batch_n,
                   would_add_n, in_progress_n):
        """Runs on each device over its LOCAL streams; collectives combine."""
        ema_values, ema_init = ema_n

        def weighted_total(p):
            if bn_mode == "shared":
                totals_n, (losses_n, stats_n, fcs_n, pred_n) = merged_loss(
                    p, batch_stats, batch_n, er_batch_n)
            else:
                totals_n, (losses_n, stats_n, fcs_n, pred_n) = vloss(
                    p, batch_stats, batch_n, er_batch_n)
            # Per-stream device-side OOD gate (local slice of the EMA
            # vectors); FCS is a gating signal, never a training signal.
            fcs_raw = jax.lax.stop_gradient(fcs_n)
            smoothed = jnp.where(
                ema_init,
                ema_values * fcs_ema_weight + (1.0 - fcs_ema_weight) * fcs_raw,
                fcs_raw,
            )
            if use_vs:
                novel = smoothed < ood_threshold
                did_add = novel & would_add_n
            else:
                novel = jnp.zeros_like(would_add_n)
                did_add = jnp.zeros_like(would_add_n)
            do_update = in_progress_n & jnp.logical_not(did_add)
            w = do_update.astype(jnp.float32)
            return jnp.sum(w * totals_n), (
                losses_n, stats_n, fcs_raw, pred_n, smoothed, novel, did_add,
                do_update, w)

        (_, (aux_n, stats_n, fcs_raw, pred_n, smoothed, novel, did_add,
             do_update, w)), local_sum = jax.value_and_grad(
            weighted_total, has_aux=True)(params)
        aux_n = dict(aux_n)
        aux_n["fcs_raw"] = fcs_raw
        gt_key = f"gt_disp_l/{input_scale}"
        if gt_key in batch_n:
            aux_n["EPE"] = jax.vmap(_epe)(pred_n, batch_n[gt_key][:, None])
        new_ema = (smoothed, jnp.ones_like(ema_init))

        # Gradient combine: ONE psum of the local weighted sum over ICI.
        denom = jnp.maximum(jax.lax.psum(jnp.sum(w), axis_name), 1.0)
        grads = jax.tree.map(lambda g: jax.lax.psum(g, axis_name) / denom, local_sum)
        if clip_grad_norm:
            grads = clip_stereo_net_grads(grads)
        any_update = jax.lax.psum(jnp.sum(w), axis_name) > 0

        # Masked Adam on the replicated params (computed identically on every
        # device — no broadcast needed).
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)

        def select(new, old):
            return jax.tree.map(lambda n, o: jnp.where(any_update, n, o), new, old)

        # Shared BN stats: psum-weighted mean of ACTIVE streams' updated
        # stats (DONE streams masked out); old stats if no stream is active.
        wa = in_progress_n.astype(jnp.float32)
        denom_a = jnp.maximum(jax.lax.psum(jnp.sum(wa), axis_name), 1.0)
        any_active = jax.lax.psum(jnp.sum(wa), axis_name) > 0

        if bn_mode == "shared":
            # Merged-forward stats carry no stream axis: across-device mean
            # of the jointly-updated stats when any stream is active.
            ndev = jax.lax.psum(1.0, axis_name)

            def stats_mean(s_new, s_old):
                m = jax.lax.psum(s_new, axis_name) / ndev
                return jnp.where(any_active, m, s_old)
        else:
            def stats_mean(s_n, s_old):
                m = jax.lax.psum(jnp.tensordot(wa, s_n, axes=(0, 0)),
                                 axis_name) / denom_a
                return jnp.where(any_active, m, s_old)

        new_stats = jax.tree.map(stats_mean, stats_n, batch_stats)

        aux = dict(aux_n)
        aux["fcs_smoothed"] = smoothed
        aux["novel"] = novel
        aux["did_add"] = did_add
        aux["do_update"] = do_update
        return (select(new_params, params), new_stats,
                select(new_opt_state, opt_state), new_ema, aux)

    tx = None  # bound at first call (from state.tx)

    def make_sharded(state_tx):
        nonlocal tx
        tx = state_tx
        return _shard_map(
            local_step, mesh,
            in_specs=(P(), P(), P(), P(axis_name), P(axis_name), P(axis_name),
                      P(axis_name), P(axis_name)),
            out_specs=(P(), P(), P(), P(axis_name), P(axis_name)),
        )

    sharded = {"fn": None}

    @jax.jit
    def _jitted(params, batch_stats, opt_state, step_count, ema_n, batch_n,
                er_batch_n, would_add_n, in_progress_n):
        out = sharded["fn"](params, batch_stats, opt_state, ema_n, batch_n,
                            er_batch_n, would_add_n, in_progress_n)
        return out + (step_count + 1,)

    def step(state, ema_n, batch_n, er_batch_n, would_add_n, in_progress_n):
        if sharded["fn"] is None:
            sharded["fn"] = make_sharded(state.tx)
        new_params, new_stats, new_opt, new_ema, aux, new_count = _jitted(
            state.params, state.batch_stats, state.opt_state, state.step,
            ema_n, batch_n, er_batch_n, would_add_n, in_progress_n)
        new_state = state.replace(step=new_count, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt)
        return new_state, new_ema, aux

    return step


def init_fleet_fcs_ema(num_streams: int):
    return (jnp.zeros((num_streams,)), jnp.zeros((num_streams,), bool))


class FleetDriver:
    """Host-side per-stream OOD gating for a fleet of adaptation streams.

    Maintains one FCS EMA + novelty decision per stream; reservoir/state
    machines plug in per stream via callbacks. Deterministic given stream
    order (seeded per stream index).
    """

    def __init__(self, num_streams: int, ood_threshold: float, fcs_ema_weight: float = 0.999):
        self.num_streams = num_streams
        self.ood_threshold = ood_threshold
        self.fcs_ema_weight = fcs_ema_weight
        self._ema: list = [None] * num_streams

    def smooth_and_gate(self, fcs_raw_n) -> Dict[str, Any]:
        """Update per-stream EMAs with this step's raw FCS vector and return
        the novelty mask."""
        import numpy as np

        fcs_raw_n = np.asarray(fcs_raw_n)
        smoothed = np.empty(self.num_streams, np.float64)
        for i in range(self.num_streams):
            if self._ema[i] is None:
                self._ema[i] = float(fcs_raw_n[i])
            else:
                self._ema[i] = online_ema(
                    self._ema[i], float(fcs_raw_n[i]), self.fcs_ema_weight
                )
            smoothed[i] = self._ema[i]
        return {
            "fcs_smoothed": smoothed,
            "novel": smoothed < self.ood_threshold,
        }
