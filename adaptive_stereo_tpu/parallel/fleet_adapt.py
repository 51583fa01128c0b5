"""Fleet adaptation driver: N camera streams, one shared model, one program.

The BASELINE.json north-star workload: per-chip camera streams (e.g. KITTI
raw campus/city/road/residential) sharded across a mesh, each with its OWN
OOD gate, FCS EMA, reservoir OVS and DONE/IN_PROGRESS state machine — while
every gradient update is a psum-combined update of the SHARED model.

Per step: ONE fused XLA dispatch (parallel/fleet.py:make_fused_fleet_step)
covering all streams' forward+backward, per-stream gating, and the shared
masked Adam update. The host then reads back the per-stream scalar vector and
commits reservoir mutations / state transitions per stream.

Documented fleet-specific policy (no reference counterpart exists): a DONE
stream keeps running through the same train-mode executable — its gradient
weight and its BN-stats contribution are masked out on device — rather than
switching to an eval-mode graph (which would force per-state executables and
defeat the single-dispatch design).
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.adapt import State, StateMachine
from ..engine.steps import make_ovs_validate_step
from .fleet import init_fleet_fcs_ema, make_fused_fleet_step
from .mesh import data_sharding, make_mesh


@dataclass
class FleetStream:
    """One camera stream: its dataset plus per-stream adaptation state."""

    dataset: object                 # map-style dataset of frame dicts
    name: str = "stream"
    er_dataset: Optional[object] = None
    state_machine: Optional[StateMachine] = None
    steps: int = 0
    gradient_updates: int = 0
    fcs_history: List[float] = field(default_factory=list)


def fleet_adapt(
    model,
    state,
    streams: List[FleetStream],
    input_scale: int,
    k: int,
    num_steps: int,
    ood_threshold: float = 15.0,
    fcs_ema_weight: float = 0.999,
    smoothness_weight: float = 1e-3,
    er_loss_weight: float = 0.05,
    adapt_mode: str = "VS+ER",
    ovs_buffer_size: int = 8,
    ovs_validate_hz: int = 100,
    val_improve_retries: int = 1,
    clip_grad_norm: bool = True,
    mesh=None,
    seed: int = 123,
    warp_precision: str = "highest",
    bn_mode: str = "per_stream",
) -> Dict:
    """Run synchronized fleet adaptation for num_steps frames per stream.

    warp_precision / bn_mode forward to make_fused_fleet_step: the bf16
    production fleet uses ("default", "shared") — see PERFORMANCE.md round-4
    multi-stream table; defaults here are the exact-parity semantics.

    Returns {'state': final TrainState, 'streams': per-stream summaries}.
    """
    n = len(streams)
    if mesh is None:
        mesh = make_mesh(min(n, len(jax.devices())))
    shard = data_sharding(mesh)

    use_er = adapt_mode in ("ER", "VS+ER")
    use_vs = adapt_mode not in ("NONSTOP", "ER", "NONE")

    fused = make_fused_fleet_step(
        model, mesh, input_scale, k,
        smoothness_weight=smoothness_weight, er_loss_weight=er_loss_weight,
        use_er=use_er, use_vs=use_vs, ood_threshold=ood_threshold,
        fcs_ema_weight=fcs_ema_weight, clip_grad_norm=clip_grad_norm,
        warp_precision=warp_precision, bn_mode=bn_mode,
    )
    validate_fn = make_ovs_validate_step(model, input_scale, smoothness_weight)

    # Per-stream state machines with per-stream seeded RNGs (determinism per
    # stream regardless of fleet size).
    sample = streams[0].dataset[0]
    h, w = sample[f"color_l/{input_scale}"].shape[:2]
    for i, st in enumerate(streams):
        if st.state_machine is None:
            initial = State.DONE if adapt_mode == "NONE" else State.IN_PROGRESS
            st.state_machine = StateMachine(
                initial, ovs_buffer_size, validate_fn, (h, w),
                rng=random.Random(seed + i),
            )

    ema = init_fleet_fcs_ema(n)

    def stack_frames(step_idx: int, er: bool):
        frames = []
        for st in streams:
            ds = (st.er_dataset or st.dataset) if er else st.dataset
            frames.append(ds[step_idx % len(ds)])
        batch = {key: np.stack([f[key] for f in frames]) for key in frames[0]}
        return {key: jax.device_put(jnp.asarray(v), shard) for key, v in batch.items()}

    for step_idx in range(num_steps):
        # Per-stream OVS validation / transition at the cadence boundary.
        if step_idx % ovs_validate_hz == 0:
            for st in streams:
                sm = st.state_machine
                if sm.ovs_buffer_size() > 0 and sm.state() == State.IN_PROGRESS:
                    sm.validate(state.params, state.batch_stats)
                    if use_vs:
                        sm.transition(val_improve_retries)

        batch_n = stack_frames(step_idx, er=False)
        er_batch_n = stack_frames(step_idx, er=True) if use_er else batch_n

        pres = [st.state_machine.ovs.pre_decide(step_idx) if use_vs else None
                for st in streams]
        would_add_n = jnp.asarray([bool(p.add) if p else False for p in pres])
        in_progress_n = jnp.asarray(
            [st.state_machine.state() == State.IN_PROGRESS for st in streams])

        state, ema, aux = fused(state, ema, batch_n, er_batch_n,
                                would_add_n, in_progress_n)

        novel = np.asarray(aux["novel"])
        did_add = np.asarray(aux["did_add"])
        do_update = np.asarray(aux["do_update"])
        fcs_smoothed = np.asarray(aux["fcs_smoothed"])
        mono = np.asarray(aux["Monodepth/total_loss"])

        for i, st in enumerate(streams):
            st.steps += 1
            st.fcs_history.append(float(fcs_smoothed[i]))
            sm = st.state_machine
            if use_vs and bool(novel[i]):
                if sm.state() == State.IN_PROGRESS:
                    sm.commit_novel(
                        pres[i],
                        batch_n[f"color_l/{input_scale}"][i : i + 1],
                        batch_n[f"color_r/{input_scale}"][i : i + 1],
                        float(mono[i]), step_idx)
                else:
                    # DONE + novel frame -> restart (reference adapt.py:111-114).
                    sm.ovs.commit(pres[i],
                                  batch_n[f"color_l/{input_scale}"][i : i + 1],
                                  batch_n[f"color_r/{input_scale}"][i : i + 1],
                                  float(mono[i]), step_idx)
                    sm.restart()
            if bool(do_update[i]):
                st.gradient_updates += 1

    return {
        "state": state,
        "streams": [
            {"name": st.name, "steps": st.steps,
             "gradient_updates": st.gradient_updates,
             "final_state": st.state_machine.state().name,
             "ovs_size": st.state_machine.ovs_buffer_size()}
            for st in streams
        ],
    }
