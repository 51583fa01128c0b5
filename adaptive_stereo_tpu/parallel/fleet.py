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

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.steps import clip_stereo_net_grads
from ..ops import online_ema


def make_fleet_fwd_bwd(single_fwd_bwd, mesh: Mesh, axis_name: str = "data"):
    """vmap the fused single-stream fwd+bwd over a leading stream axis and
    shard that axis over the mesh. Returns per-stream grads (stacked, sharded)
    and per-stream aux scalars."""

    def per_stream(params, batch_stats, batch, er_batch):
        add_b = lambda t: jax.tree.map(lambda x: x[None], t)
        return single_fwd_bwd(params, batch_stats, add_b(batch), add_b(er_batch))

    vmapped = jax.vmap(per_stream, in_axes=(None, None, 0, 0))

    shard = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    def sharded_tree(tree, s):
        return jax.tree.map(lambda _: s, tree)

    @jax.jit
    def fleet_fwd_bwd(params, batch_stats, batch, er_batch):
        batch = jax.lax.with_sharding_constraint(batch, sharded_tree(batch, shard))
        er_batch = jax.lax.with_sharding_constraint(er_batch, sharded_tree(er_batch, shard))
        params = jax.lax.with_sharding_constraint(params, sharded_tree(params, repl))
        return vmapped(params, batch_stats, batch, er_batch)

    return fleet_fwd_bwd


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
