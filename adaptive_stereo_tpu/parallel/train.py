"""Data-parallel supervised training over a device mesh.

Scale-out for the pretraining stage (reference train.py is single-GPU): the
global batch is sharded over the mesh's "data" axis via shard_map, each
device computes the multiscale Khamis loss + grads on its shard, gradients
psum-average over ICI, and one Adam update applies to the replicated params.

BatchNorm policy (explicit, tested): per-device batch statistics for
normalization (local BN — matches the reference's semantics where the batch
IS the device batch), running stats updated with the across-device mean.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..engine.steps import clip_stereo_net_grads
from ..ops import khamis_robust_loss_multiscale
from .fleet import _shard_map


def make_parallel_train_step(model, tx, mesh: Mesh, input_scale: int,
                             scales: Sequence[int], clip_grad_norm: bool,
                             axis_name: str = "data", train_bn: bool = True):
    """Returns train_step(state, sharded_batch) -> (state, losses). The batch
    leading axis must be divisible by the mesh size and sharded on `axis_name`
    (parallel.data_sharding).

    train_bn=False runs BatchNorm on running stats (eval mode, stats frozen):
    normalization then has no cross-sample coupling, so the psum-mean of the
    per-device grads is EXACTLY the single-device global-batch grad — the
    invariant tests/test_parallel.py pins numerically."""

    def local_step(params, batch_stats, opt_state, batch):
        left = batch[f"color_l/{input_scale}"]
        right = batch[f"color_r/{input_scale}"]

        def loss_fn(p):
            if train_bn:
                outputs, mut = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    left, right, side="l", output_cost_volume=False, train=True,
                    mutable=["batch_stats"],
                )
                new_stats = mut["batch_stats"]
            else:
                outputs = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    left, right, side="l", output_cost_volume=False,
                    train=False,
                )
                new_stats = batch_stats
            losses = khamis_robust_loss_multiscale(
                batch, outputs, scales=scales, gt_disp_scale=input_scale)
            return losses["total_loss"], (losses, new_stats)

        (_, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)

        # psum-average over the mesh (ICI collective inserted here).
        n = jax.lax.psum(jnp.ones(()), axis_name)
        grads = jax.tree.map(lambda g: jax.lax.psum(g, axis_name) / n, grads)
        losses = jax.tree.map(lambda l: jax.lax.psum(l, axis_name) / n, losses)
        new_stats = jax.tree.map(lambda s: jax.lax.psum(s, axis_name) / n, new_stats)

        if clip_grad_norm:
            grads = clip_stereo_net_grads(grads)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_stats, new_opt_state, losses

    sharded = _shard_map(
        local_step, mesh,
        in_specs=(P(), P(), P(), P(axis_name)),
        out_specs=(P(), P(), P(), P()),
    )

    @jax.jit
    def train_step(state, batch):
        new_params, new_stats, new_opt, losses = sharded(
            state.params, state.batch_stats, state.opt_state, batch)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_stats, opt_state=new_opt), losses

    return train_step
