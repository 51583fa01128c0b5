"""Train state: one pytree carrying params, BatchNorm stats, and Adam state.

The functional-core design (SURVEY.md §7): pure jitted step functions over an
explicit state pytree. Learning rate is an injected hyperparameter so the
reference's per-epoch StepLR halving (train.py:167, gamma 0.5) is a host-side
scalar write, not a recompile.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray            # scalar int32
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Any = struct.field(pytree_node=False)
    tx: Any = struct.field(pytree_node=False)

    @property
    def learning_rate(self) -> float:
        return float(self.opt_state.hyperparams["learning_rate"])

    def with_learning_rate(self, lr: float) -> "TrainState":
        """Host-side LR update (reference scheduler.step(), train.py:240)."""
        hp = dict(self.opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return self.replace(opt_state=self.opt_state._replace(hyperparams=hp))


def make_optimizer(learning_rate: float) -> optax.GradientTransformation:
    """Adam with torch defaults (b1=0.9, b2=0.999, eps=1e-8), LR injectable."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate)


def create_train_state(
    model,
    rng: jax.Array,
    sample_left: jnp.ndarray,
    sample_right: jnp.ndarray,
    learning_rate: float = 1e-5,
    variables: Optional[dict] = None,
) -> TrainState:
    """Initialize (or adopt imported) variables and build the optimizer state.

    Args:
      model: a models.StereoModel instance.
      rng: PRNG key for fresh init (ignored if `variables` given).
      sample_left/right: example inputs for shape inference.
      variables: optional pre-built {'params','batch_stats'} (e.g. from
        models.load_reference_checkpoint).
    """
    if variables is None:
        variables = model.init(rng, sample_left, sample_right, train=False)
    # COPY (not adopt) caller-provided arrays: the fused adapt step donates
    # state buffers, and donating a caller's arrays would delete them.
    params = jax.tree.map(lambda v: jnp.array(v, copy=True), variables["params"])
    batch_stats = jax.tree.map(
        lambda v: jnp.array(v, copy=True), variables.get("batch_stats", {})
    )
    tx = make_optimizer(learning_rate)
    opt_state = tx.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        apply_fn=model.apply,
        tx=tx,
    )
