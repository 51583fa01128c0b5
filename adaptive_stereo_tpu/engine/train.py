"""Supervised trainer (reference train.py:140-243).

One jitted value_and_grad step (multiscale Khamis loss + Adam), per-epoch LR
halving via the injected hyperparameter (no recompiles), periodic evaluation
with the reference's early/late logging cadence, full-state checkpoints.
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
from ..utils.logging_utils import MetricsWriter, write_opt_json
from .checkpoint import load_variables, save_checkpoint
from .config import ExperimentConfig
from .evaluate import evaluate
from .state import create_train_state
from .steps import make_eval_step, make_train_step, make_viz_step


def train(cfg: ExperimentConfig, variables: Optional[dict] = None,
          splits_root: Optional[str] = None) -> Dict:
    mc, dc, oc = cfg.model, cfg.data, cfg.optim
    s, k = mc.input_scale, mc.k
    log_path = os.path.join(cfg.log_dir, cfg.model_name)
    write_opt_json(log_path, cfg)

    np.random.seed(cfg.seed)

    model = StereoModel(
        k=k, input_scale=s, maxdisp=mc.maxdisp,
        dtype=jnp.bfloat16 if mc.compute_dtype == "bfloat16" else None,
        fused_siamese=mc.fused_siamese, s2d_refinement=mc.s2d_refinement,
    )
    if variables is None and cfg.load_weights_folder is not None:
        print("Loading models from:", cfg.load_weights_folder)
        variables = load_variables(cfg.load_weights_folder)
    dummy = jnp.zeros((1, dc.height // 2 ** s, dc.width // 2 ** s, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(cfg.seed), dummy, dummy,
                               learning_rate=oc.learning_rate, variables=variables)

    loss_scales = [s, s + k]
    mk = dict(scales=loss_scales, splits_root=splits_root)
    train_dataset = StereoDataset(dc.dataset_path, dc.dataset_name, dc.split,
                                  dc.height, dc.width, "train", do_hflip=dc.do_hflip,
                                  random_crop=True, load_disp_left=True,
                                  load_disp_right=True, seed=cfg.seed, **mk)
    val_dataset = StereoDataset(dc.dataset_path, dc.dataset_name, dc.split,
                                dc.height, dc.width, "val", do_hflip=False,
                                random_crop=False, load_disp_left=True,
                                load_disp_right=False, **mk)
    train_loader = BatchLoader(train_dataset, dc.batch_size, shuffle=not dc.no_shuffle,
                               num_workers=dc.num_workers, seed=cfg.seed)
    val_loader = BatchLoader(val_dataset, dc.batch_size, shuffle=False,
                             num_workers=dc.num_workers, seed=cfg.seed)

    print("-" * 70)
    print(f"DATASET SIZES:\n  TRAIN={len(train_dataset)} VAL={len(val_dataset)}")
    print("-" * 70)

    writer = MetricsWriter(os.path.join(log_path, "val"))
    train_step = make_train_step(model, state.tx, s, loss_scales, oc.clip_grad_norm)
    eval_step = make_eval_step(model, s, k)
    viz_step = make_viz_step(model, s) if cfg.log_images else None

    step = 0
    metrics: Dict = {}
    for epoch in range(cfg.num_epochs):
        for bi, raw_batch in enumerate(train_loader):
            t0 = time.time()
            batch = {key: jax.device_put(jnp.asarray(v)) for key, v in raw_batch.items()}
            state, losses = train_step(state, batch)

            early_phase = (step % cfg.log_frequency) == 0 and step < 2000
            late_phase = (step % 2000) == 0 or bi == 0
            if early_phase or late_phase:
                # Pull the loss scalar (forces completion) before timing.
                losses = {n: float(v) for n, v in losses.items()}
                elapsed = time.time() - t0
                metrics = evaluate(eval_step, state.params, state.batch_stats,
                                   val_loader, cfg.fast_eval)
                writer.log_scalars(metrics, losses, dc.batch_size / max(elapsed, 1e-9),
                                   epoch, step)
                if viz_step is not None:
                    outputs = viz_step(state.params, state.batch_stats, batch)
                    writer.log_images(batch, outputs, step)
            step += 1

        if epoch >= 1 and (epoch % cfg.save_freq) == 0:
            save_checkpoint(log_path, state, epoch, {"config": cfg.to_json()})

        # StepLR(gamma=0.5) per epoch (reference train.py:167,240).
        if (epoch + 1) % oc.scheduler_step_size == 0:
            state = state.with_learning_rate(
                state.learning_rate * 0.5)

    save_checkpoint(log_path, state, cfg.num_epochs - 1, {"config": cfg.to_json()})
    writer.close()
    return {"state": state, "final_metrics": metrics, "steps": step}
