"""Checkpoint / resume.

Beyond the reference (which saves bare state_dicts and never restores
optimizer state — train.py:129-137, SURVEY.md §5), checkpoints here capture
the FULL training state: params, BatchNorm running stats, Adam state, step,
plus JSON metadata (config, replay-buffer bookkeeping). Format is flax
msgpack — multi-host safe because every host holds replicated params and
only process 0 writes.

Layout: <log_path>/models/weights_<tag>/
    state.msgpack   (params + batch_stats + opt_state + step)
    meta.json
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
from flax import serialization


def save_checkpoint(
    log_path: str,
    state,
    tag,
    metadata: Optional[Dict[str, Any]] = None,
) -> str:
    """Save train state under models/weights_<tag>/ (reference naming,
    train.py:130). Only process 0 writes in multi-host runs."""
    if jax.process_index() != 0:
        return ""
    folder = os.path.join(log_path, "models", f"weights_{tag}")
    os.makedirs(folder, exist_ok=True)

    payload = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    with open(os.path.join(folder, "state.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(payload)))
    with open(os.path.join(folder, "meta.json"), "w") as f:
        json.dump(metadata or {}, f, indent=2, sort_keys=True)
    return folder


def load_checkpoint(folder: str, state):
    """Restore a full TrainState saved by save_checkpoint (shape/dtype
    template comes from `state`)."""
    with open(os.path.join(folder, "state.msgpack"), "rb") as f:
        payload = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        restored = serialization.from_bytes(payload, f.read())
    return state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )


def save_variables(folder: str, variables: Dict[str, Any],
                   metadata: Optional[Dict[str, Any]] = None) -> str:
    """Save bare {'params','batch_stats'} (no optimizer state) in the same
    msgpack container load_variables reads."""
    os.makedirs(folder, exist_ok=True)
    payload = {"params": variables["params"],
               "batch_stats": variables["batch_stats"]}
    with open(os.path.join(folder, "state.msgpack"), "wb") as f:
        f.write(serialization.msgpack_serialize(jax.device_get(payload)))
    with open(os.path.join(folder, "meta.json"), "w") as f:
        json.dump(metadata or {}, f, indent=2, sort_keys=True)
    return folder


def load_variables(folder: str) -> Dict[str, Any]:
    """Load only {'params','batch_stats'} from a checkpoint folder — either
    our msgpack format or a reference torch weights folder
    (feature_net.pth/stereo_net.pth), auto-detected."""
    msgpack_path = os.path.join(folder, "state.msgpack")
    if os.path.exists(msgpack_path):
        with open(msgpack_path, "rb") as f:
            restored = serialization.msgpack_restore(f.read())
        return {"params": restored["params"], "batch_stats": restored["batch_stats"]}

    if os.path.exists(os.path.join(folder, "feature_net.pth")):
        from ..models.torch_import import load_reference_checkpoint

        # k is recoverable from the number of downsample convs.
        import torch

        fsd = torch.load(os.path.join(folder, "feature_net.pth"), map_location="cpu")
        k = len({n.split(".")[1] for n in fsd if n.startswith("downsample.")})
        return load_reference_checkpoint(folder, k)

    raise FileNotFoundError(f"no checkpoint found in {folder}")
