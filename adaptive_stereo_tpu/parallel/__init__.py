"""Multi-chip scale-out: device mesh, sharded fleet adaptation.

The reference is strictly single-process single-GPU (SURVEY.md §2: zero
distributed code). This layer is framework-new, per the BASELINE north star:
each chip serves its own camera stream; adaptation gradients are reduced over
ICI so the fleet adapts one shared model.
"""

from .mesh import (
    make_mesh,
    data_sharding,
    replicated_sharding,
    initialize_multihost,
    local_data_slice,
)
from .fleet import (
    make_fleet_fwd_bwd,
    make_fleet_apply_updates,
    make_fused_fleet_step,
    init_fleet_fcs_ema,
    FleetDriver,
)
from .fleet_adapt import fleet_adapt, FleetStream
from .train import make_parallel_train_step
