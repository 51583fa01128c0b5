"""Pallas TPU kernels for the hot stereo ops.

Each kernel has a jnp twin in ops/ used as its golden reference; tests run
the kernels in interpreter mode on CPU and compiled on TPU. Enable in the
model with use_pallas=True (TPU only)."""

from .aggregation import (
    aggregate_cost_volume_pallas,
    aggregate_cost_volume_ref,
    aggregation_pallas_supported,
)
from .coarse_head import (
    coarse_head_pallas,
    coarse_head_pallas_supported,
    coarse_head_ref,
)
from .cost_volume import difference_cost_volume_pallas
from .disparity import soft_argmin_fcs_pallas
