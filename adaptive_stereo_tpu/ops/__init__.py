"""Pure functional numerics: jnp reference implementations + Pallas kernels.

Every op here is a pure function over jnp arrays, NHWC layout, designed to be
fused by XLA inside one jitted step. Pallas TPU kernels (ops.pallas) provide
faster drop-in implementations of the hot ops; each kernel has a jnp twin in
this package used for golden-value testing.
"""

from .cost_volume import difference_cost_volume
from .soft_argmin import soft_argmin, softmax_disparity
from .fcs import feature_contrast_mean, feature_contrast_median
from .warp import convert_disp_to_flow, linear_warp
from .losses import (
    khamis_robust_loss,
    khamis_robust_loss_multiscale,
    ssim,
    monodepth_edge_aware_smoothness_loss,
    monodepth_loss,
    monodepth_single_loss,
    monodepth_leftright_loss,
)
from .ema import online_ema
from .entropy import grayscale_shannon_entropy, gradient_shannon_entropy
