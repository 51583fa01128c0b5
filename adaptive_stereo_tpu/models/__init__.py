"""Model definitions (flax.linen, NHWC) + torch checkpoint importer."""

from .stereo_net import (
    FeatureExtractorNetwork,
    StereoNet,
    EdgeAwareRefinement,
    StereoModel,
    coarse_num_disparities,
)
from .torch_import import (
    import_feature_net_state_dict,
    import_stereo_net_state_dict,
    load_reference_checkpoint,
)
