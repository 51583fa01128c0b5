"""Training / adaptation engines: jitted step functions + host-side drivers."""

from .config import ModelConfig, OptimConfig, AdaptConfig, DataConfig, ExperimentConfig
from .state import TrainState, create_train_state
from .steps import (
    make_train_step,
    make_eval_step,
    make_adapt_forward_backward,
    make_infer_step,
    make_apply_updates,
    make_ovs_validate_step,
    make_fused_adapt_step,
    init_fcs_ema,
)
from .evaluate import evaluate
from .checkpoint import save_checkpoint, load_checkpoint, load_variables
from .train import train
from .adapt import adapt, State, StateMachine
from .stream_adapt import make_streaming_steps, init_stream_state, StreamAdaptState
from .stream_driver import adapt_streaming
