"""Training: data-parallel step, trainer loop, checkpoints."""

from diffsheg_tpu.train.step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
)
from diffsheg_tpu.train.checkpoint import CheckpointManager  # noqa: F401
from diffsheg_tpu.train.trainer import EvalResult, Trainer  # noqa: F401
