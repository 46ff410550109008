"""Training stack: losses, masking, optimizers, train step, checkpointing."""

from mmada_parallel_tpu.training.trainer import (  # noqa: F401
    OptimizerConfig, make_optimizer, make_train_step, TrainState)
from mmada_parallel_tpu.training import losses, masking  # noqa: F401
from mmada_parallel_tpu.training.checkpoint import CheckpointManager  # noqa: F401
