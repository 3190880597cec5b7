from fdm_tpu.train.loop import (
    TrainState,
    accumulating_optimizer,
    create_train_state,
    default_optimizer,
    make_stage1_step,
    make_stage2_step,
    replicate_state,
    Trainer,
)

__all__ = [
    "TrainState",
    "accumulating_optimizer",
    "create_train_state",
    "default_optimizer",
    "make_stage1_step",
    "make_stage2_step",
    "replicate_state",
    "Trainer",
]
