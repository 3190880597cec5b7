from fdm_tpu.train.loop import (
    TrainState,
    create_train_state,
    default_optimizer,
    make_stage1_step,
    make_stage2_step,
    replicate_state,
    Trainer,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "default_optimizer",
    "make_stage1_step",
    "make_stage2_step",
    "replicate_state",
    "Trainer",
]
