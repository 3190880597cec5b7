from fdm_tpu.train.loop import (
    TrainState,
    accumulating_optimizer,
    create_train_state,
    default_optimizer,
    freeze_audio_conv_mask,
    frozen_aware_optimizer,
    make_multi_step,
    make_stage1_step,
    make_stage2_step,
    make_stage2_e2e_step,
    replicate_state,
    Trainer,
)

__all__ = [
    "freeze_audio_conv_mask",
    "frozen_aware_optimizer",
    "make_stage2_e2e_step",
    "TrainState",
    "accumulating_optimizer",
    "create_train_state",
    "default_optimizer",
    "make_multi_step",
    "make_stage1_step",
    "make_stage2_step",
    "replicate_state",
    "Trainer",
]
