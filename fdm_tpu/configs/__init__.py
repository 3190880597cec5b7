from fdm_tpu.configs.presets import (
    VQVAEConfig,
    FDMConfig,
    DiffusionConfig,
    DatasetConfig,
    TrainConfig,
    PipelineConfig,
    mead_config,
    vocaset_config,
    biwi_config,
    get_config,
)

__all__ = [
    "VQVAEConfig",
    "FDMConfig",
    "DiffusionConfig",
    "DatasetConfig",
    "TrainConfig",
    "PipelineConfig",
    "mead_config",
    "vocaset_config",
    "biwi_config",
    "get_config",
]
