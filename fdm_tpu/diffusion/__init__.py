from fdm_tpu.diffusion.schedule import DiffusionSchedule, cosine_beta_schedule, make_schedule
from fdm_tpu.diffusion.gaussian import (
    q_sample,
    q_posterior,
    predict_noise_from_start,
    predict_start_from_noise,
    p_losses,
    ddpm_sample,
    ddim_sample,
    ddim_time_pairs,
)

__all__ = [
    "DiffusionSchedule",
    "cosine_beta_schedule",
    "make_schedule",
    "q_sample",
    "q_posterior",
    "predict_noise_from_start",
    "predict_start_from_noise",
    "p_losses",
    "ddpm_sample",
    "ddim_sample",
    "ddim_time_pairs",
]
