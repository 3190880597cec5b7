from fdm_tpu.models.fdm import FDM
from fdm_tpu.models.pipeline import LatentDiffusion

__all__ = ["FDM", "LatentDiffusion"]
