from fdm_tpu.models.fdm import FDM

__all__ = ["FDM"]
