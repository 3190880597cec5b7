"""Pallas TPU kernels for the hot ops, each with an identical-math XLA
fallback (auto-dispatch: Pallas on TPU backends, XLA elsewhere).

  alibi_attention — fused causal ALiBi-biased self-attention (FDM denoiser)
  nearest_code    — fused codebook distance+argmin (VQ quantizer), with
                    emotion-partition masking
  adain           — adaptive instance normalization (dormant reference path)
"""

from fdm_tpu.kernels.attention import (  # noqa: F401
    alibi_attention,
    alibi_attention_pallas,
    alibi_attention_xla,
)
from fdm_tpu.kernels.quantize import nearest_code, nearest_code_pallas  # noqa: F401
from fdm_tpu.kernels.adain import adain, adain_pallas, adain_xla  # noqa: F401
