"""Shared TPU tiling helpers for the Pallas kernels.

One definition of the lane width and pad-to-tile rounding used by
attention.py, adain.py, and quantize.py — a padding-policy change (e.g. a
dtype-dependent lane width) must not have to touch three copies.
"""

from __future__ import annotations

# last-dimension tile width of TPU vector memory (fp32); blocked SMEM/VMEM
# BlockSpecs must tile the trailing axis to a multiple of this
LANE = 128


def round_up(x: int, m: int) -> int:
    """Smallest multiple of m that is >= x."""
    return -(-x // m) * m
