"""Shared row-tiling helpers for the Pallas kernels.

Both the fused decode (`ops/siren_pallas.py`) and fused training
(`ops/siren_train_pallas.py`) kernels pad the sequence axis to a row tile
aligned to the TPU sublane quantum. One shared helper keeps the alignment
rule from drifting between the two kernels.
"""

from __future__ import annotations

SUBLANE = 8  # fp32 sublane quantum: row tiles must be multiples of this


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
