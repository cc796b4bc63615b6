"""Vectorized 64-bit bit kernels (numpy 1.26 has no bitwise_count).

Stand-ins for the reference's popcnt/tzcnt primitives
(/root/reference/src/lib.rs:196-308) — SWAR, branch-free, whole-column.
"""

from __future__ import annotations

import numpy as np

_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_H01 = np.uint64(0x0101010101010101)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element population count of a uint64 array (SWAR)."""
    with np.errstate(over="ignore"):
        x = np.asarray(x, dtype=np.uint64).copy()
        x -= (x >> np.uint64(1)) & _M1
        x = (x & _M2) + ((x >> np.uint64(2)) & _M2)
        x = (x + (x >> np.uint64(4))) & _M4
        return ((x * _H01) >> np.uint64(56)).astype(np.uint8)


def trailing_zeros64(x: np.ndarray) -> np.ndarray:
    """Per-element count of trailing zero bits (64 for x == 0)."""
    with np.errstate(over="ignore"):
        x = np.asarray(x, dtype=np.uint64)
        lsb_mask = (x & (~x + np.uint64(1))) - np.uint64(1)  # ones below LSB
        tz = popcount64(lsb_mask).astype(np.uint8)
        return np.where(x == 0, np.uint8(64), tz)
