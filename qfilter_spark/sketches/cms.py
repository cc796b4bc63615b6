"""Count-min sketch as a mergeable numpy state.

Sibling sketch required by the north_rule. Merge law = elementwise addition
(associative/commutative). Guarantees: estimate >= true count, and
estimate <= true count + eps * N with probability >= 1 - delta
(Cormode & Muthukrishnan 2005). Cross-check oracle in tests: Spark's
``count_min_sketch`` function and exact group-by counts.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from ..hashing import xxh64_u64
from .base import KIND_CMS, frame, register

_HDR = struct.Struct("<IIQ")  # depth, width, n_total


class CountMinSketch:
    kind = "cms"

    def __init__(self, depth: int, width: int, table: np.ndarray | None = None,
                 n_total: int = 0):
        self.depth = depth
        self.width = width
        self.table = (np.zeros((depth, width), dtype=np.int64)
                      if table is None else table)
        self.n_total = n_total

    @classmethod
    def create(cls, eps: float = 0.001, delta: float = 0.01) -> "CountMinSketch":
        width = int(math.ceil(math.e / eps))
        depth = int(math.ceil(math.log(1.0 / delta)))
        return cls(max(1, depth), max(1, width))

    def eps(self) -> float:
        return math.e / self.width

    def _indexes(self, hashes: np.ndarray) -> np.ndarray:
        """(depth, n) column indexes; row i re-hashes with seed i."""
        h = np.asarray(hashes, dtype=np.uint64)
        rows = [xxh64_u64(h, np.uint64(0xC5EED + i)) % np.uint64(self.width)
                for i in range(self.depth)]
        return np.stack(rows).astype(np.int64)

    def update_hashes(self, hashes: np.ndarray, weights: np.ndarray | None = None) -> None:
        idx = self._indexes(hashes)
        n = idx.shape[1]
        w = np.ones(n, dtype=np.int64) if weights is None else np.asarray(weights, dtype=np.int64)
        for i in range(self.depth):
            # bincount beats unbuffered np.add.at ~10-30x on this hot path
            self.table[i] += np.bincount(
                idx[i], weights=w, minlength=self.width).astype(np.int64)
        self.n_total += int(w.sum())

    def estimate_hashes(self, hashes: np.ndarray) -> np.ndarray:
        idx = self._indexes(hashes)
        ests = np.stack([self.table[i][idx[i]] for i in range(self.depth)])
        return ests.min(axis=0)

    def merge(self, other: "CountMinSketch") -> None:
        if (self.depth, self.width) != (other.depth, other.width):
            raise ValueError("incompatible CMS dimensions")
        self.table += other.table
        self.n_total += other.n_total

    def to_bytes(self) -> bytes:
        return frame(KIND_CMS, _HDR.pack(self.depth, self.width, self.n_total)
                     + self.table.tobytes())

    @classmethod
    def _decode(cls, payload: bytes) -> "CountMinSketch":
        if len(payload) < _HDR.size:
            raise ValueError("corrupt CMS blob: truncated header")
        d, w, n = _HDR.unpack_from(payload, 0)
        if d == 0 or w == 0 or len(payload) - _HDR.size != 8 * d * w:
            raise ValueError(
                f"corrupt CMS blob: payload length {len(payload) - _HDR.size}"
                f" != 8*depth*width for d={d} w={w}")
        table = np.frombuffer(payload, dtype=np.int64, offset=_HDR.size).reshape(d, w).copy()
        return cls(d, w, table, n)


register(KIND_CMS)(CountMinSketch._decode)
