"""RSQF Filter wrapped in the common sketch protocol.

Makes the quotient filter usable by the generic distributed aggregation in
:mod:`qfilter_spark.dist.agg` alongside the sibling sketches. Distributed
semantics: every partial filter is created with the same (capacity, fp_rate)
parameters — hence identical fingerprint size — so merges are always
compatible (reference compatibility rule: src/lib.rs:1343-1346).

Wire vs at-rest format: partial sketches and merge rounds travel as the
canonical sorted-fingerprint payload (``fps``) — size proportional to
*content*, O(n) encode/decode — while :meth:`to_blocks_bytes` emits the
reference's physical blocked layout for final at-rest storage
(size proportional to *capacity*; roundtrip tested in tests/test_rsqf.py).
This mirrors Spark's own aggregate buffers (compact partial state) vs final
output representation split.
"""

from __future__ import annotations

import struct

import numpy as np

from ..rsqf import Filter
from .base import KIND_RSQF, frame, register

_HDR = struct.Struct("<?")  # keep_duplicates


class RsqfSketch:
    kind = "rsqf"

    def __init__(self, filter_: Filter, keep_duplicates: bool = True):
        self.filter = filter_
        self.keep_duplicates = keep_duplicates

    @classmethod
    def create(cls, capacity: int, fp_rate: float = 0.01,
               keep_duplicates: bool = True, resizeable_from: int | None = None,
               fingerprint_bits: int | None = None) -> "RsqfSketch":
        if fingerprint_bits is not None:
            # explicit fingerprint width (reference with_fingerprint_size,
            # src/lib.rs:448-466); fp_rate is implied by the width
            f = Filter.with_fingerprint_size(capacity, fingerprint_bits)
        elif resizeable_from is not None:
            f = Filter.new_resizeable(resizeable_from, capacity, fp_rate)
        else:
            f = Filter.new(capacity, fp_rate)
        return cls(f, keep_duplicates)

    def update_hashes(self, hashes: np.ndarray) -> None:
        max_count = (1 << 64) - 1 if self.keep_duplicates else 1
        self.filter.insert_hashes(np.asarray(hashes, dtype=np.uint64),
                                  max_count=max_count)

    def remove_hashes(self, hashes: np.ndarray) -> None:
        """Retract one copy per hash (reference remove semantics
        src/lib.rs:1056-1129) — the streaming retraction hook."""
        self.filter.remove_hashes(np.asarray(hashes, dtype=np.uint64))

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        return self.filter.contains_hashes(hashes)

    def count_hashes(self, hashes: np.ndarray) -> np.ndarray:
        return self.filter.count_hashes(hashes)

    def merge(self, other: "RsqfSketch") -> None:
        # tree-merge may need headroom: grow the target first if the combined
        # multiset cannot fit (merge itself never grows; src/lib.rs:1343-1352)
        if self.keep_duplicates:
            need = len(self.filter) + len(other.filter)
        else:
            # exact union size, not the len-sum overestimate: growing when
            # the deduplicated union would fit needlessly doubles the FPR
            o = np.unique(np.asarray(other.filter._fps, dtype=np.uint64)
                          & self.filter._fp_mask())
            need = len(self.filter) + int((~self.filter.contains_hashes(o)).sum())
        while (need > self.filter.capacity()
               and self.filter.max_qbits is not None
               and self.filter.max_qbits > self.filter.qbits):
            self.filter.grow()
        self.filter.merge(self.keep_duplicates, other.filter)

    def to_bytes(self) -> bytes:
        """Wire format: canonical sorted fingerprints (content-sized)."""
        return frame(KIND_RSQF, _HDR.pack(self.keep_duplicates)
                     + self.filter.to_bytes(fmt="fps"))

    def to_blocks_bytes(self) -> bytes:
        """At-rest format: the reference's physical blocked layout."""
        return frame(KIND_RSQF, _HDR.pack(self.keep_duplicates)
                     + self.filter.to_bytes(fmt="blocks"))

    @classmethod
    def _decode(cls, payload: bytes) -> "RsqfSketch":
        (keep,) = _HDR.unpack_from(payload, 0)
        return cls(Filter.from_bytes(payload[_HDR.size:]), keep)


register(KIND_RSQF)(RsqfSketch._decode)
