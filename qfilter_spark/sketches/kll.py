"""KLL quantile sketch (Karnin, Lang, Liberty 2016) as a mergeable state.

Sibling sketch required by the north_rule. Deterministic variant: each
compactor alternates keeping even/odd-indexed items instead of coin flips,
so partial aggregation is reproducible; as SURVEY.md §2.3 notes, compactor
merges are weakly order-dependent, so tests assert the published rank-error
bound (O(1/k) normalized rank error), not bit-equality across merge orders.

Cross-check oracle in tests: Spark's ``percentile_approx`` and exact ranks.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import KIND_KLL, frame, register

_HDR = struct.Struct("<IQB")  # k, n, num_levels
_C = 2.0 / 3.0


class KllSketch:
    kind = "kll"

    def __init__(self, k: int = 200, levels: list[np.ndarray] | None = None,
                 n: int = 0, flags: int = 0):
        self.k = k
        self.levels: list[np.ndarray] = levels if levels is not None else [
            np.empty(0, dtype=np.float64)]
        self.n = n
        self.flags = flags  # per-level even/odd alternation bits

    @classmethod
    def create(cls, k: int = 200) -> "KllSketch":
        return cls(k=k)

    # ------------------------------------------------------------------
    def _capacity(self, level: int) -> int:
        h = len(self.levels)
        return max(2, int(np.ceil(self.k * _C ** (h - 1 - level))))

    def _total_capacity(self) -> int:
        return sum(self._capacity(i) for i in range(len(self.levels)))

    def update_values(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += int(v.size)
        self._compress()

    def _compress(self) -> None:
        while sum(lv.size for lv in self.levels) > self._total_capacity():
            for i, lv in enumerate(self.levels):
                if lv.size > self._capacity(i):
                    self._compact_level(i)
                    break
            else:
                break

    def _compact_level(self, i: int) -> None:
        lv = np.sort(self.levels[i])
        keep = np.empty(0, dtype=np.float64)
        if lv.size % 2 == 1:
            keep, lv = lv[-1:], lv[:-1]
        offset = (self.flags >> i) & 1
        self.flags ^= (1 << i)  # alternate deterministically
        promoted = lv[offset::2]
        self.levels[i] = keep
        if i + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])

    # ------------------------------------------------------------------
    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for i, lv in enumerate(self.levels):
            if lv.size:
                vals.append(lv)
                wts.append(np.full(lv.size, 1 << i, dtype=np.int64))
        if not vals:
            return np.empty(0), np.empty(0, dtype=np.int64)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q) -> np.ndarray | float:
        """Value(s) at normalized rank(s) q in [0, 1]."""
        v, w = self._weighted()
        if v.size == 0:
            return np.nan
        cum = np.cumsum(w)
        scalar = np.isscalar(q)
        targets = np.atleast_1d(np.asarray(q, dtype=np.float64)) * cum[-1]
        idx = np.searchsorted(cum, targets, side="left")
        idx = np.minimum(idx, v.size - 1)
        out = v[idx]
        return float(out[0]) if scalar else out

    def rank(self, value: float) -> float:
        """Approximate normalized rank of value."""
        v, w = self._weighted()
        if v.size == 0:
            return 0.0
        cum = np.concatenate([[0], np.cumsum(w)])
        i = np.searchsorted(v, value, side="left")
        return float(cum[i] / cum[-1])

    # ------------------------------------------------------------------
    def merge(self, other: "KllSketch") -> None:
        if self.k != other.k:
            raise ValueError("incompatible KLL k")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for i, lv in enumerate(other.levels):
            if lv.size:
                self.levels[i] = np.concatenate([self.levels[i], lv])
        self.n += other.n
        self._compress()

    def to_bytes(self) -> bytes:
        head = _HDR.pack(self.k, self.n, len(self.levels))
        sizes = np.array([lv.size for lv in self.levels], dtype=np.int64)
        body = sizes.tobytes() + b"".join(lv.tobytes() for lv in self.levels)
        return frame(KIND_KLL, head + struct.pack("<Q", self.flags) + body)

    @classmethod
    def _decode(cls, payload: bytes) -> "KllSketch":
        if len(payload) < _HDR.size + 8:
            raise ValueError("corrupt KLL blob: truncated header")
        k, n, h = _HDR.unpack_from(payload, 0)
        if h == 0:
            # a sketch with no level arrays can't accept updates
            # (update_values appends into levels[0]); to_bytes always
            # writes >= 1 level, so this is corruption, not emptiness
            raise ValueError("corrupt KLL blob: zero levels")
        off = _HDR.size
        (flags,) = struct.unpack_from("<Q", payload, off)
        off += 8
        sizes = np.frombuffer(payload, dtype=np.int64, offset=off, count=h)
        off += 8 * h
        # sizes are signed on the wire; a corrupt negative value would make
        # np.frombuffer(count=-1) silently consume the rest of the buffer
        # instead of failing (every other codec's counts are unsigned)
        if sizes.size and (sizes < 0).any():
            raise ValueError("corrupt KLL blob: negative level size")
        levels = []
        for s in sizes:
            levels.append(np.frombuffer(payload, dtype=np.float64, offset=off,
                                        count=int(s)).copy())
            off += 8 * int(s)
        if off != len(payload):
            raise ValueError(
                f"corrupt KLL blob: payload length {len(payload)} != "
                f"consumed {off} (trailing bytes)")
        return cls(k, levels, n, flags)


register(KIND_KLL)(KllSketch._decode)
