"""Common sketch protocol + binary codec registry.

Every sketch is a mergeable aggregation state with:
- ``update_hashes(np.uint64[:])`` or ``update_values(np.float64[:])``
- ``merge(other)`` — associative & commutative (the north_rule's merge law;
  analog of the reference's Filter::merge, /root/reference/src/lib.rs:1343-1352)
- ``to_bytes()`` / ``loads(blob)`` round trip

Blob layout: 4-byte magic ``QSKx`` where x is the kind byte, then a
kind-specific header + numpy buffers. ``loads`` dispatches on the kind byte.
"""

from __future__ import annotations

from typing import Callable

_MAGIC = b"QSK"

_REGISTRY: dict[int, Callable[[bytes], "object"]] = {}

KIND_RSQF = 1
KIND_BLOOM = 2
KIND_HLL = 3
KIND_CMS = 4
KIND_KLL = 5
KIND_TDIGEST = 6
KIND_TOPK = 7

KIND_NAMES = {
    "rsqf": KIND_RSQF,
    "bloom": KIND_BLOOM,
    "hll": KIND_HLL,
    "cms": KIND_CMS,
    "kll": KIND_KLL,
    "tdigest": KIND_TDIGEST,
    "topk": KIND_TOPK,
}

# kinds whose decoded sketch carries a per-hash probe surface
# (contains_hashes / count_hashes / estimate_hashes) — hll is
# aggregate-only, kll/tdigest are values-mode
HASH_PROBE_KINDS = {KIND_RSQF, KIND_BLOOM, KIND_CMS, KIND_TOPK}


def kind_of(blob) -> int:
    """The kind byte of a sketch blob — header-only, no payload decode
    (an at-rest RSQF blob can be GBs; capability checks must be O(1))."""
    mv = memoryview(blob)
    if len(mv) < 4 or bytes(mv[:3]) != _MAGIC:
        raise ValueError("not a qfilter_spark sketch blob")
    kind = mv[3]
    if kind not in _REGISTRY:
        raise ValueError(f"unknown sketch kind byte {kind}")
    return kind


def register(kind: int):
    def deco(fn):
        _REGISTRY[kind] = fn
        return fn
    return deco


def frame(kind: int, payload: bytes) -> bytes:
    return _MAGIC + bytes([kind]) + payload


def loads(blob):
    """Decode any registered sketch blob (bytes or memoryview).

    Zero-copy: the payload reaches the decoder as a memoryview — slicing a
    large ``bytes`` would memcpy the whole blob, which is pathologically slow
    inside PySpark worker processes (measured ~20 MB/s vs GB/s elsewhere).
    Decoders back their numpy state directly onto the buffer (read-only).
    """
    mv = memoryview(blob)
    if len(mv) < 4 or bytes(mv[:3]) != _MAGIC:
        raise ValueError("not a qfilter_spark sketch blob")
    kind = mv[3]
    if kind not in _REGISTRY:
        raise ValueError(f"unknown sketch kind byte {kind}")
    return _REGISTRY[kind](mv[4:])
