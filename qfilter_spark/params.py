"""Filter sizing arithmetic.

Reproduces the reference's parameter math exactly (semantics, not code):

- ``calculate_needed_slots``: /root/reference/src/lib.rs:399-414 — next power
  of two >= desired, min 64, doubled until ``ceil(slots*19/20) >= desired``.
- capacity = ceil(slots * 19 / 20) (95%% max load): src/lib.rs:544-550.
- MAX_QBITS = 59, MAX_CAPACITY = ceil(2^59*19/20): src/lib.rs:383-386.
- rbits for a target fp rate: ``round(-log2(fp)).max(1)`` plus the growth
  headroom ``max_qbits - qbits`` so the fingerprint size stays constant
  through growth: src/lib.rs:426-443.
"""

from __future__ import annotations

import math

from .errors import CapacityTooLarge, NotEnoughFingerprintBits

MAX_QBITS = 59
MAX_CAPACITY = ((1 << MAX_QBITS) * 19 + 19) // 20
#: smallest positive normal f64, the reference's fp_rate lower clamp
_F64_MIN_POSITIVE = 2.2250738585072014e-308


def div_ceil(a: int, b: int) -> int:
    return -(-a // b)


def next_power_of_two(n: int) -> int:
    """Rust u64::next_power_of_two semantics (0 -> 1)."""
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()


def calculate_needed_slots(desired: int) -> int:
    """Slots (power of two, >= 64) so that ceil(slots*19/20) >= desired."""
    if desired > MAX_CAPACITY:
        raise CapacityTooLarge(f"capacity {desired} > MAX_CAPACITY {MAX_CAPACITY}")
    slots = max(64, next_power_of_two(desired))
    while div_ceil(slots * 19, 20) < desired:
        slots *= 2
        if slots > (1 << MAX_QBITS):
            raise CapacityTooLarge(f"capacity {desired} needs > 2^{MAX_QBITS} slots")
    if slots > (1 << MAX_QBITS):
        raise CapacityTooLarge(f"capacity {desired} needs > 2^{MAX_QBITS} slots")
    return slots


def clamp_fp_rate(fp_rate: float) -> float:
    """Reference clamps fp to (0, 0.5] (f64::MIN_POSITIVE..=0.5)."""
    return min(max(fp_rate, _F64_MIN_POSITIVE), 0.5)


def rbits_for(fp_rate: float, qbits: int, max_qbits: int) -> int:
    """rbits = round(-log2(fp)).max(1) + (max_qbits - qbits).

    Rust f64::round rounds half AWAY from zero; Python's round() is
    banker's rounding, which would yield rbits one lower for fp rates
    where -log2(fp) is exactly x.5 (e.g. 2^-2.5), doubling the error
    bound vs the reference. floor(x + 0.5) reproduces Rust for x >= 0.
    """
    fp = clamp_fp_rate(fp_rate)
    base = max(1, math.floor(-math.log2(fp) + 0.5))
    return base + (max_qbits - qbits)


def resizeable_params(initial_capacity: int, max_capacity: int, fp_rate: float) -> tuple[int, int, int | None]:
    """Returns (qbits, rbits, max_qbits-or-None) per new_resizeable.

    Reference: src/lib.rs:426-443.
    """
    if max_capacity < initial_capacity:
        raise ValueError("max_capacity must be >= initial_capacity")
    qbits = calculate_needed_slots(initial_capacity).bit_length() - 1
    max_qbits = calculate_needed_slots(max_capacity).bit_length() - 1
    rbits = rbits_for(fp_rate, qbits, max_qbits)
    if qbits + rbits > 64:
        raise NotEnoughFingerprintBits(f"qbits {qbits} + rbits {rbits} > 64")
    return qbits, rbits, (max_qbits if max_qbits > qbits else None)


def fingerprint_size_params(initial_capacity: int, fingerprint_bits: int) -> tuple[int, int, int | None]:
    """Returns (qbits, rbits, max_qbits-or-None) per with_fingerprint_size.

    Reference: src/lib.rs:448-466.
    """
    if not (7 <= fingerprint_bits <= 64):
        raise NotEnoughFingerprintBits("fingerprint_bits must be in 7..=64")
    qbits = calculate_needed_slots(initial_capacity).bit_length() - 1
    if fingerprint_bits <= qbits:
        raise NotEnoughFingerprintBits(f"fingerprint_bits {fingerprint_bits} <= qbits {qbits}")
    rbits = fingerprint_bits - qbits
    max_qbits = min(qbits + rbits - 1, MAX_QBITS) if rbits > 1 else None
    return qbits, rbits, max_qbits


def capacity_for(qbits: int, fuzzing: bool = False) -> int:
    """ceil(2^qbits * 19 / 20); 100%% when mirroring the fuzz config."""
    buckets = 1 << qbits
    if fuzzing:
        return buckets
    return div_ceil(buckets * 19, 20)
