"""Error types mirroring the reference's error enum.

Reference: /root/reference/src/lib.rs:109-120 (Error enum:
CapacityExceeded | IncompatibleFingerprintSize | NotEnoughFingerprintBits |
CapacityTooLarge).
"""

from __future__ import annotations


class QFilterError(Exception):
    """Base class for all qfilter_spark errors."""


class CapacityExceeded(QFilterError):
    """The filter cannot admit another fingerprint (and cannot grow)."""


class IncompatibleFingerprintSize(QFilterError):
    """merge() requires other.fingerprint_size() >= self.fingerprint_size()."""


class NotEnoughFingerprintBits(QFilterError):
    """Fingerprint must be 7..=64 bits and strictly larger than qbits."""


class CapacityTooLarge(QFilterError):
    """Requested capacity exceeds MAX_CAPACITY (ceil(2^59 * 19 / 20))."""
