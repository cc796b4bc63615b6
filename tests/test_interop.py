"""Reference serde blob interop: bincode v1 and JSON carriers."""

import json
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from qfilter_spark import interop
from qfilter_spark.rsqf import Filter


def _filled(n=500, cap=1000, fp=0.01, resizeable=False):
    f = (Filter.new_resizeable(64, cap, fp) if resizeable
         else Filter.new(cap, fp))
    hs = (np.arange(1, n + 1, dtype=np.uint64)
          * np.uint64(0x9E3779B97F4A7C15))
    f.insert_hashes(hs)
    return f


@pytest.mark.parametrize("resizeable", [False, True])
def test_bincode_roundtrip(resizeable):
    f = _filled(resizeable=resizeable)
    back = interop.from_reference_bincode(interop.to_reference_bincode(f))
    assert back.qbits == f.qbits and back.rbits == f.rbits
    assert back.max_qbits == f.max_qbits
    assert np.array_equal(back.fingerprints(), f.fingerprints())


def test_json_roundtrip():
    f = _filled()
    back = interop.from_reference_json(interop.to_reference_json(f))
    assert (back.qbits, back.rbits, back.max_qbits) == (f.qbits, f.rbits,
                                                        f.max_qbits)
    assert np.array_equal(back.fingerprints(), f.fingerprints())


def test_bincode_structural_layout():
    """Field-by-field layout of bincode v1: u64 LE buffer length prefix,
    raw buffer, u64 LE len, qbits u8, rbits u8, Option tag (+value)."""
    f = _filled(n=100, cap=200)
    data = interop.to_reference_bincode(f)
    (blen,) = struct.unpack_from("<Q", data, 0)
    n_blocks = (1 << f.qbits) // 64
    assert blen == n_blocks * (1 + 16 + 64 * f.rbits // 8)  # src/lib.rs:476
    (length,) = struct.unpack_from("<Q", data, 8 + blen)
    assert length == len(f)
    q, r = struct.unpack_from("<BB", data, 16 + blen)
    assert (q, r) == (f.qbits, f.rbits)
    tag = data[18 + blen]
    assert tag == (0 if f.max_qbits is None else 1)
    assert len(data) == 19 + blen + (1 if tag else 0)


def test_json_field_names_match_reference():
    """serde renames: b/l/q/r/g (src/lib.rs:84-106); g omitted when None."""
    f = _filled(n=10, cap=100)
    obj = json.loads(interop.to_reference_json(f))
    assert set(obj) <= {"b", "l", "q", "r", "g"}
    assert obj["l"] == len(f)
    assert isinstance(obj["b"], list) and all(0 <= v <= 255 for v in obj["b"])
    if f.max_qbits is None:
        assert "g" not in obj


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                min_size=0, max_size=200))
def test_bincode_roundtrip_property(hashes):
    f = Filter.new(256, 0.01)
    if hashes:
        f.insert_hashes(np.array(hashes, dtype=np.uint64))
    back = interop.from_reference_bincode(interop.to_reference_bincode(f))
    assert np.array_equal(back.fingerprints(), f.fingerprints())


def test_corrupt_buffer_length_rejected():
    f = _filled(n=10, cap=100)
    data = bytearray(interop.to_reference_bincode(f))
    struct.pack_into("<Q", data, 0, 5)  # lie about the buffer length
    with pytest.raises((ValueError, struct.error)):
        interop.from_reference_bincode(bytes(data))
