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


# ---------------------------------------------------------------------------
# golden-blob fixture: HAND-DERIVED constant bytes for a tiny known filter,
# computed from the PUBLIC reference layout alone (src/lib.rs:468-486,
# 570-572, 725-780) — never from our own encoder — so the interop claim no
# longer rests solely on our encoder/decoder pair agreeing with itself.
#
# Filter: qbits=6 (64 slots, ONE block), rbits=7, max_qbits=None, holding
# fingerprints {(q=5,r=0x11), (q=5,r=0x22), (q=9,r=0x33)}:
#   * runs: bucket 5 -> slots 5,6 (remainders ascending); bucket 9 -> slot 9
#   * occupieds word = (1<<5)|(1<<9) = 0x220;  runends = (1<<6)|(1<<9) = 0x240
#   * block offset byte = 0 (no run covers slot 0)
#   * remainder area: 64 slots x 7 bits, LSB-first; slot i occupies bits
#     [7i, 7i+7). slot5=0x11 -> area bits 35,39; slot6=0x22 -> bits 43,47;
#     slot9=0x33 -> bits 63,64,67,68. Packed bytes: [4]=0x88 [5]=0x88
#     [7]=0x80 [8]=0x19, rest zero (56 bytes).
# bincode v1 = u64 LE buflen (0x49=73) + buffer + u64 LE l=3 + q=6 + r=7
#              + Option tag 0x00.
# ---------------------------------------------------------------------------

_GOLDEN_FPS = np.array([(5 << 7) | 0x11, (5 << 7) | 0x22, (9 << 7) | 0x33],
                       dtype=np.uint64)

_GOLDEN_BUFFER = (
    bytes([0x00])                                    # offset
    + (0x220).to_bytes(8, "little")                  # occupieds
    + (0x240).to_bytes(8, "little")                  # runends
    + bytes([0, 0, 0, 0, 0x88, 0x88, 0, 0x80, 0x19]) + bytes(47))

_GOLDEN_BINCODE = ((73).to_bytes(8, "little") + _GOLDEN_BUFFER
                   + (3).to_bytes(8, "little") + bytes([6, 7, 0]))

_GOLDEN_JSON = ('{"b":[' + ",".join(str(b) for b in _GOLDEN_BUFFER)
                + '],"l":3,"q":6,"r":7}')


def test_golden_blob_bincode():
    f = Filter(6, 7, None, _GOLDEN_FPS.copy())
    assert interop.to_reference_bincode(f) == _GOLDEN_BINCODE
    back = interop.from_reference_bincode(_GOLDEN_BINCODE)
    assert (back.qbits, back.rbits, back.max_qbits) == (6, 7, None)
    assert np.array_equal(back.fingerprints(), _GOLDEN_FPS)


def test_golden_blob_json():
    f = Filter(6, 7, None, _GOLDEN_FPS.copy())
    assert json.loads(interop.to_reference_json(f)) == json.loads(_GOLDEN_JSON)
    back = interop.from_reference_json(_GOLDEN_JSON)
    assert (back.qbits, back.rbits, back.max_qbits) == (6, 7, None)
    assert np.array_equal(back.fingerprints(), _GOLDEN_FPS)


def test_golden_blob_option_some():
    """max_qbits present -> bincode Option tag 1 + value byte; JSON field g."""
    f = Filter(6, 7, 8, _GOLDEN_FPS.copy())
    data = interop.to_reference_bincode(f)
    assert data == ((73).to_bytes(8, "little") + _GOLDEN_BUFFER
                    + (3).to_bytes(8, "little") + bytes([6, 7, 1, 8]))
    assert json.loads(interop.to_reference_json(f))["g"] == 8
    back = interop.from_reference_bincode(data)
    assert back.max_qbits == 8
    assert np.array_equal(back.fingerprints(), _GOLDEN_FPS)


def test_corrupt_buffer_length_rejected():
    f = _filled(n=10, cap=100)
    data = bytearray(interop.to_reference_bincode(f))
    struct.pack_into("<Q", data, 0, 5)  # lie about the buffer length
    with pytest.raises((ValueError, struct.error)):
        interop.from_reference_bincode(bytes(data))
