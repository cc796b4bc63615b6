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


# ---------------------------------------------------------------------------
# malformed / truncated inputs (round-5 failure-mode review)
# ---------------------------------------------------------------------------

def _blob():
    return interop.to_reference_bincode(_filled(n=10, cap=100))


def test_truncated_bincode_every_prefix_rejected():
    """Every strict prefix must raise ValueError — never struct.error,
    IndexError, or a silently wrong Filter."""
    data = _blob()
    for cut in (0, 4, 7, 8, len(data) // 2, len(data) - 2, len(data) - 1):
        with pytest.raises(ValueError):
            interop.from_reference_bincode(data[:cut])


def test_bincode_trailing_garbage_rejected():
    with pytest.raises(ValueError, match="trailing"):
        interop.from_reference_bincode(_blob() + b"\x00")


def test_bincode_overrunning_buffer_length_rejected():
    data = bytearray(_blob())
    struct.pack_into("<Q", data, 0, 1 << 40)  # buffer "longer" than input
    with pytest.raises(ValueError, match="overruns"):
        interop.from_reference_bincode(bytes(data))


def test_bincode_bad_option_tag_rejected():
    f = _filled(n=10, cap=100)
    assert f.max_qbits is None
    data = bytearray(interop.to_reference_bincode(f))
    data[-1] = 7                              # tag must be 0 or 1
    with pytest.raises(ValueError, match="Option tag"):
        interop.from_reference_bincode(bytes(data))


def test_bincode_invalid_header_fields_rejected():
    f = _filled(n=10, cap=100)
    good = interop.to_reference_bincode(f)
    blen = struct.unpack_from("<Q", good, 0)[0]
    qoff = 8 + blen + 8
    for qbits, rbits in ((0, 8), (3, 8), (60, 8), (f.qbits, 0)):
        data = bytearray(good)
        data[qoff], data[qoff + 1] = qbits, rbits
        with pytest.raises(ValueError):
            interop.from_reference_bincode(bytes(data))
    # length exceeding the slot count
    data = bytearray(good)
    struct.pack_into("<Q", data, 8 + blen, 1 << 50)
    with pytest.raises(ValueError, match="exceeds"):
        interop.from_reference_bincode(bytes(data))


def test_bincode_invalid_max_qbits_rejected():
    f = _filled(n=10, cap=10_000, resizeable=True)
    assert f.max_qbits is not None
    data = bytearray(interop.to_reference_bincode(f))
    data[-1] = 64                              # > qbits + rbits - 1
    with pytest.raises(ValueError, match="max_qbits"):
        interop.from_reference_bincode(bytes(data))


def test_bincode_corrupt_bitvectors_rejected():
    """Flipping runend bits makes occupieds/runends inconsistent: decode
    must surface ONE clear ValueError, not a numpy error mid rank/select."""
    f = _filled(n=50, cap=100)
    good = interop.to_reference_bincode(f)
    saw_reject = 0
    for flip in range(9, 17):                 # runends bytes of block 0
        data = bytearray(good)
        data[8 + flip] ^= 0xFF
        try:
            interop.from_reference_bincode(bytes(data))
        except ValueError:
            saw_reject += 1
    assert saw_reject >= 6                    # nearly all flips detected


def test_json_malformed_rejected():
    with pytest.raises(ValueError, match="malformed JSON"):
        interop.from_reference_json("{not json")
    with pytest.raises(ValueError, match="JSON object"):
        interop.from_reference_json("[1, 2]")
    with pytest.raises(ValueError, match="missing fields"):
        interop.from_reference_json('{"b": [], "q": 8}')
    with pytest.raises(ValueError):            # byte value out of range
        interop.from_reference_json('{"b": [999], "l": 0, "q": 8, "r": 8}')
    with pytest.raises(ValueError):            # negative length
        interop.from_reference_json('{"b": [], "l": -1, "q": 8, "r": 8}')
    with pytest.raises(ValueError, match="max_qbits"):
        interop.from_reference_json(
            json.dumps({"b": list(interop._buffer_of(_filled(10, 100))),
                        "l": 10, "q": 7, "r": 7, "g": 64}))


def test_json_roundtrip_still_green_after_hardening():
    f = _filled(n=25, cap=100, resizeable=True)
    g = interop.from_reference_json(interop.to_reference_json(f))
    assert np.array_equal(g._fps, f._fps)
    assert (g.qbits, g.rbits, g.max_qbits) == (f.qbits, f.rbits, f.max_qbits)


def test_bincode_zeroed_length_rejected():
    """Round-5 review: zeroing the 8-byte length word over a filled
    buffer must raise, not decode to a silently empty filter whose every
    probe is a false negative."""
    good = _blob()
    blen = struct.unpack_from("<Q", good, 0)[0]
    data = bytearray(good)
    struct.pack_into("<Q", data, 8 + blen, 0)
    with pytest.raises(ValueError, match="occupied"):
        interop.from_reference_bincode(bytes(data))
