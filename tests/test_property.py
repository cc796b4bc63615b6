"""Property-based equivalence: the vectorized batch kernels must match the
single-item reference path exactly (multiset state equality), for any input
order, duplicates, cap, and capacity pressure.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from qfilter_spark import CapacityExceeded, Filter

hash_lists = st.lists(st.integers(0, 2**64 - 1), min_size=0, max_size=300)


@settings(max_examples=60, deadline=None)
@given(hashes=hash_lists, max_count=st.sampled_from([1, 2, 5, 2**64 - 1]))
def test_insert_hashes_equals_sequential(hashes, max_count):
    f_batch = Filter.with_fingerprint_size(0, 12)
    f_seq = Filter.with_fingerprint_size(0, 12)
    h = np.array(hashes, dtype=np.uint64)
    err_batch = err_seq = False
    try:
        f_batch.insert_hashes(h, max_count=max_count)
    except CapacityExceeded:
        err_batch = True
    for x in hashes:
        try:
            f_seq.insert_fingerprint_counting(max_count, x)
        except CapacityExceeded:
            err_seq = True
    assert err_batch == err_seq
    if not err_batch:
        assert np.array_equal(f_batch.fingerprints(), f_seq.fingerprints())
        assert f_batch.qbits == f_seq.qbits  # same growth trajectory


@settings(max_examples=60, deadline=None)
@given(present=hash_lists, removals=hash_lists)
def test_remove_hashes_equals_sequential(present, removals):
    f1 = Filter.with_fingerprint_size(0, 14)
    f2 = Filter.with_fingerprint_size(0, 14)
    h = np.array(present, dtype=np.uint64)
    try:
        f1.insert_hashes(h)
        f2.insert_hashes(h)
    except CapacityExceeded:
        return
    r = np.array(removals, dtype=np.uint64)
    n1 = f1.remove_hashes(r)
    n2 = sum(f2.remove_fingerprint(int(x)) for x in removals)
    assert n1 == n2
    assert np.array_equal(f1.fingerprints(), f2.fingerprints())


@settings(max_examples=40, deadline=None)
@given(hashes=hash_lists)
def test_blocks_roundtrip_any_multiset(hashes):
    f = Filter.with_fingerprint_size(0, 13)
    try:
        f.insert_hashes(np.array(hashes, dtype=np.uint64))
    except CapacityExceeded:
        return
    g = Filter.from_bytes(f.to_bytes(fmt="blocks"))
    assert np.array_equal(g.fingerprints(), f.fingerprints())


@settings(max_examples=40, deadline=None)
@given(parts=st.lists(hash_lists, min_size=2, max_size=5),
       keep=st.booleans())
def test_merge_any_order_any_fanin(parts, keep):
    def build(order):
        acc = Filter.new(2000, 0.01)
        for i in order:
            p = Filter.new(2000, 0.01)
            p.insert_hashes(np.array(parts[i], dtype=np.uint64))
            acc.merge(keep, p)
        return acc.fingerprints()

    a = build(range(len(parts)))
    b = build(list(reversed(range(len(parts)))))
    assert np.array_equal(a, b)
