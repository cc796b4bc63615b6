"""Vectorized RSQF physical block layout (encode / decode / navigate).

Reproduces the reference's at-rest layout (/root/reference/src/lib.rs:468-486,
570-572): an array of 64-slot blocks, each

    1 byte  offset     (distance from block start to its first run's start,
                        saturating at 255; src/lib.rs:597-615, 897-907)
    8 bytes occupieds   (bit i: bucket block*64+i is a canonical home;
                        src/lib.rs:131-135)
    8 bytes runends     (bit i: slot block*64+i ends a run; src/lib.rs:706-723)
    8*rbits bytes       bit-packed remainders, rbits per slot, little-endian
                        bit order within the area (src/lib.rs:725-780)

Instead of the reference's per-item shifting inserts (src/lib.rs:1216-1302),
we build the whole structure in O(n) numpy from the sorted fingerprint
multiset — valid because the physical state is a pure function of that
multiset (SURVEY.md §1.1; grow/shrink/merge in the reference all rebuild by
re-inserting the ascending fingerprint stream).

Placement: runs are laid out in bucket order; run i starts at
``max(bucket_i, end_{i-1}+1)`` — the same fixed point sequential insertion
reaches. Wrap-around (a run pushed past the last slot continues at slot 0,
src/lib.rs:918-970 handles this with modular arithmetic) is resolved with a
two-lap "doubling" pass: placing the bucket sequence twice and keeping the
second lap yields the circular fixed point whenever load < 100%.

Decode (= the reference's FingerprintIter, src/lib.rs:328-378) is a
vectorized rank/select: occupied buckets are matched to runend positions in
circular order; the rotation anchor is any empty slot, found from the
prefix-sum invariant pending(s) = #occupieds<=s - #runends<=s (an empty slot
has pending 0 and no runend bit).
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64


def _placement(buckets: np.ndarray, counts: np.ndarray, n_slots: int) -> np.ndarray:
    """Start slot of each run (unwrapped; values may exceed n_slots-1).

    ``buckets`` strictly increasing, ``counts >= 1``, ``counts.sum() <= n_slots``.
    """
    k = buckets.size
    if k == 0:
        return np.empty(0, dtype=np.int64)
    csum = np.concatenate([[0], np.cumsum(counts)])  # exclusive prefix
    # linear pass: start_i = max(bucket_i, start_{i-1} + count_{i-1})
    t = np.maximum.accumulate(buckets - csum[:-1])
    starts = t + csum[:-1]
    ends = starts + counts - 1
    if ends[-1] < n_slots:
        return starts
    # wrapped: two-lap doubling; lap-2 placement is the circular fixed point
    b2 = np.concatenate([buckets, buckets + n_slots])
    c2 = np.concatenate([counts, counts])
    csum2 = np.concatenate([[0], np.cumsum(c2)])
    t2 = np.maximum.accumulate(b2 - csum2[:-1])
    s2 = t2 + csum2[:-1]
    return s2[k:] - n_slots  # unwrapped start in [bucket_i, bucket_i + 2*n_slots)


def _layout(fps: np.ndarray, qbits: int, rbits: int):
    """Returns (slot_pos, remainders, buckets, counts, starts) for sorted fps."""
    n_slots = 1 << qbits
    quot = (fps >> _U64(rbits)).astype(np.int64)
    rem = fps & _U64((1 << rbits) - 1)
    # fps is the sorted canonical multiset, so quot is sorted: group by
    # boundary-diff instead of np.unique (which re-sorts, ~4x slower here)
    if quot.size:
        new_group = np.empty(quot.size, dtype=bool)
        new_group[0] = True
        np.not_equal(quot[1:], quot[:-1], out=new_group[1:])
        first = np.flatnonzero(new_group)
        buckets = quot[first]
        counts = np.diff(np.append(first, quot.size))
    else:
        buckets = np.empty(0, dtype=np.int64)
        counts = np.empty(0, dtype=np.int64)
    starts = _placement(buckets, counts, n_slots)
    intra = np.arange(fps.size, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)])[:-1], counts)
    # n_slots is a power of two: & is much cheaper than % on int64
    pos = (np.repeat(starts, counts) + intra) & (n_slots - 1)
    return pos, rem, buckets, counts, starts


def encode(fps: np.ndarray, qbits: int, rbits: int) -> bytes:
    """Build the blocked byte layout from a sorted fingerprint multiset."""
    assert qbits >= 6, "block layout requires >= 64 slots"
    n_slots = 1 << qbits
    n_blocks = n_slots // 64
    pos, rem, buckets, counts, starts = _layout(fps, qbits, rbits)
    ends = starts + counts - 1

    occ_bits = np.zeros(n_slots, dtype=np.uint8)
    occ_bits[buckets] = 1
    run_bits = np.zeros(n_slots, dtype=np.uint8)
    run_bits[ends & (n_slots - 1)] = 1
    rem_by_slot = np.zeros(n_slots, dtype=np.uint64)
    rem_by_slot[pos] = rem

    # per-block offset byte: run_start(block_start) - block_start, sat. 255.
    # run_start(g) = run_end(g-1) + 1; run_end(x) = max(x, E[rank(x)]) where
    # E is the running max of run ends over buckets <= x (evaluated on the
    # doubled domain so wrapped runs are seen by early blocks).
    block_starts = np.arange(n_blocks, dtype=np.int64) * 64
    if buckets.size:
        b_all = np.concatenate([buckets, buckets + n_slots])
        e_all = np.maximum.accumulate(np.concatenate([ends, ends + n_slots]))
        x = block_starts - 1 + n_slots  # evaluate (g-1) mod n in lap 2
        idx = np.searchsorted(b_all, x, side="right") - 1
        re = np.maximum(x, np.where(idx >= 0, e_all[np.maximum(idx, 0)], -1))
        offsets = np.minimum(re - x, 255).astype(np.uint8)
    else:
        offsets = np.zeros(n_blocks, dtype=np.uint8)

    occ_words = np.packbits(occ_bits, bitorder="little").view(np.uint64)
    run_words = np.packbits(run_bits, bitorder="little").view(np.uint64)

    # pack remainders: rbits consecutive bits per slot, LSB-first, per block
    # (chunked: the n_slots*rbits-byte bit matrix would be a large fresh
    # allocation, which this host's page-fault path makes very slow)
    bit_idx = np.arange(rbits, dtype=np.uint64)
    rem_bytes = np.empty(n_slots * rbits // 8, dtype=np.uint8)
    step = 1 << 16  # slots per chunk; slot*rbits stays byte-aligned per 8
    for s in range(0, n_slots, step):
        e = min(s + step, n_slots)
        bits = ((rem_by_slot[s:e, None] >> bit_idx) & _U64(1)).astype(np.uint8)
        rem_bytes[s * rbits // 8:e * rbits // 8] = np.packbits(
            bits.reshape(-1), bitorder="little")

    block_bytes = 17 + 8 * rbits
    out = np.zeros(n_blocks * block_bytes, dtype=np.uint8)
    view = out.reshape(n_blocks, block_bytes)
    view[:, 0] = offsets
    view[:, 1:9] = occ_words.view(np.uint8).reshape(n_blocks, 8)
    view[:, 9:17] = run_words.view(np.uint8).reshape(n_blocks, 8)
    view[:, 17:] = rem_bytes.reshape(n_blocks, 8 * rbits)
    return out.tobytes()


def decode(payload: bytes, qbits: int, rbits: int, n_items: int) -> np.ndarray:
    """Recover the sorted fingerprint multiset from the blocked layout.

    Vectorized equivalent of FingerprintIter (src/lib.rs:328-378).
    """
    n_slots = 1 << qbits
    n_blocks = n_slots // 64
    block_bytes = 17 + 8 * rbits
    raw = np.frombuffer(payload, dtype=np.uint8, count=n_blocks * block_bytes)
    view = raw.reshape(n_blocks, block_bytes)
    occ_bits = np.unpackbits(np.ascontiguousarray(view[:, 1:9]).reshape(-1),
                             bitorder="little")
    run_bits = np.unpackbits(np.ascontiguousarray(view[:, 9:17]).reshape(-1),
                             bitorder="little")
    weights = (_U64(1) << np.arange(rbits, dtype=np.uint64))
    rem_area = np.ascontiguousarray(view[:, 17:]).reshape(-1)
    rem_by_slot = np.empty(n_slots, dtype=np.uint64)
    step = 1 << 16  # slots per chunk (cache-resident unpack)
    for s in range(0, n_slots, step):
        e = min(s + step, n_slots)
        bits = np.unpackbits(rem_area[s * rbits // 8:e * rbits // 8],
                             bitorder="little")
        rem_by_slot[s:e] = bits.reshape(e - s, rbits).astype(np.uint64) @ weights

    if n_items == 0:
        if occ_bits.any():
            # a zeroed/corrupted length header over a non-empty structure
            # must not silently decode to an empty filter (every probe
            # would return a false negative)
            raise ValueError("header says 0 fingerprints but the buffer "
                             "has occupied buckets")
        return np.empty(0, dtype=np.uint64)

    occ_pos = np.flatnonzero(occ_bits).astype(np.int64)
    run_pos = np.flatnonzero(run_bits).astype(np.int64)

    # find an empty anchor slot: pending(s) = p0 + cumsum(occ - run) == 0
    d = np.cumsum(occ_bits.astype(np.int64) - run_bits.astype(np.int64))
    p0 = max(0, -int(d.min()))
    empty = (p0 + d == 0) & (run_bits == 0)
    anchor = int(np.flatnonzero(empty)[0])
    shift = anchor + 1

    # rotate so the layout is linear (no run crosses the anchor)
    occ_rot = (occ_pos - shift) & (n_slots - 1)
    run_rot = (run_pos - shift) & (n_slots - 1)
    order_o = np.argsort(occ_rot)
    b_rot = occ_rot[order_o]
    b_orig = occ_pos[order_o]
    e_rot = np.sort(run_rot)

    prev_end = np.concatenate([[-1], e_rot[:-1]])
    s_rot = np.maximum(b_rot, prev_end + 1)
    counts = e_rot - s_rot + 1
    intra = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)])[:-1], counts)
    pos_rot = np.repeat(s_rot, counts) + intra
    pos = (pos_rot + shift) & (n_slots - 1)

    fps = (np.repeat(b_orig.astype(np.uint64), counts) << _U64(rbits)) | rem_by_slot[pos]
    fps.sort()
    assert fps.size == n_items, f"decoded {fps.size} fingerprints, header says {n_items}"
    return fps


def probe(payload: bytes, qbits: int, rbits: int, n_items: int,
          hashes: np.ndarray) -> np.ndarray:
    """Count matching fingerprints per query hash, through the block structure.

    Rank/select navigation (vectorized): decode run boundaries once, then
    binary-search each query's (quotient, remainder) — equivalent to the
    reference's contains/count run scan (src/lib.rs:977-1018) because runs
    are remainder-sorted and globally ordered by quotient.
    """
    fps = decode(payload, qbits, rbits, n_items)
    mask = _U64((1 << (qbits + rbits)) - 1) if qbits + rbits < 64 else _U64(0xFFFFFFFFFFFFFFFF)
    q = np.asarray(hashes, dtype=np.uint64) & mask
    lo = np.searchsorted(fps, q, side="left")
    hi = np.searchsorted(fps, q, side="right")
    return (hi - lo).astype(np.int64)
