"""MinHash/SimHash Arrow-kernel regressions.

Pins the trailing-empty-doc bug: the old kernel clipped a trailing empty
doc's reduceat start index to flat.size-1, which truncated the LAST
nonempty doc's segment by one shingle — silently corrupting its signature
(and SimHash) whenever the dropped shingle carried a lane minimum.
"""

import numpy as np

from qfilter_spark.functions import dedup


def _sigs(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    hashed = dedup.with_shingle_hashes(dedup.with_shingles(df))
    return {r["doc_id"]: (list(r["signature"]), r["bands"], r["simhash"])
            for r in dedup.minhash_signatures(hashed).collect()}


def test_trailing_empty_doc_does_not_corrupt_previous_signature(spark):
    doc = (1, "alpha beta gamma delta epsilon zeta")
    alone = _sigs(spark, [doc])
    # trailing SHORT doc (< 3 words -> empty shingle set) in the same batch
    with_empty = _sigs(spark, [doc, (2, "too short")])
    assert with_empty[1] == alone[1], "trailing empty doc changed doc 1"
    # several trailing empties, and an empty in the middle
    multi = _sigs(spark, [doc, (2, "x"), (3, ""), (4, "y z")])
    assert multi[1] == alone[1]
    mid = _sigs(spark, [(0, "x"), doc, (2, "")])
    assert mid[1] == alone[1]


def test_empty_shingle_docs_have_null_bands(spark):
    out = _sigs(spark, [(1, "alpha beta gamma delta"), (2, "short one")])
    assert out[1][1] is not None and len(out[1][1]) > 0
    assert out[2][1] is None  # never enters LSH banding
    # empty docs carry the identity signature (harmless, never banded)
    assert all(int(np.uint64(np.int64(v))) == 0xFFFFFFFFFFFFFFFF
               for v in out[2][0])


def test_empty_docs_never_become_lsh_candidates(spark):
    rows = [(i, "tiny") for i in range(10)] + [
        (100, "alpha beta gamma delta epsilon"),
        (101, "alpha beta gamma delta epsilon")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hashed = dedup.with_shingle_hashes(dedup.with_shingles(df))
    cand = dedup.lsh_candidate_pairs(dedup.minhash_signatures(hashed))
    got = {(r["doc_a"], r["doc_b"]) for r in cand.collect()}
    assert got == {(100, 101)}  # no clique among the 10 empty-shingle docs
