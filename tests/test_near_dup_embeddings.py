"""cosine_near_pairs with PLANTED near-duplicates (the gate's corpus has
none at cos >= 0.95, so its 0-row pass alone never proves recall)."""

import numpy as np

from qfilter_spark.functions import ann


def test_planted_near_dups_found_exactly(spark):
    rng = np.random.default_rng(5)
    base = rng.standard_normal((400, 32))
    rows = [(i, [float(x) for x in base[i]]) for i in range(400)]
    # plant 25 near-duplicates: tiny perturbations of existing vectors
    for j in range(25):
        src = base[j * 7]
        dup = src + 0.05 * rng.standard_normal(32)
        rows.append((1000 + j, [float(x) for x in dup]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    df.cache().count()

    # exact brute force in float32->float64 like the engine sees it
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    m = np.array([r[1] for r in rows], dtype=np.float32).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    cos = m @ m.T
    want = {(int(ids[a]), int(ids[b]))
            for a in range(len(rows)) for b in range(len(rows))
            if a < b and cos[a, b] >= 0.95}
    want = {(min(p), max(p)) for p in want}
    assert len(want) >= 20  # the planted pairs are really there

    got = {(r["vec_a"], r["vec_b"])
           for r in ann.cosine_near_pairs(df, threshold=0.95, dim=32).collect()}
    assert got == want
    df.unpersist()


def test_null_or_ragged_embeddings_refused(spark):
    """A NULL or wrong-dimension embedding row must fail loudly: the Arrow
    list column is flattened and reshaped by row-0's dimension, so a
    zero-extent (NULL) or ragged row would otherwise shift the flat buffer
    and silently mis-slice every later row into garbage scores whenever the
    totals still divide evenly."""
    import pytest

    from qfilter_spark.functions.ann import cosine_topk

    q = [(0, [1.0, 0.0, 0.0, 0.0])]
    ragged = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0]),
         (3, [0.0, 1.0, 0.0, 0.0, 0.0])],   # 4+3+5 = 12 still divides by 4
        "vec_id long, embedding array<float>")
    with pytest.raises(Exception) as ei:
        cosine_topk(ragged, q, k=2).collect()
    assert "ragged" in str(ei.value) or "expected dim" in str(ei.value)

    with_null = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, None), (3, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>")
    with pytest.raises(Exception) as ei:
        cosine_topk(with_null, q, k=2).collect()
    assert "expected dim" in str(ei.value)


def test_lsh_params_for_scales_with_corpus():
    """Auto blocking geometry: bucket width grows with the corpus (bounded
    expected bucket rows), table count keeps the analytic recall bound, and
    small corpora reproduce the historical 4-bit geometry."""
    t_small, b_small = ann.lsh_params_for(2_000, 0.95)
    assert b_small == 4                       # the historical gate geometry
    t_big, b_big = ann.lsh_params_for(1_000_000_000, 0.95)
    assert b_big == 20                        # ~1e9/2^20 ~ 1k rows/bucket
    assert t_big > t_small                    # more bits need more tables
    # analytic recall >= 0.9999 at the threshold for both geometries
    import math
    p = 1.0 - math.acos(0.95) / math.pi
    for t, b in [(t_small, b_small), (t_big, b_big)]:
        assert 1.0 - (1.0 - p ** b) ** t >= 0.9999
    # exact duplicates collide in every table: threshold 1.0 needs 1 table
    assert ann.lsh_params_for(10**9, 1.0)[0] == 1


def test_lsh_params_pinned_parameter_conditions_the_other():
    import math

    import pytest

    p = 1.0 - math.acos(0.95) / math.pi
    # pinned n_bits -> table count derived FOR that width
    t, b = ann.lsh_params_for(10**9, 0.95, n_bits=20)
    assert b == 20 and 1.0 - (1.0 - p ** b) ** t >= 0.9999
    # a pinned table count keeps the bucket-target width: if it cannot
    # reach the recall bound there, FAIL — silently narrowing the buckets
    # would recreate the quadratic self-join blow-up, silently accepting
    # lower recall would break the documented bound
    with pytest.raises(ValueError, match="pinned tables"):
        ann.lsh_params_for(10**9, 0.95, n_tables=16)
    # ... but a pinned count that does clear the bound at the target
    # width passes through (small corpus: the historical 16x4 geometry)
    t3, b3 = ann.lsh_params_for(2_000, 0.95, n_tables=16)
    assert (t3, b3) == (16, 4)
    # impractical threshold/scale fails loudly instead of shuffling
    # thousands of signature copies
    with pytest.raises(ValueError, match="impractical"):
        ann.lsh_params_for(10**9, 0.7)


def test_all_null_embedding_batch_refused(spark):
    import pytest

    from qfilter_spark.functions.ann import cosine_topk

    q = [(0, [1.0, 0.0, 0.0, 0.0])]
    all_null = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id long, embedding array<float>")
    with pytest.raises(Exception) as ei:
        cosine_topk(all_null, q, k=1).collect()
    assert "NULL/empty" in str(ei.value)
