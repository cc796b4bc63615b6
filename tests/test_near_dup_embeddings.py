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
