"""IVF coarse-quantizer ANN: determinism, self-hit, recall floor."""

import numpy as np
import pytest

from qfilter_spark.functions import ann


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.standard_normal(32)])
            for i in range(800)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    df.cache().count()
    return df


def test_centroids_deterministic_and_unit_norm(emb):
    c1 = ann.ivf_centroids(emb, n_lists=8)
    c2 = ann.ivf_centroids(emb, n_lists=8)
    assert np.array_equal(c1, c2)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_ivf_assign_covers_all_vectors(emb):
    cent = ann.ivf_centroids(emb, n_lists=8)
    lists = ann.ivf_assign(emb, cent)
    rows = lists.collect()
    assert len(rows) == 800
    assert {r["list_id"] for r in rows} <= set(range(8))


def test_ivf_topk_self_hit_and_recall(emb):
    rows = emb.where("vec_id < 5").orderBy("vec_id").collect()
    qs = [(int(r["vec_id"]), list(r["embedding"])) for r in rows]
    exact = {(r["query_id"], r["neighbor_id"])
             for r in ann.cosine_topk(emb, qs, k=10).collect()}
    out = ann.ivf_topk(emb, qs, k=10, n_lists=8, nprobe=4).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in out}
    # querying with a dataset vector: rank-1 must be the vector itself
    rank1 = {r["query_id"]: r["neighbor_id"] for r in out if r["rank"] == 1}
    assert rank1 == {q: q for q, _ in qs}
    # random data: expected recall ~ (1 + 9*nprobe/n_lists)/10 = 0.55
    assert len(exact & got) / len(exact) >= 0.3
