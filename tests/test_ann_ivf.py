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


def test_distributed_training_matches_driver_on_sample(emb):
    """Parity of the distributed Lloyd computation: when the input IS the
    bounded init sample, distributed partial-sum iterations must reproduce
    the driver-side trainer's centroids (same init, same updates)."""
    from pyspark.sql import functions as F

    sample = (emb.where(F.pmod(F.xxhash64(F.col("vec_id").cast("long")),
                               F.lit(4)) == F.lit(0))
              .orderBy("vec_id").limit(4096))
    sample = sample.cache()
    driver_cent = ann.ivf_centroids(sample, n_lists=8)
    dist_cent = ann.ivf_centroids_distributed(sample, n_lists=8)
    sample.unpersist()
    # atol covers float summation-order differences only (np.mean's
    # pairwise summation vs per-partition sequential partial sums,
    # amplified over 4 Lloyd iterations) — NOT algorithmic divergence,
    # which shows up orders of magnitude above 1e-9
    assert np.allclose(driver_cent, dist_cent, rtol=0, atol=1e-9)


def test_distributed_training_recall_at_4x_lists(emb):
    """At 4x the default list count (where the bounded sample thins to
    ~128 points/list), full-corpus distributed training must keep IVF
    recall at least as good as the sample-trained quantizer."""
    rows = emb.where("vec_id < 5").orderBy("vec_id").collect()
    qs = [(int(r["vec_id"]), list(r["embedding"])) for r in rows]
    exact = {(r["query_id"], r["neighbor_id"])
             for r in ann.cosine_topk(emb, qs, k=10).collect()}

    def recall(train):
        got = {(r["query_id"], r["neighbor_id"])
               for r in ann.ivf_topk(emb, qs, k=10, n_lists=32, nprobe=16,
                                     train=train).collect()}
        return len(exact & got) / len(exact)

    r_dist = recall("distributed")
    # self-hits guaranteed + expected ~(1+9*nprobe/n_lists)/10 ~ 0.55
    assert r_dist >= 0.3
    assert r_dist >= recall("sample") - 0.1


def test_distributed_training_recall_at_64_lists_undercovered(emb):
    """The regime the distributed trainer exists for: at n_lists=64 the
    bounded sample (m=187 of 800 here) thins to ~3 points/list — past the
    documented use-distributed bound n_lists > m/64 — and full-corpus
    Lloyd training must do at least as well as the starved sample trainer
    (deterministic on this fixture: 0.80 vs 0.78)."""
    rows = emb.where("vec_id < 5").orderBy("vec_id").collect()
    qs = [(int(r["vec_id"]), list(r["embedding"])) for r in rows]
    exact = {(r["query_id"], r["neighbor_id"])
             for r in ann.cosine_topk(emb, qs, k=10).collect()}

    def recall(train):
        got = {(r["query_id"], r["neighbor_id"])
               for r in ann.ivf_topk(emb, qs, k=10, n_lists=64, nprobe=16,
                                     train=train).collect()}
        return len(exact & got) / len(exact)

    r_dist, r_sample = recall("distributed"), recall("sample")
    assert r_dist >= r_sample
    assert r_dist >= 0.5
