"""Multimodal plumbing: attach -> features -> resize -> frame-sample.

Decoders are deterministic fakes (module STUB NOTICE: no codec libraries
in this container); these tests pin the REAL parts — Arrow batch shapes,
schemas, vectorized kernels, fan-out cardinalities — and the determinism
that makes the gate oracle exact.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from qfilter_spark.functions import multimodal
from qfilter_spark.hashing import xxh64_u64


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [(i, "x" * (10 + 13 * i)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return multimodal.attach_media(df, "encode(text, 'utf-8')", "image")


def test_resize_payload_shape_and_determinism(media_df):
    out = multimodal.resize_media(media_df.select("doc_id", "media"),
                                  width=8, height=8)
    rows = {r["doc_id"]: bytes(r["resized"]) for r in out.collect()}
    assert len(rows) == 40
    assert all(len(v) == 8 * 8 * 3 for v in rows.values())
    again = {r["doc_id"]: bytes(r["resized"])
             for r in multimodal.resize_media(
                 media_df.select("doc_id", "media"), width=8, height=8)
             .collect()}
    assert rows == again  # fully deterministic
    # distinct payloads -> distinct rasters (seeded from payload hash)
    assert len(set(rows.values())) == 40


def test_resize_matches_naive_reference(media_df):
    """The NN resize must equal the obvious two-step reference: generate
    the native raster from the seed, then index-select."""
    row = media_df.select(
        "doc_id", F.xxhash64(F.col("media.bytes")).alias("seed"),
        "media").where("doc_id = 7").collect()[0]
    seed = np.uint64(np.int64(row["seed"]))
    nat = multimodal.RESIZE_NATIVE
    n_lanes = nat * nat * 3 // 8
    lanes = np.empty(n_lanes, dtype=np.uint64)
    for j in range(n_lanes):
        lanes[j] = xxh64_u64(np.array([seed]), np.uint64(101 + j))[0]
    raster = lanes.view(np.uint8).reshape(nat, nat, 3)
    idx = (np.arange(8) * nat // 8)
    want = raster[idx][:, idx].reshape(-1).tobytes()
    got = bytes(multimodal.resize_media(
        media_df.where("doc_id = 7").select("doc_id", "media"),
        width=8, height=8).collect()[0]["resized"])
    assert got == want


def test_sample_frames_cardinality_and_indices(media_df):
    out = multimodal.sample_frames(media_df.select("doc_id", "media"),
                                   every=2).collect()
    nb = {r["doc_id"]: r["media"]["n_bytes"]
          for r in media_df.select("doc_id", "media").collect()}
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for d, n_bytes in nb.items():
        n_frames = 1 + n_bytes % 7
        want = list(range(0, n_frames, 2))
        assert sorted(by_doc[d]) == want, (d, n_bytes)
    # 8-byte frame fingerprints, deterministic across runs
    assert all(len(bytes(r["frame"])) == 8 for r in out)
    again = multimodal.sample_frames(media_df.select("doc_id", "media"),
                                     every=2).collect()
    key = lambda r: (r["doc_id"], r["frame_idx"], bytes(r["frame"]))
    assert sorted(map(key, out)) == sorted(map(key, again))


def test_sample_frames_every_one_keeps_all(media_df):
    out = multimodal.sample_frames(media_df.select("doc_id", "media"),
                                   every=1)
    nb = {r["doc_id"]: r["media"]["n_bytes"]
          for r in media_df.select("doc_id", "media").collect()}
    assert out.count() == sum(1 + v % 7 for v in nb.values())


def test_null_media_payloads_refused(spark):
    """A NULL payload hashes JVM-side to the seed constant, so every NULL
    row would silently get the SAME fabricated features/raster/frames —
    refuse like the NULL-hash paths do."""
    import pytest

    from qfilter_spark.functions.multimodal import (
        attach_media, extract_features, resize_media, sample_frames)

    df = spark.createDataFrame(
        [(1, bytearray(b"abc")), (2, None)], "id long, payload binary")
    media = attach_media(df, "payload")
    for fn in (lambda d: extract_features(d),
               lambda d: resize_media(d),
               lambda d: sample_frames(d, id_cols=["id"])):
        with pytest.raises(Exception) as ei:
            fn(media).collect()
        assert "NULL media" in str(ei.value)

    # a struct NOT built by attach_media with bytes set but n_bytes NULL
    # (sample_frames would launder it through NaN into a garbage frame
    # count) is refused the same way
    from pyspark.sql import functions as F

    bad_nb = spark.createDataFrame(
        [(1, bytearray(b"abc"))], "id long, payload binary").select(
        "id", F.struct(F.col("payload").alias("bytes"),
                       F.lit("image").alias("media_type"),
                       F.lit(None).cast("int").alias("n_bytes")).alias("media"))
    with pytest.raises(Exception) as ei:
        sample_frames(bad_nb, id_cols=["id"]).collect()
    assert "NULL media" in str(ei.value)
