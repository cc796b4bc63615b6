"""Structured Streaming: sketch folded over micro-batches, replay-safe."""

import numpy as np
import pytest

from qfilter_spark import sketches
from qfilter_spark.dist.agg import SketchSpec
from qfilter_spark.hashing import xxh64_i64
from qfilter_spark.streaming import StreamingSketch


def test_streaming_sketch_accumulates(spark, tmp_path):
    spec = SketchSpec("rsqf", dict(capacity=50_000, fp_rate=0.01), "hash_col", "h")
    ss = StreamingSketch(spec, str(tmp_path / "state"))

    # drive update() exactly as foreachBatch would, including a replay
    from pyspark.sql import functions as F
    batches = [spark.range(i * 1000, (i + 1) * 1000)
               .select(F.xxhash64(F.col("id").cast("long")).alias("h"))
               for i in range(4)]
    ss.update(batches[0], 0)
    ss.update(batches[1], 1)
    ss.update(batches[1], 1)  # replayed micro-batch: must be a no-op
    ss.update(batches[2], 2)
    ss.update(batches[3], 3)

    sk, meta, gen = ss.current()
    assert meta["n_items"] == 4000
    assert len(sk.filter) == 4000
    probe = xxh64_i64(np.arange(4000, dtype=np.int64))
    assert sk.contains_hashes(probe).all()


def test_streaming_restart_resumes(spark, tmp_path):
    spec = SketchSpec("hll", dict(p=12), "hash_col", "h")
    state = str(tmp_path / "state2")
    from pyspark.sql import functions as F

    ss1 = StreamingSketch(spec, state)
    ss1.update(spark.range(0, 5000).select(
        F.xxhash64(F.col("id").cast("long")).alias("h")), 0)
    # simulate process restart: new object over the same state dir
    ss2 = StreamingSketch(spec, state)
    ss2.update(spark.range(5000, 10000).select(
        F.xxhash64(F.col("id").cast("long")).alias("h")), 1)
    sk, meta, _ = ss2.current()
    est = sk.estimate()
    assert abs(est - 10_000) <= 4 * sk.relative_sd() * 10_000


@pytest.mark.slow
def test_streaming_end_to_end_rate_source(spark, tmp_path):
    """Real writeStream with a rate source (marked slow)."""
    from pyspark.sql import functions as F
    spec = SketchSpec("rsqf", dict(capacity=100_000, fp_rate=0.01), "hash_col", "h")
    ss = StreamingSketch(spec, str(tmp_path / "state3"))
    stream = (spark.readStream.format("rate").option("rowsPerSecond", "5000").load()
              .select(F.xxhash64(F.col("value").cast("long")).alias("h")))
    q = ss.attach(stream, str(tmp_path / "ckpt"), trigger_secs=0.5)
    import time
    deadline = time.time() + 20
    while time.time() < deadline:
        sk, meta, _ = ss.current()
        if sk is not None and meta["n_items"] > 2000:
            break
        time.sleep(0.5)
    q.stop()
    sk, meta, _ = ss.current()
    assert sk is not None and meta["n_items"] > 0
    assert len(sk.filter) == meta["n_items"]


@pytest.mark.slow
def test_keyed_sketch_stream_applyinpandaswithstate(spark, tmp_path):
    """Custom stateful operator: per-key RSQF maintained in the state store."""
    from pyspark.sql import functions as F
    from qfilter_spark.streaming import keyed_sketch_stream

    spec = SketchSpec("rsqf", dict(capacity=200_000, fp_rate=0.01), "hash_col", "h")
    stream = (spark.readStream.format("rate").option("rowsPerSecond", "4000").load()
              .select((F.col("value") % 4).alias("k"),
                      F.xxhash64(F.col("value").cast("long")).alias("h")))
    out = keyed_sketch_stream(stream, spec, key_col="k")
    q = (out.writeStream.format("memory").queryName("keyed_sketches")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt_keyed"))
         .trigger(processingTime="1 seconds")
         .start())
    import time
    deadline = time.time() + 30
    latest = {}
    while time.time() < deadline:
        for r in spark.sql("SELECT * FROM keyed_sketches").collect():
            cur = latest.get(r["k"], (0, 0))
            latest[r["k"]] = max(cur, (r["n_items"], r["sketch_len"]))
        if len(latest) == 4 and all(v[0] > 500 for v in latest.values()):
            break
        time.sleep(1)
    q.stop()
    assert len(latest) == 4, latest
    for k, (n, length) in latest.items():
        assert n > 0 and length == n, (k, n, length)  # distinct values => len == n


def test_keyed_sketch_stream_retraction(spark, tmp_path):
    """Changelog stream: op >= 0 inserts, op < 0 retracts (reference
    incremental insert/remove as streaming state). Deterministic file
    source: batch 0 inserts 200 keys, batch 1 retracts the first 100;
    final per-key state must hold exactly the net survivors."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from qfilter_spark.streaming import keyed_sketch_stream

    src = tmp_path / "src_retract"
    src.mkdir()

    def rows(ids, op):
        ids = np.array(list(ids), dtype=np.int64)
        return pa.table({
            "k": pa.array(ids % 2, pa.int64()),
            "h": pa.array(xxh64_i64(ids).view(np.int64), pa.int64()),
            "op": pa.array([op] * len(ids), pa.int32()),
        })

    for i, tbl in enumerate([rows(range(200), 1), rows(range(100), -1)]):
        p = str(src / f"{i:02d}.parquet")
        pq.write_table(tbl, p)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    spec = SketchSpec("rsqf", dict(capacity=1024, fp_rate=0.01),
                      "hash_col", "h")
    stream = (spark.readStream.schema("k long, h long, op int")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    out = keyed_sketch_stream(stream, spec, key_col="k", op_col="op")
    q = (out.writeStream.format("memory").queryName("keyed_retract")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt_retract"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows_out = spark.sql(
        "SELECT k, min(n_items) AS n, min(sketch_len) AS l "
        "FROM keyed_retract GROUP BY k").collect()
    spark.catalog.dropTempView("keyed_retract")
    got = {r["k"]: (r["n"], r["l"]) for r in rows_out}
    # per key: 100 inserted, 50 retracted -> 50 survivors, len == net
    assert got == {0: (50, 50), 1: (50, 50)}, got


def test_apply_changelog_respects_row_order_and_clamps():
    """Kernel semantics: retract-then-reinsert in one slice lands present;
    insert-then-retract nets out; retracting an absent key is a clamped
    no-op that does not drift n_items."""
    from qfilter_spark.streaming import apply_changelog

    sk = sketches.create("rsqf", capacity=64, fp_rate=0.01)
    h1, h2, h3 = (np.uint64(xxh64_i64(np.array([i], dtype=np.int64))[0])
                  for i in (1, 2, 3))
    # rows: (h1,-) (h1,+) (h2,+) (h2,-) (h3,-)
    h = np.array([h1, h1, h2, h2, h3], dtype=np.uint64)
    is_ins = np.array([False, True, True, False, False])
    n = apply_changelog(sk, h, is_ins, 0)
    assert n == 1 == len(sk.filter)
    assert bool(sk.contains_hashes(np.array([h1], dtype=np.uint64))[0])
    assert not bool(sk.contains_hashes(np.array([h2], dtype=np.uint64))[0])
    # empty slice is a no-op
    assert apply_changelog(sk, np.empty(0, np.uint64),
                           np.empty(0, bool), n) == 1


def test_apply_changelog_property_vs_multiset_model():
    """Random op sequences vs a plain Counter model: the sketch's multiset
    and n_items must track the model exactly (retraction of an absent key
    clamps; everything else is ordered multiset add/remove)."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from qfilter_spark.streaming import apply_changelog

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 7), st.booleans()),
                    min_size=0, max_size=60))
    def run(ops):
        sk = sketches.create("rsqf", capacity=256, fp_rate=0.001)
        hs = xxh64_i64(np.arange(8, dtype=np.int64)).view(np.uint64)
        model: Counter = Counter()
        for key, ins in ops:
            if ins:
                model[int(hs[key])] += 1
            elif model[int(hs[key])] > 0:
                model[int(hs[key])] -= 1
        h = np.array([hs[k] for k, _ in ops], dtype=np.uint64)
        is_ins = np.array([i for _, i in ops], dtype=bool)
        n = apply_changelog(sk, h, is_ins, 0)
        want_total = sum(model.values())
        assert n == want_total == len(sk.filter)
        counts = sk.count_hashes(hs)
        for k in range(8):
            assert int(counts[k]) == model[int(hs[k])]

    run()


def test_keyed_stream_retraction_requires_removable_sketch(spark):
    from qfilter_spark.streaming import keyed_sketch_stream

    spec = SketchSpec("bloom", dict(capacity=64, fp_rate=0.01),
                      "hash_col", "h")
    stream = (spark.readStream.format("rate").load()
              .selectExpr("value AS k", "value AS h", "1 AS op"))
    with pytest.raises(TypeError, match="retraction"):
        keyed_sketch_stream(stream, spec, key_col="k", op_col="op")


@pytest.mark.slow
def test_windowed_sketch_stream_finalizes_on_watermark(spark, tmp_path):
    from pyspark.sql import functions as F
    from qfilter_spark.streaming import windowed_sketch_stream

    spec = SketchSpec("rsqf", dict(capacity=300_000, fp_rate=0.01), "hash_col", "h")
    stream = (spark.readStream.format("rate").option("rowsPerSecond", "3000").load()
              .select(F.col("timestamp").alias("ts"),
                      F.xxhash64(F.col("value").cast("long")).alias("h")))
    out = windowed_sketch_stream(stream, spec, "ts", window_secs=3,
                                 watermark_delay="1 seconds")
    q = (out.writeStream.format("memory").queryName("win_sketches")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt_win"))
         .trigger(processingTime="1 seconds")
         .start())
    import time
    deadline = time.time() + 45
    finals = {}
    while time.time() < deadline:
        for r in spark.sql("SELECT * FROM win_sketches WHERE final").collect():
            finals[r["win_start"]] = (r["n_items"], r["sketch_len"])
        if len(finals) >= 2:
            break
        time.sleep(1)
    q.stop()
    assert len(finals) >= 2, finals
    for w, (n, length) in finals.items():
        assert n > 0 and length == n  # rate values are distinct


def test_windowed_stream_survives_late_admitted_row(spark, tmp_path):
    """Round-4 fix: a late-but-admitted row for a window whose end is
    already below the EVICTION watermark (Spark filters lateness with the
    previous batch's watermark but validates timeout timestamps against
    the current one) must finalize at the next trigger, not raise
    INVALID_TIMEOUT_TIMESTAMP and wedge the query. Reproduced as a crash
    against the unclamped code."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from qfilter_spark.streaming import windowed_sketch_stream

    src = tmp_path / "late_src"
    src.mkdir()

    def chunk(i, ts_secs):
        tbl = pa.table({
            "ts": pa.array([int(t * 1e6) for t in ts_secs],
                           pa.timestamp("us")),
            "event_id": pa.array(list(range(len(ts_secs))), pa.int64()),
        })
        p = str(src / f"{i:02d}.parquet")
        pq.write_table(tbl, p)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    chunk(0, [30, 59, 65])   # windows 0 and 60; watermark after b0 = 64
    chunk(1, [1000])         # watermark jumps to 999
    chunk(2, [70])           # admitted late row; window [60,120) end < wm
    chunk(3, [10_000])       # flush

    spec = SketchSpec("rsqf", dict(capacity=1024, fp_rate=0.01),
                      "hash_col", "h")
    stream = (spark.readStream.schema("ts timestamp, event_id long")
              .option("maxFilesPerTrigger", 1).parquet(str(src))
              .withColumn("h", F.xxhash64("event_id")))
    out = windowed_sketch_stream(stream, spec, "ts", window_secs=60,
                                 watermark_delay="1 second")
    finals = []

    def sink(bdf, bid):
        finals.extend((int(r["win_start"]), int(r["n_items"]))
                      for r in bdf.where("final").collect())

    q = (out.writeStream.foreachBatch(sink).outputMode("update")
         .option("checkpointLocation", str(tmp_path / "late_ckpt")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = dict(sorted(finals))
    # the late row ts=70 still lands in window 60 (finalized next trigger)
    assert got[0] == 2 and got[60] == 2 and got[960] == 1, got


def test_hash_stream_rejects_values_mode_sketch(spark):
    """Round-4 fix: kll/tdigest have no update_hashes — hash-column stream
    builders must fail eagerly on the driver, not per-executor."""
    from pyspark.sql import functions as F

    from qfilter_spark.streaming import (keyed_sketch_stream,
                                         windowed_sketch_stream)

    stream = (spark.readStream.format("rate").load()
              .select(F.col("timestamp").alias("ts"),
                      F.lit(0).cast("long").alias("k"),
                      F.xxhash64("value").alias("h")))
    kll = SketchSpec("kll", dict(k=200), "values", "h")
    with pytest.raises(TypeError, match="update_hashes"):
        keyed_sketch_stream(stream, kll, key_col="k")
    with pytest.raises(TypeError, match="update_hashes"):
        windowed_sketch_stream(stream, kll, "ts", window_secs=60)


def test_streaming_sketch_rejects_checkpoint_reset(tmp_path):
    """Round-4 fix: a batch id strictly below the committed one means a
    reset checkpoint is driving an old state_dir — raise instead of
    silently dropping every batch until the ids catch up."""
    from qfilter_spark.streaming import StreamingSketch

    spec = SketchSpec("rsqf", dict(capacity=256, fp_rate=0.01),
                      "hash_col", "h")
    ss = StreamingSketch(spec, str(tmp_path / "state"))
    sk = spec.make()
    ss._write_gen(0, sk, {"batch_id": 7, "n_items": 0, "ts": 0.0})
    ss.update(None, 7)   # exact replay of the committed batch: no-op
    with pytest.raises(ValueError, match="checkpoint was reset"):
        ss.update(None, 3)


def test_changelog_op_and_seq_nulls_refused():
    """A NULL op value would launder through NaN to `NaN >= 0 == False` — a
    silent retraction; a NULL sequence number argsorts last — a silent
    reordering. Both columns go through the shared refusal."""
    import pandas as pd
    import pytest

    from qfilter_spark.streaming import _no_null_col

    pdf = pd.DataFrame({"op": [1.0, None, -1.0], "seq": [1, 2, None]})
    with pytest.raises(ValueError, match="NULL values"):
        _no_null_col(pdf, "op", "keyed sketch stream")
    with pytest.raises(ValueError, match="NULL values"):
        _no_null_col(pdf, "seq", "keyed sketch stream")
    clean = pd.DataFrame({"op": [1, -1]})
    assert (_no_null_col(clean, "op", "t") >= 0).tolist() == [True, False]
