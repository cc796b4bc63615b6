"""Incremental insert into an existing sharded filter table."""

import numpy as np
from pyspark.sql import functions as F

from qfilter_spark import sketches
from qfilter_spark.dist import SketchSpec
from qfilter_spark.dist.sharded import (build_sharded_filter, insert_sharded,
                                        probe_sharded, sharded_to_single)


def test_incremental_insert_bit_equal_to_rebuild(spark):
    n_shards = 8
    spec = SketchSpec("rsqf", dict(capacity=20_000, fp_rate=0.01), "hash_col", "h")
    day1 = spark.range(0, 6000).select(
        F.xxhash64(F.col("id").cast("long")).alias("h")).repartition(4)
    day2 = spark.range(6000, 10_000).select(
        F.xxhash64(F.col("id").cast("long")).alias("h")).repartition(4)

    filt1 = build_sharded_filter(day1, spec, n_shards=n_shards).cache()
    filt12 = insert_sharded(filt1, day2, spec, n_shards, spec).cache()

    rebuilt = build_sharded_filter(day1.union(day2), spec, n_shards=n_shards)
    a = sketches.loads(sharded_to_single(filt12, spec, n_shards))
    b = sketches.loads(sharded_to_single(rebuilt, spec, n_shards))
    assert np.array_equal(a.filter.fingerprints(), b.filter.fingerprints())

    # every key from both days probes as contained in the updated table
    stats = (probe_sharded(day1.union(day2), "h", filt12, n_shards, spec)
             .groupBy().sum("n_probed", "n_contained").collect()[0])
    assert int(stats[0]) == int(stats[1]) == 10_000
    filt1.unpersist(); filt12.unpersist()


def test_insert_creates_missing_shards(spark):
    """New data landing in shards the table doesn't have yet."""
    n_shards = 8
    spec = SketchSpec("rsqf", dict(capacity=4096, fp_rate=0.01), "hash_col", "h")
    from qfilter_spark.dist.sharded import _fp_meta
    _, _, fs = _fp_meta(spec)
    shift = fs - 3
    # day 1 entirely in shard 0; day 2 entirely in shard 5
    d1 = spark.range(0, 500).select(
        (F.xxhash64(F.col("id").cast("long"))
         .bitwiseAND(F.lit((1 << shift) - 1))).alias("h"))
    d2 = spark.range(0, 500).select(
        (F.lit(5).cast("long") * F.lit(1 << shift)
         + F.xxhash64((F.col("id") + 999).cast("long"))
         .bitwiseAND(F.lit((1 << shift) - 1))).alias("h"))
    filt = build_sharded_filter(d1, spec, n_shards=n_shards)
    assert {r["shard"] for r in filt.collect()} == {0}
    updated = insert_sharded(filt, d2, spec, n_shards, spec)
    shards = {r["shard"]: r["n_fps"] for r in updated.collect()}
    assert set(shards) == {0, 5}
    assert shards[5] == 500
