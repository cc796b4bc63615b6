"""spark-submit entry points: build / probe a sharded filter table.

Run (the north_rule's deployment shape):
    python scripts/package_pyfiles.py dist/qfilter_spark.zip
    spark-submit --master local[8] --py-files dist/qfilter_spark.zip \
        scripts/submit_job.py build <corpus_parquet_dir> <filter_table>
    spark-submit --master local[8] --py-files dist/qfilter_spark.zip \
        scripts/submit_job.py probe <corpus_parquet_dir> <filter_table>

``build`` reads (doc_id, tokens, n_tok, source), builds the range-sharded
RSQF over token 3-grams, and writes the filter table plus a `_qfs_meta.json`
sidecar (underscore prefix => ignored by parquet readers) recording the
filter parameters. ``probe`` is a SEPARATE job that reads the persisted
table + sidecar and re-probes every present n-gram — the filter's life
cycle spans jobs, exactly how a 10^12-key deployment would operate.
Both print a one-line JSON summary.
"""

import json
import os
import sys
import time

from pyspark.sql import SparkSession, functions as F

N_SHARDS = 64


def _spec(total_ngrams: int, fp_rate: float = 0.01):
    from qfilter_spark.dist import SketchSpec
    return SketchSpec("rsqf", dict(capacity=int(total_ngrams * 1.05) + 64,
                                   fp_rate=fp_rate),
                      mode="tokens_ngram", col="tokens", ngram_n=3)


def _warm_workers(spark, df):
    """Spawn every core's Python worker through the real kernels BEFORE the
    timed region (a real cluster's executors are long-lived; worker spawn
    is not steady-state throughput)."""
    from qfilter_spark.dist.sharded import build_sharded_filter

    n = spark.sparkContext.defaultParallelism
    build_sharded_filter(df.limit(64 * n).repartition(n), _spec(4096),
                         n_shards=4).count()


def build(spark, corpus_path: str, out_table: str):
    from qfilter_spark.dist.sharded import build_sharded_filter

    df = spark.read.parquet(corpus_path)
    total = int(df.select(F.sum(F.greatest(F.col("n_tok") - F.lit(2), F.lit(0))))
                .collect()[0][0])
    spec = _spec(total)
    _warm_workers(spark, df)
    t0 = time.perf_counter()
    build_sharded_filter(df, spec, n_shards=N_SHARDS) \
        .write.mode("overwrite").parquet(out_table)
    secs = time.perf_counter() - t0
    with open(os.path.join(out_table, "_qfs_meta.json"), "w") as f:
        json.dump({"total_ngrams": total, "fp_rate": 0.01,
                   "n_shards": N_SHARDS}, f)
    stored = int(spark.read.parquet(out_table).groupBy().sum("n_fps").collect()[0][0])
    print(json.dumps({"mode": "build", "n_ngrams": stored, "expected": total,
                      "build_secs": round(secs, 2), "ok": stored == total}))


def probe(spark, corpus_path: str, filter_table: str):
    from qfilter_spark.dist.sharded import probe_sharded_chunks

    meta = json.load(open(os.path.join(filter_table, "_qfs_meta.json")))
    spec = _spec(meta["total_ngrams"], meta["fp_rate"])
    filter_df = spark.read.parquet(filter_table)
    df = spark.read.parquet(corpus_path)
    _warm_workers(spark, df)
    t0 = time.perf_counter()
    stats = (probe_sharded_chunks(df, spec, filter_df, meta["n_shards"], spec)
             .groupBy().sum("n_probed", "n_contained").collect()[0])
    secs = time.perf_counter() - t0
    n_probed, n_hit = int(stats[0]), int(stats[1])
    print(json.dumps({"mode": "probe", "n_probed": n_probed,
                      "false_negatives": n_probed - n_hit,
                      "probe_secs": round(secs, 2),
                      "ok": n_probed == n_hit}))


def main():
    args = sys.argv[1:]
    mode = "build"
    if args and args[0] in ("build", "probe"):
        mode, args = args[0], args[1:]
    corpus_path, table = args[0], args[1]
    spark = SparkSession.builder.appName(f"qfilter-{mode}").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (build if mode == "build" else probe)(spark, corpus_path, table)
    spark.stop()


if __name__ == "__main__":
    main()
