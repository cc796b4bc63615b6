"""Benchmark driver.

Headline job (BASELINE.json metric): distributed RSQF membership
insert+query throughput in M tokens/sec — build an RSQF over all token
3-grams of the F1 synthetic corpus (scaled to the sf under test), then probe
every present n-gram plus 50k absent keys; report observed FPR vs the 1%
bound. The same job runs at two parallelism levels (local[8] vs local[32])
as the sandbox stand-in for N vs 4N executors (BASELINE.md protocol);
scaling efficiency = (throughput_32 / throughput_8) / 4.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": <headline seconds>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": ...,
   "tokens_per_sec_m": ..., "fpr_observed": ..., "scaling": {...}}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     QFS_BENCH_DOCS (corpus size override),
     QFS_SCALING=0 to skip the local[8] rerun.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

CACHE = os.path.join(REPO, ".bench_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_session(cores: int):
    from pyspark.sql import SparkSession
    return (SparkSession.builder.master(f"local[{cores}]")
            .appName(f"qfilter-bench-{cores}")
            .config("spark.sql.shuffle.partitions", str(max(8, cores)))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "48g")
            .getOrCreate())


def ensure_corpus(n_docs: int) -> str:
    path = os.path.join(CACHE, f"corpus_{n_docs}")
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        log(f"generating bench corpus n_docs={n_docs} -> {path}")
        from qfilter_spark import corpus
        spark = make_session(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        corpus.write_corpus_distributed(spark, path, n_docs, n_partitions=64)
        spark.stop()
        open(marker, "w").write("ok")
    return path


def headline_job(spark, corpus_path: str, fp_rate: float = 0.01):
    """Build RSQF over token 3-grams, probe present+absent. Returns metrics."""
    import numpy as np
    from pyspark.sql import functions as F

    from qfilter_spark import sketches
    from qfilter_spark.dist import SketchSpec, build_sketch
    from qfilter_spark.dist.probe import probe_hashes

    df = spark.read.parquet(corpus_path)
    n_parts = spark.sparkContext.defaultParallelism * 2
    df = df.repartition(n_parts).cache()
    total_tokens = df.select(F.sum("n_tok")).collect()[0][0]
    total_ngrams = df.select(
        F.sum(F.greatest(F.col("n_tok") - F.lit(2), F.lit(0)))).collect()[0][0]

    t0 = time.perf_counter()
    spec = SketchSpec("rsqf", dict(capacity=int(total_ngrams * 1.05) + 64,
                                   fp_rate=fp_rate),
                      mode="tokens_ngram", col="tokens", ngram_n=3)
    blob = build_sketch(df, spec, fan_in=8)
    build_secs = time.perf_counter() - t0
    sk = sketches.loads(blob)
    assert len(sk.filter) == total_ngrams, (len(sk.filter), total_ngrams)

    # query phase: recount every present n-gram through the sketch
    t1 = time.perf_counter()
    probe_spec = SketchSpec("rsqf", dict(capacity=64, fp_rate=fp_rate),
                            mode="tokens_ngram", col="tokens", ngram_n=3)
    bvar = spark.sparkContext.broadcast(blob)

    import pyarrow as pa

    def probe_parts(batches):
        s = sketches.loads(bvar.value)
        n = 0
        miss = 0
        for batch in batches:
            h = probe_spec.extract(batch)
            n += h.size
            miss += int((~s.contains_hashes(h)).sum())
        yield pa.record_batch([pa.array([n], pa.int64()), pa.array([miss], pa.int64())],
                              names=["n", "miss"])

    agg = (df.select("tokens").mapInArrow(probe_parts, "n long, miss long")
           .groupBy().sum("n", "miss").collect()[0])
    n_probed, false_neg = int(agg[0]), int(agg[1])
    query_secs = time.perf_counter() - t1

    # absent-key FPR
    absent = spark.range(10**12, 10**12 + 50_000).select(
        F.xxhash64(F.col("id").cast("long")).alias("h"))
    fp_hits = probe_hashes(absent, blob, "h", out_col="c", as_bool=True) \
        .where("c").count()

    df.unpersist()
    return {
        "total_tokens": int(total_tokens),
        "total_ngrams": int(total_ngrams),
        "build_secs": build_secs,
        "query_secs": query_secs,
        "false_negatives": false_neg,
        "n_probed": n_probed,
        "fpr_observed": fp_hits / 50_000,
        "fpr_bound": sk.filter.max_error_ratio(),
        "tokens_per_sec_m": (int(total_tokens) + n_probed)
                            / (build_secs + query_secs) / 1e6,
    }


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod
    timings = {}
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).collect()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:
            log(f"query {name} failed: {e}")
            timings[name] = -1.0
    return timings


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.1
    n_docs = int(os.environ.get("QFS_BENCH_DOCS", str(max(2000, int(200_000 * sf)))))
    do_scaling = os.environ.get("QFS_SCALING", "1") != "0"

    corpus_path = ensure_corpus(n_docs)

    log(f"=== headline @ local[{cpus}] ===")
    spark = make_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    head = headline_job(spark, corpus_path)
    log(json.dumps(head, indent=2))
    log("=== per-query timings ===")
    timings = run_queries(spark, sf_dir)
    spark.stop()

    result = {
        "metric": "rsqf membership insert+query throughput",
        "value": round(head["build_secs"] + head["query_secs"], 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_docs": n_docs,
        "tokens_per_sec_m": round(head["tokens_per_sec_m"], 3),
        "total_tokens": head["total_tokens"],
        "fpr_observed": head["fpr_observed"],
        "fpr_bound": head["fpr_bound"],
        "false_negatives": head["false_negatives"],
    }

    if do_scaling:
        log("=== scaling run @ local[8] ===")
        spark8 = make_session(8)
        spark8.sparkContext.setLogLevel("ERROR")
        head8 = headline_job(spark8, corpus_path)
        spark8.stop()
        thr_n, thr_4n = head8["tokens_per_sec_m"], head["tokens_per_sec_m"]
        result["scaling"] = {
            "cores_n": 8, "cores_4n": cpus,
            "tokens_per_sec_m_n": round(thr_n, 3),
            "tokens_per_sec_m_4n": round(thr_4n, 3),
            "efficiency": round(thr_4n / thr_n / (cpus / 8), 3),
        }
        log(json.dumps(result["scaling"]))

    print(json.dumps(result))


if __name__ == "__main__":
    main()
