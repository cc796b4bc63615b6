"""A spark-submit entry point: build a sketch over a corpus table.

Run (the north_rule's deployment shape):
    python scripts/package_pyfiles.py dist/qfilter_spark.zip
    spark-submit --master local[8] --py-files dist/qfilter_spark.zip \
        scripts/submit_job.py <corpus_parquet_dir> <output_filter_table>

Reads (doc_id, tokens, n_tok, source), builds the range-sharded RSQF over
token 3-grams, writes the filter table, prints a one-line JSON summary.
"""

import json
import sys
import time

from pyspark.sql import SparkSession, functions as F


def main():
    corpus_path, out_table = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.appName("qfilter-build").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from qfilter_spark.dist import SketchSpec
    from qfilter_spark.dist.sharded import build_sharded_filter

    df = spark.read.parquet(corpus_path)
    total = int(df.select(F.sum(F.greatest(F.col("n_tok") - F.lit(2), F.lit(0))))
                .collect()[0][0])
    spec = SketchSpec("rsqf", dict(capacity=int(total * 1.05) + 64, fp_rate=0.01),
                      mode="tokens_ngram", col="tokens", ngram_n=3)
    t0 = time.perf_counter()
    build_sharded_filter(df, spec, n_shards=64) \
        .write.mode("overwrite").parquet(out_table)
    secs = time.perf_counter() - t0
    stored = int(spark.read.parquet(out_table).groupBy().sum("n_fps").collect()[0][0])
    print(json.dumps({"n_ngrams": stored, "expected": total,
                      "build_secs": round(secs, 2),
                      "ok": stored == total}))
    spark.stop()


if __name__ == "__main__":
    main()
