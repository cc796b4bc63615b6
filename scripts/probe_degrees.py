"""Measure the pinned DEGREE constants for a testdata corpus.

The bound-boolean gate rows carry engine-deterministic integers
(``__spark_entry__._DEGREE_PINS``) that DuckDB cannot derive — observed
false positives, HLL estimates, ANN recall hits. A NEW corpus needs those
measured once and pasted into the pins table; this script turns the
round-4 notes/transcript probe patterns into one runnable command:

    python scripts/probe_degrees.py /root/testdata/sf0.01
    python scripts/probe_degrees.py /root/testdata/sf0.01 --check-stability

It prints ready-to-paste dict entries keyed by the corpus discriminator
(the ``orders`` row count), plus the per-source HLL VALUES block when any
per-source estimate deviates from the exact count (the ``_HLL_SRC_SF01``
shape). ``--check-stability`` re-measures under a second Spark config
(different core count + shuffle partitions) and fails loudly on any
config-dependent value — the property that makes pinning sound.
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
_pp = os.environ.get("PYTHONPATH", "")
if REPO not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = f"{REPO}{os.pathsep}{_pp}" if _pp else REPO


def measure(sf_dir: str, master: str, shuffle: int) -> dict:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(master)
             .appName("qfs-probe-degrees")
             .config("spark.sql.shuffle.partitions", str(shuffle))
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    try:
        from qfilter_spark import workloads as W

        disc = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).count()
        out = {"discriminator": disc}

        row = W.q_rsqf_fpr(spark, sf_dir).collect()[0]
        out["n_false_positives"] = int(row["n_false_positives"])

        row = W.q_hll_distinct(spark, sf_dir).collect()[0]
        out["hll_estimate"] = int(row["hll_estimate"])

        row = W.q_ann_lsh_recall(spark, sf_dir).collect()[0]
        out["n_recall_hits"] = int(row["n_recall_hits"])

        row = W.q_ann_ivf_recall(spark, sf_dir).collect()[0]
        out["n_recall_hits_sample"] = int(row["n_recall_hits_sample"])
        out["n_recall_hits_dist"] = int(row["n_recall_hits_dist"])

        src = {r["source"]: (int(r["hll_estimate"]), int(r["exact_distinct"]))
               for r in W.q_hll_per_source(spark, sf_dir).collect()}
        out["per_source"] = src
        return out
    finally:
        spark.stop()


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    check = "--check-stability" in sys.argv

    a = measure(sf_dir, "local[8]", 8)
    if check:
        b = measure(sf_dir, "local[4]", 32)
        if a != b:
            diff = {k: (a[k], b[k]) for k in a if a[k] != b.get(k)}
            print(f"CONFIG-DEPENDENT degrees (unpinnable): {diff}",
                  file=sys.stderr)
            return 1
        print("stability check: identical under local[8]/8 and local[4]/32",
              file=sys.stderr)

    disc = a["discriminator"]
    print(f"# paste into __spark_entry__._DEGREE_PINS (corpus key {disc}):")
    for name in ("n_false_positives", "hll_estimate", "n_recall_hits",
                 "n_recall_hits_sample", "n_recall_hits_dist"):
        print(f'    "{name}": {{..., {disc}: {a[name]}}},')
    deviating = {s: est for s, (est, exact) in sorted(a["per_source"].items())
                 if est != exact}
    if deviating:
        print("# per-source HLL deviations (the _HLL_SRC_SF01 shape; exact "
              "sources need no pin):")
        for s, est in deviating.items():
            print(f'    "{s}": {est},')
    else:
        print("# per-source HLL estimates are all exact on this corpus: "
              "no per-source pins needed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
