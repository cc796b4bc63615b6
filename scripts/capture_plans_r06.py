"""Capture .explain('formatted') for the optimization-relevant stages.

Usage: python capture_plans.py <repo_root> <suffix(before|after)> <outdir>
Builds the SAME internal DataFrames the gate queries drive, through the
package under <repo_root>, and writes plans/<query>_<suffix>.txt.
"""
import os, sys, time
root, suffix, outdir = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, root)
os.environ["PYTHONPATH"] = root
os.makedirs(outdir, exist_ok=True)
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[32]")
         .appName(f"plans-{suffix}")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "16g")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
         .config("spark.sql.session.timeZone", "UTC")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"

from qfilter_spark import workloads as W, sketches
from qfilter_spark.dist import SketchSpec, build_sketch, partial_sketches
from qfilter_spark.dist.probe import probe_hashes
import qfilter_spark.dist.sharded as S

def dump(name, df):
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
        f.write(plan)
    print("wrote", name, flush=True)

# ---- rsqf_fpr: absent-key probe plan ----
docs = W._hashed(W.load(spark, sf, "documents"), "doc_id")
n = W.table_rows(sf, "documents")
spec_d = SketchSpec("rsqf", dict(capacity=max(64, n), fp_rate=0.01), "hash_col", "h")
blob = build_sketch(docs, spec_d, fan_in=8)
try:
    absent = spark.range(10**12, 10**12 + 50_000, 1, 8).select(
        F.xxhash64(F.col("id").cast("long")).alias("h"))
    if suffix == "before":
        absent = spark.range(10**12, 10**12 + 50_000).select(
            F.xxhash64(F.col("id").cast("long")).alias("h"))
    dump("rsqf_fpr_probe", probe_hashes(absent, blob, "h", out_col="c", as_bool=True).where("c"))
except Exception as e:
    print("fpr skip", e)

# ---- quantile rank agg plan (kll over orders) ----
orders = W.load(spark, sf, "orders")
col = "o_totalprice"
if suffix == "before":
    dfq = W.fan_out(orders)
    aggs = [F.count("*").alias("n")] + [F.sum((F.col(col) <= F.lit(float(p))).cast("long")).alias(f"r{p}") for p in (10,25,50,75,90)]
    dump("kll_rank_agg", dfq.agg(*aggs))
    dump("kll_partials", partial_sketches(dfq, SketchSpec("kll", dict(k=200), "values", col)))
else:
    vals = orders.select(col)
    aggs = [F.count("*").alias("n")] + [F.sum((F.col(col) <= F.lit(float(p))).cast("long")).alias(f"r{p}") for p in (10,25,50,75,90)]
    dump("kll_rank_agg", vals.agg(*aggs))
    dump("kll_partials", partial_sketches(W.fan_out(vals), SketchSpec("kll", dict(k=200), "values", col)))

# ---- sharded probe plan (rsqf_sharded's stats stage) ----
li = W._hashed(W.load(spark, sf, "lineitem"), "l_orderkey")
nl = W.table_rows(sf, "lineitem")
spec_l = SketchSpec("rsqf", dict(capacity=max(64, nl), fp_rate=0.01), "hash_col", "h")
fdf = S.build_sharded_filter(li, spec_l, n_shards=16)
if suffix == "after":
    fdf = fdf.cache()
    fdf.count()
    probe = S.probe_sharded_chunks(li, spec_l, fdf, 16, spec_l)
else:
    probe = S.probe_sharded(li, "h", fdf, 16, spec_l)
dump("rsqf_sharded_probe", probe.groupBy().sum("n_probed", "n_contained"))
if suffix == "after":
    fdf.unpersist()

# ---- merge_invariance partials (project before the 8-way exchange) ----
if suffix == "before":
    li8 = W._hashed(W.load(spark, sf, "lineitem"), "l_orderkey").repartition(8)
else:
    li8 = W._hashed(W.load(spark, sf, "lineitem"), "l_orderkey").select("h").repartition(8)
dump("merge_invariance_partials", partial_sketches(li8, spec_l))

# ---- headline: chunk-emit build + chunked probe (sorted-run pipeline) ----
corpus = os.path.join(root, ".bench_cache", "corpus_20000")
if os.path.exists(os.path.join("/root/repo/.bench_cache", "corpus_20000")):
    corpus = "/root/repo/.bench_cache/corpus_20000"
    cdf = spark.read.parquet(corpus).repartition(64).select("tokens", "n_tok")
    spec_h = SketchSpec("rsqf", dict(capacity=7_000_000, fp_rate=0.01),
                        mode="tokens_ngram", col="tokens", ngram_n=3)
    dump("headline_build", S.build_sharded_filter(cdf, spec_h, n_shards=16))
    fdf2 = S.build_sharded_filter(cdf, spec_h, n_shards=16)
    dump("headline_probe", S.probe_sharded_chunks(cdf, spec_h, fdf2, 16, spec_h))

# ---- dedup_embedding_cosine final plan ----
try:
    dump("dedup_embedding_cosine", W.q_dedup_embedding_cosine(spark, sf))
except Exception as e:
    print("emb skip", e)

# ---- multimodal / token_stats / final returned plans of untouched-but-audited queries ----
for qname in ("rsqf_membership", "rsqf_counting", "bloom_membership",
              "cms_heavy_hitters", "dedup_minhash", "dedup_ngram_jaccard",
              "dedup_simhash", "topk_tokens", "multimodal_stats",
              "token_stats"):
    try:
        dump(qname, getattr(W, f"q_{qname}" if not qname.startswith("q_") else qname)(spark, sf))
    except Exception as e:
        print(qname, "skip", e)
spark.stop()
