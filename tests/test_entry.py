"""Driver-contract smoke: entry() runs, queries()/oracle_sql() are aligned,
and a fast subset of queries matches its DuckDB oracle at sf0.001.
(The full gate lives in scripts/check_correctness.py.)
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

FAST_SUBSET = ["rsqf_membership", "hll_distinct", "dedup_exact", "langid",
               "token_stats", "multimodal_stats"]


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession
    s = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert rows[0]["n_probed"] == rows[0]["n_contained"]


def test_every_query_has_known_oracle_or_is_documented():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles).issubset(set(qs)), "oracle without query"
    assert len(qs) >= 20


@pytest.mark.parametrize("name", FAST_SUBSET)
def test_fast_queries_match_oracle(spark, duck, name):
    got = entrymod.queries()[name](spark, SF_DIR).toPandas()
    want = duck.execute(entrymod.oracle_sql()[name]).df()
    got = got[sorted(got.columns)].sort_values(list(sorted(got.columns))).reset_index(drop=True)
    want = want[sorted(want.columns)].sort_values(list(sorted(want.columns))).reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        assert list(got[c].astype(object)) == list(want[c].astype(object)), c
