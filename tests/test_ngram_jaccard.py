"""ngram_jaccard_pairs vs brute force — including the HOT-shingle branch
(corpus-frequent shingles excluded from candidate generation but counted
exactly in the intersection), which gate-scale data never exercises."""

import itertools

import pytest
from pyspark.sql import functions as F

from qfilter_spark.functions import dedup


def brute_force(docs, n=3, t=800):
    """Exact all-pairs word-shingle Jaccard >= t/1000 (pure Python)."""
    sh = {}
    for doc_id, text in docs:
        words = text.split(" ")
        sh[doc_id] = {" ".join(words[i:i + n])
                      for i in range(len(words) - n + 1)} if len(words) >= n else set()
    out = {}
    for (a, sa), (b, sb) in itertools.combinations(sorted(sh.items()), 2):
        if not sa and not sb:
            continue
        jm = 1000 * len(sa & sb) // len(sa | sb)
        if jm >= t:
            out[(a, b)] = jm
    return out


@pytest.fixture(scope="module")
def hot_corpus():
    """Every doc shares an 8-word boilerplate (all its shingles have
    df == n_docs, far above max_df) plus distinct content; two pairs are
    near-duplicates whose similarity depends on BOTH hot and rare parts."""
    boiler = "terms of service apply to all content here"
    docs = []
    for i in range(40):
        body = " ".join(f"w{i}x{j}" for j in range(12))
        docs.append((f"d{i:02d}", f"{boiler} {body}"))
    # near-dup pair: same body, one word changed at the tail
    base = " ".join(f"same{j}" for j in range(20))
    docs.append(("e00", f"{boiler} {base} endA"))
    docs.append(("e01", f"{boiler} {base} endB"))
    # exact-dup pair
    docs.append(("f00", f"{boiler} alpha beta gamma delta epsilon zeta"))
    docs.append(("f01", f"{boiler} alpha beta gamma delta epsilon zeta"))
    return docs


def test_hot_branch_matches_brute_force(spark, hot_corpus):
    df = spark.createDataFrame(hot_corpus, "doc_id string, text string")
    got = {(r["doc_a"], r["doc_b"]): r["jacc_millis"]
           for r in dedup.ngram_jaccard_pairs(df, max_df=10,
                                              threshold_millis=800).collect()}
    want = brute_force(hot_corpus, t=800)
    assert got == want
    assert ("f00", "f01") in got and got[("f00", "f01")] == 1000
    # sanity: the boilerplate really is hot (df = 44 > max_df = 10)
    sh = dedup.with_shingle_hashes(dedup.with_shingles(df))
    freqs = (sh.select(F.explode("shingle_hashes").alias("hs"))
             .groupBy("hs").count().agg(F.max("count")).collect()[0][0])
    assert freqs > 10


def test_lower_threshold_still_exact(spark, hot_corpus):
    df = spark.createDataFrame(hot_corpus, "doc_id string, text string")
    got = {(r["doc_a"], r["doc_b"]): r["jacc_millis"]
           for r in dedup.ngram_jaccard_pairs(df, max_df=10,
                                              threshold_millis=300).collect()}
    want = brute_force(hot_corpus, t=300)
    # recall caveat: a qualifying pair with NO shared rare shingle is
    # legitimately missed; every pair found must have the exact score
    for pair, jm in got.items():
        assert want.get(pair) == jm
    # pairs sharing at least one rare shingle must all be found
    missed = set(want) - set(got)
    for a, b in missed:
        ta = dict(hot_corpus)[a].split(" ")
        tb = dict(hot_corpus)[b].split(" ")
        sa = {" ".join(ta[i:i + 3]) for i in range(len(ta) - 2)}
        sb = {" ".join(tb[i:i + 3]) for i in range(len(tb) - 2)}
        shared = sa & sb
        boiler_sh = {" ".join("terms of service apply to all content here"
                              .split(" ")[i:i + 3]) for i in range(6)}
        assert shared <= boiler_sh, (a, b, shared - boiler_sh)
