"""Hash parity: numpy/pure-python XXH64 vs Spark's xxhash64.

Expected values below were produced by Spark 4.1.2 ``F.xxhash64`` (seed 42)
and hardcoded so the fast suite needs no JVM; tests/test_dist.py re-checks
parity live inside a SparkSession.
"""

import numpy as np

from qfilter_spark.hashing import (
    to_i64,
    xxh64_bytes,
    xxh64_i64,
    xxh64_str,
    xxh64_u64,
    xxh64_u64_chain,
)

SPARK_LONG_VECTORS = {
    0: -5252525462095825812,
    1: -7001672635703045582,
    -1: 3858142552250413010,
}

SPARK_STR_VECTORS = {
    "": -7444071767201028348,
    "a": -8582455328737087284,
    "hello": -4367754540140381902,
    "hello world this is a longer string exceeding 32 bytes for stripe path":
        8918787915325306146,
    "héllo ünïcode ✓": 4009359668559222506,
}


def test_long_parity_with_spark_vectors():
    vals = np.array(list(SPARK_LONG_VECTORS), dtype=np.int64)
    got = to_i64(xxh64_u64(vals.view(np.uint64)))
    assert list(got) == list(SPARK_LONG_VECTORS.values())


def test_str_parity_with_spark_vectors():
    for s, want in SPARK_STR_VECTORS.items():
        assert np.int64(np.uint64(xxh64_str(s))) == want


def test_bytes_matches_8byte_kernel():
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 2**63, size=100, dtype=np.int64)
    vec = xxh64_u64(vals.view(np.uint64))
    for v, h in zip(vals, vec):
        assert xxh64_bytes(int(v).to_bytes(8, "little")) == int(h)


def test_chain_uses_previous_as_seed():
    a = np.array([1], dtype=np.uint64)
    b = np.array([2], dtype=np.uint64)
    h1 = xxh64_u64(a)
    chained = xxh64_u64_chain([a, b])
    assert chained[0] == xxh64_u64(b, h1)[0]


def test_i64_wrapper():
    v = np.array([-5], dtype=np.int64)
    assert xxh64_i64(v)[0] == xxh64_u64(v.view(np.uint64))[0]


def test_vector_seed_broadcast():
    vals = np.arange(4, dtype=np.uint64)
    seeds = np.arange(4, dtype=np.uint64)
    out = xxh64_u64(vals, seeds)
    for i in range(4):
        assert out[i] == xxh64_u64(vals[i : i + 1], int(seeds[i]))[0]
