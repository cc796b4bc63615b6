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


# Spark 4.1.2 F.xxhash64 vectors for DoubleType lanes (seed 42):
# doubles hash their IEEE754 long bits, -0.0 normalized to 0.0
# (SPARK-27619), NaN canonicalized (Java doubleToLongBits); a NULL column
# passes the seed through unchanged.
SPARK_DOUBLE_VECTORS = {
    1.5: 7738255526519901366,
    0.0: -5252525462095825812,
    -0.0: -5252525462095825812,
    float("nan"): -3127944061524951246,
}


def test_hash_obj_floats_match_spark_vectors():
    from qfilter_spark.hashing import hash_obj, to_i64

    for v, want in SPARK_DOUBLE_VECTORS.items():
        assert int(np.int64(np.uint64(hash_obj(v)))) == want
    assert hash_obj(np.float32(1.5)) == hash_obj(1.5)  # promoted to double
    assert hash_obj(np.float64(-0.0)) == hash_obj(0.0)


def test_hash_obj_none_and_nested():
    from qfilter_spark.hashing import SPARK_SEED, hash_obj

    # a null lane passes the seed through: top-level None == seed,
    # None inside a composite is a no-op lane
    assert hash_obj(None) == SPARK_SEED
    assert hash_obj((1, None, "a")) == hash_obj((1, "a"))
    assert hash_obj((None, 7)) == hash_obj(7)
    # nested sequences flatten into the same lane chain
    assert hash_obj((1, (2.5, "x"), b"y")) == hash_obj((1, 2.5, "x", b"y"))
    # mixed-type chain is order-sensitive
    assert hash_obj((1, "a")) != hash_obj(("a", 1))
