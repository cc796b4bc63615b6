"""Canary for the hint-free grouped-map Arrow contract (VERDICT r5 #2).

dist/agg.build_grouped_sketches defines its applyInArrow function WITHOUT
type hints on purpose: PySpark's eval-type inference crashes on
unresolvable hints, and the hint-free fallback happens to resolve to the
grouped-map Arrow eval type we need. That is a fragile upstream contract:
a PySpark upgrade that changes the inference rules would otherwise fail
deep inside a gate run with an opaque worker error. This test constructs
a grouped-map applyInArrow exactly the way agg.py does and fails with a
readable message if the contract moves.
"""

from __future__ import annotations

import pyarrow as pa
import pytest


@pytest.mark.usefixtures("spark")
def test_hint_free_apply_in_arrow_grouped_map(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "k string, v long")

    # EXACTLY the agg.py shape: no type hints on either parameter, a
    # pyarrow.Table in and out, a tuple key
    def fold(key, tbl):
        return pa.table({
            "k": pa.array([key[0].as_py()], pa.string()),
            "n": pa.array([tbl.num_rows], pa.int64()),
        })

    try:
        rows = (df.groupBy("k").applyInArrow(fold, "k string, n long")
                .collect())
    except Exception as exc:  # noqa: BLE001 — the message IS the product
        pytest.fail(
            "hint-free applyInArrow grouped-map no longer resolves to the "
            "grouped-map Arrow eval type — PySpark's eval-type inference "
            f"contract changed (see dist/agg.py build_salted): {exc!r}")
    got = {r["k"]: r["n"] for r in rows}
    assert got == {"a": 2, "b": 1}, got
