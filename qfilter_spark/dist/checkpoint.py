"""Checkpointed merge lineage (north_rule: resumable runs).

Each tree-merge round is persisted as a Parquet table
``<dir>/round=K/`` carrying per-shard lineage + metrics
(shard_id, n_items, build_secs, payload). A round is complete when Spark's
``_SUCCESS`` marker exists; resume reads the last complete round and
continues the reduction from there, skipping all finished work.
"""

from __future__ import annotations

import os

from .agg import PARTIAL_SCHEMA


class MergeLineage:
    def __init__(self, spark, directory: str):
        self.spark = spark
        self.dir = directory

    def _round_path(self, rnd: int) -> str:
        return os.path.join(self.dir, f"round={rnd}")

    def write_round(self, df, rnd: int):
        """Persist a round and return the re-read DataFrame (cuts lineage)."""
        path = self._round_path(rnd)
        df.write.mode("overwrite").parquet(path)
        return self.spark.read.schema(PARTIAL_SCHEMA).parquet(path)

    def complete_rounds(self) -> list[int]:
        if not os.path.isdir(self.dir):
            return []
        rounds = []
        for name in os.listdir(self.dir):
            if not name.startswith("round="):
                continue
            suffix = name.split("=", 1)[1]
            if not suffix.isdigit():  # stray dirs (backups, copy-tool
                continue              # artifacts) must not break resume
            if os.path.exists(os.path.join(self.dir, name, "_SUCCESS")):
                rounds.append(int(suffix))
        return sorted(rounds)

    def last_complete_round(self) -> int | None:
        rounds = self.complete_rounds()
        return rounds[-1] if rounds else None

    def read_round(self, rnd: int):
        return self.spark.read.schema(PARTIAL_SCHEMA).parquet(self._round_path(rnd))

    def metrics(self, rnd: int) -> list[dict]:
        """Per-shard lineage metrics for a round (without payloads)."""
        rows = self.read_round(rnd).select("shard_id", "n_items", "build_secs").collect()
        return [r.asDict() for r in rows]


def resume_tree_merge(spark, directory: str, fan_in: int = 16) -> bytes:
    """Continue an interrupted tree merge from its last complete round."""
    from .agg import tree_merge

    lineage = MergeLineage(spark, directory)
    last = lineage.last_complete_round()
    if last is None:
        raise FileNotFoundError(f"no complete merge round under {directory}")
    df = lineage.read_round(last)
    n = df.count()

    class _Offset(MergeLineage):
        def write_round(self, d, rnd):
            return super().write_round(d, rnd + last)

    return tree_merge(df, fan_in=fan_in, lineage=_Offset(spark, directory),
                      n_partials=n, write_initial=False)
