"""Table-maintenance patterns: skew-resistant aggregation, CDC upsert
(MERGE emulation), bucketed co-located joins.

These are the operational patterns a 100 TB lake needs around the
analytic operators:

- ``salted_count``: two-stage aggregation over a salted key. A single
  hot key (one domain dominating the corpus) turns a groupBy into one
  straggler task; salting fans the hot key over N partial groups, then
  a second tiny aggregation merges the partials. Result is IDENTICAL
  to the direct groupBy — which is exactly what the oracle checks.

- ``merge_upsert``: MERGE INTO emulation without Delta/Iceberg
  (guide: 'CDC/SCD2 -> anti-join + union'): updated rows replace
  matched target rows, unmatched updates are inserted.

- bucketed join: writing both sides bucketed by the join key lets
  Spark join without ANY shuffle (SortMergeJoin with zero Exchange).
  Registered as the ``bucketed_join_revenue`` query; the no-shuffle
  plan is pinned by tests/test_bucketing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_BUCKETS = 16


def salted_count(
    df: DataFrame, key: str, value_col: str, n_salts: int = SALT_BUCKETS
) -> DataFrame:
    """groupBy(key) count+sum via salt -> partial agg -> final agg."""
    salted = df.withColumn("_salt", F.pmod(F.crc32(F.col(value_col).cast("string")), F.lit(n_salts)))
    partial = salted.groupBy(key, "_salt").agg(
        F.count("*").alias("_n"), F.sum(value_col).alias("_s")
    )
    return partial.groupBy(key).agg(
        F.sum("_n").cast("long").alias("n"),
        F.round(F.sum("_s"), 6).alias("total"),
    )


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE emulation: rows of ``target`` whose key appears in
    ``updates`` are replaced; new update keys are appended."""
    kept = target.join(updates.select(key), key, "left_anti")
    return kept.unionByName(updates)
