"""Partition-shape helpers.

Small fixture tables arrive as ONE parquet split, so a compute-heavy
narrow operator (regex chains, higher-order-function hashing, Pandas
UDF decode) would run on a single core no matter how many executors
exist. ``spread`` repartitions UP to the session's default parallelism
— and never DOWN: at 100 TB the scan already yields thousands of
splits and repartitioning would only add a pointless shuffle, so it
becomes a no-op there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Ensure at least defaultParallelism * min_factor partitions for
    downstream compute-bound narrow transforms."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
