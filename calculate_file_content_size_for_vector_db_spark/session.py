"""SparkSession builder tuned for the engine.

The reference's only parallelism knob is a process-pool size
(pdf_reader.py:278,543 — "number_of_threads", actually processes). In
Spark, parallelism comes from partitions; this builder pins the configs
every pipeline in this package assumes:

- UTC session timezone (oracle comparisons against DuckDB are UTC-naive),
- Arrow-accelerated Python UDF exchange (the pdf-extract and recursive
  splitter paths are Pandas UDFs),
- AQE on (runtime shuffle-partition coalescing + skew-join splitting —
  the 1,652-page-file-among-15-page-files skew of README.md:20 at scale),
- shuffle partitions sized to local cores for tests; a real cluster
  deployment overrides via spark-submit conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "content-sizer",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = cpus if cpus is not None else os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", "/tmp/spark-warehouse")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    return builder.getOrCreate()
