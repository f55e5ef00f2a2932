"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (rollup summary over the documents
fixture — the reference's whole reason to exist, README.md:13-27).
``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md section 2 (+ section 7.4 extensions); the driver runs
Spark vs DuckDB side-by-side at sf0.01 and hash-compares.

Registry pattern: every query is registered once with its Spark callable
and (when SQL-expressible) its DuckDB oracle, kept adjacent so the pair
stays in sync. Column names/aliases MUST match between the two.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from calculate_file_content_size_for_vector_db_spark import entry_queries

QueryFn = Callable[[SparkSession, str], DataFrame]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-document size metrics + SUM TOTAL rollup."""
    return entry_queries.REGISTRY["rollup_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in entry_queries.REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle
        for name, q in entry_queries.REGISTRY.items()
        if q.oracle is not None
    }
