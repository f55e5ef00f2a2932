"""Query registry backing __spark_entry__.py.

Each ``Q`` pairs a Spark DataFrame callable (spark, sf_dir) -> DataFrame
with its DuckDB oracle SQL (None for non-SQL-expressible ops -> the
driver's weaker rows-only check). Aliases are kept identical on both
sides because the driver's compare sorts columns by name before hashing.

Conventions for hash-stable parity:
- doubles rounded to 6 decimals on BOTH sides (partition-order float
  summation differences live far below 1e-6 at fixture scale);
- DuckDB integer SUM/COUNT cast to BIGINT (DuckDB sums to HUGEINT);
- division guarded: Spark try_divide <-> SQL CASE WHEN 0 THEN NULL;
- timestamps compared as formatted strings.

Fixture chunk size is 100 (not the reference's 1200, pdf_reader.py:506)
so the ~100-500 char synthetic docs yield multiple chunks per doc.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calculate_file_content_size_for_vector_db_spark.plans.pipeline import DocumentPipeline
from calculate_file_content_size_for_vector_db_spark.sources.io import read_table

FIXTURE_CHUNK_SIZE = 100


@dataclass
class Q:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]


REGISTRY: dict[str, Q] = {}


def register(name: str, oracle: Optional[str] = None):
    def deco(fn):
        REGISTRY[name] = Q(fn, oracle)
        return fn

    return deco


def _pipe(spark: SparkSession) -> DocumentPipeline:
    return DocumentPipeline(spark, chunk_size=FIXTURE_CHUNK_SIZE)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# Shared oracle SQL fragments (DuckDB dialect)
# ---------------------------------------------------------------------------

# C2/S1-S4 preprocessing chain, order per SURVEY.md Q4. In DuckDB
# single-quoted strings, backslash is literal: '\n' is the RE2 newline
# escape, '\\u' matches a literal backslash + u.
def _SQL_PREPROCESS(expr: str) -> str:
    return (
        "lower(regexp_replace(regexp_replace(regexp_replace("
        f"{expr}, '\\n{{2,}}', chr(10), 'g'), '\\n+', ' ', 'g'), "
        "'\\\\u[0-9a-fA-F]{4}', '', 'g'))"
    )


# Fixed-width chunk table over documents (chunk_size 100), processed
# content + length — mirrors DocumentPipeline.chunks minus the window.
_SQL_CHUNKS = f"""
chunk_raw AS (
    SELECT doc_id,
           CAST(unnest(range(0, CAST(ceil(length(text) / {FIXTURE_CHUNK_SIZE}.0) AS INT))) AS INT) AS chunk_index,
           text
    FROM documents
    WHERE length(text) > 0
),
chunks AS (
    SELECT doc_id,
           chunk_index,
           {_SQL_PREPROCESS(f"substring(text, chunk_index * {FIXTURE_CHUNK_SIZE} + 1, {FIXTURE_CHUNK_SIZE})")} AS content
    FROM chunk_raw
),
chunk_sized AS (
    SELECT doc_id, chunk_index, content,
           CAST(length(content) AS INT) AS chunk_length
    FROM chunks
)
"""

_SQL_PER_FILE = f"""
WITH {_SQL_CHUNKS},
per_doc AS (
    SELECT doc_id,
           COUNT(*) AS chunks,
           CAST(SUM(chunk_length) AS BIGINT) AS text_size
    FROM chunk_sized
    GROUP BY doc_id
),
per_file AS (
    SELECT d.doc_id,
           d.n_chars AS file_size,
           COALESCE(p.chunks, 0) AS chunks,
           COALESCE(p.text_size, 0) AS text_size,
           CASE WHEN COALESCE(p.text_size, 0) = 0 THEN NULL
                ELSE round(d.n_chars / CAST(p.text_size AS DOUBLE), 6) END AS ratio
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
)
"""


# ---------------------------------------------------------------------------
# Core metric queries (SURVEY.md A1-A5, P3, 2.8 join, rollup)
# ---------------------------------------------------------------------------


@register(
    "per_file_metrics",
    _SQL_PER_FILE + "SELECT doc_id, file_size, chunks, text_size, ratio FROM per_file",
)
def per_file_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pipe(spark).per_file(_docs(spark, sf_dir))


@register(
    "corpus_totals",
    _SQL_PER_FILE
    + """
SELECT COUNT(*) AS n_files,
       CAST(SUM(file_size) AS BIGINT) AS total_file_size,
       CAST(SUM(text_size) AS BIGINT) AS total_text_size,
       CAST(SUM(chunks) AS BIGINT) AS total_chunks,
       CASE WHEN SUM(text_size) = 0 THEN NULL
            ELSE round(SUM(file_size) / CAST(SUM(text_size) AS DOUBLE), 6) END AS total_ratio
FROM per_file
""",
)
def corpus_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators import metrics

    return metrics.corpus_totals(_pipe(spark).per_file(_docs(spark, sf_dir)))


@register(
    "rollup_summary",
    _SQL_PER_FILE
    + """
SELECT COALESCE(CAST(doc_id AS VARCHAR), 'SUM TOTAL') AS filename,
       CAST(SUM(file_size) AS BIGINT) AS file_size,
       CAST(SUM(text_size) AS BIGINT) AS text_size,
       CAST(SUM(chunks) AS BIGINT) AS chunks,
       CASE WHEN SUM(text_size) = 0 THEN NULL
            ELSE round(SUM(file_size) / CAST(SUM(text_size) AS DOUBLE), 6) END AS ratio
FROM per_file
GROUP BY ROLLUP(doc_id)
""",
)
def rollup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pipe(spark).summary(_docs(spark, sf_dir))
