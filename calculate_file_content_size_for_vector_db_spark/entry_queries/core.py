"""Core query family (split from the entry_queries monolith;
see entry_queries/__init__.py for the assembled registry)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from calculate_file_content_size_for_vector_db_spark.plans.pipeline import DocumentPipeline

from calculate_file_content_size_for_vector_db_spark.entry_queries._core import (
    FIXTURE_CHUNK_SIZE,
    _SQL_CHUNKS,
    _SQL_PREPROCESS,
    _docs,
    _pipe,
    register,
)


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


# ---------------------------------------------------------------------------
# Reference parity — scalar / window / join / sort / format surface
# (SURVEY.md C2, W1, W2, 2.8, O1, P1/P4, F1, S6-S10)
# ---------------------------------------------------------------------------


@register(
    "preprocess_text",
    f"SELECT doc_id, {_SQL_PREPROCESS('text')} AS processed FROM documents",
)
def preprocess_text_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.functions.text import preprocess_text

    return _docs(spark, sf_dir).select("doc_id", preprocess_text("text").alias("processed"))


@register(
    "chunk_stats",
    _SQL_PER_FILE.rstrip()
    + """
SELECT doc_id, chunk_index,
       chunk_index * 100 AS start_index,
       chunk_length
FROM chunk_sized
""",
)
def chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _pipe(spark)
        .chunks(_docs(spark, sf_dir))
        .select("doc_id", "chunk_index", "start_index", "chunk_length")
    )


@register(
    "running_offset",
    _SQL_PER_FILE.rstrip()
    + """
SELECT doc_id, chunk_index, chunk_length,
       CAST(COALESCE(SUM(chunk_length) OVER (
           PARTITION BY doc_id ORDER BY chunk_index
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS chunk_offset_in_file
FROM chunk_sized
""",
)
def running_offset_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _pipe(spark)
        .chunks(_docs(spark, sf_dir))
        .select("doc_id", "chunk_index", "chunk_length", "chunk_offset_in_file")
    )


@register(
    "chunk_enumerate",
    _SQL_PER_FILE.rstrip()
    + """
SELECT doc_id, chunk_index, chunk_length,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY chunk_index) - 1 AS INT)
           AS chunk_seq
FROM chunk_sized
""",
)
def chunk_enumerate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators import metrics

    chunks = _pipe(spark).chunks(_docs(spark, sf_dir))
    return metrics.chunk_enumerate(chunks).select(
        "doc_id", "chunk_index", "chunk_length", "chunk_seq"
    )


@register(
    "file_chunk_join",
    _SQL_PER_FILE.rstrip()
    + """
SELECT d.doc_id, d.lang,
       COALESCE(p.chunks, 0) AS chunks,
       COALESCE(p.text_size, 0) AS text_size
FROM documents d LEFT JOIN per_doc p USING (doc_id)
""",
)
def file_chunk_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators import metrics

    docs = _docs(spark, sf_dir)
    stats = metrics.chunk_aggregates(_pipe(spark).chunks(docs))
    return metrics.file_chunk_join(docs.select("doc_id", "lang"), stats).select(
        "doc_id", "lang", "chunks", "text_size"
    )


@register(
    "sort_by_size",
    _SQL_PER_FILE.rstrip()
    + """
SELECT doc_id, file_size,
       CAST(ROW_NUMBER() OVER (ORDER BY file_size DESC, doc_id) AS INT) AS size_rank
FROM per_file
""",
)
def sort_by_size_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: global size rank of the per-file summary.

    The unpartitioned window funnels through ONE task — acceptable only
    because its input is the per-file summary (one row per document,
    ~bytes each), not the chunk fact table; a corpus would need
    billions of FILES before the ranked frame outgrew an executor. The
    global total order IS the operator's semantic (reference
    pdf_reader.py sorts the whole summary table). Pinned by
    tests/test_plans.py::test_global_window_rankers_rank_aggregated_frames.
    """
    from pyspark.sql import Window

    per = _pipe(spark).per_file(_docs(spark, sf_dir))
    w = Window.orderBy(F.desc("file_size"), F.asc("doc_id"))
    return per.select(
        "doc_id", "file_size", F.row_number().over(w).cast("int").alias("size_rank")
    )


@register(
    "extrapolate_estimate",
    _SQL_PER_FILE.rstrip()
    + """
, totals AS (
    SELECT CASE WHEN SUM(text_size) = 0 THEN NULL
                ELSE round(SUM(file_size) / CAST(SUM(text_size) AS DOUBLE), 6) END AS total_ratio
    FROM per_file
)
SELECT CAST(100.0 AS DOUBLE) AS corpus_gb,
       round(100.0 / total_ratio, 6) AS estimated_text_gb
FROM totals
""",
)
def extrapolate_estimate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators import metrics

    totals = metrics.corpus_totals(_pipe(spark).per_file(_docs(spark, sf_dir)))
    return metrics.extrapolate_estimate(totals)


_SQL_PATHS = """
paths AS (
    SELECT doc_id,
           '/corpus/' || source || '/doc_' || CAST(doc_id AS VARCHAR) ||
               CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN '.pdf' WHEN 1 THEN '.PDF' ELSE '.txt' END
               AS path
    FROM documents
)
"""


@register(
    "project_basename",
    "WITH "
    + _SQL_PATHS
    + """
SELECT doc_id, path,
       path[length(path) - strpos(reverse(path), '/') + 2:] AS filename
FROM paths
""",
)
def project_basename_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.functions.text import basename

    return _synth_paths(_docs(spark, sf_dir)).select(
        "doc_id", "path", basename("path").alias("filename")
    )


@register(
    "filter_extension",
    "WITH "
    + _SQL_PATHS
    + """
SELECT doc_id, path FROM paths WHERE lower(path) LIKE '%.pdf'
""",
)
def filter_extension_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F1 (pdf_reader.py:343): case-INSENSITIVE extension match
    return (
        _synth_paths(_docs(spark, sf_dir))
        .where(F.lower(F.col("path")).endswith(".pdf"))
        .select("doc_id", "path")
    )


def _synth_paths(docs: DataFrame) -> DataFrame:
    ext = (
        F.when(F.col("doc_id") % 3 == 0, ".pdf")
        .when(F.col("doc_id") % 3 == 1, ".PDF")
        .otherwise(".txt")
    )
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("/corpus/"), F.col("source"), F.lit("/doc_"),
            F.col("doc_id").cast("string"), ext,
        ).alias("path"),
    )


@register(
    "format_summary",
    _SQL_PER_FILE.rstrip()
    + """
SELECT COALESCE(CAST(doc_id AS VARCHAR), 'SUM TOTAL') AS filename,
       format('{:,}', CAST(SUM(file_size) AS BIGINT)) AS file_size_fmt,
       format('{:,}', CAST(SUM(text_size) AS BIGINT)) AS text_size_fmt,
       format('{:,}', CAST(SUM(chunks) AS BIGINT)) AS chunks_fmt,
       printf('%.2f', CASE WHEN SUM(text_size) = 0 THEN NULL
            ELSE round(SUM(file_size) / CAST(SUM(text_size) AS DOUBLE), 6) END) AS ratio_fmt
FROM per_file
GROUP BY ROLLUP(doc_id)
""",
)
def format_summary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.functions.fmt import format_summary

    return format_summary(_pipe(spark).summary(_docs(spark, sf_dir)))


@register(
    "record_to_json",
    "SELECT doc_id, to_json(struct_pack(doc_id := doc_id, lang := lang, "
    "n_chars := n_chars)) AS record FROM documents",
)
def record_to_json_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.functions.fmt import record_to_json

    return _docs(spark, sf_dir).select(
        "doc_id", record_to_json("doc_id", "lang", "n_chars").alias("record")
    )


# ---------------------------------------------------------------------------
# Non-SQL-expressible ops (driver records rows-only checks)
# ---------------------------------------------------------------------------


@register("chunk_split", None)
def chunk_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: the recursive character splitter (pandas UDF + posexplode)."""
    pipe = DocumentPipeline(spark, chunk_size=FIXTURE_CHUNK_SIZE, recursive=True)
    return pipe.chunks(_docs(spark, sf_dir)).select(
        "doc_id", "chunk_index", "start_index", "chunk_length", "content"
    )


@register("chunk_split_overlap", None)
def chunk_split_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 with chunk_overlap > 0 (pdf_reader.py:310 exposes the knob;
    the CLI default is 0, so this covers the library-consumer path).
    Rows-only like chunk_split; the overlap merge/eviction semantics
    are pinned by goldens and properties in tests/test_chunk.py."""
    pipe = DocumentPipeline(
        spark, chunk_size=FIXTURE_CHUNK_SIZE, chunk_overlap=20, recursive=True
    )
    return pipe.chunks(_docs(spark, sf_dir)).select(
        "doc_id", "chunk_index", "start_index", "chunk_length", "content"
    )


@register("file_scan", None)
def file_scan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRC1/SRC2: real binaryFile recursive scan (of the fixture dir
    itself — the parquet files are the only real files available)."""
    from calculate_file_content_size_for_vector_db_spark.sources.io import scan_files

    return scan_files(spark, sf_dir, extension=".parquet", with_content=False).select(
        "path", "length"
    )


@register("pdf_extract", None)
def pdf_extract_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRC3: text -> deterministic PDF bytes -> distributed per-page
    extraction via mapInPandas (round-trip exercises the real plumbing)."""
    from calculate_file_content_size_for_vector_db_spark.sources.extract import (
        extract_pages,
        text_to_pdf_udf,
    )

    docs = _docs(spark, sf_dir).limit(200)
    files = docs.select(
        F.concat(F.lit("mem://doc_"), F.col("doc_id").cast("string")).alias("path"),
        text_to_pdf_udf()(F.col("text")).alias("content"),
    )
    return extract_pages(files)


@register("csv_sink", None)
def csv_sink_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3: CSV sink round-trip (write single-file CSV, read it back)."""
    import tempfile

    from calculate_file_content_size_for_vector_db_spark.sources.io import write_csv

    out = tempfile.mkdtemp(prefix="csv_sink_") + "/summary"
    summary = _pipe(spark).summary(_docs(spark, sf_dir))
    write_csv(summary, out)
    return spark.read.option("header", True).csv(out)
