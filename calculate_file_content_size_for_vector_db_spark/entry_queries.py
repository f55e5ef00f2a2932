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

from calculate_file_content_size_for_vector_db_spark.operators.dedup import (
    BLOOM_BITS,
    BLOOM_HASHES,
    PROD_MAX_BUCKET_SIZE,
    PROD_MAX_SHINGLE_FREQ,
)
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
        import functools

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Several queries persist() intermediates that feed multiple
            # plan branches and (correctly) never unpersist inside a lazy
            # builder — but across a 120-query sweep in one session those
            # caches accumulate in executor memory. Any prior query's
            # cache is dead weight once its result was materialized, so
            # each query entry starts from a clean cache.
            spark.catalog.clearCache()
            return fn(spark, sf_dir)

        REGISTRY[name] = Q(wrapped, oracle)
        return fn

    return deco


def _pipe(spark: SparkSession) -> DocumentPipeline:
    return DocumentPipeline(spark, chunk_size=FIXTURE_CHUNK_SIZE)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.partitioning import spread

    return spread(read_table(spark, sf_dir, "documents"))


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


# ---------------------------------------------------------------------------
# Text analysis extension (SURVEY.md section 7.4; operators/textstats.py)
# ---------------------------------------------------------------------------

_SQL_TOKENS = (
    "list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')"
)


@register(
    "text_tokens",
    f"""
SELECT doc_id,
       CAST(len({_SQL_TOKENS}) AS INT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS INT) AS n_bpe_tokens,
       CAST(length(text) AS INT) AS n_chars_text
FROM documents
""",
)
def text_tokens_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import token_counts

    return token_counts(_docs(spark, sf_dir)).select(
        "doc_id", "n_tokens", "n_bpe_tokens", "n_chars_text"
    )


_SQL_QUALITY_CHAIN = f"""
t AS (
    SELECT doc_id, text, {_SQL_TOKENS} AS ws,
           CAST(length(text) AS DOUBLE) AS n
    FROM documents
), m AS (
    SELECT doc_id, n,
           CAST(len(ws) AS DOUBLE) AS n_toks,
           CAST(n - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) AS punct,
           CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) AS alpha,
           CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to','in','is'))) AS DOUBLE) AS stop,
           CAST(coalesce(list_sum(list_transform(ws, w -> length(w))), 0) AS DOUBLE) AS tok_chars
    FROM t
), r AS (
    SELECT doc_id,
           round(CASE WHEN n = 0 THEN NULL ELSE punct / n END, 6) AS punct_ratio,
           round(CASE WHEN n = 0 THEN NULL ELSE alpha / n END, 6) AS alpha_ratio,
           round(CASE WHEN n_toks = 0 THEN NULL ELSE stop / n_toks END, 6) AS stopword_ratio,
           round(CASE WHEN n_toks = 0 THEN NULL ELSE tok_chars / n_toks END, 6) AS mean_word_len
    FROM m
), q AS (
    SELECT doc_id, punct_ratio, alpha_ratio, stopword_ratio, mean_word_len,
           round(1.0 - coalesce(punct_ratio, 1.0) + coalesce(stopword_ratio, 0.0), 6)
               AS quality_score
    FROM r
)
"""


@register(
    "text_quality",
    f"""
WITH {_SQL_QUALITY_CHAIN}
SELECT doc_id, punct_ratio, alpha_ratio, stopword_ratio, mean_word_len, quality_score
FROM q
""",
)
def text_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import quality_score

    return quality_score(_docs(spark, sf_dir)).select(
        "doc_id", "punct_ratio", "alpha_ratio", "stopword_ratio",
        "mean_word_len", "quality_score",
    )


@register(
    "text_lang_id",
    f"""
WITH t AS (
    SELECT doc_id, {_SQL_TOKENS} AS ws FROM documents
), s AS (
    SELECT doc_id,
           CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to','in','is'))) AS INT) AS score_en,
           CAST(len(list_filter(ws, w -> w IN ('der','die','das','und','ist','ein'))) AS INT) AS score_de,
           CAST(len(list_filter(ws, w -> w IN ('el','la','de','que','y','un'))) AS INT) AS score_es,
           CAST(len(list_filter(ws, w -> w IN ('le','la','et','les','des','un'))) AS INT) AS score_fr,
           CAST(len(list_filter(ws, w -> w IN ('的','是','了','在'))) AS INT) AS score_zh
    FROM t
)
SELECT doc_id, score_en, score_de, score_es, score_fr, score_zh,
       CASE WHEN greatest(score_en, score_de, score_es, score_fr, score_zh) = 0 THEN 'und'
            WHEN score_en = greatest(score_en, score_de, score_es, score_fr, score_zh) THEN 'en'
            WHEN score_de = greatest(score_en, score_de, score_es, score_fr, score_zh) THEN 'de'
            WHEN score_es = greatest(score_en, score_de, score_es, score_fr, score_zh) THEN 'es'
            WHEN score_fr = greatest(score_en, score_de, score_es, score_fr, score_zh) THEN 'fr'
            ELSE 'zh' END AS predicted_lang
FROM s
""",
)
def text_lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import lang_id

    return lang_id(_docs(spark, sf_dir)).select(
        "doc_id", "score_en", "score_de", "score_es", "score_fr", "score_zh",
        "predicted_lang",
    )


@register(
    "text_fingerprint",
    """
SELECT doc_id,
       CASE WHEN text IS NULL OR length(text) = 0 THEN 0
            ELSE list_reduce(
                list_transform(string_split(text, ''), c -> CAST(ord(c) AS BIGINT)),
                (a, b) -> (a * 31 + b) % 1000000007) END AS fp
FROM documents
""",
)
def text_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import fingerprint

    return _docs(spark, sf_dir).select("doc_id", fingerprint("text").alias("fp"))


@register(
    "text_lm_score",
    f"""
WITH tok AS (
    SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents
),
freq AS (SELECT tok, count(*) AS tf FROM tok GROUP BY tok),
tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS n FROM freq)
SELECT d.doc_id, s.lm_score
FROM documents d LEFT JOIN (
    SELECT t.doc_id, round(avg(ln(f.tf / tot.n)), 6) AS lm_score
    FROM tok t JOIN freq f USING (tok), tot
    GROUP BY t.doc_id
) s USING (doc_id)
""",
)
def text_lm_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram LM filter score (textstats.unigram_logprob):
    corpus frequencies are the LM, docs score by mean token
    ln-probability."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        unigram_logprob,
    )

    return unigram_logprob(_docs(spark, sf_dir))


@register(
    "source_reputation",
    f"""
WITH {_SQL_QUALITY_CHAIN}
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(q.quality_score), 6) AS source_quality
FROM documents d JOIN q USING (doc_id)
GROUP BY d.source
""",
)
def source_reputation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mean composite quality (textstats.source_reputation)
    — the domain-reputation table a curation pipeline broadcasts into
    its ingestion gate."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        source_reputation,
    )

    return source_reputation(_docs(spark, sf_dir)).select(
        "source", F.col("n_docs").cast("long").alias("n_docs"), "source_quality"
    )


# (keep_rate, exact percentile literal 1 - keep_rate) — shared between
# the Spark percentile() calls and the DuckDB quantile_cont mirror so
# both interpolate the same binary fraction.
_CALIBRATE_RATES = ((0.5, "0.5"), (0.8, "0.2"), (0.95, "0.05"))

_SQL_CALIBRATE_THRESHOLDS = "\nUNION ALL\n".join(
    f"SELECT CAST({rate} AS DOUBLE) AS keep_rate,"
    f" round(quantile_cont(quality_score, {frac}), 6) AS threshold FROM q"
    for rate, frac in _CALIBRATE_RATES
)


@register(
    "quality_calibrate",
    f"""
WITH {_SQL_QUALITY_CHAIN},
th AS (
{_SQL_CALIBRATE_THRESHOLDS}
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM q)
SELECT th.keep_rate, th.threshold,
       CAST(count(*) FILTER (WHERE s.quality_score >= th.threshold) AS BIGINT) AS n_pass,
       round(count(*) FILTER (WHERE s.quality_score >= th.threshold)
             / CAST(any_value(tot.total) AS DOUBLE), 6) AS pass_rate
FROM q s, th, tot
GROUP BY th.keep_rate, th.threshold
""",
)
def quality_calibrate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate calibration: the quality-score thresholds that keep 50 /
    80 / 95 percent of the corpus, with the realized pass counts —
    pick a data budget, read off the cutoff (instead of hand-tuning a
    magic score). One percentile aggregate + a 1-row broadcast back
    over the scores."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        calibrate_quality_threshold,
    )

    return calibrate_quality_threshold(_docs(spark, sf_dir), _CALIBRATE_RATES)


@register(
    "mix_balanced_recipe",
    """
WITH per AS (
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
),
corpus AS (
    SELECT CAST(sum(n_docs) AS DOUBLE) AS total,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(min(n_docs) AS BIGINT) AS min_n
    FROM per
)
SELECT lang, n_docs,
       round(n_docs / total, 6) AS actual_share,
       round(1.0 / n_groups, 6) AS target_share,
       round(min_n / CAST(n_docs AS DOUBLE), 6) AS sample_rate,
       min_n AS expected_docs
FROM per, corpus
""",
)
def mix_balanced_recipe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The uniform data-mixing recipe over languages: downsample every
    lang to the smallest lang's count (per-group sample_rate feeds
    sampleBy / a deterministic mod-id filter when composing the
    training mix). Two bounded shuffles."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        balanced_mix_recipe,
    )

    return balanced_mix_recipe(_docs(spark, sf_dir), "lang")


# ---------------------------------------------------------------------------
# Deduplication extension (operators/dedup.py)
# ---------------------------------------------------------------------------

_SQL_SHINGLES = f"""
ws_t AS (
    SELECT doc_id, {_SQL_TOKENS} AS ws FROM documents
),
sh_t AS (
    SELECT doc_id,
           list_distinct(list_transform(range(1, len(ws) - 1),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
    FROM ws_t
    WHERE len(ws) >= 3
)
"""


@register(
    "dedup_exact",
    """
SELECT sha256(text) AS content_hash,
       CAST(min(doc_id) AS BIGINT) AS keeper_id,
       count(*) AS dup_count
FROM documents
GROUP BY sha256(text)
""",
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import exact_dedup

    return exact_dedup(_docs(spark, sf_dir)).select("content_hash", "keeper_id", "dup_count")


@register(
    "dedup_ngram_jaccard",
    "WITH "
    + _SQL_SHINGLES
    + """,
ex AS (
    SELECT doc_id, len(sh) AS n, unnest(sh) AS g FROM sh_t
),
cand AS (
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           count(*) AS inter, any_value(a.n) AS n_a, any_value(b.n) AS n_b
    FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT a_id, b_id,
       round(inter / CAST(n_a + n_b - inter AS DOUBLE), 6) AS jaccard
FROM cand
WHERE round(inter / CAST(n_a + n_b - inter AS DOUBLE), 6) >= 0.5
""",
)
def dedup_ngram_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs (no candidate bound) — full recall;
    the production-scale bounded form is dedup_ngram_jaccard_capped,
    mirroring the dedup_minhash_lsh / _capped naming pair."""
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    return ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.5)


@register(
    "dedup_ngram_jaccard_capped",
    "WITH "
    + _SQL_SHINGLES
    + f""",
ex AS (
    SELECT doc_id, len(sh) AS n, unnest(sh) AS g FROM sh_t
),
exf AS (
    -- mirror of max_shingle_freq: hub shingles leave the JOIN side
    -- only; n (per-doc size) keeps every shingle
    SELECT * FROM ex QUALIFY count(*) OVER (PARTITION BY g) <= {PROD_MAX_SHINGLE_FREQ}
),
cand AS (
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           count(*) AS inter, any_value(a.n) AS n_a, any_value(b.n) AS n_b
    FROM exf a JOIN exf b ON a.g = b.g AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT a_id, b_id,
       round(inter / CAST(n_a + n_b - inter AS DOUBLE), 6) AS jaccard
FROM cand
WHERE round(inter / CAST(n_a + n_b - inter AS DOUBLE), 6) >= 0.5
""",
)
def dedup_ngram_jaccard_capped_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-candidate form — the production default at scale: hub
    shingles (doc-freq > PROD_MAX_SHINGLE_FREQ) are dropped from
    candidate generation, since one boilerplate shingle shared by 1M
    docs fans the self-join out quadratically. The cap is mirrored in
    the oracle's QUALIFY filter, so the bounded semantics themselves
    are hash-verified (neutral at fixture scale: max doc-freq there is
    7)."""
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import (
        PROD_MAX_SHINGLE_FREQ,
        ngram_jaccard_pairs,
    )

    return ngram_jaccard_pairs(
        _docs(spark, sf_dir), threshold=0.5, max_shingle_freq=PROD_MAX_SHINGLE_FREQ
    )


_SQL_MINHASH_BANDS = (
    "WITH "
    + _SQL_SHINGLES
    + """,
sig_t AS (
    SELECT doc_id,
           list_transform(range(0, 8),
               s -> list_min(list_transform(sh, g -> md5(CAST(s AS VARCHAR) || '|' || g)))) AS signature
    FROM sh_t
),
band_t AS (
    SELECT doc_id, signature, CAST(unnest(range(0, 4)) AS INT) AS band FROM sig_t
),
bands AS (
    SELECT doc_id, band,
           md5(signature[2*band + 1] || '|' || signature[2*band + 2]) AS band_hash
    FROM band_t
)
"""
)


@register(
    "minhash_signature",
    _SQL_MINHASH_BANDS + "SELECT doc_id, band, band_hash FROM bands",
)
def minhash_signature_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import (
        minhash_bands,
        minhash_signature,
    )

    return minhash_bands(minhash_signature(_docs(spark, sf_dir))).select(
        "doc_id", "band", "band_hash"
    )


@register(
    "dedup_minhash_lsh",
    _SQL_MINHASH_BANDS
    + """,
cand AS (
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
verified AS (
    SELECT c.a_id, c.b_id,
           len(list_intersect(sa.sh, sb.sh)) AS inter,
           len(sa.sh) AS n_a, len(sb.sh) AS n_b
    FROM cand c
    JOIN sh_t sa ON sa.doc_id = c.a_id
    JOIN sh_t sb ON sb.doc_id = c.b_id
)
SELECT a_id, b_id,
       round(inter / CAST(n_a + n_b - inter AS DOUBLE), 6) AS jaccard
FROM verified
WHERE round(inter / CAST(n_a + n_b - inter AS DOUBLE), 6) >= 0.5
""",
)
def dedup_minhash_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.5)


@register(
    "dedup_minhash_lsh_capped",
    _SQL_MINHASH_BANDS
    + f""",
bands_f AS (
    -- mirror of max_bucket_size: oversized band buckets are dropped
    -- whole before candidate generation
    SELECT * FROM bands
    QUALIFY count(*) OVER (PARTITION BY band, band_hash) <= {PROD_MAX_BUCKET_SIZE}
),
cand AS (
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM bands_f a JOIN bands_f b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
verified AS (
    SELECT c.a_id, c.b_id,
           len(list_intersect(sa.sh, sb.sh)) AS inter,
           len(sa.sh) AS n_a, len(sb.sh) AS n_b
    FROM cand c
    JOIN sh_t sa ON sa.doc_id = c.a_id
    JOIN sh_t sb ON sb.doc_id = c.b_id
)
SELECT a_id, b_id,
       round(inter / CAST(n_a + n_b - inter AS DOUBLE), 6) AS jaccard
FROM verified
WHERE round(inter / CAST(n_a + n_b - inter AS DOUBLE), 6) >= 0.5
""",
)
def dedup_minhash_lsh_capped_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production default for MinHash-LSH at scale: band buckets
    larger than PROD_MAX_BUCKET_SIZE are dropped before the candidate
    self-join, bounding per-bucket fanout at cap^2 on low-entropy
    corpora where exact LSH degenerates to quadratic. Cap mirrored in
    the oracle's QUALIFY filter (neutral at fixture scale: max bucket
    there is 3), so the bounded semantics are hash-verified."""
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _docs(spark, sf_dir), threshold=0.5, max_bucket_size=PROD_MAX_BUCKET_SIZE
    )


# The "daily batch" split used by dedup_incremental: every 7th doc
# plays the new batch, the rest the existing corpus (mirrored in the
# oracle's candidate predicates).
_INCR_BATCH_MOD = 7


@register(
    "dedup_incremental",
    _SQL_MINHASH_BANDS
    + f""",
cand AS (
    SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_hash = b.band_hash
    WHERE a.doc_id % {_INCR_BATCH_MOD} = 0 AND b.doc_id % {_INCR_BATCH_MOD} <> 0
),
verified AS (
    SELECT c.new_id, c.corpus_id,
           len(list_intersect(sa.sh, sb.sh)) AS inter,
           len(sa.sh) AS n_a, len(sb.sh) AS n_b
    FROM cand c
    JOIN sh_t sa ON sa.doc_id = c.new_id
    JOIN sh_t sb ON sb.doc_id = c.corpus_id
)
SELECT new_id, corpus_id,
       round(inter / CAST(n_a + n_b - inter AS DOUBLE), 6) AS jaccard
FROM verified
WHERE round(inter / CAST(n_a + n_b - inter AS DOUBLE), 6) >= 0.5
""",
)
def dedup_incremental_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-batch-vs-corpus dedup (VERDICT r05 stretch): every 7th doc
    plays the daily batch, the rest the existing corpus whose band and
    shingle tables are the pre-built inputs — only the batch is
    signature-hashed, matching the operation a 100-TB pipeline runs per
    ingest. The oracle computes bands over the union (signatures are
    per-doc, so subset bands == filtered union bands) and splits in the
    candidate predicate."""
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import (
        incremental_neardup_pairs,
        minhash_bands,
        minhash_signature,
        shingle_sets,
    )

    docs = _docs(spark, sf_dir)
    batch = docs.where(F.col("doc_id") % _INCR_BATCH_MOD == 0)
    corpus = docs.where(F.col("doc_id") % _INCR_BATCH_MOD != 0)
    corpus_bands = minhash_bands(minhash_signature(corpus))
    return incremental_neardup_pairs(batch, corpus_bands, shingle_sets(corpus))


@register(
    "dedup_bloom_prefilter",
    _SQL_MINHASH_BANDS
    + f""",
hashed AS (
    SELECT doc_id, band_hash,
           CAST(('0x' || substring(band_hash, 1, 15)) AS BIGINT) AS h1,
           CAST(('0x' || substring(band_hash, 16, 15)) AS BIGINT) AS h2
    FROM bands
),
corpus_pos AS (
    SELECT DISTINCT (h1 + t.j * h2) % {BLOOM_BITS} AS p
    FROM hashed CROSS JOIN range(0, {BLOOM_HASHES}) t(j)
    WHERE doc_id % {_INCR_BATCH_MOD} <> 0
),
batch_probe AS (
    SELECT doc_id, band_hash, (h1 + t.j * h2) % {BLOOM_BITS} AS p
    FROM hashed CROSS JOIN range(0, {BLOOM_HASHES}) t(j)
    WHERE doc_id % {_INCR_BATCH_MOD} = 0
),
row_ok AS (
    SELECT doc_id, band_hash,
           min(CASE WHEN p IN (SELECT p FROM corpus_pos) THEN 1 ELSE 0 END) AS all_hit
    FROM batch_probe GROUP BY doc_id, band_hash
),
doc_ok AS (SELECT doc_id, max(all_hit) AS hit FROM row_ok GROUP BY doc_id)
SELECT d.doc_id, coalesce(o.hit = 1, FALSE) AS maybe_neardup
FROM documents d LEFT JOIN doc_ok o ON o.doc_id = d.doc_id
WHERE d.doc_id % {_INCR_BATCH_MOD} = 0
""",
)
def dedup_bloom_prefilter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Bloom-join pre-gate for incremental near-dup: the
    stored corpus's LSH band hashes are packed into a bounded bitmap
    (dedup.bloom_bitmap — at most m/32 rows, broadcastable at any
    corpus size) and the daily batch probes it with its own band
    hashes. maybe_neardup=false docs provably share no band hash with
    the corpus, so only the true fraction enters the band equi-join.
    The oracle checks membership against the unpacked DISTINCT
    position set — equivalent because the 32-bit word packing is
    lossless."""
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import (
        bloom_neardup_prefilter,
        minhash_bands,
        minhash_signature,
    )

    docs = _docs(spark, sf_dir)
    batch = docs.where(F.col("doc_id") % _INCR_BATCH_MOD == 0)
    corpus = docs.where(F.col("doc_id") % _INCR_BATCH_MOD != 0)
    corpus_bands = minhash_bands(minhash_signature(corpus))
    return bloom_neardup_prefilter(batch, corpus_bands)


@register(
    "dedup_bloom_append",
    _SQL_MINHASH_BANDS
    + f""",
hashed AS (
    SELECT band_hash,
           CAST(('0x' || substring(band_hash, 1, 15)) AS BIGINT) AS h1,
           CAST(('0x' || substring(band_hash, 16, 15)) AS BIGINT) AS h2
    FROM bands
),
pos AS (
    SELECT DISTINCT (h1 + t.j * h2) % {BLOOM_BITS} AS p
    FROM hashed CROSS JOIN range(0, {BLOOM_HASHES}) t(j)
),
words AS (
    SELECT p // 32 AS word_id, CAST(power(2, p % 32) AS BIGINT) AS mask FROM pos
)
SELECT CAST(word_id AS BIGINT) AS word_id, CAST(bit_or(mask) AS BIGINT) AS word
FROM words GROUP BY word_id
""",
)
def dedup_bloom_append_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the Bloom pre-gate's bitmap
    (dedup.bloom_bitmap_union, VERDICT r07 item 3): the stored bitmap
    is built from the corpus band store and persisted to parquet; the
    daily batch's band words are unioned IN (one bounded full-outer +
    bitwise OR) instead of rebuilding over the whole band store. The
    oracle builds the bitmap from scratch over ALL bands, so the hash
    pins union-in == rebuild (bit_or idempotence) THROUGH the parquet
    store seam — and a checkpoint replay that re-admits the same batch
    provably cannot corrupt the filter."""
    import tempfile

    from calculate_file_content_size_for_vector_db_spark.operators.dedup import (
        bloom_bitmap,
        bloom_bitmap_union,
        minhash_bands,
        minhash_signature,
    )

    docs = _docs(spark, sf_dir)
    batch = docs.where(F.col("doc_id") % _INCR_BATCH_MOD == 0)
    corpus = docs.where(F.col("doc_id") % _INCR_BATCH_MOD != 0)
    idx = tempfile.mkdtemp(prefix="bloom_store_")
    bloom_bitmap(minhash_bands(minhash_signature(corpus))).write.mode(
        "overwrite"
    ).parquet(f"{idx}/bitmap")
    stored = spark.read.parquet(f"{idx}/bitmap")
    delta = bloom_bitmap(minhash_bands(minhash_signature(batch)))
    return bloom_bitmap_union(stored, delta)


def _sql_simhash(bits: int = 16) -> str:
    return f"""
ws_t AS (
    SELECT doc_id, {_SQL_TOKENS} AS ws FROM documents
),
h_t AS (
    SELECT doc_id,
           list_transform(ws, w -> list_reduce(
               list_transform(string_split(w, ''), c -> CAST(ord(c) AS BIGINT)),
               (a, b) -> (a * 31 + b) % 1000000007)) AS hs
    FROM ws_t
),
sim_t AS (
    SELECT doc_id,
           CASE WHEN len(hs) = 0 THEN 0
                ELSE CAST(list_sum(list_transform(range(0, {bits}),
                    b -> CASE WHEN 2 * len(list_filter(hs, h -> (h >> b) & 1 = 1)) > len(hs)
                              THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) END AS simhash
    FROM h_t
)
"""


_SQL_SIMHASH = _sql_simhash(16)


@register(
    "dedup_simhash",
    "WITH " + _SQL_SIMHASH + "SELECT doc_id, simhash FROM sim_t",
)
def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import simhash

    return simhash(_docs(spark, sf_dir))


@register(
    "simhash_pairs",
    "WITH "
    + _SQL_SIMHASH
    + """
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sim_t a, sim_t b
WHERE a.doc_id < b.doc_id
  AND bit_count(xor(a.simhash, b.simhash)) <= 3
""",
)
def simhash_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import simhash_pairs

    return simhash_pairs(_docs(spark, sf_dir), max_hamming=3)


# Scale form: 28-bit sketch (2^7 buckets per pigeonhole segment) plus
# the bucket-size cap — the deployment defaults from dedup.py, both
# mirrored in the oracle (segment explode + QUALIFY bucket filter),
# so the bounded candidate generation is itself hash-verified.
_SIMHASH_WIDE_SEG_BITS = 7  # 28 bits / (max_hamming 3 + 1) segments


@register(
    "simhash_pairs_wide",
    "WITH "
    + _sql_simhash(28)
    + f""",
segs AS (
    SELECT doc_id, simhash, CAST(t.i AS INT) AS seg,
           CAST((simhash >> (t.i * {_SIMHASH_WIDE_SEG_BITS})) & {(1 << _SIMHASH_WIDE_SEG_BITS) - 1} AS INT) AS seg_val
    FROM sim_t, (SELECT unnest(range(0, 4)) AS i) t
),
segf AS (
    SELECT * FROM segs
    QUALIFY count(*) OVER (PARTITION BY seg, seg_val) <= {PROD_MAX_BUCKET_SIZE}
)
SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM segf a JOIN segf b ON a.seg = b.seg AND a.seg_val = b.seg_val
WHERE a.doc_id < b.doc_id
  AND bit_count(xor(a.simhash, b.simhash)) <= 3
""",
)
def simhash_pairs_wide_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import (
        PROD_MAX_BUCKET_SIZE,
        SIMHASH_BITS_SCALE,
        simhash_pairs,
    )

    return simhash_pairs(
        _docs(spark, sf_dir),
        max_hamming=3,
        bits=SIMHASH_BITS_SCALE,
        max_bucket_size=PROD_MAX_BUCKET_SIZE,
    )


# ---------------------------------------------------------------------------
# Similarity search extension (operators/similarity.py)
# ---------------------------------------------------------------------------

_SQL_EMB = "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"

_SQL_LSH_BUCKETS = (
    "buck AS (SELECT vec_id, CAST(list_sum(list_transform(range(0, 16), p -> "
    "CASE WHEN list_dot_product(v, list_transform(range(0, 64), j -> "
    "((j + p * 64) * 2654435761 % 1000003) / 1000003.0 - 0.5)) > 0 "
    "THEN (1::BIGINT << CAST(p AS INT)) ELSE 0::BIGINT END)) AS BIGINT) AS bucket FROM e)"
)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "embeddings")


@register(
    "sim_topk_bruteforce",
    f"""
WITH {_SQL_EMB},
scored AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM e a, e b
    WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
    FROM scored
) WHERE rank <= 5
""",
)
def sim_topk_bruteforce_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import topk_bruteforce

    emb = _emb(spark, sf_dir)
    return topk_bruteforce(emb, emb.where(F.col("vec_id") < 10), k=5)


@register(
    "sim_nearest_neighbor",
    f"""
WITH {_SQL_EMB},
scored AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM e a, e b WHERE a.vec_id <> b.vec_id
)
SELECT query_id, neighbor_id, cosine FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
    FROM scored
) WHERE rn = 1
""",
)
def sim_nearest_neighbor_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        nearest_neighbor_blocked,
    )

    return nearest_neighbor_blocked(_emb(spark, sf_dir))


@register(
    "dedup_embedding",
    f"""
WITH {_SQL_EMB}
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       round(list_cosine_similarity(a.v, b.v), 6) AS cosine
FROM e a, e b
WHERE a.vec_id < b.vec_id
  AND round(list_cosine_similarity(a.v, b.v), 6) >= 0.45
""",
)
def dedup_embedding_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        cosine_neardup_pairs,
    )

    return cosine_neardup_pairs(_emb(spark, sf_dir), threshold=0.45)


@register(
    "sim_lsh_buckets",
    f"WITH {_SQL_EMB},\n{_SQL_LSH_BUCKETS}\nSELECT vec_id, bucket FROM buck",
)
def sim_lsh_buckets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import lsh_buckets

    return lsh_buckets(_emb(spark, sf_dir))


@register(
    "sim_topk_lsh",
    f"""
WITH {_SQL_EMB},
{_SQL_LSH_BUCKETS},
scored AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM e a
    JOIN buck ba ON a.vec_id = ba.vec_id
    JOIN buck bb ON ba.bucket = bb.bucket
    JOIN e b ON b.vec_id = bb.vec_id
    WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
    FROM scored
) WHERE rank <= 5
""",
)
def sim_topk_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import topk_lsh

    emb = _emb(spark, sf_dir)
    return topk_lsh(emb, emb.where(F.col("vec_id") < 10), k=5)


# ---------------------------------------------------------------------------
# Streaming surface — batch-mode equivalents (streaming/windows.py)
# ---------------------------------------------------------------------------


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "events")


@register(
    "events_tumbling",
    """
SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n_events, round(sum(value), 6) AS total_value
FROM events GROUP BY 1, 2
""",
)
def events_tumbling_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.streaming.windows import tumbling_agg

    return tumbling_agg(_events(spark, sf_dir))


@register(
    "events_sliding",
    """
WITH x AS (
    SELECT ts, value,
           time_bucket(INTERVAL '5 minutes', ts) - to_minutes(CAST(k * 5 AS INT)) AS ws
    FROM events, (SELECT unnest(range(0, 2)) AS k) ks
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       count(*) AS n_events, round(sum(value), 6) AS total_value
FROM x GROUP BY 1
""",
)
def events_sliding_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.streaming.windows import sliding_agg

    return sliding_agg(_events(spark, sf_dir))


_SQL_SESSIONS = """
WITH x AS (
    SELECT user_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), y AS (
    SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
    FROM x
)
SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       user_id, count(*) AS n_events, round(sum(value), 6) AS total_value
FROM y GROUP BY user_id, sid
"""


@register("events_session", _SQL_SESSIONS)
def events_session_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.streaming.windows import session_agg

    return session_agg(_events(spark, sf_dir))


@register("events_sessionize_lag", _SQL_SESSIONS)
def events_sessionize_lag_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.streaming.windows import sessionize_lag

    return sessionize_lag(_events(spark, sf_dir))


@register(
    "events_json",
    "SELECT event_id, CAST(props->>'k' AS INT) AS k_value FROM events",
)
def events_json_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.streaming.windows import json_props

    return json_props(_events(spark, sf_dir))


@register(
    "events_topk_per_user",
    """
SELECT user_id, event_id, value_r, rank FROM (
    SELECT user_id, event_id, round(value, 6) AS value_r,
           CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY round(value, 6) DESC, event_id) AS INT) AS rank
    FROM events
) WHERE rank <= 3
""",
)
def events_topk_per_user_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.streaming.windows import topk_per_key

    return topk_per_key(_events(spark, sf_dir), k=3)


@register(
    "events_lag_delta",
    """
SELECT event_id, user_id,
       round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 6)
           AS value_delta
FROM events
""",
)
def events_lag_delta_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.streaming.windows import lag_delta

    return lag_delta(_events(spark, sf_dir))


@register(
    "events_asof_join",
    """
SELECT e.event_id, e.user_id, round(p.value, 6) AS last_purchase_value
FROM events e
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts >= p.ts
""",
)
def events_asof_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.relational import asof_join_events

    return asof_join_events(_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# Relational analytics (operators/relational.py) over the TPC-H-ish schema
# ---------------------------------------------------------------------------


@register(
    "tpch_q1",
    """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(28,8)) * (CAST(1 AS DECIMAL(18,4)) + CAST(l_tax AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.relational import pricing_summary

    return pricing_summary(read_table(spark, sf_dir, "lineitem"))


@register(
    "tpch_q3",
    """
SELECT o_orderkey, orderdate, o_orderpriority, revenue FROM (
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
) ORDER BY revenue DESC, o_orderkey LIMIT 10
""",
)
def tpch_q3_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.relational import shipping_priority

    return shipping_priority(
        read_table(spark, sf_dir, "customer"),
        read_table(spark, sf_dir, "orders"),
        read_table(spark, sf_dir, "lineitem"),
    )


@register(
    "tpch_q5",
    """
SELECT n_name, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""",
)
def tpch_q5_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.relational import (
        local_supplier_volume,
    )

    return local_supplier_volume(
        read_table(spark, sf_dir, "region"),
        read_table(spark, sf_dir, "nation"),
        read_table(spark, sf_dir, "customer"),
        read_table(spark, sf_dir, "supplier"),
        read_table(spark, sf_dir, "orders"),
        read_table(spark, sf_dir, "lineitem"),
    )


@register(
    "anti_join_customers",
    """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""",
)
def anti_join_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.relational import (
        customers_without_orders,
    )

    return customers_without_orders(
        read_table(spark, sf_dir, "customer"), read_table(spark, sf_dir, "orders")
    )


@register(
    "semi_join_customers",
    """
SELECT count(*) AS n_customers FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
""",
)
def semi_join_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.relational import (
        customers_with_orders_count,
    )

    return customers_with_orders_count(
        read_table(spark, sf_dir, "customer"), read_table(spark, sf_dir, "orders")
    )


@register(
    "nation_set_ops",
    """
WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
SELECT nationkey, 'both' AS set_op
FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
UNION ALL
SELECT nationkey, 'customers_only' AS set_op
FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
""",
)
def nation_set_ops_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.relational import nation_set_ops

    return nation_set_ops(
        read_table(spark, sf_dir, "customer"), read_table(spark, sf_dir, "supplier")
    )


@register(
    "doc_cube",
    """
SELECT COALESCE(lang, 'ALL') AS lang_g, COALESCE(source, 'ALL') AS source_g,
       count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents GROUP BY CUBE(lang, source)
""",
)
def doc_cube_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.relational import doc_cube

    return doc_cube(_docs(spark, sf_dir))


_LANGS = ["de", "en", "es", "fr", "zh"]


@register(
    "lang_pivot",
    "SELECT source, "
    + ", ".join(
        f"CAST(count(*) FILTER (lang = '{lg}') AS BIGINT) AS n_{lg}" for lg in _LANGS
    )
    + " FROM documents GROUP BY source",
)
def lang_pivot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.relational import lang_pivot

    return lang_pivot(_docs(spark, sf_dir), _LANGS)


# ---------------------------------------------------------------------------
# Multimodal columns (operators/multimodal.py) — binary payload plumbing
# with a deterministic fake decoder (no media libs in this container),
# so the mapInPandas output is oracle-checkable arithmetic.
# ---------------------------------------------------------------------------


@register(
    "multimodal_image_meta",
    """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
       CAST((octet_length(encode(text)) * 31) % 480 + 1 AS INT) AS height,
       CAST(octet_length(encode(text)) % 3 + 1 AS INT) AS channels,
       'fake' AS format
FROM documents
""",
)
def multimodal_image_meta_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.multimodal import (
        decode_image_meta,
        text_as_binary,
    )

    return decode_image_meta(text_as_binary(_docs(spark, sf_dir)))


@register(
    "multimodal_frames",
    """
SELECT doc_id,
       CAST(unnest(range(0, octet_length(encode(text)) // 64 + 1)) AS INT) AS frame_index,
       CAST(unnest(range(0, octet_length(encode(text)) // 64 + 1)) * 64 AS BIGINT) AS frame_offset
FROM documents
""",
)
def multimodal_frames_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.multimodal import (
        sample_frames,
        text_as_binary,
    )

    return sample_frames(text_as_binary(_docs(spark, sf_dir)))


# ---------------------------------------------------------------------------
# IVF ANN (operators/similarity.py): k-means centroids, assignment,
# cell search. The oracle unrolls the same Lloyd rounds as the Spark
# implementation (similarity.ivf_centroids): init = k smallest-id
# vectors, per-round rounded-cosine argmax assignment (ties -> smallest
# cell) and per-dimension avg rounded to 6 decimals.
# ---------------------------------------------------------------------------


def _sql_kmeans_chain(k: int = 8, iters: int = 3, src: str = "e", tag: str = "") -> str:
    """Unrolled Lloyd chain over ``src``; ``tag`` namespaces the CTEs
    (cent{tag}{i} / assign{tag}{i}) so two trainings — e.g. the
    base-corpus store and a fresh full-corpus retrain in
    ivf_staleness — can coexist in one oracle."""
    parts = [
        f"cent{tag}0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, v AS cv"
        f" FROM (SELECT vec_id, v FROM {src} ORDER BY vec_id LIMIT {k}))"
    ]
    for i in range(1, iters + 1):
        prev = f"cent{tag}{i - 1}"
        parts.append(
            f"""assign{tag}{i} AS (
    SELECT vec_id, cell FROM (
        SELECT a.vec_id, c.cell,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, c.cv), 6) DESC, c.cell) AS rn
        FROM {src} a, {prev} c
    ) WHERE rn = 1
)"""
        )
        parts.append(
            f"""cent{tag}{i} AS (
    SELECT cell, list(cx ORDER BY pos) AS cv FROM (
        SELECT s.cell, t.pos AS pos, round(avg(a.v[t.pos]), 6) AS cx
        FROM {src} a JOIN assign{tag}{i} s ON a.vec_id = s.vec_id,
             (SELECT unnest(range(1, 65)) AS pos) t
        GROUP BY s.cell, t.pos
    ) GROUP BY cell
)"""
        )
    return ",\n".join(parts)


_SQL_IVF = f"""
{_SQL_EMB},
{_sql_kmeans_chain()},
cent AS (SELECT cell, cv FROM cent3),
assign AS (
    SELECT vec_id, cell, cell_cosine FROM (
        SELECT a.vec_id, c.cell,
               round(list_cosine_similarity(a.v, c.cv), 6) AS cell_cosine,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, c.cv), 6) DESC, c.cell) AS rn
        FROM e a, cent c
    ) WHERE rn = 1
)
"""


@register(
    "sim_ivf_centroids",
    f"""
WITH {_SQL_IVF}
SELECT CAST(cell AS INT) AS cell,
       CAST(to_json(list_transform(cv, x -> CAST(round(x * 1000000.0) AS BIGINT))) AS VARCHAR)
           AS centroid_r
FROM cent
""",
)
def sim_ivf_centroids_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid vectors are fixed-point-scaled to int64 and JSON-
    serialized on both sides (the embedding_quantize pattern) so the
    driver's pandas canonicalization sees a scalar string, not an
    unhashable list, and the value compare is exact."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import ivf_centroids

    return ivf_centroids(_emb(spark, sf_dir)).select(
        F.col("cell").cast("int").alias("cell"),
        F.to_json(
            F.transform("centroid", lambda x: F.round(x * F.lit(1000000.0)).cast("long"))
        ).alias("centroid_r"),
    )


@register(
    "sim_ivf_assign",
    f"""
WITH {_SQL_IVF}
SELECT vec_id, CAST(cell AS INT) AS cell, cell_cosine FROM assign
""",
)
def sim_ivf_assign_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import ivf_assign

    return ivf_assign(_emb(spark, sf_dir)).select(
        "vec_id", F.col("cell").cast("int").alias("cell"), "cell_cosine"
    )


@register(
    "sim_topk_ivf",
    f"""
WITH {_SQL_IVF},
scored AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM e a
    JOIN assign sa ON a.vec_id = sa.vec_id
    JOIN assign sb ON sa.cell = sb.cell
    JOIN e b ON b.vec_id = sb.vec_id
    WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
    FROM scored
) WHERE rank <= 5
""",
)
def sim_topk_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import topk_ivf

    emb = _emb(spark, sf_dir)
    return topk_ivf(emb, emb.where(F.col("vec_id") < 10), k=5)


@register(
    "sim_topk_ivf_stored",
    f"""
WITH {_SQL_IVF},
scored AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM e a
    JOIN assign sa ON a.vec_id = sa.vec_id
    JOIN assign sb ON sa.cell = sb.cell
    JOIN e b ON b.vec_id = sb.vec_id
    WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
    FROM scored
) WHERE rank <= 5
""",
)
def sim_topk_ivf_stored_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The parquet-backed index path: train the IVF quantizer ONCE,
    persist (centroids, assignment) as parquet — the stored index a
    100-TB deployment builds offline — then answer the query from the
    STORE alone, so search pays no training lineage at all (the
    incremental-dedup contract, applied to ANN). The oracle is
    sim_topk_ivf's verbatim: the round-trip must be exact, because
    cells are ints and centroid/assignment doubles are 6-decimal-
    rounded values that parquet stores losslessly. What this query
    guards is the serialization seam itself — schema drift, rounding
    drift, or a lossy write in the index tables would hash-mismatch."""
    import tempfile

    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
        topk_ivf,
    )

    emb = _emb(spark, sf_dir)
    idx = tempfile.mkdtemp(prefix="ivf_index_")
    ivf_centroids(emb).write.mode("overwrite").parquet(f"{idx}/centroids")
    ivf_assign(emb).write.mode("overwrite").parquet(f"{idx}/assign")
    return topk_ivf(
        emb,
        emb.where(F.col("vec_id") < 10),
        k=5,
        assign=spark.read.parquet(f"{idx}/assign"),
        centroids=spark.read.parquet(f"{idx}/centroids"),
    )


# ---------------------------------------------------------------------------
# Round 8: incremental maintenance of the stored ANN index (VERDICT
# r07 items 3-4). sim_ivf_append is the write half of the stored path:
# the store is trained on the BASE corpus (vec_id % 10 != 0), a new
# ingest batch (vec_id % 10 == 0) is assigned against the FROZEN
# stored centroids — no retrain — and appended to the stored
# assignment table. The oracle trains its unrolled chain on the base
# subset only and assigns ALL vectors, so the hash pins the
# equivalence store+batch == assignment-from-stored-centroids (valid
# because per-vector assignment depends only on the frozen centroids).
# ivf_staleness is the paired QA row: the number that says when the
# frozen quantizer has drifted far enough from the appended data to
# warrant a rebuild.
# ---------------------------------------------------------------------------

_SQL_IVF_BASE_STORE = f"""
{_SQL_EMB},
eb AS (SELECT * FROM e WHERE vec_id % 10 <> 0),
{_sql_kmeans_chain(src="eb", tag="b")},
centb AS (SELECT cell, cv FROM centb3),
assignb AS (
    SELECT vec_id, cell, cell_cosine FROM (
        SELECT a.vec_id, c.cell,
               round(list_cosine_similarity(a.v, c.cv), 6) AS cell_cosine,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, c.cv), 6) DESC, c.cell) AS rn
        FROM e a, centb c
    ) WHERE rn = 1
)
"""


@register(
    "sim_ivf_append",
    f"""
WITH {_SQL_IVF_BASE_STORE}
SELECT vec_id, CAST(cell AS INT) AS cell, cell_cosine FROM assignb
""",
)
def sim_ivf_append_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest maintenance of the stored IVF index
    (similarity.ivf_append_assign): centroids train ONCE on the base
    corpus and persist; the new batch is assigned against the frozen
    store and appended to the stored assignment table, at batch-sized
    (never corpus-sized) cost. Result = the appended assignment table
    read back from parquet, so the hash also guards the append seam
    (schema drift or a lossy append would mismatch)."""
    import tempfile

    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        ivf_append_assign,
        ivf_centroids,
    )

    emb = _emb(spark, sf_dir)
    base = emb.where(F.col("vec_id") % 10 != 0)
    batch = emb.where(F.col("vec_id") % 10 == 0)
    idx = tempfile.mkdtemp(prefix="ivf_append_")
    ivf_centroids(base).write.mode("overwrite").parquet(f"{idx}/centroids")
    cents = spark.read.parquet(f"{idx}/centroids")
    ivf_append_assign(base, cents).write.mode("overwrite").parquet(f"{idx}/assign")
    ivf_append_assign(batch, cents).write.mode("append").parquet(f"{idx}/assign")
    return spark.read.parquet(f"{idx}/assign").select(
        "vec_id", F.col("cell").cast("int").alias("cell"), "cell_cosine"
    )


@register(
    "knn_graph_append",
    f"""
WITH {_SQL_IVF_BASE_STORE},
gb AS (
    SELECT vec_id, cell FROM (
        SELECT a.vec_id, c.cell,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, c.cv), 6) DESC, c.cell) AS rn
        FROM e a, centb c WHERE a.vec_id % 10 = 0
    ) WHERE rn <= 2
),
scored AS (
    SELECT gb.vec_id AS query_id, sb.vec_id AS neighbor_id,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM gb JOIN assignb sb ON gb.cell = sb.cell
    JOIN e a ON a.vec_id = gb.vec_id JOIN e b ON b.vec_id = sb.vec_id
    WHERE sb.vec_id % 10 <> 0
)
SELECT query_id, neighbor_id, cosine, rank FROM (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
    FROM scored
) WHERE rank <= 8
""",
)
def knn_graph_append_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental GRAPH maintenance — the graph family joins the
    store-append symmetry (IVF: sim_ivf_append, PQ codes:
    dedup_semantic_append, postings: bm25_search_stored, bitmap,
    clusters): a daily vector batch gets its edge lists by probing
    its top-2 cells against the FROZEN stored centroids and taking
    the exact top-8 among the STORED corpus members of those cells
    (knn_graph_ivf's candidates= hook) — batch-sized cost, never a
    graph rebuild. Append-only graph maintenance is deliberately
    one-directional (old nodes' edge lists are not revisited; that
    drift is what ivf_staleness-style QA catches at maintenance
    cadence), and this row pins exactly the one-directional
    semantics: new-node edges == exact in-probe-cell top-8 against
    the base, through both parquet store seams (centroids +
    assignment)."""
    import tempfile

    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        ivf_append_assign,
        ivf_centroids,
        knn_graph_ivf,
    )

    emb = _emb(spark, sf_dir)
    base = emb.where(F.col("vec_id") % 10 != 0)
    batch = emb.where(F.col("vec_id") % 10 == 0)
    store = tempfile.mkdtemp(prefix="graph_append_")
    ivf_centroids(base).write.mode("overwrite").parquet(f"{store}/cents")
    cents = spark.read.parquet(f"{store}/cents")
    ivf_append_assign(base, cents).write.mode("overwrite").parquet(f"{store}/assign")
    return knn_graph_ivf(
        batch,
        assign=spark.read.parquet(f"{store}/assign"),
        centroids=cents,
        candidates=base,
    )


@register(
    "ivf_staleness",
    f"""
WITH {_SQL_IVF_BASE_STORE},
{_sql_kmeans_chain()},
centf AS (SELECT cell, cv FROM cent3),
assignf AS (
    SELECT vec_id, cell, cell_cosine FROM (
        SELECT a.vec_id, c.cell,
               round(list_cosine_similarity(a.v, c.cv), 6) AS cell_cosine,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, c.cv), 6) DESC, c.cell) AS rn
        FROM e a, centf c
    ) WHERE rn = 1
),
ss AS (SELECT CAST(count(*) AS BIGINT) AS n_vectors,
              round(avg(cell_cosine), 6) AS mean_cc_stored FROM assignb),
sbal AS (SELECT round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS max_share_stored
         FROM (SELECT count(*) AS c FROM assignb GROUP BY cell)),
fs AS (SELECT round(avg(cell_cosine), 6) AS mean_cc_fresh FROM assignf),
fbal AS (SELECT round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS max_share_fresh
         FROM (SELECT count(*) AS c FROM assignf GROUP BY cell))
SELECT n_vectors, mean_cc_stored, mean_cc_fresh,
       round(mean_cc_fresh - mean_cc_stored, 6) AS cc_drift,
       max_share_stored, max_share_fresh
FROM ss, fs, sbal, fbal
""",
)
def ivf_staleness_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-staleness QA for the appended store
    (similarity.ivf_staleness): after sim_ivf_append has grown the
    corpus past the store's training set, recall decays silently —
    this row quantifies the decay as quantization-quality drift
    (mean nearest-centroid cosine, stored vs fresh retrain) plus list
    balance (largest cell share, the probe-1 degeneracy signal).
    Pinned property: zero appends => cc_drift == 0 exactly
    (tests/test_similarity.py)."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        ivf_centroids,
        ivf_staleness,
    )

    emb = _emb(spark, sf_dir)
    stored = ivf_centroids(emb.where(F.col("vec_id") % 10 != 0))
    return ivf_staleness(emb, stored)


# ---------------------------------------------------------------------------
# Product quantization (operators/similarity.py pq_*): per-subspace
# k-means codebooks, the compressed code table, and ADC top-k. The
# oracle unrolls the identical Lloyd rounds per subspace: init =
# subvectors of the k smallest-id vectors; assignment by squared-L2
# rounded to 6 decimals BEFORE argmin (ties -> smallest code);
# per-dimension means rounded to 6 decimals each round. The `lut`
# CTE bakes in the query set (vec_id < 10) used by both topk queries.
# ---------------------------------------------------------------------------


def _sql_pq_chain(
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    train_filter: str | None = None,
) -> str:
    d = dim // m

    def sq(a: str, b: str) -> str:
        return (
            f"round(list_sum(list_transform(range(1, {d + 1}), "
            f"j -> ({a}[j] - {b}[j]) * ({a}[j] - {b}[j]))), 6)"
        )

    # train_filter restricts the TRAINING side (seed rows, Lloyd
    # assignments and centroid updates) to a subset of e while the
    # final `codes` assignment still covers every vector — the SQL
    # mirror of pq_encode's train_df / stored-codebook path. None
    # keeps the original full-corpus chain byte-for-byte.
    tsrc = "tsv" if train_filter else "sv"
    parts = [
        f"""sv AS (
    SELECT vec_id, CAST(t.s AS INT) AS sub,
           list_slice(v, t.s * {d} + 1, t.s * {d} + {d}) AS sv
    FROM e, (SELECT unnest(range(0, {m})) AS s) t
)""",
    ]
    if train_filter:
        parts.append(f"tsv AS (SELECT * FROM sv WHERE {train_filter})")
    first_src = (
        f"(SELECT vec_id FROM e WHERE {train_filter} ORDER BY vec_id LIMIT {k})"
        if train_filter
        else f"(SELECT vec_id FROM e ORDER BY vec_id LIMIT {k})"
    )
    parts += [
        f"""firstk AS (
    SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code
    FROM {first_src}
)""",
        f"cb0 AS (SELECT s.sub, f.code, s.sv AS cv FROM {tsrc} s JOIN firstk f USING (vec_id))",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""asg{i} AS (
    SELECT vec_id, sub, code FROM (
        SELECT s.vec_id, s.sub, c.code,
               row_number() OVER (PARTITION BY s.vec_id, s.sub
                   ORDER BY {sq("s.sv", "c.cv")}, c.code) AS rn
        FROM {tsrc} s JOIN cb{i - 1} c ON s.sub = c.sub
    ) WHERE rn = 1
)"""
        )
        parts.append(
            f"""cb{i} AS (
    SELECT sub, code, list(cx ORDER BY pos) AS cv FROM (
        SELECT a.sub, a.code, t.pos AS pos, round(avg(s.sv[t.pos]), 6) AS cx
        FROM {tsrc} s JOIN asg{i} a ON s.vec_id = a.vec_id AND s.sub = a.sub,
             (SELECT unnest(range(1, {d + 1})) AS pos) t
        GROUP BY a.sub, a.code, t.pos
    ) GROUP BY sub, code
)"""
        )
    parts.append(
        f"""codes AS (
    SELECT vec_id, sub, code FROM (
        SELECT s.vec_id, s.sub, c.code,
               row_number() OVER (PARTITION BY s.vec_id, s.sub
                   ORDER BY {sq("s.sv", "c.cv")}, c.code) AS rn
        FROM sv s JOIN cb{iters} c ON s.sub = c.sub
    ) WHERE rn = 1
)"""
    )
    parts.append(
        f"""lut AS (
    SELECT s.vec_id AS query_id, c.sub, c.code, {sq("s.sv", "c.cv")} AS d2
    FROM sv s JOIN cb{iters} c ON s.sub = c.sub
    WHERE s.vec_id < 10
)"""
    )
    return ",\n".join(parts)


@register(
    "pq_codebooks",
    f"""
WITH {_SQL_EMB},
{_sql_pq_chain()}
SELECT CAST(sub AS INT) AS sub, CAST(code AS INT) AS code,
       CAST(to_json(list_transform(cv, x -> CAST(round(x * 1000000.0) AS BIGINT))) AS VARCHAR)
           AS codeword_r
FROM cb2
""",
)
def pq_codebooks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained per-subspace codebooks themselves (the IVF trio has
    sim_ivf_centroids; this is PQ's counterpart). Codeword vectors are
    fixed-point-scaled and JSON-serialized on both sides so the driver
    compares scalar strings."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import pq_codebooks

    return pq_codebooks(_emb(spark, sf_dir)).select(
        F.col("sub").cast("int").alias("sub"),
        F.col("code").cast("int").alias("code"),
        F.to_json(
            F.transform("cv", lambda x: F.round(x * F.lit(1000000.0)).cast("long"))
        ).alias("codeword_r"),
    )


@register(
    "pq_codes",
    f"""
WITH {_SQL_EMB},
{_sql_pq_chain()}
SELECT vec_id, CAST(to_json(list(code ORDER BY sub)) AS VARCHAR) AS codes
FROM codes GROUP BY vec_id
""",
)
def pq_codes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each vector as its m one-byte codes — the 16x-compressed corpus
    representation. Codes JSON-serialize on both sides (the
    sim_ivf_centroids pattern) so the driver compares scalar strings."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import pq_encode

    return pq_encode(_emb(spark, sf_dir)).select(
        "vec_id", F.to_json("codes").alias("codes")
    )


@register(
    "pq_topk",
    f"""
WITH {_SQL_EMB},
{_sql_pq_chain()},
adc AS (
    SELECT l.query_id, co.vec_id AS neighbor_id, round(SUM(l.d2), 6) AS adist
    FROM codes co JOIN lut l ON co.sub = l.sub AND co.code = l.code
    WHERE co.vec_id <> l.query_id
    GROUP BY l.query_id, co.vec_id
)
SELECT query_id, neighbor_id, adist, rank FROM (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY adist, neighbor_id) AS INT) AS rank
    FROM adc
) WHERE rank <= 5
""",
)
def pq_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import pq_topk

    emb = _emb(spark, sf_dir)
    return pq_topk(emb, emb.where(F.col("vec_id") < 10), topk=5)


@register(
    "dedup_semantic_pq",
    f"""
WITH {_SQL_EMB},
{_sql_pq_chain()},
codes_per AS (
    SELECT vec_id, CAST(to_json(list(code ORDER BY sub)) AS VARCHAR) AS codes
    FROM codes GROUP BY vec_id
)
SELECT codes, CAST(min(vec_id) AS BIGINT) AS keeper_id, count(*) AS dup_count
FROM codes_per GROUP BY codes HAVING count(*) > 1
""",
)
def dedup_semantic_pq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarse semantic dedup by full PQ-code agreement (SemDeDup-style
    bucketing): linear encode + one hash-agg, no pairwise stage."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        semantic_dedup_pq,
    )

    return semantic_dedup_pq(_emb(spark, sf_dir)).select(
        F.to_json("codes").alias("codes"), "keeper_id", "dup_count"
    )


@register(
    "sim_topk_ivfpq",
    f"""
WITH {_SQL_IVF},
{_sql_pq_chain()},
adc AS (
    SELECT l.query_id, co.vec_id AS neighbor_id, round(SUM(l.d2), 6) AS adist
    FROM codes co
    JOIN assign ca ON co.vec_id = ca.vec_id
    JOIN lut l ON co.sub = l.sub AND co.code = l.code
    JOIN assign qa ON l.query_id = qa.vec_id AND ca.cell = qa.cell
    WHERE co.vec_id <> l.query_id
    GROUP BY l.query_id, co.vec_id
)
SELECT query_id, neighbor_id, adist, rank FROM (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY adist, neighbor_id) AS INT) AS rank
    FROM adc
) WHERE rank <= 5
""",
)
def sim_topk_ivfpq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell pruning composed with PQ ADC scoring — the canonical
    billion-scale layout (coarse quantizer prunes, codes score)."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import topk_ivfpq

    emb = _emb(spark, sf_dir)
    return topk_ivfpq(emb, emb.where(F.col("vec_id") < 10), topk=5)


@register(
    "sim_topk_ivfpq_probe2",
    f"""
WITH {_SQL_IVF},
{_sql_pq_chain()},
qassign AS (
    SELECT vec_id, cell FROM (
        SELECT a.vec_id, c.cell,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, c.cv), 6) DESC, c.cell) AS rn
        FROM e a, cent c
        WHERE a.vec_id < 10
    ) WHERE rn <= 2
),
adc AS (
    SELECT l.query_id, co.vec_id AS neighbor_id, round(SUM(l.d2), 6) AS adist
    FROM codes co
    JOIN assign ca ON co.vec_id = ca.vec_id
    JOIN qassign qa ON ca.cell = qa.cell
    JOIN lut l ON co.sub = l.sub AND co.code = l.code AND l.query_id = qa.vec_id
    WHERE co.vec_id <> l.query_id
    GROUP BY l.query_id, co.vec_id
)
SELECT query_id, neighbor_id, adist, rank FROM (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY adist, neighbor_id) AS INT) AS rank
    FROM adc
) WHERE rank <= 5
""",
)
def sim_topk_ivfpq_probe2_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF×PQ: the query searches its top-2 cells — 2x the
    scanned codes, materially better recall near cell boundaries (the
    sim_topk_lsh_multiprobe pattern applied to the IVF coarse
    quantizer)."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import topk_ivfpq

    emb = _emb(spark, sf_dir)
    return topk_ivfpq(emb, emb.where(F.col("vec_id") < 10), topk=5, probes=2)


@register(
    "sim_topk_binary",
    f"""
WITH {_SQL_EMB},
sk AS (
    SELECT vec_id,
           CAST(list_sum(list_transform(range(0, 32),
               j -> CASE WHEN v[CAST(j AS INT) + 1] > 0
                         THEN (1::BIGINT << CAST(j AS INT)) ELSE 0::BIGINT END)) AS BIGINT)
               AS sk_lo,
           CAST(list_sum(list_transform(range(32, 64),
               j -> CASE WHEN v[CAST(j AS INT) + 1] > 0
                         THEN (1::BIGINT << CAST(j - 32 AS INT)) ELSE 0::BIGINT END)) AS BIGINT)
               AS sk_hi
    FROM e
),
cand AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           CAST(bit_count(xor(q.sk_lo, c.sk_lo)) + bit_count(xor(q.sk_hi, c.sk_hi)) AS INT) AS ham
    FROM sk q JOIN sk c ON q.vec_id <> c.vec_id
    WHERE q.vec_id < 10
),
top AS (
    SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY ham, neighbor_id) AS rn
        FROM cand
    ) WHERE rn <= 20
)
SELECT query_id, neighbor_id, cosine, rank FROM (
    SELECT t.query_id, t.neighbor_id,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine,
           CAST(row_number() OVER (PARTITION BY t.query_id
               ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC, t.neighbor_id)
               AS INT) AS rank
    FROM top t
    JOIN e a ON a.vec_id = t.query_id
    JOIN e b ON b.vec_id = t.neighbor_id
) WHERE rank <= 5
""",
)
def sim_topk_binary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized compressed scan (1 bit/dim, 64x smaller) with
    exact-cosine rerank of the top 4k Hamming candidates."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import topk_binary

    emb = _emb(spark, sf_dir)
    return topk_binary(emb, emb.where(F.col("vec_id") < 10), k=5, rerank=4)


# ---------------------------------------------------------------------------
# ANN recall@k: each approximate tier measured against the exact
# brute-force top-k (VERDICT r05 "What's missing" #1). The recall value
# is what picks probe counts / rerank multipliers at 100 TB; both sides
# rank deterministically (id tie-breaks) so recall itself hash-verifies.
# ---------------------------------------------------------------------------

_RECALL_K = 10

# Exact top-k CTE + the recall aggregate; `approx` must be a prior CTE
# with (query_id, neighbor_id).
_SQL_RECALL_TAIL = f"""
exact AS (
    SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC, b.vec_id)
                   AS rank
        FROM e a, e b WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
    ) WHERE rank <= {_RECALL_K}
)
SELECT CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(ap.neighbor_id) AS BIGINT) AS n_hits,
       round(count(ap.neighbor_id) / CAST(count(*) AS DOUBLE), 6) AS recall
FROM exact ex
LEFT JOIN approx ap
  ON ex.query_id = ap.query_id AND ex.neighbor_id = ap.neighbor_id
"""

_SQL_PQ_ADC = """
adc AS (
    SELECT l.query_id, co.vec_id AS neighbor_id, round(SUM(l.d2), 6) AS adist
    FROM codes co JOIN lut l ON co.sub = l.sub AND co.code = l.code
    WHERE co.vec_id <> l.query_id
    GROUP BY l.query_id, co.vec_id
)"""

_SQL_IVFPQ_ADC = """
adc AS (
    SELECT l.query_id, co.vec_id AS neighbor_id, round(SUM(l.d2), 6) AS adist
    FROM codes co
    JOIN assign ca ON co.vec_id = ca.vec_id
    JOIN lut l ON co.sub = l.sub AND co.code = l.code
    JOIN assign qa ON l.query_id = qa.vec_id AND ca.cell = qa.cell
    WHERE co.vec_id <> l.query_id
    GROUP BY l.query_id, co.vec_id
)"""

_SQL_ADC_TOPK = f"""
approx AS (
    SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
        FROM adc
    ) WHERE rank <= {_RECALL_K}
)"""


def _recall_queries(spark: SparkSession, sf_dir: str):
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import topk_bruteforce

    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 10)
    return emb, q, topk_bruteforce(emb, q, k=_RECALL_K)


@register(
    "pq_recall_at_10",
    f"""
WITH {_SQL_EMB},
{_sql_pq_chain()},
{_SQL_PQ_ADC},
{_SQL_ADC_TOPK},
{_SQL_RECALL_TAIL}
""",
)
def pq_recall_at_10_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the full-corpus PQ-ADC scan vs exact cosine."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        pq_topk,
        recall_vs_exact,
    )

    emb, q, exact = _recall_queries(spark, sf_dir)
    return recall_vs_exact(exact, pq_topk(emb, q, topk=_RECALL_K))


@register(
    "ivfpq_recall_at_10",
    f"""
WITH {_SQL_IVF},
{_sql_pq_chain()},
{_SQL_IVFPQ_ADC},
{_SQL_ADC_TOPK},
{_SQL_RECALL_TAIL}
""",
)
def ivfpq_recall_at_10_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of single-probe IVF×PQ — what one probed cell costs in
    accuracy relative to PQ's full-corpus scan."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        recall_vs_exact,
        topk_ivfpq,
    )

    emb, q, exact = _recall_queries(spark, sf_dir)
    return recall_vs_exact(exact, topk_ivfpq(emb, q, topk=_RECALL_K))


@register(
    "ivfpq_probe2_recall_at_10",
    f"""
WITH {_SQL_IVF},
{_sql_pq_chain()},
qassign AS (
    SELECT vec_id, cell FROM (
        SELECT a.vec_id, c.cell,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, c.cv), 6) DESC, c.cell) AS rn
        FROM e a, cent c
        WHERE a.vec_id < 10
    ) WHERE rn <= 2
),
adc AS (
    SELECT l.query_id, co.vec_id AS neighbor_id, round(SUM(l.d2), 6) AS adist
    FROM codes co
    JOIN assign ca ON co.vec_id = ca.vec_id
    JOIN qassign qa ON ca.cell = qa.cell
    JOIN lut l ON co.sub = l.sub AND co.code = l.code AND l.query_id = qa.vec_id
    WHERE co.vec_id <> l.query_id
    GROUP BY l.query_id, co.vec_id
),
{_SQL_ADC_TOPK},
{_SQL_RECALL_TAIL}
""",
)
def ivfpq_probe2_recall_at_10_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of 2-probe IVF×PQ — the measured payoff of doubling the
    probed cells (must sit at or above the single-probe number)."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        recall_vs_exact,
        topk_ivfpq,
    )

    emb, q, exact = _recall_queries(spark, sf_dir)
    return recall_vs_exact(exact, topk_ivfpq(emb, q, topk=_RECALL_K, probes=2))


@register(
    "binary_recall_at_10",
    f"""
WITH {_SQL_EMB},
sk AS (
    SELECT vec_id,
           CAST(list_sum(list_transform(range(0, 32),
               j -> CASE WHEN v[CAST(j AS INT) + 1] > 0
                         THEN (1::BIGINT << CAST(j AS INT)) ELSE 0::BIGINT END)) AS BIGINT)
               AS sk_lo,
           CAST(list_sum(list_transform(range(32, 64),
               j -> CASE WHEN v[CAST(j AS INT) + 1] > 0
                         THEN (1::BIGINT << CAST(j - 32 AS INT)) ELSE 0::BIGINT END)) AS BIGINT)
               AS sk_hi
    FROM e
),
cand AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           CAST(bit_count(xor(q.sk_lo, c.sk_lo)) + bit_count(xor(q.sk_hi, c.sk_hi)) AS INT) AS ham
    FROM sk q JOIN sk c ON q.vec_id <> c.vec_id
    WHERE q.vec_id < 10
),
top AS (
    SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY ham, neighbor_id) AS rn
        FROM cand
    ) WHERE rn <= {4 * _RECALL_K}
),
approx AS (
    SELECT query_id, neighbor_id FROM (
        SELECT t.query_id, t.neighbor_id,
               CAST(row_number() OVER (PARTITION BY t.query_id
                   ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC, t.neighbor_id)
                   AS INT) AS rank
        FROM top t
        JOIN e a ON a.vec_id = t.query_id
        JOIN e b ON b.vec_id = t.neighbor_id
    ) WHERE rank <= {_RECALL_K}
),
{_SQL_RECALL_TAIL}
""",
)
def binary_recall_at_10_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the sign-bit Hamming scan + exact rerank (rerank=4,
    i.e. 40 candidates per query) vs exact cosine."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        recall_vs_exact,
        topk_binary,
    )

    emb, q, exact = _recall_queries(spark, sf_dir)
    return recall_vs_exact(exact, topk_binary(emb, q, k=_RECALL_K, rerank=4))


@register(
    "lsh_recall_at_10",
    f"""
WITH {_SQL_EMB},
{_SQL_LSH_BUCKETS},
approx AS (
    SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC, b.vec_id)
                   AS rank
        FROM e a
        JOIN buck ba ON a.vec_id = ba.vec_id
        JOIN buck bb ON ba.bucket = bb.bucket
        JOIN e b ON b.vec_id = bb.vec_id
        WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
    ) WHERE rank <= {_RECALL_K}
),
{_SQL_RECALL_TAIL}
""",
)
def lsh_recall_at_10_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of single-bucket LSH (candidate-pruned exact cosine):
    measures bucket coverage, the number a user tunes n_planes by."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        recall_vs_exact,
        topk_lsh,
    )

    emb, q, exact = _recall_queries(spark, sf_dir)
    return recall_vs_exact(exact, topk_lsh(emb, q, k=_RECALL_K))


@register(
    "lsh_multiprobe_recall_at_10",
    f"""
WITH {_SQL_EMB},
{_SQL_LSH_BUCKETS},
approx AS (
    SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC, b.vec_id)
                   AS rank
        FROM e a
        JOIN buck ba ON a.vec_id = ba.vec_id
        JOIN buck bb ON (ba.bucket = bb.bucket OR bit_count(xor(ba.bucket, bb.bucket)) = 1)
        JOIN e b ON b.vec_id = bb.vec_id
        WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
    ) WHERE rank <= {_RECALL_K}
),
{_SQL_RECALL_TAIL}
""",
)
def lsh_multiprobe_recall_at_10_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of multi-probe LSH (own + 1-bit-flip buckets). For
    candidate-pruned EXACT search, more candidates can only help, so
    this must sit at or above lsh_recall_at_10 — the guaranteed
    monotonicity the ADC tiers lack (pinned in tests)."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        recall_vs_exact,
        topk_lsh_multiprobe,
    )

    emb, q, exact = _recall_queries(spark, sf_dir)
    return recall_vs_exact(exact, topk_lsh_multiprobe(emb, q, k=_RECALL_K))


@register(
    "ivf_recall_at_10",
    f"""
WITH {_SQL_IVF},
approx AS (
    SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC, b.vec_id)
                   AS rank
        FROM e a
        JOIN assign sa ON a.vec_id = sa.vec_id
        JOIN assign sb ON sa.cell = sb.cell
        JOIN e b ON b.vec_id = sb.vec_id
        WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
    ) WHERE rank <= {_RECALL_K}
),
{_SQL_RECALL_TAIL}
""",
)
def ivf_recall_at_10_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of single-probe IVF with exact in-cell scoring —
    isolates the coarse quantizer's coverage from PQ's scoring error
    (compare ivfpq_recall_at_10, which adds ADC approximation)."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        recall_vs_exact,
        topk_ivf,
    )

    emb, q, exact = _recall_queries(spark, sf_dir)
    return recall_vs_exact(exact, topk_ivf(emb, q, k=_RECALL_K))


@register(
    "ivf_probe2_recall_at_10",
    f"""
WITH {_SQL_IVF},
qassign AS (
    SELECT vec_id, cell FROM (
        SELECT a.vec_id, c.cell,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, c.cv), 6) DESC, c.cell) AS rn
        FROM e a, cent c
        WHERE a.vec_id < 10
    ) WHERE rn <= 2
),
approx AS (
    SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC, b.vec_id)
                   AS rank
        FROM e a
        JOIN qassign qa ON a.vec_id = qa.vec_id
        JOIN assign sb ON qa.cell = sb.cell
        JOIN e b ON b.vec_id = sb.vec_id
        WHERE a.vec_id <> b.vec_id
    ) WHERE rank <= {_RECALL_K}
),
{_SQL_RECALL_TAIL}
""",
)
def ivf_probe2_recall_at_10_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of 2-probe IVF with EXACT in-cell scoring — unlike
    ivfpq_probe2 (ADC-scored, pinned non-monotone), this must sit at
    or above ivf_recall_at_10: the probe1 candidate set is contained
    in probe2's and exact cosine ranks both. Completes the exact-tier
    probe story next to lsh -> lsh_multiprobe."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        recall_vs_exact,
        topk_ivf,
    )

    emb, q, exact = _recall_queries(spark, sf_dir)
    return recall_vs_exact(exact, topk_ivf(emb, q, k=_RECALL_K, probes=2))


@register(
    "ann_frontier",
    f"""
WITH {_SQL_IVF},
{_SQL_LSH_BUCKETS},
exact AS (
    SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC, b.vec_id)
                   AS rank
        FROM e a, e b WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
    ) WHERE rank <= {_RECALL_K}
),
lsh_app AS (
    SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC, b.vec_id)
                   AS rank
        FROM e a
        JOIN buck ba ON a.vec_id = ba.vec_id
        JOIN buck bb ON ba.bucket = bb.bucket
        JOIN e b ON b.vec_id = bb.vec_id
        WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
    ) WHERE rank <= {_RECALL_K}
),
mp_app AS (
    SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC, b.vec_id)
                   AS rank
        FROM e a
        JOIN buck ba ON a.vec_id = ba.vec_id
        JOIN buck bb ON (ba.bucket = bb.bucket OR bit_count(xor(ba.bucket, bb.bucket)) = 1)
        JOIN e b ON b.vec_id = bb.vec_id
        WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
    ) WHERE rank <= {_RECALL_K}
),
ivf_app AS (
    SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC, b.vec_id)
                   AS rank
        FROM e a
        JOIN assign sa ON a.vec_id = sa.vec_id
        JOIN assign sb ON sa.cell = sb.cell
        JOIN e b ON b.vec_id = sb.vec_id
        WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
    ) WHERE rank <= {_RECALL_K}
),
qassign2 AS (
    SELECT vec_id, cell FROM (
        SELECT a.vec_id, c.cell,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, c.cv), 6) DESC, c.cell) AS rn
        FROM e a, cent c
        WHERE a.vec_id < 10
    ) WHERE rn <= 2
),
ivf2_app AS (
    SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC, b.vec_id)
                   AS rank
        FROM e a
        JOIN qassign2 qa ON a.vec_id = qa.vec_id
        JOIN assign sb ON qa.cell = sb.cell
        JOIN e b ON b.vec_id = sb.vec_id
        WHERE a.vec_id <> b.vec_id
    ) WHERE rank <= {_RECALL_K}
),
bf_cand AS (SELECT count(*) AS c FROM e a JOIN e b ON a.vec_id <> b.vec_id
            WHERE a.vec_id < 10),
lsh_cand AS (SELECT count(*) AS c FROM buck ba JOIN buck bb ON ba.bucket = bb.bucket
             WHERE ba.vec_id < 10 AND ba.vec_id <> bb.vec_id),
mp_cand AS (SELECT count(*) AS c FROM buck ba
            JOIN buck bb ON (ba.bucket = bb.bucket OR bit_count(xor(ba.bucket, bb.bucket)) = 1)
            WHERE ba.vec_id < 10 AND ba.vec_id <> bb.vec_id),
ivf_cand AS (SELECT count(*) AS c FROM assign sa JOIN assign sb ON sa.cell = sb.cell
             WHERE sa.vec_id < 10 AND sa.vec_id <> sb.vec_id),
ivf2_cand AS (SELECT count(*) AS c FROM qassign2 qa JOIN assign sb ON qa.cell = sb.cell
              WHERE qa.vec_id <> sb.vec_id)
SELECT 'bruteforce' AS tier, CAST((SELECT c FROM bf_cand) AS BIGINT) AS candidate_rows,
       CAST(count(*) AS BIGINT) AS n_exact, CAST(count(ap.neighbor_id) AS BIGINT) AS n_hits,
       round(count(ap.neighbor_id) / CAST(count(*) AS DOUBLE), 6) AS recall
FROM exact ex LEFT JOIN exact ap
  ON ex.query_id = ap.query_id AND ex.neighbor_id = ap.neighbor_id
UNION ALL
SELECT 'lsh', CAST((SELECT c FROM lsh_cand) AS BIGINT),
       CAST(count(*) AS BIGINT), CAST(count(ap.neighbor_id) AS BIGINT),
       round(count(ap.neighbor_id) / CAST(count(*) AS DOUBLE), 6)
FROM exact ex LEFT JOIN lsh_app ap
  ON ex.query_id = ap.query_id AND ex.neighbor_id = ap.neighbor_id
UNION ALL
SELECT 'lsh_multiprobe', CAST((SELECT c FROM mp_cand) AS BIGINT),
       CAST(count(*) AS BIGINT), CAST(count(ap.neighbor_id) AS BIGINT),
       round(count(ap.neighbor_id) / CAST(count(*) AS DOUBLE), 6)
FROM exact ex LEFT JOIN mp_app ap
  ON ex.query_id = ap.query_id AND ex.neighbor_id = ap.neighbor_id
UNION ALL
SELECT 'ivf', CAST((SELECT c FROM ivf_cand) AS BIGINT),
       CAST(count(*) AS BIGINT), CAST(count(ap.neighbor_id) AS BIGINT),
       round(count(ap.neighbor_id) / CAST(count(*) AS DOUBLE), 6)
FROM exact ex LEFT JOIN ivf_app ap
  ON ex.query_id = ap.query_id AND ex.neighbor_id = ap.neighbor_id
UNION ALL
SELECT 'ivf_probe2', CAST((SELECT c FROM ivf2_cand) AS BIGINT),
       CAST(count(*) AS BIGINT), CAST(count(ap.neighbor_id) AS BIGINT),
       round(count(ap.neighbor_id) / CAST(count(*) AS DOUBLE), 6)
FROM exact ex LEFT JOIN ivf2_app ap
  ON ex.query_id = ap.query_id AND ex.neighbor_id = ap.neighbor_id
""",
)
def ann_frontier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recall-vs-work frontier (similarity.ann_frontier): one row
    per exact-scoring ANN tier with its recall@10 AND the number of
    candidate pairs it scores — tier selection at 100 TB becomes a
    lookup (cheapest tier whose recall clears the bar) instead of a
    synthesis across separate recall queries and SCALE.md slopes.
    The ADC tiers (PQ/IVFxPQ) are excluded by design: compressed
    scoring voids the candidates-superset => recall>= guarantee this
    frame pins; their rows live in tools/ann_frontier.py."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import ann_frontier

    emb = _emb(spark, sf_dir)
    return ann_frontier(emb, emb.where(F.col("vec_id") < 10), k=_RECALL_K)


@register(
    "knn_graph",
    f"""
WITH {_SQL_EMB},
scored AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM e a, e b
    WHERE a.vec_id <> b.vec_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
    FROM scored
) WHERE rank <= 3
""",
)
def knn_graph_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact k-NN graph (k=3) over EVERY vector — the edge list
    that clustering, graph-based dedup, and label propagation build
    on. Runs the distributed block GRID (packed blocks, one vectorized
    matmul per cell, per-cell top-k, global rank): O(N^2) work spread
    over n_blocks^2 tasks with block-sized memory, never a driver-side
    corpus or a row-per-pair product. The oracle is the brute-force
    window over all pairs."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import topk_grid

    emb = _emb(spark, sf_dir)
    return topk_grid(emb, emb, k=3)


@register(
    "triplet_mining",
    f"""
WITH {_SQL_EMB},
lab AS (SELECT vec_id, label FROM embeddings),
scored AS (
    SELECT a.vec_id AS anchor_id, b.vec_id AS cand_id,
           la.label = lb.label AS same,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM e a JOIN lab la ON a.vec_id = la.vec_id,
         e b JOIN lab lb ON b.vec_id = lb.vec_id
    WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
),
best AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY anchor_id, same
            ORDER BY cosine DESC, cand_id) AS rn
        FROM scored
    ) WHERE rn = 1
)
SELECT p.anchor_id,
       p.cand_id AS positive_id, p.cosine AS pos_cosine,
       n.cand_id AS negative_id, n.cosine AS neg_cosine
FROM best p JOIN best n ON p.anchor_id = n.anchor_id
WHERE p.same AND NOT n.same
""",
)
def triplet_mining_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive triplets for the first 10 anchors: nearest
    same-label vector (positive) + nearest other-label vector (hard
    negative) — the data-prep op behind contrastive embedding
    training. Exact scan at fixture scale; at 100 TB the candidate set
    comes from an ANN tier instead (same ranking, pruned input)."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import mine_triplets

    emb = _emb(spark, sf_dir)
    return mine_triplets(emb, emb.where(F.col("vec_id") < 10))


def _sql_pagerank_chain(iters: int = 3, damping_pct: int = 85) -> str:
    """Unrolled PageRank CTEs over the `knn` edge CTE (src, dst) and
    the `e` vector table — mirrors operators/graph.pagerank step for
    step in FIXED-POINT integer arithmetic (micro-unit ranks, integer
    division), so parity is bit-exact with no round-half boundaries."""
    from calculate_file_content_size_for_vector_db_spark.operators.graph import PAGERANK_SCALE

    teleport_num = (100 - damping_pct) * PAGERANK_SCALE // 100
    parts = [
        "nodes AS (SELECT vec_id AS node FROM e)",
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes)",
        "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM knn GROUP BY src)",
        f"pr0 AS (SELECT node, {PAGERANK_SCALE} // nn.n AS pr FROM nodes, nn)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""pr{i} AS (
    SELECT no.node,
           {teleport_num} // (SELECT n FROM nn)
               + ({damping_pct} * coalesce(s.c, 0)) // 100 AS pr
    FROM nodes no LEFT JOIN (
        SELECT k.dst AS node, CAST(sum(p.pr // d.outdeg) AS BIGINT) AS c
        FROM knn k JOIN deg d ON k.src = d.src JOIN pr{i - 1} p ON k.src = p.node
        GROUP BY k.dst
    ) s ON no.node = s.node
)"""
        )
    return ",\n".join(parts)


@register(
    "knn_pagerank",
    f"""
WITH {_SQL_EMB},
knn AS (
    SELECT query_id AS src, neighbor_id AS dst FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC, b.vec_id)
                   AS rank
        FROM e a, e b WHERE a.vec_id <> b.vec_id
    ) WHERE rank <= 3
),
{_sql_pagerank_chain()}
SELECT node AS vec_id, CAST(pr AS BIGINT) AS pagerank_micro FROM pr3
""",
)
def knn_pagerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the semantic k-NN graph (3 unrolled
    power iterations, damping 0.85, fixed-point micro-unit ranks) —
    the signal diversity-aware data selection ranks by: high-rank
    vectors sit in dense semantic neighborhoods, low-rank ones are
    outliers. Edges come from the distributed block grid; each
    iteration is one edge-rank equi-join plus one keyed aggregation
    (edges never move — the standard distributed PageRank layout),
    all one lazy plan."""
    from calculate_file_content_size_for_vector_db_spark.operators.graph import pagerank
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import topk_grid

    emb = _emb(spark, sf_dir)
    edges = topk_grid(emb, emb, k=3).select(
        F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    return pagerank(edges, emb.select(F.col("vec_id").alias("node"))).select(
        F.col("node").alias("vec_id"), "pagerank_micro"
    )


# ---------------------------------------------------------------------------
# Additional analytic surface: time-series trend, rank distribution,
# exact percentiles, distinct + approx-distinct, unpivot
# ---------------------------------------------------------------------------


@register(
    "orders_monthly_revenue",
    """
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
FROM orders GROUP BY 1
""",
)
def orders_monthly_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("revenue"),
        )
    )


@register(
    "customer_balance_ntile",
    """
SELECT c_custkey,
       CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INT) AS quartile,
       round(percent_rank() OVER (ORDER BY c_acctbal, c_custkey), 6) AS pr
FROM customer
""",
)
def customer_balance_ntile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global quartiles/percent-rank over the customer DIMENSION.

    ntile/percent_rank need the full total order, so the unpartitioned
    window is inherent to the semantic. Bounded-input assumption:
    customer is a dimension table (TPC-H: 150k rows/SF — ~15M at
    SF100), small enough for the single ranking task; for fact-scale
    percentile needs use lineitem_percentiles (approx_percentile, fully
    parallel) instead.
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    return read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    )


@register(
    "lineitem_percentiles",
    """
SELECT round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
       round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 6) AS p75
FROM lineitem
""",
)
def lineitem_percentiles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(l_extendedprice, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.75)"), 6).alias("p75"),
    )


@register(
    "distinct_customers_ordering",
    "SELECT count(DISTINCT o_custkey) AS n_distinct FROM orders",
)
def distinct_customers_ordering_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "orders").agg(
        F.countDistinct("o_custkey").alias("n_distinct")
    )


@register("approx_distinct_customers", None)
def approx_distinct_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approx-distinct (sketch internals differ engine-to-engine ->
    rows-only check; the exact twin above is the oracle-checked path)."""
    return read_table(spark, sf_dir, "orders").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n_approx")
    )


@register(
    "approx_distinct_error",
    """
SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact,
       true AS within_bound
FROM orders
""",
)
def approx_distinct_error_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-error contract for the HLL sketch (VERDICT r05 item 6):
    emits the exact distinct count plus a flag that the approx estimate
    sits within 5x the configured rsd (0.02 -> 10% relative error, a
    ~5-sigma bound HLL clears by construction). The sketch value itself
    is engine-specific, but the BOUND is portable — the oracle asserts
    within_bound = true, so any Spark-side sketch drift out of bound
    becomes a driver hash mismatch instead of an unverifiable row."""
    agg = read_table(spark, sf_dir, "orders").agg(
        F.countDistinct("o_custkey").alias("n_exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n_approx"),
    )
    return agg.select(
        F.col("n_exact").cast("long").alias("n_exact"),
        (
            F.abs(F.col("n_approx") - F.col("n_exact"))
            / F.col("n_exact").cast("double")
            <= 0.10
        ).alias("within_bound"),
    )


@register(
    "monthly_activity_full_outer",
    """
WITH om AS (
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
           count(*) AS n_orders
    FROM orders GROUP BY 1
),
sm AS (
    SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
           count(*) AS n_shipments
    FROM lineitem GROUP BY 1
)
SELECT coalesce(om.month, sm.month) AS month,
       om.n_orders AS n_orders,
       sm.n_shipments AS n_shipments
FROM om FULL OUTER JOIN sm ON om.month = sm.month
""",
)
def monthly_activity_full_outer_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order months FULL OUTER shipment months — the one join type the
    registry lacked. Genuinely unmatched rows exist on the shipment
    side (l_shipdate runs up to ~4 months past the last o_orderdate),
    so the NULL-preserving semantics are actually exercised. Both
    inputs are month-cardinality aggregates, so the outer join runs on
    bounded data after two keyed shuffles."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    om = orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
    ).agg(F.count("*").alias("n_orders"))
    sm = li.groupBy(
        F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias("month")
    ).agg(F.count("*").alias("n_shipments"))
    return om.join(sm, "month", "full_outer").select("month", "n_orders", "n_shipments")


@register(
    "approx_percentile_error",
    """
SELECT CAST(count(*) AS BIGINT) AS n_rows, true AS within_rank_bound
FROM lineitem
""",
)
def approx_percentile_error_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-error contract for the approx-percentile sketch (the
    approx_distinct_error pattern applied to the second sketch family):
    approx_percentile(x, 0.5, accuracy=100) guarantees the returned
    value's RANK is within N/accuracy of the true median rank. The
    query re-counts the returned value's actual rank relationally and
    emits the bound check; the oracle asserts it holds, so sketch
    drift out of contract becomes a hash mismatch. (The sketch VALUE
    itself is engine-specific — that part stays unasserted, exactly as
    with HLL.)"""
    li = read_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    v = li.agg(
        F.expr("approx_percentile(l_extendedprice, 0.5, 100)").alias("v"),
        F.count("*").cast("long").alias("n_rows"),
    )
    return (
        li.crossJoin(F.broadcast(v))
        .agg(
            F.any_value("n_rows").alias("n_rows"),
            F.sum(F.when(F.col("l_extendedprice") <= F.col("v"), 1).otherwise(0)).alias(
                "rank_of_v"
            ),
        )
        .select(
            "n_rows",
            (
                F.abs(F.col("rank_of_v") - F.col("n_rows") / F.lit(2.0))
                <= F.col("n_rows") / F.lit(100.0) + F.lit(1.0)
            ).alias("within_rank_bound"),
        )
    )


@register(
    "part_unpivot",
    """
SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part
""",
)
def part_unpivot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "part").selectExpr(
        "p_partkey",
        "stack(2, 'size', CAST(p_size AS DOUBLE), 'retailprice', p_retailprice) AS (metric, value)",
    )


# ---------------------------------------------------------------------------
# Maintenance / robustness patterns (operators/maintenance.py) + SQL API
# ---------------------------------------------------------------------------


@register(
    "salted_event_counts",
    """
SELECT event_type, count(*) AS n, round(sum(value), 6) AS total
FROM events GROUP BY event_type
""",
)
def salted_event_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-stage agg — result identical to direct groupBy
    (which is what the oracle expresses)."""
    from calculate_file_content_size_for_vector_db_spark.operators.maintenance import salted_count

    return salted_count(_events(spark, sf_dir), "event_type", "value")


@register(
    "cdc_upsert",
    """
WITH updates AS (
    SELECT doc_id, 'UPDATED:' || lang AS lang FROM documents WHERE doc_id < 10
    UNION ALL
    SELECT -1 AS doc_id, 'new' AS lang
)
SELECT doc_id, lang FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM updates)
UNION ALL
SELECT doc_id, lang FROM updates
""",
)
def cdc_upsert_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.maintenance import merge_upsert

    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    updates = (
        docs.where(F.col("doc_id") < 10)
        .select("doc_id", F.concat(F.lit("UPDATED:"), F.col("lang")).alias("lang"))
        .unionByName(
            docs.sparkSession.createDataFrame([(-1, "new")], "doc_id long, lang string")
        )
    )
    return merge_upsert(docs, updates, "doc_id")


@register(
    "corpus_snapshot_diff",
    """
WITH v_old AS (
    SELECT doc_id, sha256(text) AS fp FROM documents WHERE doc_id % 53 <> 0
),
v_new AS (
    SELECT doc_id,
           sha256(CASE WHEN doc_id % 31 = 0 THEN text || ' rev2' ELSE text END) AS fp
    FROM documents WHERE doc_id % 47 <> 0
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.fp IS DISTINCT FROM n.fp THEN 'changed'
            ELSE 'unchanged' END AS status
FROM v_old o FULL OUTER JOIN v_new n ON o.doc_id = n.doc_id
WHERE CASE WHEN o.doc_id IS NULL THEN 'added'
           WHEN n.doc_id IS NULL THEN 'removed'
           WHEN o.fp IS DISTINCT FROM n.fp THEN 'changed'
           ELSE 'unchanged' END <> 'unchanged'
""",
)
def corpus_snapshot_diff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-versioning diff (relational.snapshot_diff): two
    deterministic corpus versions derived from the fixture — v_old
    drops every 53rd doc (later ingests), v_new drops every 47th
    (deletions) and revises every 31st text — then the added / removed /
    changed delta by content fingerprint. Only 64-hex fingerprints
    cross the full-outer shuffle, never text bytes."""
    from calculate_file_content_size_for_vector_db_spark.operators.relational import snapshot_diff

    docs = _docs(spark, sf_dir)
    v_old = docs.where(F.col("doc_id") % 53 != 0)
    v_new = docs.where(F.col("doc_id") % 47 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 31 == 0, F.concat(F.col("text"), F.lit(" rev2"))
        ).otherwise(F.col("text")),
    )
    return snapshot_diff(v_old, v_new)


@register(
    "grouping_sets_lang_source",
    """
SELECT COALESCE(lang, 'ALL') AS lang_g, COALESCE(source, 'ALL') AS source_g,
       count(*) AS n_docs
FROM documents GROUP BY GROUPING SETS ((lang), (source))
""",
)
def grouping_sets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the spark.sql() surface."""
    _docs(spark, sf_dir).createOrReplaceTempView("documents_v")
    return spark.sql(
        """
        SELECT COALESCE(lang, 'ALL') AS lang_g, COALESCE(source, 'ALL') AS source_g,
               count(*) AS n_docs
        FROM documents_v GROUP BY GROUPING SETS ((lang), (source))
        """
    )


@register(
    "events_json_struct",
    "SELECT event_id, CAST(props->>'k' AS INT) AS k_struct FROM events",
)
def events_json_struct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-full JSON parsing (from_json -> typed struct field)."""
    return _events(spark, sf_dir).select(
        "event_id",
        F.from_json(F.col("props"), "k INT").getField("k").alias("k_struct"),
    )


@register(
    "fuzzy_source_match",
    """
WITH s AS (SELECT DISTINCT source FROM documents)
SELECT a.source AS a_source, b.source AS b_source,
       CAST(levenshtein(a.source, b.source) AS INT) AS edit_dist
FROM s a, s b
WHERE a.source < b.source AND levenshtein(a.source, b.source) <= 2
""",
)
def fuzzy_source_match_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance pairs over distinct sources, length-blocked.

    Lossless blocking: levenshtein(a, b) >= |len(a) - len(b)|, so any
    pair within distance 2 is within 2 in length. One side explodes to
    length keys len-2..len+2, the other keys by exact length — an
    equi-join (each pair meets on exactly one key), never a cross join
    over the distinct-source set."""
    s = _docs(spark, sf_dir).select("source").distinct()
    a = s.select(
        F.col("source").alias("a_source"),
        F.explode(
            F.sequence(F.length("source") - 2, F.length("source") + 2)
        ).alias("lkey"),
    )
    b = s.select(F.col("source").alias("b_source"), F.length("source").alias("lkey"))
    return (
        a.join(b, "lkey")
        .where(F.col("a_source") < F.col("b_source"))
        .select(
            "a_source",
            "b_source",
            F.levenshtein(F.col("a_source"), F.col("b_source")).cast("int").alias("edit_dist"),
        )
        .where(F.col("edit_dist") <= 2)
    )


@register(
    "orders_moving_avg",
    """
SELECT o_orderkey, o_custkey,
       round(avg(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg
FROM orders
""",
)
def orders_moving_avg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.avg("o_totalprice").over(w), 6).alias("moving_avg"),
    )


# ---------------------------------------------------------------------------
# Composed end-to-end pipeline: the full training-data prep flow as ONE
# lazy DataFrame graph — quality gate -> near-dup removal (MinHash LSH,
# keep smallest doc_id of each dup pair) -> chunk -> corpus stats.
# ---------------------------------------------------------------------------


@register(
    "training_pipeline",
    "WITH "
    + _SQL_SHINGLES
    + """,
sig_t AS (
    SELECT doc_id,
           list_transform(range(0, 8),
               s -> list_min(list_transform(sh, g -> md5(CAST(s AS VARCHAR) || '|' || g)))) AS signature
    FROM sh_t
),
band_t AS (
    SELECT doc_id, signature, CAST(unnest(range(0, 4)) AS INT) AS band FROM sig_t
),
bands AS (
    SELECT doc_id, band,
           md5(signature[2*band + 1] || '|' || signature[2*band + 2]) AS band_hash
    FROM band_t
),
cand AS (
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
dup_pairs AS (
    SELECT c.a_id, c.b_id
    FROM cand c
    JOIN sh_t sa ON sa.doc_id = c.a_id
    JOIN sh_t sb ON sb.doc_id = c.b_id
    WHERE round(len(list_intersect(sa.sh, sb.sh)) /
          CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE), 6) >= 0.5
),
quality AS (
    SELECT doc_id, text,
           round(CASE WHEN length(text) = 0 THEN NULL
                 ELSE (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))
                      / CAST(length(text) AS DOUBLE) END, 6) AS punct_ratio
    FROM documents
),
kept AS (
    SELECT q.doc_id, q.text FROM quality q
    WHERE COALESCE(q.punct_ratio, 1.0) <= 0.1
      AND q.doc_id NOT IN (SELECT b_id FROM dup_pairs)
),
chunked AS (
    SELECT doc_id,
           CAST(unnest(range(0, CAST(ceil(length(text) / 100.0) AS INT))) AS INT) AS chunk_index,
           text
    FROM kept WHERE length(text) > 0
)
SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       count(*) AS n_chunks,
       CAST(SUM(length(substring(text, chunk_index * 100 + 1, 100))) AS BIGINT) AS total_chars
FROM chunked
""",
)
def training_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate -> MinHash-LSH dedup (drop the larger id of each
    verified pair) -> fixed chunking -> one-row corpus stats. At scale:
    two shuffles (signature agg, candidate join) + one final agg."""
    from calculate_file_content_size_for_vector_db_spark.operators.chunk import chunk_fixed
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import minhash_lsh_pairs
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import quality_score

    docs = _docs(spark, sf_dir)
    dup_b = minhash_lsh_pairs(docs, threshold=0.5).select(
        F.col("b_id").alias("doc_id")
    ).distinct()
    kept = (
        quality_score(docs)
        .where(F.coalesce(F.col("punct_ratio"), F.lit(1.0)) <= 0.1)
        .join(dup_b, "doc_id", "left_anti")
        .select("doc_id", "text")
    )
    chunks = chunk_fixed(kept, chunk_size=FIXTURE_CHUNK_SIZE, keep_cols=["doc_id"])
    return chunks.agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count("*").alias("n_chunks"),
        F.sum(F.length("chunk_text")).cast("long").alias("total_chars"),
    )


@register(
    "curation_pipeline",
    _SQL_MINHASH_BANDS
    + """,
cand AS (
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
dup_pairs AS (
    SELECT c.a_id, c.b_id
    FROM cand c
    JOIN sh_t sa ON sa.doc_id = c.a_id
    JOIN sh_t sb ON sb.doc_id = c.b_id
    WHERE round(len(list_intersect(sa.sh, sb.sh)) /
          CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE), 6) >= 0.5
),
lang AS (
    SELECT doc_id,
           CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to','in','is'))) AS INT) AS s_en,
           CAST(len(list_filter(ws, w -> w IN ('der','die','das','und','ist','ein'))) AS INT) AS s_de,
           CAST(len(list_filter(ws, w -> w IN ('el','la','de','que','y','un'))) AS INT) AS s_es,
           CAST(len(list_filter(ws, w -> w IN ('le','la','et','les','des','un'))) AS INT) AS s_fr,
           CAST(len(list_filter(ws, w -> w IN ('的','是','了','在'))) AS INT) AS s_zh
    FROM ws_t
),
lang_en AS (
    SELECT doc_id FROM lang
    WHERE greatest(s_en, s_de, s_es, s_fr, s_zh) > 0
      AND s_en = greatest(s_en, s_de, s_es, s_fr, s_zh)
),
qual AS (
    SELECT doc_id FROM (
        SELECT doc_id,
               round(CASE WHEN length(text) = 0 THEN NULL
                     ELSE (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))
                          / CAST(length(text) AS DOUBLE) END, 6) AS punct_ratio
        FROM documents
    ) WHERE COALESCE(punct_ratio, 1.0) <= 0.1
),
sh5 AS (
    SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 3),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]))) AS g
    FROM ws_t WHERE len(ws) >= 5
),
contaminated AS (
    SELECT DISTINCT t.doc_id
    FROM sh5 t JOIN sh5 b ON t.g = b.g AND t.doc_id % 5 <> 0 AND b.doc_id % 5 = 0
),
kept AS (
    SELECT d.doc_id, d.text
    FROM documents d
    JOIN lang_en USING (doc_id)
    JOIN qual USING (doc_id)
    WHERE d.doc_id % 5 <> 0
      AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
      AND d.doc_id NOT IN (SELECT b_id FROM dup_pairs)
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(len(w.ws)), 0) AS BIGINT) AS total_tokens,
       CAST(coalesce(sum(length(k.text)), 0) AS BIGINT) AS total_chars
FROM kept k JOIN ws_t w USING (doc_id)
""",
)
def curation_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE curation stack composed as one lazy plan — the query
    a training-data team actually ships: benchmark split held out
    (doc_id % 5 == 0) -> language gate (detected 'en') -> quality gate
    (punct_ratio <= 0.1) -> benchmark decontamination (shared 5-gram)
    -> MinHash-LSH near-dup drop (larger id of each verified pair) ->
    one-row corpus budget (docs / tokens / chars). Every stage is an
    already-proven operator; composition stays gates + anti-joins on
    doc_id plus the LSH chain's own bounded shuffles."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import decontaminate
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import minhash_lsh_pairs
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        lang_id,
        quality_score,
        tokens,
    )

    docs = _docs(spark, sf_dir)
    train = docs.where(F.col("doc_id") % 5 != 0)
    bench = docs.where(F.col("doc_id") % 5 == 0)
    lang_en = (
        lang_id(docs)
        .where(
            (F.col("predicted_lang") == "en")
        )
        .select("doc_id")
    )
    qual = (
        quality_score(docs)
        .where(F.coalesce(F.col("punct_ratio"), F.lit(1.0)) <= 0.1)
        .select("doc_id")
    )
    contaminated = decontaminate(train, bench, n=5).select("doc_id")
    dup_b = minhash_lsh_pairs(docs, threshold=0.5).select(
        F.col("b_id").alias("doc_id")
    ).distinct()
    kept = (
        train.join(lang_en, "doc_id")
        .join(qual, "doc_id")
        .join(contaminated, "doc_id", "left_anti")
        .join(dup_b, "doc_id", "left_anti")
        .select("doc_id", "text")
    )
    return kept.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.coalesce(F.sum(F.size(tokens("text"))), F.lit(0)).cast("long").alias("total_tokens"),
        F.coalesce(F.sum(F.length("text")), F.lit(0)).cast("long").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# More relational shapes: Q6-style filter-agg, Q4-style EXISTS,
# correlated-average comparison
# ---------------------------------------------------------------------------


@register(
    "tpch_q6",
    """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
)
def tpch_q6_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    * F.col("l_discount").cast("decimal(18,4)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "late_shipment_orders",
    """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
)
GROUP BY o_orderpriority
""",
)
def late_shipment_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS as a conditional left-semi join."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    semi = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


@register(
    "above_avg_customers",
    """
WITH nation_avg AS (
    SELECT c_nationkey, avg(c_acctbal) AS navg FROM customer GROUP BY c_nationkey
)
SELECT c.c_custkey, round(c.c_acctbal, 2) AS acctbal,
       round(n.navg, 6) AS nation_avg
FROM customer c JOIN nation_avg n USING (c_nationkey)
WHERE c.c_acctbal > n.navg
""",
)
def above_avg_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-average comparison, decorrelated as agg + broadcast
    join (what Catalyst does to the EXISTS/IN subquery form anyway)."""
    cust = read_table(spark, sf_dir, "customer")
    nation_avg = cust.groupBy("c_nationkey").agg(F.avg("c_acctbal").alias("navg"))
    return (
        cust.join(F.broadcast(nation_avg), "c_nationkey")
        .where(F.col("c_acctbal") > F.col("navg"))
        .select(
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.round("navg", 6).alias("nation_avg"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus/ML utilities: vocabulary, TF-IDF, deterministic splits,
# map explode, window-function breadth
# ---------------------------------------------------------------------------


@register(
    "vocabulary",
    f"""
WITH toks AS (
    SELECT unnest({_SQL_TOKENS}) AS word FROM documents
)
SELECT word, count(*) AS n,
       CAST(row_number() OVER (ORDER BY count(*) DESC, word) AS INT) AS rank
FROM toks GROUP BY word
""",
)
def vocabulary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary with frequency ranks (explode + count + rank).

    The rank window is global (unpartitioned) but its input is the
    POST-AGGREGATION distinct-word frame — natural-language vocabulary
    grows ~O(corpus^0.5) (Heaps' law), millions of rows at 100 TB, not
    the token fact table's trillions. Consumers needing only the head
    should add .limit(k) before collecting. Pinned by
    tests/test_plans.py::test_global_window_rankers_rank_aggregated_frames.
    """
    from pyspark.sql import Window

    from calculate_file_content_size_for_vector_db_spark.operators.textstats import tokens

    toks = _docs(spark, sf_dir).select(F.explode(tokens("text")).alias("word"))
    counts = toks.groupBy("word").agg(F.count("*").alias("n"))
    w = Window.orderBy(F.desc("n"), F.asc("word"))
    return counts.withColumn("rank", F.row_number().over(w).cast("int"))


@register(
    "tfidf_top_terms",
    f"""
WITH toks AS (
    SELECT doc_id, unnest({_SQL_TOKENS}) AS word FROM documents
),
tf AS (
    SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY doc_id, word
),
df_t AS (
    SELECT word, count(DISTINCT doc_id) AS dfreq FROM toks GROUP BY word
),
n_docs AS (SELECT count(*) AS n FROM documents),
scored AS (
    SELECT tf.doc_id, tf.word,
           round(tf.tf * ln(CAST(n_docs.n AS DOUBLE) / df_t.dfreq), 6) AS tfidf
    FROM tf JOIN df_t USING (word) CROSS JOIN n_docs
)
SELECT doc_id, word, tfidf, rank FROM (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, word) AS INT) AS rank
    FROM scored
) WHERE rank <= 3
""",
)
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: two hash-aggs (term-freq, doc-freq) + a broadcast join of
    the term dictionary + windowed top-3 terms per doc."""
    from pyspark.sql import Window

    from calculate_file_content_size_for_vector_db_spark.operators.textstats import tokens

    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("word"))
    tf = toks.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dft = toks.groupBy("word").agg(F.countDistinct("doc_id").alias("dfreq"))
    n = docs.count()
    scored = tf.join(F.broadcast(dft), "word").select(
        "doc_id",
        "word",
        F.round(F.col("tf") * F.log(F.lit(float(n)) / F.col("dfreq")), 6).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("word"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select("doc_id", "word", "tfidf", "rank")
    )


@register(
    "train_test_split",
    """
SELECT doc_id,
       CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 10 < 8
            THEN 'train' ELSE 'test' END AS split
FROM documents
""",
)
def train_test_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/test assignment (stable under
    reshuffling and incremental loads, unlike random sampling)."""
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "int"
    ) % 10
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.when(bucket < 8, "train").otherwise("test").alias("split"),
    )


@register(
    "events_props_map",
    """
SELECT event_id, k AS prop_key, CAST(props ->> k AS INT) AS prop_value
FROM (SELECT event_id, props, unnest(json_keys(props)) AS k FROM events)
""",
)
def events_props_map_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON -> map -> exploded key/value rows (map surface)."""
    ev = _events(spark, sf_dir)
    m = F.from_json(F.col("props"), "map<string,int>")
    return ev.select("event_id", F.explode(m).alias("prop_key", "prop_value"))


@register(
    "orders_window_stats",
    """
SELECT o_orderkey, o_custkey,
       round(first_value(o_totalprice) OVER w, 2) AS first_price,
       round(last_value(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS last_price,
       round(cume_dist() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice, o_orderkey), 6) AS cd
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def orders_window_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_cd = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w_full), 2).alias("last_price"),
        F.round(F.cume_dist().over(w_cd), 6).alias("cd"),
    )


# ---------------------------------------------------------------------------
# Statistical aggregates: correlation/stddev, grouped percentiles,
# histogram bucketing, arg-max, sorted collect
# ---------------------------------------------------------------------------


@register(
    "lineitem_stats",
    """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       round(stddev_samp(l_extendedprice), 4) AS price_stddev,
       round(covar_samp(l_quantity, l_discount), 6) AS qty_disc_covar
FROM lineitem GROUP BY l_returnflag
""",
)
def lineitem_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("qty_disc_covar"),
    )


@register(
    "grouped_percentiles",
    """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
       round(quantile_cont(o_totalprice, 0.9), 6) AS p90_price
FROM orders GROUP BY o_orderpriority
""",
)
def grouped_percentiles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90_price"),
    )


@register(
    "value_histogram",
    """
SELECT CAST(CASE WHEN value < 0 THEN 0
                 WHEN value >= 100 THEN 11
                 ELSE floor(value / 10) + 1 END AS INT) AS bucket,
       count(*) AS n,
       round(min(value), 6) AS lo,
       round(max(value), 6) AS hi
FROM events GROUP BY 1
""",
)
def value_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.groupBy(
        F.width_bucket("value", F.lit(0.0), F.lit(100.0), F.lit(10)).cast("int").alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
    )


@register(
    "richest_customer_per_nation",
    """
SELECT c_nationkey, c_custkey AS richest_custkey,
       round(c_acctbal, 2) AS max_acctbal
FROM (
    SELECT *, row_number() OVER (PARTITION BY c_nationkey
        ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
    FROM customer
) WHERE rn = 1
""",
)
def richest_customer_per_nation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-max with a deterministic (balance, key) tie-break."""
    cust = read_table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        F.expr("max_by(c_custkey, struct(c_acctbal, c_custkey))").alias("richest_custkey"),
        F.round(F.max("c_acctbal"), 2).alias("max_acctbal"),
    )


@register(
    "langs_per_source",
    """
SELECT source, to_json(list_sort(list(DISTINCT lang))) AS langs
FROM documents GROUP BY source
""",
)
def langs_per_source_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # langs is serialized to JSON on both sides: the driver's pandas
    # canonicalizer can't hash a raw array<string> column (same fix as
    # rag_ingest / sim_ivf_centroids). The array-valued form stays
    # available to library consumers via textstats.langs_per_source —
    # serialization here is a driver-facing canonicalization only.
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        langs_per_source,
    )

    return langs_per_source(_docs(spark, sf_dir)).select(
        "source", F.to_json("langs").alias("langs")
    )


@register(
    "zscore_by_lang",
    """
SELECT doc_id, lang,
       round(CASE WHEN stddev_samp(n_chars) OVER (PARTITION BY lang) > 0
             THEN (n_chars - avg(n_chars) OVER (PARTITION BY lang))
                  / stddev_samp(n_chars) OVER (PARTITION BY lang)
             ELSE 0.0 END, 6) AS zscore
FROM documents
""",
)
def zscore_by_lang_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas surface (per-group normalization),
    oracle-verified against the pure-SQL window form."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import zscore_by_group

    return zscore_by_group(_docs(spark, sf_dir))


@register(
    "dedup_clusters",
    _SQL_MINHASH_BANDS
    + """,
cand AS (
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
pairs AS (
    SELECT c.a_id, c.b_id
    FROM cand c
    JOIN sh_t sa ON sa.doc_id = c.a_id
    JOIN sh_t sb ON sb.doc_id = c.b_id
    WHERE round(len(list_intersect(sa.sh, sb.sh)) /
          CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE), 6) >= 0.5
),
sym AS (
    SELECT a_id AS src, b_id AS dst FROM pairs
    UNION
    SELECT b_id AS src, a_id AS dst FROM pairs
),
reach AS (
    WITH RECURSIVE r(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, e.dst FROM r JOIN sym e ON r.dst = e.src
    )
    SELECT * FROM r
)
SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
FROM reach GROUP BY src
""",
)
def dedup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative connected-components clustering of near-duplicates
    (oracle: transitive closure via recursive CTE)."""
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import neardup_clusters

    return neardup_clusters(_docs(spark, sf_dir), threshold=0.5)


@register(
    "dedup_survivors",
    _SQL_MINHASH_BANDS
    + """,
cand AS (
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
pairs AS (
    SELECT c.a_id, c.b_id
    FROM cand c
    JOIN sh_t sa ON sa.doc_id = c.a_id
    JOIN sh_t sb ON sb.doc_id = c.b_id
    WHERE round(len(list_intersect(sa.sh, sb.sh)) /
          CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE), 6) >= 0.5
),
sym AS (
    SELECT a_id AS src, b_id AS dst FROM pairs
    UNION
    SELECT b_id AS src, a_id AS dst FROM pairs
),
reach AS (
    WITH RECURSIVE r(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, e.dst FROM r JOIN sym e ON r.dst = e.src
    )
    SELECT * FROM r
),
clusters AS (
    SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
    FROM reach GROUP BY src
)
SELECT d.doc_id FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM clusters WHERE cluster_id <> doc_id)
""",
)
def dedup_survivors_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The kept-document view after near-dup collapse: corpus minus
    non-keeper cluster members, via a broadcast left-anti join (the
    loser set is tiny relative to the corpus)."""
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import dedup_survivors

    return dedup_survivors(_docs(spark, sf_dir), threshold=0.5)


@register("dedup_clusters_star", None)  # oracle assigned below — identical to dedup_clusters
def dedup_clusters_star_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deployment-scale CC path under the SAME oracle as
    dedup_clusters: large-star/small-star contraction (dedup.
    star_components, O(log^2 n) rounds on any structure) must produce
    exactly the label-propagation fixpoint — component-min labels —
    so the recursive-CTE transitive closure verifies both. This row
    exists because the scale ladder showed pointer jumping failing to
    converge on a 200k-doc graph; the replacement algorithm gets a
    driver-checked correctness row, not just unit tests."""
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import neardup_clusters

    return neardup_clusters(_docs(spark, sf_dir), threshold=0.5, method="star")


REGISTRY["dedup_clusters_star"].oracle = REGISTRY["dedup_clusters"].oracle


@register("dedup_incremental_bloom", None)  # oracle assigned below — identical to dedup_incremental
def dedup_incremental_bloom_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed production ingest: Bloom pre-gate THEN the band
    join, registered under dedup_incremental's oracle verbatim — the
    no-false-negatives guarantee as a hash-checked equality, not a
    docstring claim. Only batch docs whose band hashes hit the corpus
    bitmap (broadcast probe against the bounded word table) enter
    incremental_neardup_pairs; if the gate ever dropped a true
    near-dup, this row would mismatch."""
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import (
        bloom_neardup_prefilter,
        incremental_neardup_pairs,
        minhash_bands,
        minhash_signature,
        shingle_sets,
    )

    docs = _docs(spark, sf_dir)
    batch = docs.where(F.col("doc_id") % _INCR_BATCH_MOD == 0)
    corpus = docs.where(F.col("doc_id") % _INCR_BATCH_MOD != 0)
    corpus_bands = minhash_bands(minhash_signature(corpus))
    gate = bloom_neardup_prefilter(batch, corpus_bands)
    batch_f = batch.join(
        gate.where(F.col("maybe_neardup")).select("doc_id"), "doc_id", "left_semi"
    )
    return incremental_neardup_pairs(batch_f, corpus_bands, shingle_sets(corpus))


REGISTRY["dedup_incremental_bloom"].oracle = REGISTRY["dedup_incremental"].oracle


@register("dedup_clusters_append", None)  # oracle assigned below — identical to dedup_clusters
def dedup_clusters_append_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cluster maintenance (dedup.cluster_append) under
    dedup_clusters' transitive-closure oracle VERBATIM: cluster the
    corpus side alone (star CC), then merge the daily batch in via the
    contracted supergraph — stored labels + (batch↔corpus pairs from
    the stored band/shingle artifacts) + (batch↔batch pairs) — and the
    result must hash-equal a from-scratch clustering of the full
    corpus. The equality holds because the pair predicate is pairwise
    (corpus-corpus pairs are baked into the stored labels; the two
    batch blocks cover the rest) and contraction preserves
    connectivity and component minima. At 100 TB this is the
    difference between re-clustering 10^9 docs nightly and solving a
    CC whose node count is the day's touched clusters."""
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import (
        cluster_append,
        incremental_neardup_pairs,
        minhash_bands,
        minhash_lsh_pairs,
        minhash_signature,
        neardup_clusters,
        shingle_sets,
    )

    docs = _docs(spark, sf_dir)
    batch = docs.where(F.col("doc_id") % _INCR_BATCH_MOD == 0)
    corpus = docs.where(F.col("doc_id") % _INCR_BATCH_MOD != 0)
    stored = neardup_clusters(corpus, threshold=0.5, method="star")
    cross = incremental_neardup_pairs(
        batch,
        minhash_bands(minhash_signature(corpus)),
        shingle_sets(corpus),
        threshold=0.5,
    )
    within = minhash_lsh_pairs(batch, threshold=0.5)
    edges = cross.select(
        F.col("new_id").alias("src"), F.col("corpus_id").alias("dst")
    ).unionByName(
        within.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    )
    return cluster_append(stored, edges)


REGISTRY["dedup_clusters_append"].oracle = REGISTRY["dedup_clusters"].oracle



_SQL_REV = (
    "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * "
    "(CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)"
)


@register(
    "tpch_q10",
    f"""
SELECT c_custkey, c_name, c_acctbal, n_name, revenue FROM (
    SELECT c_custkey, c_name, c_acctbal, n_name, {_SQL_REV} AS revenue
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation ON n_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY 1, 2, 3, 4
) ORDER BY revenue DESC, c_custkey LIMIT 20
""",
)
def tpch_q10_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.relational import (
        returned_item_customers,
    )

    return returned_item_customers(
        read_table(spark, sf_dir, "customer"),
        read_table(spark, sf_dir, "orders"),
        read_table(spark, sf_dir, "lineitem"),
        read_table(spark, sf_dir, "nation"),
    )


@register(
    "tpch_q14",
    """
SELECT CAST(round(100.0 * sum(CASE WHEN p_type = 'PROMO'
           THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
           ELSE CAST(0 AS DECIMAL(18,4)) END)
       / sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 6) AS DOUBLE)
       AS promo_revenue_pct
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00'
""",
)
def tpch_q14_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.relational import (
        promo_revenue_ratio,
    )

    return promo_revenue_ratio(
        read_table(spark, sf_dir, "lineitem"), read_table(spark, sf_dir, "part")
    )


@register(
    "tpch_q19",
    f"""
SELECT {_SQL_REV} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 20)
""",
)
def tpch_q19_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calculate_file_content_size_for_vector_db_spark.operators.relational import (
        disjunctive_part_revenue,
    )

    return disjunctive_part_revenue(
        read_table(spark, sf_dir, "lineitem"), read_table(spark, sf_dir, "part")
    )


@register(
    "events_multi_rollup",
    """
SELECT granularity, bucket, n_events, total_value FROM (
    SELECT CASE WHEN grouping(h) = 0 THEN 'hour' ELSE 'day' END AS granularity,
           CASE WHEN grouping(h) = 0 THEN strftime(h, '%Y-%m-%d %H:%M:%S')
                ELSE strftime(d, '%Y-%m-%d %H:%M:%S') END AS bucket,
           count(*) AS n_events,
           round(sum(value), 6) AS total_value
    FROM (
        SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d, value
        FROM events
    )
    GROUP BY GROUPING SETS ((h, d), (d))
)
""",
)
def events_multi_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: hourly AND daily rollups
    of the event stream in ONE pass via GROUPING SETS — the
    multi-granularity materialization a time-series store keeps. Each
    hour belongs to one day, so (hour, day) grouping equals hour
    grouping while letting grouping() label the level. One shuffle for
    both granularities; partial aggregation runs map-side."""
    ev = _events(spark, sf_dir).select(
        F.date_trunc("hour", "ts").alias("h"),
        F.date_trunc("day", "ts").alias("d"),
        "value",
    )
    # grouping() is only legal inside the grouping-sets aggregation
    # itself, so the level label and bucket are computed in agg()
    g = ev.groupingSets([["h", "d"], ["d"]], "h", "d").agg(
        F.when(F.grouping("h") == 0, F.lit("hour"))
        .otherwise(F.lit("day"))
        .alias("granularity"),
        F.when(F.grouping("h") == 0, F.date_format("h", "yyyy-MM-dd HH:mm:ss"))
        .otherwise(F.date_format("d", "yyyy-MM-dd HH:mm:ss"))
        .alias("bucket"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )
    return g.select("granularity", "bucket", "n_events", "total_value")


@register(
    "tpch_q7",
    f"""
SELECT supp_nation, cust_nation, l_year, {_SQL_REV} AS revenue
FROM (
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           l_extendedprice, l_discount
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation ns ON ns.n_nationkey = s_nationkey
    JOIN nation nc ON nc.n_nationkey = c_nationkey
    WHERE ns.n_name < nc.n_name
)
GROUP BY supp_nation, cust_nation, l_year
""",
)
def tpch_q7_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape generalized to every nation pair: cross-border
    shipping volume by (supplier nation, customer nation, year). Two
    broadcast nation joins on different keys; the fact chain shuffles
    once for the final group."""
    li = read_table(spark, sf_dir, "lineitem")
    sup = read_table(spark, sf_dir, "supplier")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(ns), F.col("ns_key") == F.col("s_nationkey"))
        .join(F.broadcast(nc), F.col("nc_key") == F.col("c_nationkey"))
        .where(F.col("supp_nation") < F.col("cust_nation"))
    )
    rev = (
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,4)")
                * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
            ),
            2,
        )
        .cast("double")
        .alias("revenue")
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
    ).agg(rev)


@register(
    "tpch_q18",
    """
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_totalprice,
       round(total_qty, 6) AS total_qty
FROM orders
JOIN customer ON c_custkey = o_custkey
JOIN (
    SELECT l_orderkey, sum(l_quantity) AS total_qty
    FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 200
) big ON big.l_orderkey = o_orderkey
""",
)
def tpch_q18_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — a grouped HAVING
    pre-aggregation of the fact table joined back to its dimensions.
    The aggregation shrinks the fact side BEFORE the joins, so the
    join input is orders-above-threshold, not all lineitems."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 200)
    )
    return (
        orders.join(big, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            F.round("total_qty", 6).alias("total_qty"),
        )
    )


@register(
    "duplicated_spans",
    f"""
WITH ws_t AS (
    SELECT doc_id, {_SQL_TOKENS} AS ws FROM documents
),
spans AS (
    SELECT doc_id,
           md5(concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3], ws[i+4])) AS span_hash
    FROM ws_t, LATERAL (SELECT unnest(range(1, len(ws) - 3)) AS i) t
    WHERE len(ws) >= 5
)
SELECT span_hash,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       count(*) AS n_occurrences
FROM spans
GROUP BY span_hash
HAVING count(DISTINCT doc_id) >= 2
""",
)
def duplicated_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-span detection (the exact-substring
    dedup signal from training-data curation): every 5-token span is
    hashed and grouped; spans occurring in >= 2 distinct docs are the
    boilerplate/duplication candidates. One explode + one hash-agg —
    linear at any corpus size, no pairwise stage at all (contrast the
    pair-producing dedup ops above)."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import tokens
    from calculate_file_content_size_for_vector_db_spark.partitioning import spread

    n = 5
    docs = spread(read_table(spark, sf_dir, "documents"))
    toks = tokens("text")
    spans = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.md5(
            F.concat_ws(" ", *[F.element_at(toks, i + k + 1) for k in range(n)])
        ),
    )
    exploded = docs.where(F.size(toks) >= n).select(
        "doc_id", F.explode(spans).alias("span_hash")
    )
    return (
        exploded.groupBy("span_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= 2)
    )


@register(
    "dedup_span_rewrite",
    f"""
WITH ws_t AS (
    SELECT doc_id, {_SQL_TOKENS} AS ws FROM documents
),
tok_t AS (
    SELECT doc_id, CAST(t.i AS INT) - 1 AS pos, ws[CAST(t.i AS INT)] AS tok
    FROM ws_t, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i) t
),
span_t AS (
    SELECT doc_id, CAST(t.i AS INT) - 1 AS i,
           md5(concat_ws(' ', ws[CAST(t.i AS INT)], ws[CAST(t.i AS INT)+1],
               ws[CAST(t.i AS INT)+2], ws[CAST(t.i AS INT)+3], ws[CAST(t.i AS INT)+4]))
               AS span_hash
    FROM ws_t, LATERAL (SELECT unnest(range(1, len(ws) - 3)) AS i) t
    WHERE len(ws) >= 5
),
dup AS (
    SELECT span_hash, CAST(min(doc_id) AS BIGINT) AS keeper
    FROM span_t GROUP BY span_hash HAVING count(DISTINCT doc_id) >= 2
),
cov AS (
    SELECT DISTINCT s.doc_id, CAST(s.i + o.k AS INT) AS pos
    FROM span_t s
    JOIN dup d USING (span_hash), LATERAL (SELECT unnest(range(0, 5)) AS k) o
    WHERE s.doc_id <> d.keeper
),
kept AS (
    SELECT t.doc_id, t.pos, t.tok
    FROM tok_t t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos
    WHERE c.pos IS NULL
),
reb AS (
    SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
           CAST(count(*) AS BIGINT) AS n_tokens_kept
    FROM kept GROUP BY doc_id
)
SELECT w.doc_id,
       coalesce(r.clean_text, '') AS clean_text,
       CAST(coalesce(r.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept,
       CAST(len(w.ws) - coalesce(r.n_tokens_kept, 0) AS BIGINT) AS n_tokens_removed
FROM ws_t w LEFT JOIN reb r USING (doc_id)
""",
)
def dedup_span_rewrite_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup WITH document rewrite (Lee et al. 2022):
    each cross-doc duplicated 5-token span survives only in its
    smallest-id document; every other occurrence is deleted and the
    texts re-assembled. duplicated_spans detects; this one actually
    produces the cleaned corpus."""
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import (
        span_dedup_rewrite,
    )

    return span_dedup_rewrite(_docs(spark, sf_dir))


@register(
    "schema_evolution_read",
    """
SELECT doc_id, lang, CAST(NULL AS VARCHAR) AS source FROM documents
UNION ALL
SELECT doc_id, CAST(NULL AS VARCHAR) AS lang, source FROM documents
""",
)
def schema_evolution_read_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution at the source: two parquet batches written
    with DIFFERENT schemas (an early pipeline wrote (doc_id, lang),
    a later one (doc_id, source)) read back as ONE frame via
    mergeSchema — each batch's missing columns surface as NULLs.
    The oracle mirrors the union-with-NULL-fill semantics exactly."""
    import tempfile

    out = tempfile.mkdtemp(prefix="schema_evo_") + "/docs"
    docs = _docs(spark, sf_dir)
    docs.select("doc_id", "lang").write.mode("overwrite").parquet(out + "/batch=1")
    docs.select("doc_id", "source").write.mode("append").parquet(out + "/batch=2")
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(out)
        .select("doc_id", "lang", "source")
    )


@register(
    "winsorize_chars",
    """
WITH bounds AS (
    SELECT lang,
           round(quantile_cont(n_chars, 0.05), 6) AS lo,
           round(quantile_cont(n_chars, 0.95), 6) AS hi
    FROM documents GROUP BY lang
)
SELECT d.doc_id, d.lang, d.n_chars,
       round(least(greatest(CAST(d.n_chars AS DOUBLE), b.lo), b.hi), 6) AS clipped_chars
FROM documents d JOIN bounds b ON d.lang = b.lang
""",
)
def winsorize_chars_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (outlier clipping to per-group p05/p95) — the
    data-cleaning step before length-sensitive training statistics.
    The per-group bounds frame is tiny (one row per lang) and
    broadcasts; the clip itself is a narrow map."""
    docs = _docs(spark, sf_dir)
    bounds = docs.groupBy("lang").agg(
        F.round(F.expr("percentile(n_chars, 0.05)"), 6).alias("lo"),
        F.round(F.expr("percentile(n_chars, 0.95)"), 6).alias("hi"),
    )
    return docs.join(F.broadcast(bounds), "lang").select(
        "doc_id",
        "lang",
        "n_chars",
        F.round(
            F.least(F.greatest(F.col("n_chars").cast("double"), F.col("lo")), F.col("hi")),
            6,
        ).alias("clipped_chars"),
    )


@register(
    "quality_quarantine",
    f"""
WITH t AS (
    SELECT doc_id, text, n_chars, length(text) AS n,
           CAST(length(text) AS DOUBLE) AS nd,
           {_SQL_TOKENS} AS ws
    FROM documents
), m AS (
    SELECT doc_id, n_chars, n,
           round(CASE WHEN nd = 0 THEN NULL
                 ELSE (nd - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))) / nd END, 6)
               AS punct_ratio,
           round(CASE WHEN len(ws) = 0 THEN NULL
                 ELSE CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
                      / len(ws) END, 6) AS stopword_ratio
    FROM t
)
SELECT CASE WHEN n IS NULL OR n = 0 THEN 'empty'
            WHEN n < 60 THEN 'too_short'
            WHEN round(1.0 - coalesce(punct_ratio, 1.0) + coalesce(stopword_ratio, 0.0), 6) < 1.04
                THEN 'low_quality'
            ELSE 'ok' END AS reject_reason,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM m GROUP BY 1
""",
)
def quality_quarantine_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter quality gate: every doc is routed to exactly one
    lane — 'empty' / 'too_short' / 'low_quality' (composite score
    below threshold) / 'ok' — and the per-lane summary is emitted.
    The training pipeline keeps the 'ok' lane; the quarantine lanes
    keep provenance for re-ingestion. One scan, one agg shuffle."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import quality_score

    scored = quality_score(_docs(spark, sf_dir))
    reason = (
        F.when(
            F.col("text").isNull() | (F.length("text") == 0), F.lit("empty")
        )
        .when(F.length("text") < 60, F.lit("too_short"))
        .when(F.col("quality_score") < 1.04, F.lit("low_quality"))
        .otherwise(F.lit("ok"))
    )
    return (
        scored.select(reason.alias("reject_reason"), "n_chars")
        .groupBy("reject_reason")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


_PRICE_BANDS = [
    ("budget", 0.0, 50_000.0),
    ("standard", 50_000.0, 150_000.0),
    ("premium", 150_000.0, 300_000.0),
    ("luxury", 300_000.0, 1e18),
]


@register(
    "orders_price_band_join",
    "WITH bands(band, lo, hi) AS (VALUES "
    + ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _PRICE_BANDS)
    + """)
SELECT b.band, count(*) AS n_orders,
       CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
FROM orders o JOIN bands b
  ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY b.band
""",
)
def orders_price_band_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join against a band dimension: the fact side streams, the
    tiny band table broadcasts, and the inequality predicate evaluates
    in the broadcast nested-loop — the standard banding shape (each
    fact row matches exactly one band, so output stays linear). At a
    100 TB fact table this is a narrow scan + one agg shuffle; a
    non-broadcastable range join would instead want bucketed range
    partitioning."""
    orders = read_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(_PRICE_BANDS, "band string, lo double, hi double")
    return (
        orders.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("revenue"),
        )
    )


@register(
    "event_type_islands",
    """
WITH seq AS (
    SELECT user_id, event_type, ts,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         - row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)
           AS grp
    FROM events
)
SELECT user_id, event_type,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS run_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS run_end,
       count(*) AS n_events
FROM seq GROUP BY user_id, event_type, grp
""",
)
def event_type_islands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: collapse each user's CONSECUTIVE same-type
    events into runs via the row_number-difference trick — two windows
    sharing one (user) shuffle, then a hash agg. The classic SQL-hard
    sessionization primitive, fully native."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.withColumn(
        "grp", F.row_number().over(w_all) - F.row_number().over(w_type)
    )
    return seq.groupBy("user_id", "event_type", "grp").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("run_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("run_end"),
        F.count("*").alias("n_events"),
    ).drop("grp")


@register(
    "funnel_conversion",
    """
WITH per_user AS (
    SELECT user_id,
           min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
    FROM events GROUP BY user_id
),
clicks AS (
    SELECT p.user_id, min(e.ts) AS t_click
    FROM per_user p JOIN events e ON e.user_id = p.user_id
    WHERE e.event_type = 'click' AND e.ts > p.t_view
    GROUP BY p.user_id
),
purchases AS (
    SELECT c.user_id, min(e.ts) AS t_purchase
    FROM clicks c JOIN events e ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c.t_click
    GROUP BY c.user_id
)
SELECT 'view' AS stage, count(t_view) AS n_users FROM per_user
UNION ALL
SELECT 'click_after_view' AS stage, count(*) AS n_users FROM clicks
UNION ALL
SELECT 'purchase_after_click' AS stage, count(*) AS n_users FROM purchases
""",
)
def funnel_conversion_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> first click after it ->
    first purchase after that), the product-analytics staple: three
    stage frames chained on user equi-joins, each one hash agg."""
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .join(per_user, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        per_user.agg(
            F.lit("view").alias("stage"), F.count("t_view").alias("n_users")
        )
        .unionByName(
            clicks.agg(
                F.lit("click_after_view").alias("stage"),
                F.count("*").alias("n_users"),
            )
        )
        .unionByName(
            purchases.agg(
                F.lit("purchase_after_click").alias("stage"),
                F.count("*").alias("n_users"),
            )
        )
    )


_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"]


@register(
    "column_profile_orders",
    "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS column_name,
       CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_value,
       CAST(max({c}) AS VARCHAR) AS max_value
FROM orders"""
        for c in _PROFILE_COLS
    ),
)
def column_profile_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling operator (pipeline observability): per-column
    null count, distinct count, min/max — typed aggs per column,
    stringified for the uniform report schema. One scan feeds every
    branch; at scale swap count(DISTINCT) for approx_count_distinct."""
    orders = read_table(spark, sf_dir, "orders")
    out = None
    for c in _PROFILE_COLS:
        prof = orders.agg(
            F.lit(c).alias("column_name"),
            (F.count(F.lit(1)) - F.count(c)).alias("n_nulls"),
            F.countDistinct(c).alias("n_distinct"),
            F.min(c).cast("string").alias("min_value"),
            F.max(c).cast("string").alias("max_value"),
        )
        out = prof if out is None else out.unionByName(prof)
    return out


@register(
    "bucketed_join_revenue",
    """
SELECT c_mktsegment,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS rev
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c_mktsegment
""",
)
def bucketed_join_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact-fact join via bucketed tables: both sides are
    written bucketBy(8) + sortBy on the join key, so the sort-merge
    join needs ZERO exchange — the pre-partitioning pattern for joins
    repeated across a 100 TB pipeline (amortize one shuffle at write
    time, join shuffle-free forever after). The oracle checks values
    against the plain join; tests/test_bucketing.py pins the no-shuffle
    plan."""
    import shutil

    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    try:
        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix(
            "file:"
        )
        for tbl in ("orders_rb", "customer_rb"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            shutil.rmtree(f"{wh}/{tbl}", ignore_errors=True)
        orders.write.mode("overwrite").bucketBy(8, "o_custkey").sortBy(
            "o_custkey"
        ).saveAsTable("orders_rb")
        customer.write.mode("overwrite").bucketBy(8, "o_custkey").sortBy(
            "o_custkey"
        ).saveAsTable("customer_rb")
        left = spark.table("orders_rb").hint("merge")
        right = spark.table("customer_rb")
    except Exception:  # noqa: BLE001 — unwritable warehouse: same values, plain join
        left, right = orders, customer
    return (
        left.join(right, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("rev")
        )
    )


@register(
    "multimodal_audio_windows",
    """
WITH w AS (
    SELECT doc_id,
           CAST(unnest(range(0, CAST(ceil(length(text) / 64.0) AS INT))) AS INT) AS window_index,
           text
    FROM documents WHERE length(text) > 0
)
SELECT doc_id, window_index,
       CAST(window_index * 64 AS BIGINT) AS start_offset,
       CAST(length(substring(text, window_index * 64 + 1, 64)) AS INT) AS n_samples,
       round(list_sum(list_transform(string_split(substring(text, window_index * 64 + 1, 64), ''),
                 c -> CAST(ord(c) AS BIGINT)))
             / CAST(length(substring(text, window_index * 64 + 1, 64)) AS DOUBLE), 6)
           AS mean_amplitude
FROM w
""",
)
def multimodal_audio_windows_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-rate sample windowing + per-window amplitude feature."""
    from calculate_file_content_size_for_vector_db_spark.operators.multimodal import audio_windows

    return audio_windows(_docs(spark, sf_dir))


@register(
    "multimodal_phash_dedup",
    """
WITH codes_t AS (
    SELECT doc_id,
           list_transform(string_split(text, ''), ch -> CAST(ord(ch) AS BIGINT)) AS codes,
           CAST(length(text) AS BIGINT) AS ln
    FROM documents
),
h AS (
    SELECT doc_id,
           CASE WHEN ln = 0 THEN 0
                ELSE CAST(list_sum(list_transform(range(0, 12), b ->
                    CASE WHEN ((b + 1) * ln) // 12 - (b * ln) // 12 > 0
                          AND list_sum(list_slice(codes, (b * ln) // 12 + 1, ((b + 1) * ln) // 12))
                              / CAST(((b + 1) * ln) // 12 - (b * ln) // 12 AS DOUBLE)
                              > list_sum(codes) / CAST(ln AS DOUBLE)
                         THEN (1::BIGINT << CAST(b AS INT)) ELSE 0::BIGINT END)) AS BIGINT)
           END AS ahash
    FROM codes_t
)
SELECT ahash, CAST(min(doc_id) AS BIGINT) AS keeper_id, count(*) AS dup_count
FROM h GROUP BY ahash HAVING count(*) > 1
""",
)
def multimodal_phash_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup (LAION-style): average-hash over the
    decoded sample stream (fake decode: code points stand in for
    pixels, per the module contract), then one hash-agg bucketing on
    the full 12-bit hash — the dedup_semantic_pq shape applied to the
    multimodal column, no pairwise stage."""
    from calculate_file_content_size_for_vector_db_spark.operators.multimodal import phash_dedup

    return phash_dedup(_docs(spark, sf_dir))


@register(
    "multimodal_resize",
    """
SELECT doc_id,
       CAST(64 AS INT) AS width,
       CAST(64 AS INT) AS height,
       CAST(length(text) % 3 + 1 AS INT) AS channels,
       CAST(length(text) AS BIGINT) AS n_bytes_in,
       CAST(64 * 64 * (length(text) % 3 + 1) AS BIGINT) AS n_bytes_out
FROM documents
""",
)
def multimodal_resize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize plumbing (the last verb of the multimodal
    north-star list: decode / feature-extract / RESIZE / frame-sample):
    Arrow-batched mapInPandas over the binary column, deterministic
    fake decode so the metadata is oracle-checkable — the fixture
    payload is UTF-8 of ASCII text, so byte length == length(text) on
    the SQL side."""
    from calculate_file_content_size_for_vector_db_spark.operators.multimodal import (
        resize_images,
        text_as_binary,
    )

    return resize_images(text_as_binary(_docs(spark, sf_dir)))


@register(
    "rag_ingest",
    f"""
WITH {_SQL_CHUNKS},
fp AS (
    SELECT doc_id, chunk_index,
           CASE WHEN content IS NULL OR length(content) = 0 THEN 0
                ELSE list_reduce(
                    list_transform(string_split(content, ''), c -> CAST(ord(c) AS BIGINT)),
                    (a, b) -> (a * 31 + b) % 1000000007) END AS h
    FROM chunk_sized
),
emb AS (
    SELECT doc_id, chunk_index,
           list_transform(range(0, 64),
               j -> ((h + j * 40503) * 2654435761 % 1000003) / 1000003.0 - 0.5) AS v
    FROM fp
)
SELECT doc_id, chunk_index,
       CAST(list_sum(list_transform(range(0, 16), p ->
           CASE WHEN list_dot_product(v, list_transform(range(0, 64), j ->
               ((j + p * 64) * 2654435761 % 1000003) / 1000003.0 - 0.5)) > 0
           THEN (1::BIGINT << CAST(p AS INT)) ELSE 0::BIGINT END)) AS BIGINT) AS bucket,
       CAST(to_json(list_transform(v, x ->
           CAST(round(round(x, 6) * 1000000.0) AS BIGINT))) AS VARCHAR) AS embedding_r
FROM emb
""",
)
def rag_ingest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vector-db ingestion pipeline the reference sizes capacity
    FOR (README.md:4-8), composed end-to-end as one lazy graph:
    chunk -> preprocess -> embed (deterministic hash projection
    standing in for a model encoder) -> LSH index bucket. Everything
    is a narrow map after the chunk explode — zero joins, zero
    Python, one shuffle-free scan at 100 TB."""
    from calculate_file_content_size_for_vector_db_spark.operators.embed import (
        rag_ingest_frame,
    )

    chunks = _pipe(spark).chunks(_docs(spark, sf_dir)).select(
        "doc_id", "chunk_index", "content"
    )
    # Fixed-point-scale + JSON-serialize the embedding so the driver's
    # pandas canonicalization compares a scalar string (embedding_quantize
    # pattern); the streaming path keeps the raw array from the frame.
    return rag_ingest_frame(chunks).select(
        "doc_id",
        "chunk_index",
        "bucket",
        F.to_json(
            F.transform("embedding_r", lambda x: F.round(x * F.lit(1000000.0)).cast("long"))
        ).alias("embedding_r"),
    )


@register(
    "events_interval_join",
    """
SELECT a.user_id, a.event_id AS a_event, b.event_id AS b_event,
       strftime(a.ts, '%Y-%m-%d %H:%M:%S') AS a_time,
       strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS b_time
FROM events a JOIN events b ON a.user_id = b.user_id
WHERE a.event_type = 'click' AND b.event_type = 'purchase'
  AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 3600 SECONDS
""",
)
def events_interval_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click -> purchase attribution within an hour: the batch face of
    the watermarked stream-stream interval join (streaming/windows.py
    interval_join; true-streaming smoke in tests/test_streaming.py)."""
    from calculate_file_content_size_for_vector_db_spark.streaming.windows import interval_join

    ev = _events(spark, sf_dir)
    return interval_join(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
        max_gap_seconds=3600,
    )


@register(
    "sim_topk_lsh_multiprobe",
    f"""
WITH {_SQL_EMB},
{_SQL_LSH_BUCKETS},
scored AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM e a
    JOIN buck ba ON a.vec_id = ba.vec_id
    JOIN buck bb ON (ba.bucket = bb.bucket OR bit_count(xor(ba.bucket, bb.bucket)) = 1)
    JOIN e b ON b.vec_id = bb.vec_id
    WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
    FROM scored
) WHERE rank <= 5
""",
)
def sim_topk_lsh_multiprobe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe ANN (own bucket + every 1-bit-flip bucket)."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        topk_lsh_multiprobe,
    )

    emb = _emb(spark, sf_dir)
    return topk_lsh_multiprobe(emb, emb.where(F.col("vec_id") < 10), k=5)


@register(
    "json_source",
    "SELECT doc_id, lang, source, n_chars FROM documents",
)
def json_source_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source round-trip: write the documents metadata as
    JSON, read it back with an explicit schema. The oracle compares
    VALUES against the original table, so the round-trip must be
    lossless — a stronger check than the rows-only csv_sink."""
    import tempfile

    out = tempfile.mkdtemp(prefix="json_source_") + "/docs"
    _docs(spark, sf_dir).select("doc_id", "lang", "source", "n_chars").write.mode(
        "overwrite"
    ).json(out)
    return spark.read.schema(
        "doc_id bigint, lang string, source string, n_chars bigint"
    ).json(out)


@register(
    "partitioned_source_prune",
    "SELECT doc_id, n_chars FROM documents WHERE lang = 'en'",
)
def partitioned_source_prune_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned sink + partition-pruned scan: write documents
    partitioned by lang, read back filtering one partition. At scale
    the filter prunes directories before any file is opened
    (PartitionFilters in the scan; pinned by tests/test_plans.py)."""
    import tempfile

    out = tempfile.mkdtemp(prefix="part_source_") + "/docs"
    _docs(spark, sf_dir).write.mode("overwrite").partitionBy("lang").parquet(out)
    return (
        spark.read.parquet(out)
        .where(F.col("lang") == "en")
        .select("doc_id", "n_chars")
    )


# ---------------------------------------------------------------------------
# TPC-H completion: the 12 query shapes not yet covered (q2, q8, q9,
# q11, q12, q13, q15, q16, q17, q20, q21, q22), adapted to the fixture
# schema where TPC-H columns don't exist (no partsupp table, no
# l_commitdate/l_receiptdate/l_shipmode, no c_phone): part-supplier
# economics derive from lineitem, "late" predicates from shipdate, and
# q22's phone-prefix grouping becomes nation grouping. Together with
# q1/q3/q5/q6/q7/q10/q14/q18/q19 and late_shipment_orders (the q4
# EXISTS shape), all 22 TPC-H query shapes are registered.
# ---------------------------------------------------------------------------


def _d184(c):
    """DECIMAL(18,4) operand for exact cross-engine revenue sums."""
    return F.col(c).cast("decimal(18,4)")


_DISC_REV = None  # revenue expr built inline per query (column names vary)


@register(
    "tpch_q2",
    """
WITH unit AS (
    SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS cost
    FROM lineitem GROUP BY l_partkey, l_suppkey
),
eligible AS (
    SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name, cost
    FROM unit
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE p_type = 'SMALL' AND r_name = 'EUROPE'
),
ranked AS (
    SELECT *, min(cost) OVER (PARTITION BY p_partkey) AS min_cost FROM eligible
)
SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, p_name,
       round(cost, 6) AS unit_cost
FROM ranked WHERE cost = min_cost
""",
)
def tpch_q2_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: minimum-cost supplier per part within a region.
    The partsupp table doesn't exist in the fixtures, so unit cost is
    derived from lineitem (min observed extendedprice/quantity per
    part-supplier pair) — same correlated-min query shape. The min is
    decorrelated as a window over the already-filtered eligible set, so
    the heavy lineitem aggregation happens once; part/supplier/nation/
    region are all broadcast. Ties at the min keep every tied supplier,
    as in TPC-H."""
    from pyspark.sql import Window

    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").where(F.col("p_type") == "SMALL")
    sup = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    unit = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost")
    )
    eligible = (
        unit.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
    )
    ranked = eligible.withColumn(
        "min_cost", F.min("cost").over(Window.partitionBy("p_partkey"))
    )
    return ranked.where(F.col("cost") == F.col("min_cost")).select(
        F.round("s_acctbal", 2).alias("s_acctbal"),
        "s_name",
        "n_name",
        "p_partkey",
        "p_name",
        F.round("cost", 6).alias("unit_cost"),
    )


@register(
    "tpch_q8",
    """
WITH flat AS (
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS volume,
           ns.n_name AS supp_nation
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation nc ON nc.n_nationkey = c_nationkey
    JOIN region r ON r.r_regionkey = nc.n_regionkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ns ON ns.n_nationkey = s_nationkey
    WHERE p_type = 'PROMO' AND r.r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
FROM flat GROUP BY o_year
""",
)
def tpch_q8_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one nation's fraction of
    yearly revenue for a part type sold into a region. Star-join chain
    with every dimension broadcast; the only shuffle is the final
    2-group aggregation. The share is a conditional-sum over the same
    rows, so one pass computes numerator and denominator."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    cust = read_table(spark, sf_dir, "customer")
    sup = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nc = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    volume = (_d184("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _d184("l_discount"))).alias(
        "volume"
    )
    flat = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nc), F.col("nc_key") == F.col("c_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("nc_region"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(ns), F.col("ns_key") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"), volume, "supp_nation"
        )
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return flat.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(zero)).cast(
                "double"
            )
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


@register(
    "tpch_q9",
    """
WITH flat AS (
    SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
           CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
             - CAST(p_retailprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4)) * CAST(0.1 AS DECIMAL(18,4)) AS amount
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%widget%'
)
SELECT nation, o_year, CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
FROM flat GROUP BY nation, o_year
""",
)
def tpch_q9_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit by nation and year). The fixture
    has no partsupp.ps_supplycost, so cost is proxied as 10% of
    p_retailprice per unit — the query shape (substring part filter,
    profit expression, two-key group) is unchanged. All decimal
    arithmetic so the cross-engine sums are exact."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    sup = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    amount = (
        _d184("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _d184("l_discount"))
        - _d184("p_retailprice") * _d184("l_quantity") * F.lit(0.1).cast("decimal(18,4)")
    ).alias("amount")
    flat = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("o_year"),
            amount,
        )
    )
    return flat.groupBy("nation", "o_year").agg(
        F.round(F.sum("amount"), 2).cast("double").alias("sum_profit")
    )


@register(
    "tpch_q11",
    """
WITH value_t AS (
    SELECT l_partkey,
           sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS val
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = 'EUROPE'
    GROUP BY l_partkey
)
SELECT l_partkey, CAST(round(val, 2) AS DOUBLE) AS part_value
FROM value_t
WHERE CAST(val AS DOUBLE) > 0.001 * (SELECT CAST(sum(val) AS DOUBLE) FROM value_t)
""",
)
def tpch_q11_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock): per-part value restricted to one
    region's suppliers, kept only when above a fraction of the grand
    total — the grand total is a scalar subquery over the SAME
    aggregate. The per-part aggregate is computed once and reused for
    both branches (persist), with the 1-row total broadcast back — no
    second scan of lineitem and no shuffle for the filter."""
    li = read_table(spark, sf_dir, "lineitem")
    sup = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    value_t = (
        li.join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_d184("l_extendedprice")).alias("val"))
        .persist()
    )
    total = value_t.agg(F.sum("val").cast("double").alias("grand_total"))
    return (
        value_t.crossJoin(F.broadcast(total))
        .where(F.col("val").cast("double") > 0.001 * F.col("grand_total"))
        .select("l_partkey", F.round("val", 2).cast("double").alias("part_value"))
    )


@register(
    "tpch_q12",
    """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
""",
)
def tpch_q12_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes vs priority): the fixture has no
    l_shipmode, so l_returnflag is the grouping dimension. The point of
    the shape survives: fact-to-fact join with the date filter pushed
    into the lineitem scan, then conditional counts in one pass."""
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = read_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "tpch_q4",
    """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
""",
)
def tpch_q4_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking), completing the
    q1-q22 set: orders from one quarter counted per priority when at
    least one of their lineitems was LATE. The fixture has no
    l_commitdate/l_receiptdate, so late = shipped more than 60 days
    after the order date — the correlated-EXISTS shape survives
    exactly: a LEFT SEMI join on the order key with the lateness
    predicate inside the join condition (each order counted once no
    matter how many late lines), date filter pushed into the orders
    scan, then a tiny priority-keyed count."""
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = read_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("order_count")
    )


@register(
    "tpch_q13",
    """
WITH per_cust AS (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders
      ON o_custkey = c_custkey AND o_orderpriority <> '5-LOW'
    GROUP BY c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
""",
)
def tpch_q13_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): left outer join
    with the extra predicate INSIDE the join condition (customers with
    zero qualifying orders must survive with count 0), then a
    distribution-of-counts double aggregation. count(o_orderkey) counts
    non-null matches only — the left-join NULL row contributes 0."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("o_orderpriority") != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").cast("bigint").alias("custdist"))


@register(
    "tpch_q15",
    """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(round(total_revenue, 2) AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
)
def tpch_q15_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarterly revenue view, max-revenue
    scalar subquery, equality join back — ties all survive. The
    revenue aggregate is persisted and reused for both the max and the
    filter; decimal sums make the cross-engine equality exact (a
    floating-point == here would be flaky)."""
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    sup = read_table(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                _d184("l_extendedprice")
                * (F.lit(1).cast("decimal(18,4)") - _d184("l_discount"))
            ).alias("total_revenue")
        )
        .persist()
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue", 2).cast("double").alias("total_revenue"),
        )
    )


@register(
    "tpch_q16",
    """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def tpch_q16_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (supplier count by part attributes): the part-supplier
    relation comes from lineitem (no partsupp in the fixtures), the
    complaints exclusion becomes negative-balance suppliers. NOT IN is
    a broadcast anti-join (the excluded set is tiny); the distinct
    count shuffles once on the group keys."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    bad_sup = read_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad_sup), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


@register(
    "tpch_q17",
    """
WITH avg_qty AS (
    SELECT l_partkey AS ap_key, 0.2 * avg(l_quantity) AS qty_threshold
    FROM lineitem GROUP BY l_partkey
)
SELECT CAST(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0, 2) AS DOUBLE) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN avg_qty ON ap_key = l_partkey
WHERE p_brand = 'Brand#5' AND l_quantity < qty_threshold
""",
)
def tpch_q17_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity revenue): the correlated per-part
    average-quantity subquery, decorrelated as an aggregate joined back
    on the part key — exactly what Catalyst's subquery rewrite does.
    Quantities are integer-valued doubles so the avg is exact across
    engines; the revenue sum is decimal, converted to double before the
    final /7 so both engines do the identical IEEE division."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#5")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(avg_qty, F.col("ap_key") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum(_d184("l_extendedprice")).cast("double") / 7.0, 2)
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "tpch_q20",
    """
WITH shipped AS (
    SELECT l_suppkey AS sk, sum(l_quantity) AS qty
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE 'small%'
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_name, n_name, round(qty, 6) AS shipped_qty
FROM supplier
JOIN shipped ON sk = s_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE qty > 1.5 * (SELECT avg(qty) FROM shipped)
""",
)
def tpch_q20_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (suppliers with excess stock of a part subset):
    partsupp.ps_availqty doesn't exist, so "stock" is the quantity
    actually shipped of name-filtered parts in the window, and the
    threshold is 1.5x the cross-supplier average (a scalar over the
    same aggregate, broadcast back). Same nested-aggregate + semi-join
    shape; quantity sums are integer-valued doubles, exact in both
    engines."""
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    part = read_table(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    sup = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    shipped = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.col("l_suppkey").alias("sk"))
        .agg(F.sum("l_quantity").alias("qty"))
        .persist()
    )
    avg_qty = shipped.agg(F.avg("qty").alias("avg_qty"))
    return (
        shipped.crossJoin(F.broadcast(avg_qty))
        .where(F.col("qty") > 1.5 * F.col("avg_qty"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("sk"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_name", "n_name", F.round("qty", 6).alias("shipped_qty"))
    )


@register(
    "tpch_q21",
    """
WITH l1 AS (
    SELECT l_orderkey, l_suppkey FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_returnflag = 'R' AND o_orderstatus = 'F'
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM l1
JOIN supplier ON s_suppkey = l_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
)
AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
)
GROUP BY s_name
""",
)
def tpch_q21_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): R-flagged
    lines in finished multi-supplier orders where no OTHER supplier
    also flagged R. The EXISTS / NOT EXISTS pair is computed as ONE
    per-order aggregate (distinct suppliers, distinct R-suppliers)
    joined back — two self-semi-joins collapse into a single shuffle
    of lineitem. l1's supplier is R, so "no other R supplier" is
    exactly n_r_supp == 1, and "another supplier exists" is
    n_supp > 1."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    sup = read_table(spark, sf_dir, "supplier")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_r_supp"),
    )
    l1 = li.where(F.col("l_returnflag") == "R").join(
        orders, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
    )
    return (
        l1.join(per_order, "l_orderkey")
        .where((F.col("n_supp") > 1) & (F.col("n_r_supp") == 1))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
    )


@register(
    "tpch_q22",
    """
WITH avg_bal AS (
    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS ab
    FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT ab FROM avg_bal)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey
""",
)
def tpch_q22_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-sales opportunity): above-average-balance
    customers with no recent orders, grouped by nation (the fixture has
    no c_phone for prefix grouping; every fixture customer has SOME
    order, so the anti-join is against orders since 2000 to stay
    non-trivial). The global average is an exact decimal sum divided
    once as a double; the NOT EXISTS is a broadcast anti-join against
    the date-filtered order keys."""
    cust = read_table(spark, sf_dir, "customer")
    recent = (
        read_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_d184("c_acctbal")).cast("double") / F.count("*")).alias("ab")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("bigint").alias("numcust"),
            F.round(F.sum(_d184("c_acctbal")), 2).cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Training-data curation surface (operators/curation.py): PII
# redaction, Gopher-style quality rules, sequence packing, embedding
# quantization — the corpus-preparation steps between ingestion and
# training-shard writing.
# ---------------------------------------------------------------------------

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


@register(
    "pii_redact",
    f"""
WITH pii AS (
    SELECT doc_id,
           text || ' Contact: user' || CAST(doc_id AS VARCHAR) || '@mail.example.com or 555-'
                || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
                || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 3) % 256 AS VARCHAR) AS t
    FROM documents
),
st AS (
    SELECT doc_id, t, regexp_replace(t, '{_PII_EMAIL}', '[EMAIL]', 'g') AS t1 FROM pii
),
st2 AS (
    SELECT doc_id, t, t1, regexp_replace(t1, '{_PII_PHONE}', '[PHONE]', 'g') AS t2 FROM st
)
SELECT doc_id,
       regexp_replace(t2, '{_PII_IP}', '[IP]', 'g') AS clean_text,
       CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(t1, '{_PII_PHONE}')) AS BIGINT) AS n_phone,
       CAST(len(regexp_extract_all(t2, '{_PII_IP}')) AS BIGINT) AS n_ip
FROM st2
""",
)
def pii_redact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over documents. The fixture text contains no real
    PII, so a deterministic contact line (email + phone + IP derived
    from doc_id) is appended first — the redactor is then exercised on
    every row, and the oracle builds the identical input. Map-only
    regexp pipeline, zero shuffles (operators/curation.py)."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import redact_pii

    d = F.col("doc_id")
    pii_text = F.concat(
        F.col("text"),
        F.lit(" Contact: user"),
        d.cast("string"),
        F.lit("@mail.example.com or 555-"),
        F.lpad((d % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad(((d * 7) % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."),
        (d % 256).cast("string"),
        F.lit("."),
        ((d * 3) % 256).cast("string"),
    )
    staged = _docs(spark, sf_dir).select("doc_id", pii_text.alias("pii_text"))
    return redact_pii(staged, text_col="pii_text")


@register(
    "gopher_quality",
    """
WITH ws_t AS (
    SELECT doc_id, text,
           list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '') AS ws
    FROM documents
),
feat AS (
    SELECT doc_id,
           len(ws) AS n_words,
           list_sum(list_transform(ws, w -> length(w))) AS word_chars,
           len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha,
           length(text) AS n_chars,
           length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS n_symbol,
           len(list_filter(ws, w -> list_contains(['the','and','of','to','a','in','is','it'], lower(w)))) AS stop_hits
    FROM ws_t
),
f2 AS (
    SELECT doc_id, n_words, n_chars, stop_hits,
           (n_chars IS NULL OR n_chars = 0 OR n_words = 0) AS empty,
           round(word_chars / CAST(n_words AS DOUBLE), 6) AS mean_word_len,
           round(n_alpha / CAST(n_words AS DOUBLE), 6) AS alpha_ratio,
           round(n_symbol / CAST(n_chars AS DOUBLE), 6) AS symbol_ratio
    FROM feat
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       CASE WHEN NOT empty THEN mean_word_len END AS mean_word_len,
       CASE WHEN NOT empty THEN alpha_ratio END AS alpha_ratio,
       CASE WHEN NOT empty THEN symbol_ratio END AS symbol_ratio,
       CAST(stop_hits AS BIGINT) AS stopword_hits,
       CASE WHEN empty THEN FALSE ELSE
           (n_words BETWEEN 20 AND 100000 AND mean_word_len BETWEEN 3.0 AND 12.0
            AND alpha_ratio >= 0.8 AND symbol_ratio <= 0.1 AND stop_hits >= 2) END AS keep
FROM f2
""",
)
def gopher_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule document quality gate (word count, mean word length,
    alpha-word ratio, symbol ratio, stopword floor) with per-rule
    features and the final keep verdict (operators/curation.py)."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import gopher_quality

    return gopher_quality(_docs(spark, sf_dir))


@register(
    "pack_sequences",
    """
WITH tok AS (
    SELECT doc_id, source,
           CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')) AS BIGINT) AS n_tokens
    FROM documents
),
packed AS (
    SELECT doc_id, source, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
    FROM tok
)
SELECT doc_id, source, n_tokens,
       CAST(floor(cum / 512.0) AS BIGINT) AS seq_id,
       cum % 512 AS seq_offset
FROM packed
""",
)
def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chop sequence packing into 512-token training
    sequences, parallel per source stream (operators/curation.py —
    the corpus-level lift of the reference's running chunk offset,
    pdf_reader.py:483-485)."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import pack_sequences

    return pack_sequences(_docs(spark, sf_dir), budget=512)


@register(
    "pack_sequences_salted",
    """
WITH tok AS (
    SELECT doc_id, source,
           CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')) AS BIGINT) AS n_tokens
    FROM documents
),
packed AS (
    SELECT doc_id, source, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
    FROM tok
)
SELECT doc_id, source, n_tokens,
       CAST(floor(cum / 512.0) AS BIGINT) AS seq_id,
       cum % 512 AS seq_offset
FROM packed
""",
)
def pack_sequences_salted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level salted packing (operators/curation.py): identical
    output to pack_sequences — the oracle IS the plain single-window
    formulation, so the driver hash-verifies the salted decomposition's
    equivalence — but the running-sum window runs per (stream,
    key-range substream), so parallelism is n_streams * n_salts tasks
    instead of being bounded by stream cardinality (a 3-source 100 TB
    corpus packs on 3 cores without this)."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import (
        pack_sequences_salted,
    )

    return pack_sequences_salted(_docs(spark, sf_dir), budget=512, n_salts=8)


@register(
    "decontaminate",
    """
WITH toks AS (
    SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '') AS ws
    FROM documents
),
sh AS (
    SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 3),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]))) AS g
    FROM toks WHERE len(ws) >= 5
)
SELECT t.doc_id,
       CAST(count(DISTINCT t.g) AS BIGINT) AS n_hits,
       CAST(count(DISTINCT b.doc_id) AS BIGINT) AS n_bench_docs
FROM sh t JOIN sh b ON t.g = b.g AND t.doc_id % 5 <> 0 AND b.doc_id % 5 = 0
GROUP BY t.doc_id
""",
)
def decontaminate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs (doc_id % 5 != 0)
    sharing any 5-gram with the pseudo-benchmark split (doc_id % 5 ==
    0), with contaminated-n-gram and benchmark-doc counts. Shingle
    equi-join, never doc-pairwise (operators/curation.py)."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import decontaminate

    docs = _docs(spark, sf_dir)
    train = docs.where(F.col("doc_id") % 5 != 0)
    bench = docs.where(F.col("doc_id") % 5 == 0)
    return decontaminate(train, bench, n=5)


@register(
    "doc_repetition",
    """
WITH toks AS (
    SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '') AS ws
    FROM documents
),
g AS (
    SELECT doc_id,
           CASE WHEN len(ws) >= 3 THEN list_transform(range(1, len(ws) - 1),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) ELSE [] END AS grams
    FROM toks
)
SELECT doc_id,
       CAST(len(grams) AS BIGINT) AS n_grams,
       CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
       CASE WHEN len(grams) > 0 THEN round(1.0 - len(list_distinct(grams)) / CAST(len(grams) AS DOUBLE), 6) END AS dup_ratio
FROM g
""",
)
def doc_repetition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document duplicate-3-gram fraction (Gopher repetition
    rule family) — map-only array arithmetic (operators/curation.py)."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import (
        repetition_ratio,
    )

    return repetition_ratio(_docs(spark, sf_dir), n=3)


@register(
    "stratified_sample",
    """
SELECT doc_id, lang, bucket FROM (
    SELECT doc_id, lang,
           CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 100 AS bucket
    FROM documents
) WHERE bucket < CASE WHEN lang = 'en' THEN 50 ELSE 20 END
""",
)
def stratified_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing via deterministic per-language sampling: keep 50%
    of English, 20% of everything else, by md5 bucket — stable under
    reshuffling and incremental loads, no shuffle
    (operators/curation.py)."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import (
        stratified_sample,
    )

    return stratified_sample(_docs(spark, sf_dir), rates={"en": 50}, default_rate=20)


@register(
    "embedding_quantize",
    """
WITH s AS (
    SELECT vec_id, embedding,
           list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS sc
    FROM embeddings
)
SELECT vec_id, round(sc, 6) AS scale,
       CASE WHEN sc > 0 THEN
           CAST(to_json(list_transform(embedding, x -> CAST(round(127.0 * CAST(x AS DOUBLE) / sc) AS INT))) AS VARCHAR)
       END AS q_embedding
FROM s
""",
)
def embedding_quantize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column with a
    per-vector scale (operators/curation.py). The int array is
    JSON-serialized on both sides so the value compare is exact and
    representation-independent."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import (
        quantize_embeddings,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    q = quantize_embeddings(emb)
    return q.select("vec_id", "scale", F.to_json("q_embedding").alias("q_embedding"))


# ---------------------------------------------------------------------------
# Round-3 additions: entropy quality scoring, SCD2 dimension history,
# deterministic sharded corpus shuffle, ORC source round-trip.
# ---------------------------------------------------------------------------


@register(
    "char_entropy",
    """
WITH ch AS (
    SELECT doc_id, unnest(string_split(text, '')) AS ch
    FROM documents WHERE length(text) > 0
),
cnt AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY doc_id, ch),
ent AS (
    SELECT doc_id,
           round(log2(CAST(sum(c) AS DOUBLE))
                 - sum(c * log2(CAST(c AS DOUBLE))) / CAST(sum(c) AS DOUBLE), 6)
               AS char_entropy
    FROM cnt GROUP BY doc_id
)
SELECT d.doc_id, e.char_entropy FROM documents d LEFT JOIN ent e USING (doc_id)
""",
)
def char_entropy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-unigram Shannon entropy per document — the cheap
    gibberish/repetition quality signal (operators/textstats.py)."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import char_entropy

    return char_entropy(_docs(spark, sf_dir))


@register(
    "scd2_user_state",
    """
WITH ordered AS (
    SELECT user_id, event_type, ts, event_id,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
),
changes AS (
    SELECT user_id, event_type, ts, event_id FROM ordered
    WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type AS state,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                '%Y-%m-%d %H:%M:%S') AS valid_to
FROM changes
""",
)
def scd2_user_state_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension intervals from the event
    change stream (operators/relational.py scd2_history): per-user
    state with valid_from/valid_to, NULL valid_to = current."""
    from calculate_file_content_size_for_vector_db_spark.operators.relational import scd2_history

    return scd2_history(_events(spark, sf_dir))


@register(
    "dedup_semantic_append",
    f"""
WITH {_SQL_EMB},
{_sql_pq_chain(train_filter="vec_id % 7 <> 0")},
packed AS (
    SELECT vec_id, list(code ORDER BY sub) AS codes FROM codes GROUP BY vec_id
)
SELECT b.vec_id AS new_id, c.vec_id AS corpus_id
FROM packed b JOIN packed c ON b.codes = c.codes
WHERE b.vec_id % 7 = 0 AND c.vec_id % 7 <> 0
""",
)
def dedup_semantic_append_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SEMANTIC dedup — the embedding-tier member of the
    incremental family (pairs: dedup_incremental, bitmap:
    dedup_bloom_append, clusters: dedup_clusters_append, index:
    sim_ivf_append): PQ codebooks train ONCE on the base corpus and
    freeze in parquet; the base corpus's code table persists as the
    stored artifact; the daily batch encodes against the STORED
    codebooks (pq_encode's codebooks= hook — a pure assignment map,
    zero Lloyd lineage) and probes the stored code table with one
    equi-join on the m-code key. Batch-sized cost at any corpus size:
    the batch pays subvector split + assignment; the corpus appears
    only as its stored code table (SemDeDup at ingest time). The
    oracle trains its unrolled Lloyd chain on the base subset and
    encodes everything from scratch, so the hash pins the frozen-
    codebook equivalence AND both parquet seams (codebooks and code
    table round-trip)."""
    import tempfile

    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
    )

    emb = _emb(spark, sf_dir)
    base = emb.where(F.col("vec_id") % _INCR_BATCH_MOD != 0)
    batch = emb.where(F.col("vec_id") % _INCR_BATCH_MOD == 0)
    store = tempfile.mkdtemp(prefix="pq_append_")
    pq_codebooks(base).write.mode("overwrite").parquet(f"{store}/cb")
    cb = spark.read.parquet(f"{store}/cb")
    pq_encode(base, codebooks=cb).write.mode("overwrite").parquet(f"{store}/codes")
    stored = spark.read.parquet(f"{store}/codes")
    return (
        pq_encode(batch, codebooks=cb)
        .withColumnRenamed("vec_id", "new_id")
        .join(stored.withColumnRenamed("vec_id", "corpus_id"), "codes")
        .select("new_id", "corpus_id")
    )


@register(
    "scd2_temporal_join",
    """
WITH ordered AS (
    SELECT user_id, event_type, ts, event_id,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events WHERE event_type <> 'purchase'
),
changes AS (
    SELECT user_id, event_type, ts, event_id FROM ordered
    WHERE prev_type IS NULL OR prev_type <> event_type
),
hist AS (
    SELECT user_id, event_type AS state,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    '%Y-%m-%d %H:%M:%S') AS valid_to
    FROM changes
),
facts AS (
    SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts
    FROM events WHERE event_type = 'purchase'
)
SELECT f.event_id, f.user_id, f.ts, h.state
FROM facts f
LEFT JOIN hist h ON h.user_id = f.user_id
  AND f.ts >= h.valid_from AND (h.valid_to IS NULL OR f.ts < h.valid_to)
""",
)
def scd2_temporal_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join (relational.scd2_temporal_join): every
    purchase event picks up the SCD2 state the user was in AT THAT
    MOMENT — the dimension built from the non-purchase change stream,
    the fact stream joined on user_id with the validity range as a
    residual condition on the equi-join (never a range BNLJ). The
    as-was correctness op behind leakage-free feature joins: joining
    today's dimension row to yesterday's fact is label leakage;
    half-open intervals make the boundary deterministic in both
    engines (lexical == temporal for the shared timestamp format)."""
    from calculate_file_content_size_for_vector_db_spark.operators.relational import (
        scd2_history,
        scd2_temporal_join,
    )

    ev = _events(spark, sf_dir)
    dim = scd2_history(ev.where(F.col("event_type") != "purchase"))
    facts = ev.where(F.col("event_type") == "purchase")
    return scd2_temporal_join(facts, dim)


@register(
    "training_shard_order",
    """
WITH h AS (
    SELECT doc_id, md5('shuffle-seed-1|' || CAST(doc_id AS VARCHAR)) AS h
    FROM documents
)
SELECT doc_id, substring(h, 1, 2) AS shard,
       CAST(row_number() OVER (PARTITION BY substring(h, 1, 2) ORDER BY h, doc_id)
            AS BIGINT) AS shard_pos
FROM h
""",
)
def training_shard_order_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sharded corpus shuffle: (shard, shard_pos) define
    the training read order, reproducible across engines/runs, with
    per-shard windows instead of one global serial row_number
    (operators/curation.py training_shard_order)."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import (
        training_shard_order,
    )

    return training_shard_order(_docs(spark, sf_dir))


@register(
    "orc_source",
    "SELECT doc_id, lang, source, n_chars FROM documents",
)
def orc_source_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source round-trip (columnar sibling of json_source): write
    the documents metadata as ORC with Spark's native vectorized
    writer, read it back. Value-compared against the original table,
    so the round-trip must be lossless."""
    import tempfile

    out = tempfile.mkdtemp(prefix="orc_source_") + "/docs"
    _docs(spark, sf_dir).select("doc_id", "lang", "source", "n_chars").write.mode(
        "overwrite"
    ).orc(out)
    return spark.read.schema(
        "doc_id bigint, lang string, source string, n_chars bigint"
    ).orc(out)


# ---------------------------------------------------------------------------
# Round-6 extension surface (second wave): matryoshka prefix search,
# label propagation over the kNN graph, Count-Min heavy hitters,
# temperature mixing, readability, BPE pair mining, Z-order layout,
# embedding dimension profiling
# ---------------------------------------------------------------------------

_MAT_PREFIX = 16
_MAT_RERANK = 4


def _sql_matryoshka(k: int) -> str:
    """Prefix-dim shortlist + exact-rerank CTEs over `e`: `approx` is
    the top-``k`` (query_id, neighbor_id, cosine, rank) per query —
    mirrors operators/similarity.topk_matryoshka stage for stage."""
    return f"""
pshort AS (
    SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v[1:{_MAT_PREFIX}], b.v[1:{_MAT_PREFIX}]), 6) DESC,
                            b.vec_id) AS rn
        FROM e a, e b
        WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
    ) WHERE rn <= {_MAT_RERANK * k}
),
approx AS (
    SELECT query_id, neighbor_id, cosine, rank FROM (
        SELECT t.query_id, t.neighbor_id,
               round(list_cosine_similarity(a.v, b.v), 6) AS cosine,
               CAST(row_number() OVER (PARTITION BY t.query_id
                   ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC, t.neighbor_id)
                   AS INT) AS rank
        FROM pshort t
        JOIN e a ON a.vec_id = t.query_id
        JOIN e b ON b.vec_id = t.neighbor_id
    ) WHERE rank <= {k}
)
"""


@register(
    "sim_topk_matryoshka",
    f"""
WITH {_SQL_EMB},
{_sql_matryoshka(5)}
SELECT query_id, neighbor_id, cosine, rank FROM approx
""",
)
def sim_topk_matryoshka_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka (prefix-dimension) top-k: shortlist on the first 16
    of 64 dims (4x less data scanned — MRL-style embeddings make every
    prefix a usable embedding), exact rerank of the top-20 survivors.
    The training-free compressed-scan tier next to PQ (codebooks) and
    binary (sign bits)."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import topk_matryoshka

    emb = _emb(spark, sf_dir)
    return topk_matryoshka(
        emb, emb.where(F.col("vec_id") < 10), k=5, prefix=_MAT_PREFIX, rerank=_MAT_RERANK
    )


@register(
    "matryoshka_recall_at_10",
    f"""
WITH {_SQL_EMB},
{_sql_matryoshka(_RECALL_K)},
{_SQL_RECALL_TAIL}
""",
)
def matryoshka_recall_at_10_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the matryoshka prefix shortlist + exact rerank —
    joins the recall matrix as the eighth approximate tier; like the
    other candidate-pruned exact tiers it is monotone in the rerank
    multiplier."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        recall_vs_exact,
        topk_matryoshka,
    )

    emb, q, exact = _recall_queries(spark, sf_dir)
    return recall_vs_exact(
        exact,
        topk_matryoshka(emb, q, k=_RECALL_K, prefix=_MAT_PREFIX, rerank=_MAT_RERANK),
    )


_SQL_KNN_EDGES = """
knn AS (
    SELECT query_id AS src, neighbor_id AS dst FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC, b.vec_id)
                   AS rank
        FROM e a, e b WHERE a.vec_id <> b.vec_id
    ) WHERE rank <= 3
)
"""


def _sql_label_prop_chain(iters: int = 2) -> str:
    """Unrolled label-propagation CTEs over `knn` + `seeds` + `nodes`
    — mirrors operators/graph.label_propagation round for round
    (majority vote over out-neighbors, ties -> smallest label, seeds
    clamped, no-vote nodes keep their previous label)."""
    parts = [
        "seeds AS (SELECT vec_id AS node, label FROM embeddings WHERE vec_id % 5 = 0)",
        "nodes AS (SELECT vec_id AS node FROM e)",
        "lab0 AS (SELECT n.node, s.label AS lab FROM nodes n LEFT JOIN seeds s ON n.node = s.node)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""votes{i} AS (
    SELECT k.src AS node, l.lab AS nl, CAST(count(*) AS BIGINT) AS v
    FROM knn k JOIN lab{i - 1} l ON k.dst = l.node
    WHERE l.lab IS NOT NULL GROUP BY 1, 2
),
win{i} AS (
    SELECT node, nl FROM (
        SELECT node, nl, row_number() OVER (PARTITION BY node ORDER BY v DESC, nl) AS rn
        FROM votes{i}
    ) WHERE rn = 1
),
lab{i} AS (
    SELECT n.node, coalesce(s.label, w.nl, l.lab) AS lab
    FROM nodes n
    LEFT JOIN win{i} w ON n.node = w.node
    LEFT JOIN seeds s ON n.node = s.node
    LEFT JOIN lab{i - 1} l ON n.node = l.node
)"""
        )
    return ",\n".join(parts)


@register(
    "knn_label_propagation",
    f"""
WITH {_SQL_EMB},
{_SQL_KNN_EDGES},
{_sql_label_prop_chain(2)}
SELECT n.node AS vec_id, l.lab AS label, s.node IS NOT NULL AS is_seed
FROM nodes n
JOIN lab2 l ON n.node = l.node
LEFT JOIN seeds s ON n.node = s.node
""",
)
def knn_label_propagation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label propagation over the semantic k-NN graph
    (operators/graph.py label_propagation): every fifth vector keeps
    its true label as a seed, the other 80% take the majority label of
    their 3 nearest neighbors across 2 unrolled rounds — the standard
    cheap way to extend a small labeled set over a 100-TB corpus
    (Zhu & Ghahramani 2002). Each round is one edge-label equi-join +
    one keyed vote count + a per-node argmax; edges never move."""
    from calculate_file_content_size_for_vector_db_spark.operators.graph import label_propagation
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import topk_grid

    emb = _emb(spark, sf_dir)
    edges = topk_grid(emb, emb, k=3).select(
        F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    seeds = emb.where(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("node"), "label"
    )
    nodes = emb.select(F.col("vec_id").alias("node"))
    return label_propagation(edges, seeds, nodes, iters=2).select(
        F.col("node").alias("vec_id"), "label", "is_seed"
    )


_CMS_SQL_CELL = (
    "CAST(('0x' || substring(md5('cms' || {r} || '|' || {w}), 1, 8)) AS BIGINT) % 128"
)


@register(
    "heavy_hitters_cms",
    f"""
WITH toks AS (SELECT unnest({_SQL_TOKENS}) AS word FROM documents),
occ AS (SELECT word, CAST(count(*) AS BIGINT) AS exact_count FROM toks GROUP BY 1),
cells AS (
    SELECT t.r AS row, {_CMS_SQL_CELL.format(r="t.r", w="word")} AS col
    FROM toks CROSS JOIN range(0, 4) t(r)
),
sketch AS (SELECT row, col, CAST(count(*) AS BIGINT) AS cell_count FROM cells GROUP BY 1, 2),
probes AS (
    SELECT o.word, o.exact_count, t.r AS row,
           {_CMS_SQL_CELL.format(r="t.r", w="o.word")} AS col
    FROM occ o CROSS JOIN range(0, 4) t(r)
),
est AS (
    SELECT p.word, p.exact_count, CAST(min(s.cell_count) AS BIGINT) AS est_count
    FROM probes p JOIN sketch s ON p.row = s.row AND p.col = s.col
    GROUP BY 1, 2
)
SELECT word, est_count, exact_count,
       CAST(est_count - exact_count AS BIGINT) AS overcount,
       CAST(row_number() OVER (ORDER BY est_count DESC, word) AS INT) AS rank
FROM est QUALIFY rank <= 10
""",
)
def heavy_hitters_cms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-Sketch heavy hitters (third sketch family after HLL
    and approx-percentile, same bounded-error-oracle pattern): top-10
    tokens by CMS estimate with the exact count alongside — the CMS
    one-sided guarantee (overcount >= 0) holds row for row, and the
    sketch itself is a fixed 4x128 grid however large the vocabulary.
    The sketch-build agg collapses map-side (fixed key space); the
    filled sketch broadcasts."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        cms_heavy_hitters,
    )

    return cms_heavy_hitters(_docs(spark, sf_dir))


@register(
    "mix_temperature_recipe",
    """
WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang),
t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total,
             sum(pow(CAST(n_docs AS DOUBLE), 0.5)) AS wsum_raw FROM c),
q AS (
    SELECT lang, n_docs, total,
           n_docs / CAST(total AS DOUBLE) AS share,
           pow(n_docs / CAST(total AS DOUBLE), 0.5)
               / (wsum_raw / pow(CAST(total AS DOUBLE), 0.5)) AS mw
    FROM c, t
)
SELECT lang, n_docs,
       round(share, 6) AS share,
       round(mw, 6) AS mix_weight,
       round(least(1.0, mw * 0.5 * total / CAST(n_docs AS DOUBLE)), 6) AS sample_rate,
       round(mw * 0.5 * total, 6) AS expected_docs
FROM q
""",
)
def mix_temperature_recipe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based data-mixing recipe (alpha=0.5, budget=half
    the corpus): sampled mass per language proportional to share^alpha
    renormalized — the multilingual-LM standard (XLM/mT5) that
    up-weights low-resource languages smoothly, next to the hard
    uniform floor of mix_balanced_recipe. One keyed count + a 1-row
    broadcast normalizer; nothing scales with corpus rows."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        temperature_mix_recipe,
    )

    return temperature_mix_recipe(_docs(spark, sf_dir), alpha=0.5, budget_frac=0.5)


@register(
    "text_readability",
    """
WITH m AS (
    SELECT doc_id,
           CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')) AS BIGINT) AS n_words,
           CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sentences,
           CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS BIGINT) AS n_syllables
    FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       CASE WHEN n_words = 0 THEN NULL
            ELSE round(206.835
                       - 1.015 * (n_words / CAST(n_sentences AS DOUBLE))
                       - 84.6 * (n_syllables / CAST(n_words AS DOUBLE)), 6)
       END AS flesch
FROM m
""",
)
def text_readability_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document (vowel-group syllable proxy,
    [.!?]-run sentence proxy) — the prose-complexity quality signal
    next to gopher_quality's boilerplate rules. Pure per-row
    regexp_count derivation: no shuffle, whole-stage codegen."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import readability

    return readability(_docs(spark, sf_dir))


@register(
    "bpe_top_pairs",
    f"""
WITH w AS (
    SELECT t AS word, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest({_SQL_TOKENS}) AS t FROM documents)
    GROUP BY 1
),
p AS (
    SELECT substring(word, CAST(j AS INT), 2) AS pair, n
    FROM (SELECT word, n, unnest(range(1, greatest(length(word), 1))) AS j FROM w)
),
f AS (
    SELECT pair, CAST(sum(n) AS BIGINT) AS freq
    FROM p WHERE length(pair) = 2 GROUP BY 1
)
SELECT pair, freq, CAST(row_number() OVER (ORDER BY freq DESC, pair) AS INT) AS rank
FROM f QUALIFY rank <= 20
""",
)
def bpe_top_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scoring pass of one BPE merge step (Sennrich et al. 2016)
    run distributed: top-20 adjacent character pairs by corpus
    frequency. Occurrences compress to the (word, count) dictionary
    first — the orders-of-magnitude-smaller frame classic BPE trains
    on — then explode to length-1 pairs and one keyed sum."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import bpe_pair_counts

    return bpe_pair_counts(_docs(spark, sf_dir))


def _sql_bpe_chain(n_merges: int, train_where: str = "") -> str:
    """Unrolled BPE training chain (the kmeans/GD discipline applied to
    tokenizer training): r0 = char reprs of the (word, freq) dict with
    the double-space boundary invariant; each round counts adjacent
    symbol pairs, picks (count DESC, lhs, rhs) LIMIT 1, and rewrites
    reprs with the same literal replace() Spark uses — integer counts,
    so training is reproduced bit-for-bit."""
    parts = [
        f"""w0 AS (
    SELECT t AS word, CAST(count(*) AS BIGINT) AS freq
    FROM (SELECT unnest({_SQL_TOKENS}) AS t FROM documents {{train_where}}) GROUP BY 1
)""".format(train_where=train_where),
        """r0 AS (
    SELECT word, freq,
           ' ' || array_to_string(string_split(word, ''), '  ') || ' ' AS repr
    FROM w0
)""",
    ]
    for i in range(1, n_merges + 1):
        parts.extend([
            f"""p{i} AS (
    SELECT s[j] AS l, s[j + 1] AS r, freq FROM (
        SELECT s, freq, CAST(unnest(range(1, greatest(len(s), 1))) AS INT) AS j
        FROM (SELECT string_split(trim(repr), '  ') AS s, freq FROM r{i - 1})
    )
)""",
            f"""b{i} AS (
    SELECT {i} AS rank, l AS lhs, r AS rhs, l || r AS merged,
           CAST(sum(freq) AS BIGINT) AS pair_count
    FROM p{i} GROUP BY l, r
    ORDER BY pair_count DESC, l, r LIMIT 1
)""",
            f"""r{i} AS (
    SELECT word, freq,
           replace(repr, ' ' || b.lhs || '  ' || b.rhs || ' ',
                   ' ' || b.merged || ' ') AS repr
    FROM r{i - 1} CROSS JOIN b{i} b
)""",
        ])
    return "WITH " + ",\n".join(parts)


_BPE_N = 8  # keep in sync with textstats.BPE_MERGES


@register(
    "bpe_train_merges",
    _sql_bpe_chain(_BPE_N)
    + "\n"
    + " UNION ALL ".join(
        f"SELECT CAST(rank AS INT) AS rank, lhs, rhs, merged, pair_count FROM b{i}"
        for i in range(1, _BPE_N + 1)
    ),
)
def bpe_train_merges_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained BPE merge table (Sennrich et al. 2016) — 8 greedy
    merges over the corpus word dictionary, the tokenizer-as-artifact
    next to quality_classifier_weights' classifier-as-artifact. Every
    round is vocab-bounded (pair hash-agg + 1-row argmax + one literal
    replace rewrite), the corpus itself is scanned exactly once for
    word counts; rounds localCheckpoint the |V|-row repr table so the
    plan stays flat (operators/textstats.py:_bpe_train_reprs)."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        bpe_train_merges,
    )

    return bpe_train_merges(_docs(spark, sf_dir))


@register(
    "bpe_apply_tokens",
    _sql_bpe_chain(_BPE_N)
    + f""",
vocab AS (
    SELECT word,
           CAST(len(string_split(trim(repr), '  ')) AS BIGINT) AS n_sym
    FROM r{_BPE_N}
),
tk AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS word FROM documents)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens
FROM tk JOIN vocab USING (word) GROUP BY doc_id
""",
)
def bpe_apply_tokens_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token counts under the TRAINED segmentation: the final
    merged reprs ARE the segmentation of every vocab word, so serving
    is one broadcast join from the exploded corpus onto the |V|-row
    (word -> n_symbols) map — the merge loop never touches documents.
    Docs with zero tokens are absent on both sides (inner join)."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        bpe_apply_tokens,
    )

    return bpe_apply_tokens(_docs(spark, sf_dir))


@register(
    "bpe_apply_oov",
    _sql_bpe_chain(_BPE_N, train_where="WHERE doc_id % 17 <> 0")
    + f""",
nw AS (
    SELECT DISTINCT t AS word
    FROM (SELECT unnest({_SQL_TOKENS}) AS t FROM documents WHERE doc_id % 17 = 0)
),
a0 AS (
    SELECT word,
           ' ' || array_to_string(string_split(word, ''), '  ') || ' ' AS repr
    FROM nw
),
"""
    + ",\n".join(
        f"""a{i} AS (
    SELECT word, replace(repr, ' ' || b.lhs || '  ' || b.rhs || ' ',
                         ' ' || b.merged || ' ') AS repr
    FROM a{i - 1} CROSS JOIN b{i} b
)"""
        for i in range(1, _BPE_N + 1)
    )
    + f""",
vocab AS (
    SELECT word,
           CAST(len(string_split(trim(repr), '  ')) AS BIGINT) AS n_sym
    FROM a{_BPE_N}
),
tk AS (
    SELECT doc_id, unnest({_SQL_TOKENS}) AS word
    FROM documents WHERE doc_id % 17 = 0
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens
FROM tk JOIN vocab USING (word) GROUP BY doc_id
""",
)
def bpe_apply_oov_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The out-of-vocabulary serving path: a tokenizer trained ONLY on
    docs with id % 17 != 0 segments the HELD-OUT docs by replaying the
    stored merge table in rank order — an F.aggregate fold over the
    merges as a 1-row broadcast (textstats.bpe_segment_with_merges),
    each step the same boundary-safe literal replace training used.
    Distinct held-out words fold once; documents pay one broadcast
    join. This is what a deployed tokenizer does to fresh crawl data;
    the oracle replays the identical merges as unrolled CTE rounds."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        bpe_apply_oov,
    )

    return bpe_apply_oov(_docs(spark, sf_dir))


@register(
    "bpe_vocab_coverage",
    f"""
WITH tok AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS w FROM documents),
vocab AS (SELECT DISTINCT w FROM tok WHERE doc_id % 17 <> 0),
bw AS (SELECT w, CAST(count(*) AS BIGINT) AS occ
       FROM tok WHERE doc_id % 17 = 0 GROUP BY w),
fl AS (SELECT bw.occ, CASE WHEN v.w IS NULL THEN 1 ELSE 0 END AS oov
       FROM bw LEFT JOIN vocab v ON bw.w = v.w)
SELECT CAST(count(*) AS BIGINT) AS n_batch_words,
       CAST(sum(oov) AS BIGINT) AS n_oov_words,
       CAST(sum(occ) AS BIGINT) AS n_batch_tokens,
       CAST(sum(oov * occ) AS BIGINT) AS n_oov_tokens,
       round(sum(oov) / CAST(NULLIF(count(*), 0) AS DOUBLE), 6) AS oov_word_rate,
       round(sum(oov * occ) / CAST(NULLIF(sum(occ), 0) AS DOUBLE), 6) AS oov_token_rate
FROM fl
""",
)
def bpe_vocab_coverage_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-staleness QA (textstats.bpe_vocab_coverage): OOV
    word/token rates of the held-out batch (the bpe_apply_oov split,
    doc_id % 17 == 0) against the stored training vocabulary — the
    retrain trigger for the trained merge table, completing the
    round-8 store-maintenance symmetry (sim_ivf_append/ivf_staleness
    :: bpe_apply_oov/bpe_vocab_coverage). Coverage needs only the
    vocab's word set, so no merge training appears in the plan."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        bpe_vocab_coverage,
    )

    return bpe_vocab_coverage(_docs(spark, sf_dir))


@register(
    "line_dedup_rewrite",
    """
WITH paged AS (
    SELECT doc_id, replace(text, ' ', chr(10)) AS text FROM documents
),
lt AS (
    SELECT doc_id, ls[i] AS line, i AS pos FROM (
        SELECT doc_id, ls, CAST(unnest(range(1, len(ls) + 1)) AS INT) AS i
        FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
              FROM paged WHERE text IS NOT NULL)
    )
),
kept AS (
    SELECT doc_id, line, pos FROM (
        SELECT doc_id, line, pos,
               row_number() OVER (PARTITION BY doc_id, line ORDER BY pos) AS rn
        FROM lt
    ) WHERE rn = 1 OR line = ''
),
rb AS (
    SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
           CAST(count(*) AS BIGINT) AS n_lines_kept
    FROM kept GROUP BY doc_id
),
tot AS (
    SELECT doc_id, text,
           CASE WHEN text IS NULL THEN NULL
                ELSE len(string_split(text, chr(10))) END AS n_lines
    FROM paged
)
SELECT t.doc_id,
       CASE WHEN t.text IS NULL THEN NULL
            ELSE coalesce(rb.clean_text, '') END AS clean_text,
       CAST(coalesce(rb.n_lines_kept, 0) AS BIGINT) AS n_lines_kept,
       CAST(CASE WHEN t.text IS NULL THEN 0
                 ELSE t.n_lines - coalesce(rb.n_lines_kept, 0) END AS BIGINT)
           AS n_lines_removed
FROM tot t LEFT JOIN rb ON rb.doc_id = t.doc_id
""",
)
def line_dedup_rewrite_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document duplicate-line removal (dedup.line_dedup_rewrite):
    repeated non-empty lines keep their first occurrence, empty lines
    (paragraph structure) survive — the CCNet/C4-style page cleanup
    next to span_dedup_rewrite's cross-document span removal. Entirely
    keyed on doc_id: posexplode, one first-occurrence window, one
    ordered re-assembly; no cross-document stage. The fixture corpus
    is single-line, so both engines first re-page it (word -> line)
    to give the dedup real duplicate lines to remove; multi-line
    goldens incl. empty-line preservation live in tests/test_dedup.py."""
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import (
        line_dedup_rewrite,
    )

    paged = _docs(spark, sf_dir).withColumn(
        "text", F.replace(F.col("text"), F.lit(" "), F.lit("\n"))
    )
    return line_dedup_rewrite(paged)


@register(
    "zorder_layout",
    """
WITH span AS (
    SELECT min(o_custkey) AS ck_lo, max(o_custkey) AS ck_hi,
           min(o_orderdate) AS dt_lo, max(o_orderdate) AS dt_hi
    FROM orders
),
wz AS (
    SELECT o_custkey, o_orderdate,
           CAST((o_custkey - ck_lo) * 16 // (ck_hi - ck_lo + 1) AS BIGINT) AS x,
           CAST(date_diff('day', dt_lo, o_orderdate) * 16
                // (date_diff('day', dt_lo, dt_hi) + 1) AS BIGINT) AS y
    FROM orders, span
),
z AS (
    SELECT o_custkey, o_orderdate,
           (((x >> 0) & 1) << 0) + (((y >> 0) & 1) << 1)
         + (((x >> 1) & 1) << 2) + (((y >> 1) & 1) << 3)
         + (((x >> 2) & 1) << 4) + (((y >> 2) & 1) << 5)
         + (((x >> 3) & 1) << 6) + (((y >> 3) & 1) << 7) AS zv
    FROM wz
)
SELECT CAST(zv // 16 AS INT) AS file_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(o_custkey) AS BIGINT) AS min_custkey,
       CAST(max(o_custkey) AS BIGINT) AS max_custkey,
       strftime(min(o_orderdate), '%Y-%m-%d') AS min_orderdate,
       strftime(max(o_orderdate), '%Y-%m-%d') AS max_orderdate
FROM z GROUP BY 1
""",
)
def zorder_layout_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout statistics over orders on
    (o_custkey, o_orderdate) — the clustering step behind parquet
    row-group skipping / OPTIMIZE ZORDER BY: per-file min/max boxes
    stay narrow in BOTH dimensions, so predicates on either column
    prune most files. Integer bit arithmetic end-to-end (bit-exact);
    one 1-row broadcast quantization frame + one 16-group hash-agg."""
    from calculate_file_content_size_for_vector_db_spark.operators.maintenance import zorder_layout

    return zorder_layout(read_table(spark, sf_dir, "orders"))


@register(
    "embedding_dim_stats",
    """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
x AS (
    SELECT CAST(t.j AS INT) AS dim, v[CAST(t.j AS INT) + 1] AS x
    FROM e CROSS JOIN range(0, 64) t(j)
)
SELECT dim, CAST(count(*) AS BIGINT) AS n,
       round(avg(x), 6) AS mean,
       round(sqrt(avg(x * x) - avg(x) * avg(x)), 6) AS std,
       round(min(x), 6) AS vmin,
       round(max(x), 6) AS vmax
FROM x GROUP BY dim
""",
)
def embedding_dim_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding profile (mean/std/min/max over each of
    the 64 dims) — the QA pass that catches dead dimensions,
    un-normalized batches and fp spikes before vectors reach an index.
    posexplode + ONE keyed hash-agg with 64 groups: partial aggregation
    collapses everything map-side regardless of corpus size."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import dim_stats

    return dim_stats(_emb(spark, sf_dir))


# ---------------------------------------------------------------------------
# Round-6 extension surface (third wave): containment dedup, bigram LM,
# label-centroid QA, rolling anomaly detection, key-skew diagnosis
# ---------------------------------------------------------------------------


@register(
    "dedup_containment",
    "WITH "
    + _SQL_SHINGLES
    + """,
ex AS (
    SELECT doc_id, len(sh) AS n, unnest(sh) AS g FROM sh_t
),
cand AS (
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           count(*) AS inter, any_value(a.n) AS n_a, any_value(b.n) AS n_b
    FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT a_id, b_id,
       round(inter / CAST(n_a AS DOUBLE), 6) AS containment_a,
       round(inter / CAST(n_b AS DOUBLE), 6) AS containment_b
FROM cand
WHERE greatest(round(inter / CAST(n_a AS DOUBLE), 6),
               round(inter / CAST(n_b AS DOUBLE), 6)) >= 0.8
""",
)
def dedup_containment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-containment pairs (|A n B| / |A| per direction, either
    side >= 0.8) — the asymmetric quote/subset detector Jaccard
    misses: a short doc quoted whole inside a long one has low Jaccard
    but containment ~1 on the short side (Broder's containment).
    Same shingle-equi-join candidate plan as dedup_ngram_jaccard."""
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import containment_pairs

    return containment_pairs(_docs(spark, sf_dir), threshold=0.8)


@register(
    "text_bigram_lm",
    f"""
WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
bg AS (
    SELECT doc_id, toks[CAST(j AS INT)] AS w1, toks[CAST(j AS INT) + 1] AS w2
    FROM (SELECT doc_id, toks, unnest(range(1, greatest(len(toks), 1))) AS j FROM t)
),
c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY 1),
v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
      FROM (SELECT unnest(toks) AS tok FROM t)),
sc AS (
    SELECT b.doc_id,
           round(avg(ln((c12.c12 + 1) / CAST(c1.c1 + v.v AS DOUBLE))), 6) AS lm2_score
    FROM bg b JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
    GROUP BY 1
)
SELECT d.doc_id, sc.lm2_score FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
""",
)
def text_bigram_lm_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM score with add-1 smoothing (mean ln P(w2|w1)) — the
    word-ORDER-aware sequel to text_lm_score: scrambled text keeps its
    unigram score but collapses here. Bigrams derive per-row from the
    token array (slice+zip, no positional self-join); the LM is two
    vocab-bounded hash-aggs."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import bigram_logprob

    return bigram_logprob(_docs(spark, sf_dir))


@register(
    "label_centroid_quality",
    """
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cd AS (
    SELECT label, CAST(j AS INT) AS dim, round(avg(v[CAST(j AS INT) + 1]), 6) AS m
    FROM (SELECT label, v, unnest(range(0, 64)) AS j FROM e)
    GROUP BY 1, 2
),
cent AS (SELECT label, list(m ORDER BY dim) AS cv FROM cd GROUP BY 1),
sc AS (
    SELECT e.label, round(list_cosine_similarity(e.v, c.cv), 6) AS c
    FROM e JOIN cent c USING (label)
)
SELECT label, CAST(count(*) AS BIGINT) AS n_members,
       round(avg(c), 6) AS avg_cosine, round(min(c), 6) AS min_cosine
FROM sc GROUP BY label
""",
)
def label_centroid_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid cohesion (members' cosine to their label
    mean vector) — the label-quality QA pass next to embedding_dim
    _stats: low avg flags a heterogeneous label, a very low min flags
    probable mislabels. One (label, dim) hash-agg builds centroids;
    the labels-sized centroid table broadcasts back for one cosine
    map + one keyed agg."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        label_centroid_quality,
    )

    return label_centroid_quality(_emb(spark, sf_dir))


@register(
    "events_anomaly",
    """
WITH w AS (
    SELECT event_id, user_id, value,
           count(value) OVER win AS n,
           sum(value) OVER win AS s,
           sum(value * value) OVER win AS s2
    FROM events
    WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
),
sc AS (
    SELECT event_id, user_id, value, n, s / n AS mean,
           CASE WHEN (s2 - s * s / n) / (n - 1) > 1e-9
                THEN (value - s / n) / sqrt((s2 - s * s / n) / (n - 1))
                ELSE NULL END AS z
    FROM w
)
SELECT event_id, user_id, round(value, 6) AS value,
       round(mean, 6) AS mean_prev, round(z, 6) AS z
FROM sc WHERE n >= 5 AND abs(z) > 3.0
""",
)
def events_anomaly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling z-score anomalies: events more than 3 sample
    standard deviations from the mean of the same user's previous 20
    events (exclusive bounded frame — an event never scores against
    itself; < 5 history rows or ~zero variance are not scored). One
    user_id exchange, O(20) state per row."""
    from calculate_file_content_size_for_vector_db_spark.operators.relational import (
        rolling_anomalies,
    )

    return rolling_anomalies(_events(spark, sf_dir))


@register(
    "key_skew_profile",
    """
WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY user_id)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(c) AS BIGINT) AS n_rows,
       round(quantile_cont(c, 0.5), 6) AS p50,
       round(quantile_cont(c, 0.9), 6) AS p90,
       round(quantile_cont(c, 0.99), 6) AS p99,
       CAST(max(c) AS BIGINT) AS max_count,
       round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS top1_share,
       round(CAST(max(c) AS DOUBLE) / round(quantile_cont(c, 0.5), 6), 6) AS skew_ratio
FROM c
""",
)
def key_skew_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row skew diagnosis of events.user_id as a shuffle key:
    per-key count percentiles, hottest-key share, skew_ratio =
    max/median — the pre-flight number that decides between a plain
    shuffle, salting, or AQE skew-split at 100 TB (pairs with
    salted_event_counts, which demonstrates the remediation)."""
    from calculate_file_content_size_for_vector_db_spark.operators.maintenance import (
        key_skew_profile,
    )

    return key_skew_profile(_events(spark, sf_dir), "user_id")


@register(
    "join_size_cms",
    """
WITH a AS (SELECT user_id AS k FROM events
           WHERE event_type = 'click' AND user_id IS NOT NULL),
b AS (SELECT user_id AS k FROM events
      WHERE event_type = 'purchase' AND user_id IS NOT NULL),
ca AS (
    SELECT r.range AS row,
           CAST(('0x' || substring(md5('cms' || CAST(r.range AS VARCHAR) || '|'
               || CAST(k AS VARCHAR)), 1, 8)) AS BIGINT) % 1024 AS col,
           count(*) AS cnt_a
    FROM a CROSS JOIN range(4) r GROUP BY 1, 2
),
cb AS (
    SELECT r.range AS row,
           CAST(('0x' || substring(md5('cms' || CAST(r.range AS VARCHAR) || '|'
               || CAST(k AS VARCHAR)), 1, 8)) AS BIGINT) % 1024 AS col,
           count(*) AS cnt_b
    FROM b CROSS JOIN range(4) r GROUP BY 1, 2
),
est AS (
    SELECT CAST(min(s) AS BIGINT) AS est_join_rows
    FROM (SELECT ca.row, sum(cnt_a * cnt_b) AS s
          FROM ca JOIN cb ON ca.row = cb.row AND ca.col = cb.col
          GROUP BY ca.row)
),
ka AS (SELECT k, count(*) AS c FROM a GROUP BY k),
kb AS (SELECT k, count(*) AS c FROM b GROUP BY k),
ex AS (SELECT CAST(coalesce(sum(ka.c * kb.c), 0) AS BIGINT) AS exact_join_rows
       FROM ka JOIN kb USING (k)),
ta AS (SELECT CAST(sum(c) AS BIGINT) AS n_a, CAST(count(*) AS BIGINT) AS n_keys_a FROM ka),
tb AS (SELECT CAST(sum(c) AS BIGINT) AS n_b, CAST(count(*) AS BIGINT) AS n_keys_b FROM kb)
SELECT n_a, n_b, n_keys_a, n_keys_b, exact_join_rows, est_join_rows,
       CAST(est_join_rows - exact_join_rows AS BIGINT) AS overcount,
       CAST(est_join_rows - exact_join_rows AS DOUBLE)
           <= 3.0 * n_a * n_b / 1024.0 AS within_bound
FROM ta, tb, ex, est
""",
)
def join_size_cms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation by Count-Min INNER PRODUCT
    (maintenance.join_size_cms): |clicks ⋈ purchases on user_id|
    estimated from two fixed-size grids — the planner sketch consulted
    before choosing shuffle vs broadcast vs salting (key_skew_profile's
    companion). est ≥ exact always (collisions only add, the CMS
    theorem as a hash-checked column); the exact join size rides along
    as the QA baseline. Grids are mergeable cell-wise per shard/day,
    and the whole estimate is integer arithmetic off the md5 hash, so
    both engines reproduce grids, products, and the min bit-for-bit."""
    from calculate_file_content_size_for_vector_db_spark.operators.maintenance import (
        join_size_cms,
    )

    ev = _events(spark, sf_dir).where(F.col("user_id").isNotNull())
    a = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("k")
    )
    b = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("k")
    )
    return join_size_cms(a, b)


# ---------------------------------------------------------------------------
# Round-6 extension surface (fourth wave): MinHash error contract,
# cohort retention, RFM segmentation, cosine range search
# ---------------------------------------------------------------------------


@register(
    "minhash_jaccard_estimate",
    _SQL_MINHASH_BANDS
    + """,
cand AS (
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
est AS (
    SELECT c.a_id, c.b_id,
           round(len(list_filter(range(1, 9),
               i -> sa.signature[CAST(i AS INT)] = sb.signature[CAST(i AS INT)])) / 8.0, 6)
               AS jaccard_est,
           round(len(list_intersect(ha.sh, hb.sh))
                 / CAST(len(ha.sh) + len(hb.sh) - len(list_intersect(ha.sh, hb.sh)) AS DOUBLE), 6)
               AS jaccard_exact
    FROM cand c
    JOIN sig_t sa ON sa.doc_id = c.a_id
    JOIN sig_t sb ON sb.doc_id = c.b_id
    JOIN sh_t ha ON ha.doc_id = c.a_id
    JOIN sh_t hb ON hb.doc_id = c.b_id
)
SELECT a_id, b_id, jaccard_est, jaccard_exact,
       round(abs(jaccard_est - jaccard_exact), 6) AS abs_error
FROM est
""",
)
def minhash_jaccard_estimate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-vs-exact error contract — the FOURTH sketch family
    under the bounded-error-oracle pattern (after HLL, approx-
    percentile, CMS): for every LSH candidate pair, the signature-
    agreement estimate a production pipeline acts on, the exact
    shingle Jaccard, and the absolute error. Fixture finding: the
    textbook 3-sigma bound sqrt(J(1-J)/k) does NOT hold conditionally
    — candidates exist BECAUSE a band agreed, so low-Jaccard
    candidates err high by construction; the deterministic guarantees
    (1/k quantization grid, >= 2-of-8 shared-band floor, exact 1 for
    identical docs) are pinned in tests/test_dedup.py instead."""
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import (
        minhash_jaccard_estimate,
    )

    return minhash_jaccard_estimate(_docs(spark, sf_dir))


@register(
    "cohort_retention",
    """
WITH f AS (SELECT user_id, min(date_trunc('week', ts)) AS cw FROM events GROUP BY user_id),
a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
SELECT strftime(f.cw, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', f.cw, a.wk) // 7 AS INT) AS week_n,
       CAST(count(*) AS BIGINT) AS n_users
FROM a JOIN f USING (user_id)
GROUP BY 1, 2
""",
)
def cohort_retention_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity week,
    counted in each later active week — the standard engagement report
    over an event stream. Two linear hash-aggs + one user_id equi-join;
    no windows, no self-joins (operators/relational.py)."""
    from calculate_file_content_size_for_vector_db_spark.operators.relational import (
        cohort_retention,
    )

    return cohort_retention(_events(spark, sf_dir))


@register(
    "orders_rfm_segments",
    """
WITH ref AS (SELECT max(o_orderdate) AS refd FROM orders),
per AS (
    SELECT o_custkey,
           CAST(date_diff('day', max(o_orderdate), (SELECT refd FROM ref)) AS INT) AS recency_days,
           CAST(count(*) AS BIGINT) AS frequency,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS monetary
    FROM orders GROUP BY o_custkey
),
scored AS (
    SELECT o_custkey, recency_days, frequency, monetary,
           CAST(ntile(4) OVER (ORDER BY recency_days, o_custkey) AS INT) AS r_score,
           CAST(ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS INT) AS f_score,
           CAST(ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS INT) AS m_score
    FROM per
)
SELECT o_custkey, recency_days, frequency, monetary, r_score, f_score, m_score,
       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || CAST(m_score AS VARCHAR) AS segment
FROM scored
""",
)
def orders_rfm_segments_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency/frequency/monetary quartile
    scores + the classic 3-digit segment code) — the marketing-
    analytics workhorse. One custkey hash-agg, a 1-row max-date
    broadcast, three ntile windows over the customers-sized aggregated
    frame (bounded global-window pattern), custkey tie-breaks for
    deterministic quartiles."""
    from calculate_file_content_size_for_vector_db_spark.operators.relational import rfm_segments

    return rfm_segments(read_table(spark, sf_dir, "orders"))


@register(
    "sim_range_search",
    f"""
WITH {_SQL_EMB}
SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       round(list_cosine_similarity(a.v, b.v), 6) AS cosine
FROM e a, e b
WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
  AND round(list_cosine_similarity(a.v, b.v), 6) >= 0.25
""",
)
def sim_range_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine range (radius) search: every corpus vector within 0.25
    of each query — the other half of the vector-db query API next to
    top-k (no ranking window at all; nothing re-partitions by query).
    At 100 TB the same threshold filter applies after an LSH/IVF
    candidate tier instead of the full scan."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import range_search

    emb = _emb(spark, sf_dir)
    return range_search(emb, emb.where(F.col("vec_id") < 10), threshold=0.25)


# ---------------------------------------------------------------------------
# Round-6 extension surface (fifth wave): SQ8 int8 search tier + recall,
# kNN clustering coefficients, salted skew join
# ---------------------------------------------------------------------------

_SQL_INT8 = """
q8 AS (
    SELECT vec_id, list_transform(v, x -> CAST(round(127.0 * x / s) AS BIGINT)) AS qv
    FROM (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS s FROM e)
    WHERE s > 0
)
"""


def _sql_int8_approx(k: int) -> str:
    return f"""
qshort AS (
    SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(CAST(a.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[])), 6) DESC,
                            b.vec_id) AS rn
        FROM q8 a, q8 b
        WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
    ) WHERE rn <= {4 * k}
),
approx AS (
    SELECT query_id, neighbor_id, cosine, rank FROM (
        SELECT t.query_id, t.neighbor_id,
               round(list_cosine_similarity(a.v, b.v), 6) AS cosine,
               CAST(row_number() OVER (PARTITION BY t.query_id
                   ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC, t.neighbor_id)
                   AS INT) AS rank
        FROM qshort t
        JOIN e a ON a.vec_id = t.query_id
        JOIN e b ON b.vec_id = t.neighbor_id
    ) WHERE rank <= {k}
)
"""


@register(
    "sim_topk_int8",
    f"""
WITH {_SQL_EMB},
{_SQL_INT8},
{_sql_int8_approx(5)}
SELECT query_id, neighbor_id, cosine, rank FROM approx
""",
)
def sim_topk_int8_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 top-k: int8-quantized compressed scan (4x less vector data
    than float32; the per-vector scale cancels out of cosine, so the
    scan is exact integer arithmetic) + exact rerank of the top-20 —
    the scalar-quantization tier every vector store ships next to PQ,
    binary and matryoshka."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import topk_int8

    emb = _emb(spark, sf_dir)
    return topk_int8(emb, emb.where(F.col("vec_id") < 10), k=5, rerank=4)


@register(
    "int8_recall_at_10",
    f"""
WITH {_SQL_EMB},
{_SQL_INT8},
{_sql_int8_approx(_RECALL_K)},
{_SQL_RECALL_TAIL}
""",
)
def int8_recall_at_10_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the SQ8 tier — the NINTH row of the recall matrix;
    candidate-pruned exact rerank, so rerank-monotone like the other
    non-ADC tiers. int8 preserves direction almost exactly at 64 dims,
    so this tier's recall should sit at the top of the compressed
    family (pinned relative to binary in tests)."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        recall_vs_exact,
        topk_int8,
    )

    emb, q, exact = _recall_queries(spark, sf_dir)
    return recall_vs_exact(exact, topk_int8(emb, q, k=_RECALL_K, rerank=4))


@register(
    "knn_clustering_coeff",
    f"""
WITH {_SQL_EMB},
{_SQL_KNN_EDGES},
und AS (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM knn WHERE src <> dst
),
deg AS (
    SELECT node, CAST(count(*) AS BIGINT) AS degree
    FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und) GROUP BY 1
),
tri AS (
    SELECT e1.a, e1.b, e2.c
    FROM und e1
    JOIN (SELECT a AS b, b AS c FROM und) e2 USING (b)
    JOIN (SELECT a AS ta, b AS tc FROM und) e3 ON e1.a = e3.ta AND e2.c = e3.tc
),
corners AS (
    SELECT node, CAST(count(*) AS BIGINT) AS triangles
    FROM (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
    GROUP BY 1
)
SELECT n.node AS vec_id,
       coalesce(d.degree, 0) AS degree,
       coalesce(t.triangles, 0) AS triangles,
       CASE WHEN coalesce(d.degree, 0) >= 2
            THEN round(2.0 * coalesce(t.triangles, 0) / (d.degree * (d.degree - 1)), 6)
       END AS clustering_coeff
FROM (SELECT vec_id AS node FROM e) n
LEFT JOIN deg d USING (node)
LEFT JOIN corners t USING (node)
""",
)
def knn_clustering_coeff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficients over the semantic k-NN graph
    (operators/graph.py clustering_coefficients): per-vector triangle
    density — 2T/(deg(deg-1)) — separating hub-of-a-clique vectors
    from bridge vectors, the third graph signal next to PageRank and
    label propagation. Canonical a<b<c two-join triangle enumeration;
    bounded-degree kNN keeps it linear."""
    from calculate_file_content_size_for_vector_db_spark.operators.graph import (
        clustering_coefficients,
    )
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import topk_grid

    emb = _emb(spark, sf_dir)
    edges = topk_grid(emb, emb, k=3).select(
        F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    return clustering_coefficients(edges, emb.select(F.col("vec_id").alias("node"))).select(
        F.col("node").alias("vec_id"), "degree", "triangles", "clustering_coeff"
    )


@register(
    "salted_join_events",
    """
WITH d AS (SELECT user_id, min(ts) AS f FROM events GROUP BY user_id)
SELECT e.event_id, e.user_id, round(e.value, 6) AS value,
       strftime(d.f, '%Y-%m-%d %H:%M:%S') AS first_seen
FROM events e JOIN d USING (user_id)
""",
)
def salted_join_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant fact-dim join: events (skewed user_id fact)
    joined to the per-user first-seen dimension on (user_id, salt)
    with an 8x-replicated dim — one hot user's rows spread over 8
    partitions instead of one straggler. Output is row-for-row
    IDENTICAL to the plain join, which is exactly what the oracle
    checks (the join-side counterpart of salted_event_counts)."""
    from calculate_file_content_size_for_vector_db_spark.operators.maintenance import salted_join

    ev = _events(spark, sf_dir)
    dim = ev.groupBy("user_id").agg(F.min("ts").alias("_f"))
    return salted_join(ev, dim, "user_id", n_salts=8, salt_src="event_id").select(
        "event_id",
        "user_id",
        F.round("value", 6).alias("value"),
        F.date_format("_f", "yyyy-MM-dd HH:mm:ss").alias("first_seen"),
    )


# ---------------------------------------------------------------------------
# Round-6 extension surface (sixth wave): BM25 lexical retrieval,
# Markov event transitions, referential-integrity audit
# ---------------------------------------------------------------------------

_BM25_QUERIES = [(0, "spark hash join"), (1, "table scan fast"), (2, "sort merge batch")]

# Shared by bm25_search and hybrid_search_rrf so the lexical side of
# the fusion provably matches the standalone ranking.
_SQL_BM25_CTES = f"""q AS (SELECT * FROM (VALUES {", ".join(f"({i}, '{s}')" for i, s in _BM25_QUERIES)}) AS t(query_id, q)),
qt AS (
    SELECT DISTINCT query_id,
           unnest(list_filter(regexp_split_to_array(q, '\\s+'), w -> w <> '')) AS term
    FROM q
),
toks AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
st AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
              (SELECT avg(dl) FROM dl) AS avgdl),
sc AS (
    SELECT qt.query_id, tf.doc_id,
           round(sum(ln((st.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
                     * tf.tf * (1.2 + 1)
                     / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl))), 6) AS score
    FROM tf JOIN qt USING (term) JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN st
    GROUP BY 1, 2
)"""


@register(
    "bm25_search",
    f"""
WITH {_SQL_BM25_CTES}
SELECT query_id, doc_id, score,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
FROM sc QUALIFY rank <= 10
""",
)
def bm25_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 per keyword query (Lucene +1 idf form) — lexical
    retrieval next to the nine embedding tiers, and the standard
    hybrid-search complement. The scoring join is posting-list-sized
    (only rows whose term appears in a query), never corpus-sized;
    query terms and the 1-row (N, avgdl) frame broadcast."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import bm25_search

    return bm25_search(_docs(spark, sf_dir), _BM25_QUERIES)


@register("bm25_search_stored", None)  # oracle assigned below — identical to bm25_search
def bm25_search_stored_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental LEXICAL index under bm25_search's oracle VERBATIM —
    retrieval joins the incremental-store family: the base corpus's
    posting artifacts (per-(doc,term) tf, per-doc lengths, 1-row
    n_docs meta) persist to parquet, the daily batch's artifacts are
    computed batch-only and APPENDED (doc-keyed tables with disjoint
    keys union by plain append; the meta row appends and sums on
    read), and the search serves entirely from the merged store
    through bm25_search's tf_df/dl_df/meta_df hooks — df/idf/avgdl
    derive at query time, so no stored statistic ever goes stale.
    The shared-oracle hash pins append == full rebuild AND the
    parquet seam (tf/dl are ints — lossless)."""
    import tempfile

    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        bm25_postings,
        bm25_search,
    )

    docs = _docs(spark, sf_dir)
    base = docs.where(F.col("doc_id") % _INCR_BATCH_MOD != 0)
    batch = docs.where(F.col("doc_id") % _INCR_BATCH_MOD == 0)
    store = tempfile.mkdtemp(prefix="bm25_store_")
    tf_b, dl_b, meta_b = bm25_postings(base)
    tf_b.write.mode("overwrite").parquet(f"{store}/tf")
    dl_b.write.mode("overwrite").parquet(f"{store}/dl")
    meta_b.write.mode("overwrite").parquet(f"{store}/meta")
    tf_n, dl_n, meta_n = bm25_postings(batch)
    tf_n.write.mode("append").parquet(f"{store}/tf")
    dl_n.write.mode("append").parquet(f"{store}/dl")
    meta_n.write.mode("append").parquet(f"{store}/meta")
    meta = spark.read.parquet(f"{store}/meta").agg(
        F.sum("n_docs").cast("long").alias("n_docs")
    )
    return bm25_search(
        None,
        _BM25_QUERIES,
        tf_df=spark.read.parquet(f"{store}/tf"),
        dl_df=spark.read.parquet(f"{store}/dl"),
        meta_df=meta,
    )


REGISTRY["bm25_search_stored"].oracle = REGISTRY["bm25_search"].oracle


@register(
    "event_transitions",
    """
WITH steps AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
),
c AS (
    SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
    FROM steps WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
)
SELECT prev_type, event_type, n,
       round(n / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6) AS prob
FROM c
""",
)
def event_transitions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the per-user event
    stream (counts + row-normalized probabilities) — the session-path
    summary behind funnels and next-action baselines. One user_id
    exchange for the lag, one |types|^2-group count, a windowed
    normalizer over that tiny frame (operators/relational.py)."""
    from calculate_file_content_size_for_vector_db_spark.operators.relational import (
        event_transitions,
    )

    return event_transitions(_events(spark, sf_dir))


@register(
    "fk_integrity_check",
    """
SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_orders,
       (SELECT CAST(count(*) AS BIGINT) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
           AS orphan_orders,
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
           AS orphan_lineitems,
       (SELECT CAST(count(*) AS BIGINT) FROM orders WHERE o_totalprice <= 0)
           AS nonpositive_totals
""",
)
def fk_integrity_check_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row referential-integrity audit of the star schema: orphan
    orders (no customer), orphan lineitems (no order), non-positive
    order totals — the data-contract gate a lake runs before
    publishing a snapshot. Each check is one LEFT ANTI join reduced to
    a count (broadcastable key sides) or a pushed-down filter count;
    a healthy snapshot reads all zeros."""
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    lineitem = read_table(spark, sf_dir, "lineitem")
    n_orders = orders.agg(F.count("*").cast("long").alias("n_orders"))
    orphan_o = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"], "left_anti")
        .agg(F.count("*").cast("long").alias("orphan_orders"))
    )
    orphan_l = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"], "left_anti")
        .agg(F.count("*").cast("long").alias("orphan_lineitems"))
    )
    nonpos = orders.where(F.col("o_totalprice") <= 0).agg(
        F.count("*").cast("long").alias("nonpositive_totals")
    )
    return (
        n_orders.crossJoin(F.broadcast(orphan_o))
        .crossJoin(F.broadcast(orphan_l))
        .crossJoin(F.broadcast(nonpos))
    )


# ---------------------------------------------------------------------------
# Round-6 extension surface (seventh wave): lang-ID confusion matrix,
# KS distribution-drift monitor, weekday seasonality profile
# ---------------------------------------------------------------------------


@register(
    "lang_confusion",
    f"""
WITH t AS (
    SELECT doc_id, {_SQL_TOKENS} AS ws FROM documents
), s AS (
    SELECT doc_id,
           CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to','in','is'))) AS INT) AS score_en,
           CAST(len(list_filter(ws, w -> w IN ('der','die','das','und','ist','ein'))) AS INT) AS score_de,
           CAST(len(list_filter(ws, w -> w IN ('el','la','de','que','y','un'))) AS INT) AS score_es,
           CAST(len(list_filter(ws, w -> w IN ('le','la','et','les','des','un'))) AS INT) AS score_fr,
           CAST(len(list_filter(ws, w -> w IN ('的','是','了','在'))) AS INT) AS score_zh
    FROM t
), p AS (
    SELECT doc_id,
           CASE WHEN greatest(score_en, score_de, score_es, score_fr, score_zh) = 0 THEN 'und'
                WHEN score_en = greatest(score_en, score_de, score_es, score_fr, score_zh) THEN 'en'
                WHEN score_de = greatest(score_en, score_de, score_es, score_fr, score_zh) THEN 'de'
                WHEN score_es = greatest(score_en, score_de, score_es, score_fr, score_zh) THEN 'es'
                WHEN score_fr = greatest(score_en, score_de, score_es, score_fr, score_zh) THEN 'fr'
                ELSE 'zh' END AS predicted_lang
    FROM s
), c AS (
    SELECT d.lang, p.predicted_lang, CAST(count(*) AS BIGINT) AS n
    FROM documents d JOIN p USING (doc_id)
    GROUP BY 1, 2
)
SELECT lang, predicted_lang, n,
       round(n / CAST(sum(n) OVER (PARTITION BY lang) AS DOUBLE), 6) AS share
FROM c
""",
)
def lang_confusion_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the marker-word language identifier vs the
    labeled language — the QA for the lang-ID gate itself (which
    corpus slices the heuristic would mis-route, and where 'und'
    fallback mass concentrates). Narrow scoring map + one tiny
    langs^2-group agg + a windowed row-normalizer."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import lang_confusion

    return lang_confusion(_docs(spark, sf_dir))


@register(
    "split_drift_ks",
    """
WITH s AS (
    SELECT n_chars,
           CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 10 < 8
                THEN 'train' ELSE 'test' END AS split
    FROM documents
),
c AS (
    SELECT n_chars AS v,
           CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
           CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS cb
    FROM s GROUP BY 1
),
t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b FROM c),
cdf AS (
    SELECT v, t.n_a, t.n_b,
           round(abs(sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         / CAST(t.n_a AS DOUBLE)
                   - sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         / CAST(t.n_b AS DOUBLE)), 6) AS gap
    FROM c, t
)
SELECT n_a, n_b, gap AS ks_stat, CAST(v AS BIGINT) AS ks_at_value
FROM cdf QUALIFY row_number() OVER (ORDER BY gap DESC, v) = 1
""",
)
def split_drift_ks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between the
    hash-assigned train and test splits' n_chars distributions
    (operators/curation.py ks_drift) — the standard distribution-
    drift monitor; a hash split SHOULD read near zero, which is
    exactly what makes it the null-hypothesis fixture for the
    operator. Both samples compress to value histograms before the
    single bounded CDF window."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import ks_drift

    docs = _docs(spark, sf_dir)
    split = F.when(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast("int") % 10 < 8,
        "train",
    ).otherwise("test")
    return ks_drift(docs.withColumn("split", split), value_col="n_chars")


@register(
    "orders_weekday_seasonality",
    """
WITH per AS (
    SELECT CAST(isodow(o_orderdate) AS INT) AS dow,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM orders GROUP BY 1
)
SELECT dow, n_orders, revenue,
       round(revenue / sum(revenue) OVER (), 6) AS revenue_share,
       round((revenue / sum(revenue) OVER ()) * 7, 6) AS seasonal_index
FROM per
""",
)
def orders_weekday_seasonality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue profile by ISO day-of-week with each day's share
    indexed against uniform 1/7 — the seasonality diagnostic behind
    forecasting baselines and over/under-trading alerts. One 7-group
    hash-agg + a windowed normalizer over the 7-row frame."""
    from calculate_file_content_size_for_vector_db_spark.operators.relational import (
        weekday_seasonality,
    )

    return weekday_seasonality(read_table(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# Round-6 extension surface (seventh wave): hybrid retrieval
# ---------------------------------------------------------------------------


@register(
    "hybrid_search_rrf",
    f"""
WITH {_SQL_BM25_CTES},
ltop AS (
    SELECT query_id, doc_id, rank FROM (
        SELECT query_id, doc_id,
               CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
        FROM sc
    ) WHERE rank <= 10
),
{_SQL_EMB},
vtop AS (
    SELECT query_id, doc_id, rank FROM (
        SELECT CAST(a.vec_id AS INT) AS query_id, b.vec_id AS doc_id,
               CAST(row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC, b.vec_id) AS INT) AS rank
        FROM e a, e b WHERE a.vec_id < 3 AND a.vec_id <> b.vec_id
    ) WHERE rank <= 10
),
fused AS (
    SELECT query_id, doc_id,
           round(coalesce(1.0::DOUBLE / (60 + l.rank), 0) + coalesce(1.0::DOUBLE / (60 + v.rank), 0), 6) AS rrf_score,
           l.rank AS lex_rank, v.rank AS vec_rank
    FROM ltop l FULL OUTER JOIN vtop v USING (query_id, doc_id)
)
SELECT query_id, doc_id, rrf_score, lex_rank, vec_rank,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS INT) AS rank
FROM fused QUALIFY rank <= 10
""",
)
def hybrid_search_rrf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical top-10 fused with cosine vector
    top-10 by reciprocal-rank fusion (k=60) — the query shape every
    vector DB ships as "hybrid search", and the capstone of this
    repo's retrieval surface (bm25_search x the nine embedding tiers).
    The three keyword queries pair with query vectors 0..2 (the
    fixture's doc/vec ids align), modeling a query with both a text
    and an embedding form. rrf_fuse is rank-based, so at 100 TB the
    vector side swaps to any ANN tier (IVF x PQ, binary, SQ8) without
    touching the fusion; both fused inputs stay candidate-list-sized,
    so fusion cost never scales with the corpus."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        rrf_fuse,
        topk_bruteforce,
    )
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import bm25_search

    lex = bm25_search(_docs(spark, sf_dir), _BM25_QUERIES)
    emb = _emb(spark, sf_dir)
    vec = topk_bruteforce(emb, emb.where(F.col("vec_id") < 3), k=10).withColumnRenamed(
        "neighbor_id", "doc_id"
    )
    return rrf_fuse(lex, vec, k_rrf=60, topn=10)


# ---------------------------------------------------------------------------
# Wave 8: index-build QA (the operational numbers an index BUILD emits
# before anything is served from it — recall@k grades the serving path,
# these grade the artifact) + DSIR importance weighting for
# domain-targeted curation.
# ---------------------------------------------------------------------------


@register(
    "ivf_list_stats",
    f"""
WITH {_SQL_IVF},
sizes AS (SELECT cell, count(*) AS ls FROM assign GROUP BY cell),
tot AS (SELECT CAST(sum(ls) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS n_live FROM sizes)
SELECT CAST(cell AS INT) AS cell, CAST(ls AS BIGINT) AS list_size,
       round(ls / tot.n, 6) AS corpus_share,
       round(ls * tot.n_live / tot.n, 6) AS balance_ratio,
       CAST(8 - tot.n_live AS INT) AS dead_cells
FROM sizes, tot
""",
)
def ivf_list_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-list size profile of the IVF index (similarity.
    ivf_list_stats): per-cell size, corpus share, balance ratio vs a
    uniform split, and the dead-cell count — the build-time QA that
    catches BOTH degeneracies (one hot cell = task skew at 100 TB;
    a collapsed quantizer whose few live cells look balanced) before
    the index serves a single query. The SQL's literal 8 is
    similarity.IVF_CELLS."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import ivf_list_stats

    return ivf_list_stats(_emb(spark, sf_dir))


@register(
    "pq_reconstruction_error",
    f"""
WITH {_SQL_EMB},
{_sql_pq_chain()},
err AS (
    SELECT s.sub,
           round(list_sum(list_transform(range(1, 17),
               j -> (s.sv[j] - c.cv[j]) * (s.sv[j] - c.cv[j]))), 6) AS d2
    FROM sv s JOIN codes a ON s.vec_id = a.vec_id AND s.sub = a.sub
         JOIN cb2 c ON a.sub = c.sub AND a.code = c.code
)
SELECT CAST(sub AS INT) AS sub, CAST(count(*) AS BIGINT) AS n_subvectors,
       round(avg(d2), 6) AS avg_sq_error, round(max(d2), 6) AS max_sq_error
FROM err GROUP BY sub
""",
)
def pq_reconstruction_error_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-subspace PQ quantization distortion (similarity.
    pq_reconstruction_error): avg/max squared L2 between each
    subvector and its assigned codeword — the representation-quality
    twin of pq_recall_at_10 (recall grades the served ranking; this
    grades the compressed artifact, and sizes m and k before a
    100-TB build). The oracle reuses _sql_pq_chain's trained cb2 and
    final codes, so both engines measure the identical codebooks."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        pq_reconstruction_error,
    )

    return pq_reconstruction_error(_emb(spark, sf_dir))


@register(
    "dsir_importance",
    f"""
WITH tok AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents),
ttok AS (SELECT unnest({_SQL_TOKENS}) AS tok FROM documents WHERE lang = 'en'),
rfreq AS (SELECT tok, count(*) AS rf FROM tok GROUP BY tok),
tfreq AS (SELECT tok, count(*) AS tf FROM ttok GROUP BY tok),
w0 AS (SELECT COALESCE(r.tok, t.tok) AS tok, COALESCE(r.rf, 0) AS rf,
              COALESCE(t.tf, 0) AS tf
       FROM rfreq r FULL OUTER JOIN tfreq t ON r.tok = t.tok),
tot AS (SELECT CAST(sum(rf) AS DOUBLE) AS rn, CAST(sum(tf) AS DOUBLE) AS tn,
               CAST(count(*) AS DOUBLE) AS v FROM w0),
w AS (SELECT tok, ln(((tf + 1) / (tot.tn + tot.v)) / ((rf + 1) / (tot.rn + tot.v))) AS lr
      FROM w0, tot)
SELECT d.doc_id, s.n_tokens, s.dsir_weight
FROM documents d LEFT JOIN (
    SELECT t.doc_id, CAST(count(*) AS INT) AS n_tokens,
           round(avg(w.lr), 6) AS dsir_weight
    FROM tok t JOIN w USING (tok)
    GROUP BY t.doc_id
) s USING (doc_id)
""",
)
def dsir_importance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (textstats.dsir_importance, Xie
    et al. 2023) against an English target domain: per-doc mean
    ln(p_target/p_raw) under add-1-smoothed unigram LMs — resampling
    proportionally to exp(weight) shifts the corpus toward the
    target. The hashed-n-gram curation method sitting between the
    pure-frequency text_lm_score and a trained quality classifier."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        dsir_importance,
    )

    docs = _docs(spark, sf_dir)
    return dsir_importance(docs, docs.where(F.col("lang") == "en"))


@register(
    "source_cap_sample",
    f"""
WITH {_SQL_QUALITY_CHAIN}
SELECT d.doc_id, d.source, q.quality_score,
       CAST(row_number() OVER (
           PARTITION BY d.source
           ORDER BY q.quality_score DESC NULLS LAST, d.doc_id) AS INT) AS source_rank
FROM documents d JOIN q USING (doc_id)
QUALIFY source_rank <= 10
""",
)
def source_cap_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap (curation.cap_per_source): at most 10 docs per
    source, best composite quality first — the web-pipeline gate that
    stops one hot domain from dominating the mix. The Spark side runs
    the two-phase salted top-k (output provably identical to the
    plain window the oracle states; phase 1 can never evict a final
    winner), so the hot-domain case distributes instead of piling one
    partition."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import cap_per_source
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import quality_score

    scored = quality_score(_docs(spark, sf_dir)).select("doc_id", "source", "quality_score")
    return cap_per_source(scored, cap=10)


@register(
    "dedup_rate_by_source",
    """
WITH per_text AS (
    SELECT source, sha256(text) AS content_hash, count(*) AS copies
    FROM documents
    GROUP BY source, sha256(text)
)
SELECT source,
       CAST(sum(copies) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(sum(copies) - count(*) AS BIGINT) AS n_dup,
       round((sum(copies) - count(*)) / CAST(sum(copies) AS DOUBLE), 6) AS dup_rate
FROM per_text
GROUP BY source
""",
)
def dedup_rate_by_source_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate density per source (dedup.dup_rate_by_source) —
    the dedup observability view: the dedup ops emit pairs/survivors,
    this reports WHERE the duplication comes from, the per-domain
    number that re-prioritizes the next crawl cycle. Within-source
    semantics (a text shared across sources is a duplicate in
    neither), stated identically by both engines' GROUP BYs."""
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import dup_rate_by_source

    return dup_rate_by_source(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# Wave 9 (round 7): trained quality classifier — hashed-bag-of-words
# logistic regression, full-batch GD unrolled in pure DataFrame ops
# (the unrolled-Lloyd pattern of the kmeans chain, same 6-decimal
# per-round rounding for bit-exact cross-engine training parity).
# ---------------------------------------------------------------------------


def _sql_hashed_features(suffix: str, src: str = "documents", buckets: int = 16) -> str:
    """CTE chain tok{s}/hb{s}/cnt{s}/nt{s}/feat{s}: the hashed-bucket
    normalized-count features of curation._hashed_features over
    ``src`` (intercept pseudo-bucket -1), shared by the training chain
    and the full-corpus scoring side of the sampled-train variant."""
    s = suffix
    return ",\n".join(
        [
            f"tok{s} AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS w FROM {src})",
            f"hb{s} AS (SELECT doc_id, CAST(list_reduce(list_transform(string_split(w, ''),"
            " c -> CAST(ord(c) AS BIGINT)), (a, b) -> (a * 31 + b) % 1000000007)"
            f" % {buckets} AS INT) AS b FROM tok{s})",
            f"cnt{s} AS (SELECT doc_id, b, count(*) AS c FROM hb{s} GROUP BY doc_id, b)",
            f"nt{s} AS (SELECT doc_id, count(*) AS n FROM hb{s} GROUP BY doc_id)",
            f"feat{s} AS (SELECT c.doc_id, c.b, c.c / CAST(n.n AS DOUBLE) AS x"
            f" FROM cnt{s} c JOIN nt{s} n USING (doc_id)"
            f" UNION ALL SELECT doc_id, -1 AS b, 1.0 AS x FROM nt{s})",
        ]
    )


def _sql_logreg_chain(
    buckets: int = 16, rounds: int = 2, lr: float = 1.0, train_src: str = "documents"
) -> str:
    """DuckDB mirror of curation.quality_classifier_weights: hashed
    features (token_hash % buckets, intercept pseudo-bucket -1) over
    ``train_src``, then ``rounds`` unrolled GD steps. Final weights
    CTE is ``wl{rounds}``; its bucket universe is the TRAINING
    corpus's (matching Spark, where unseen buckets simply have no
    weight row and contribute nothing at scoring time)."""
    parts = [
        _sql_hashed_features("q", train_src, buckets),
        f"labq AS (SELECT d.doc_id, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y"
        f" FROM {train_src} d JOIN ntq USING (doc_id))",
        "ntrq AS (SELECT CAST(count(*) AS DOUBLE) AS n_train FROM labq)",
        "wl0 AS (SELECT DISTINCT b, 0.0 AS wgt FROM featq)",
    ]
    for r in range(1, rounds + 1):
        parts += [
            f"zl{r} AS (SELECT f.doc_id, round(sum(f.x * w.wgt), 6) AS z"
            f" FROM featq f JOIN wl{r - 1} w USING (b) GROUP BY f.doc_id)",
            f"pl{r} AS (SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 6) AS p FROM zl{r})",
            f"gl{r} AS (SELECT f.b, round(sum(f.x * (p.p - l.y)) / ntrq.n_train, 6) AS g"
            f" FROM featq f JOIN pl{r} p USING (doc_id) JOIN labq l USING (doc_id), ntrq"
            " GROUP BY f.b, ntrq.n_train)",
            f"wl{r} AS (SELECT w.b, round(w.wgt - {lr} * COALESCE(g.g, 0.0), 6) AS wgt"
            f" FROM wl{r - 1} w LEFT JOIN gl{r} g USING (b))",
        ]
    return ",\n".join(parts)


@register(
    "quality_classifier_weights",
    f"""
WITH {_sql_logreg_chain()}
SELECT CAST(b AS INT) AS b, wgt FROM wl2
""",
)
def quality_classifier_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained model artifact (curation.quality_classifier_weights):
    17 rows of hashed-bucket logistic weights (b=-1 intercept) after 2
    full-batch GD rounds against the English-language label — the
    fastText-style quality gate trained entirely in DataFrame algebra,
    reproduced bit-for-bit by the oracle's unrolled SQL chain. At
    100 TB this trains on a labeled sample (train_df) and broadcasts."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import (
        quality_classifier_weights,
    )

    return quality_classifier_weights(
        _docs(spark, sf_dir), positive=F.col("lang") == "en"
    ).select(F.col("b").cast("int").alias("b"), "wgt")


@register(
    "quality_classifier_score",
    f"""
WITH {_sql_logreg_chain()},
zf AS (SELECT f.doc_id, round(sum(f.x * w.wgt), 6) AS z
       FROM featq f JOIN wl2 w USING (b) GROUP BY f.doc_id)
SELECT d.doc_id, CAST(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS INT) AS label,
       round(1.0 / (1.0 + exp(-zf.z)), 6) AS score
FROM documents d LEFT JOIN zf USING (doc_id)
""",
)
def quality_classifier_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document scored by the trained classifier (curation.
    quality_classifier_score): sigmoid(w·x) next to the training label
    — the probability gate that sits above gopher_quality (rules) and
    dsir_importance (importance heuristic) in the curation ladder.
    Zero-token docs keep NULL score. Scoring is one broadcast of the
    17-row weight table + one keyed agg: linear at any corpus size."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import (
        quality_classifier_score,
    )

    return quality_classifier_score(
        _docs(spark, sf_dir), positive=F.col("lang") == "en"
    )


@register(
    "quality_classifier_score_sampled",
    f"""
WITH {_sql_logreg_chain(train_src="(SELECT * FROM documents WHERE doc_id % 4 = 0)")},
{_sql_hashed_features("f")},
zf AS (SELECT f.doc_id, round(sum(f.x * w.wgt), 6) AS z
       FROM featf f JOIN wl2 w USING (b) GROUP BY f.doc_id)
SELECT d.doc_id, CAST(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS INT) AS label,
       round(1.0 / (1.0 + exp(-zf.z)), 6) AS score
FROM documents d LEFT JOIN zf USING (doc_id)
""",
)
def quality_classifier_score_sampled_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production shape of quality_classifier_score (VERDICT r07
    item 5): GD runs on a deterministic 25% hash-sample
    (doc_id % 4 = 0) and the resulting 17-row weight table broadcasts
    to score the FULL corpus — at 100 TB training cost is
    sample-sized while scoring stays one broadcast join + one keyed
    agg over the corpus. The oracle trains its unrolled chain on the
    same sample and scores through a second full-corpus feature
    chain, so sampled-train parity is hash-checked end-to-end.
    Buckets unseen in the sample have no weight row on either side
    (inner join drops them); zero-token docs keep NULL score."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import (
        quality_classifier_score,
    )

    docs = _docs(spark, sf_dir)
    return quality_classifier_score(
        docs,
        positive=F.col("lang") == "en",
        train_df=docs.where(F.col("doc_id") % 4 == 0),
    )


@register(
    "contamination_score",
    """
WITH toks AS (
    SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '') AS ws
    FROM documents
),
sh AS (
    SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 3),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]))) AS g
    FROM toks WHERE len(ws) >= 5
),
totals AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
    FROM sh WHERE doc_id % 5 <> 0 GROUP BY doc_id
),
bg AS (SELECT DISTINCT g FROM sh WHERE doc_id % 5 = 0),
hits AS (
    SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_hits
    FROM sh t JOIN bg ON t.g = bg.g
    WHERE t.doc_id % 5 <> 0 GROUP BY t.doc_id
)
SELECT d.doc_id,
       COALESCE(t.n_grams, 0) AS n_grams,
       COALESCE(h.n_hits, 0) AS n_hits,
       round(COALESCE(h.n_hits, 0) / CAST(NULLIF(t.n_grams, 0) AS DOUBLE), 6)
           AS contamination
FROM documents d
LEFT JOIN totals t USING (doc_id)
LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 5 <> 0
""",
)
def contamination_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded benchmark-overlap measurement (curation.
    contamination_score, GPT-3 appendix-C style): for EVERY training
    doc (doc_id % 5 != 0), the fraction of its distinct 5-grams found
    anywhere in the pseudo-benchmark split — decontaminate gates on
    any overlap; this measures HOW MUCH, which sets drop-vs-surgical
    policy. Same shingle equi-join shape, benchmark side broadcast at
    scale."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import (
        contamination_score,
    )

    docs = _docs(spark, sf_dir)
    return contamination_score(
        docs.where(F.col("doc_id") % 5 != 0),
        docs.where(F.col("doc_id") % 5 == 0),
        n=5,
    )


@register(
    "leakage_safe_split",
    _SQL_MINHASH_BANDS
    + """,
cand AS (
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
pairs AS (
    SELECT c.a_id, c.b_id
    FROM cand c
    JOIN sh_t sa ON sa.doc_id = c.a_id
    JOIN sh_t sb ON sb.doc_id = c.b_id
    WHERE round(len(list_intersect(sa.sh, sb.sh)) /
          CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE), 6) >= 0.5
),
sym AS (
    SELECT a_id AS src, b_id AS dst FROM pairs
    UNION
    SELECT b_id AS src, a_id AS dst FROM pairs
),
reach AS (
    WITH RECURSIVE r(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, e.dst FROM r JOIN sym e ON r.dst = e.src
    )
    SELECT * FROM r
),
cc AS (
    SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
    FROM reach GROUP BY src
)
SELECT d.doc_id,
       CAST(COALESCE(cc.cluster_id, d.doc_id) AS BIGINT) AS cluster_id,
       CASE WHEN COALESCE(cc.cluster_id, d.doc_id) % 5 = 0 THEN 'test' ELSE 'train' END
           AS split
FROM documents d LEFT JOIN cc USING (doc_id)
""",
)
def leakage_safe_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware train/test split (curation.leakage_safe_split):
    every near-dup CLUSTER lands on one side (cluster_id = cluster-min
    doc id, test iff cluster_id % 5 == 0) — the leakage guard
    train_test_split's per-doc hashing lacks; a test doc's near-dup in
    train inflates eval exactly like benchmark contamination. Oracle:
    the dedup_clusters recursive-CTE transitive closure + the same
    modulo rule."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import (
        leakage_safe_split,
    )

    return leakage_safe_split(_docs(spark, sf_dir))


@register(
    "ccnet_lm_buckets",
    f"""
WITH tok AS (
    SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents
),
freq AS (SELECT tok, count(*) AS tf FROM tok GROUP BY tok),
tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS n FROM freq),
sc AS (
    SELECT t.doc_id, round(avg(ln(f.tf / tot.n)), 6) AS lm_score
    FROM tok t JOIN freq f USING (tok), tot
    GROUP BY t.doc_id
),
b AS (
    SELECT d.doc_id, sc.lm_score,
           ntile(3) OVER (PARTITION BY d.lang ORDER BY sc.lm_score DESC, d.doc_id) AS t
    FROM documents d JOIN sc USING (doc_id)
)
SELECT d.doc_id, d.lang, b.lm_score,
       CASE b.t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' WHEN 3 THEN 'tail' END AS lm_bucket
FROM documents d LEFT JOIN b USING (doc_id)
""",
)
def ccnet_lm_buckets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail partition (textstats.ccnet_lm_buckets,
    Wenzek et al. 2020): each language's docs split into unigram-LM
    perplexity terciles — keep head, sample middle, drop tail PER
    LANGUAGE, the bucketing that doesn't starve low-resource langs.
    One per-lang ntile window over (score, id) pairs on top of the
    text_lm_score chain; zero-token docs keep NULL score and bucket."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        ccnet_lm_buckets,
    )

    return ccnet_lm_buckets(_docs(spark, sf_dir))


@register(
    "dedup_pair_quality",
    _SQL_MINHASH_BANDS
    + f""",
truth AS (
    SELECT sa.doc_id AS a_id, sb.doc_id AS b_id
    FROM sh_t sa JOIN sh_t sb ON sa.doc_id < sb.doc_id
    WHERE round(len(list_intersect(sa.sh, sb.sh))
          / CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE), 6)
          >= 0.5
),
cand AS (
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
lshp AS (
    SELECT c.a_id, c.b_id FROM cand c
    JOIN sh_t sa ON sa.doc_id = c.a_id
    JOIN sh_t sb ON sb.doc_id = c.b_id
    WHERE round(len(list_intersect(sa.sh, sb.sh))
          / CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE), 6)
          >= 0.5
),
bands_f AS (
    SELECT * FROM bands
    QUALIFY count(*) OVER (PARTITION BY band, band_hash) <= {PROD_MAX_BUCKET_SIZE}
),
cand_c AS (
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM bands_f a JOIN bands_f b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
lshc AS (
    SELECT c.a_id, c.b_id FROM cand_c c
    JOIN sh_t sa ON sa.doc_id = c.a_id
    JOIN sh_t sb ON sb.doc_id = c.b_id
    WHERE round(len(list_intersect(sa.sh, sb.sh))
          / CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE), 6)
          >= 0.5
),
simh AS (
    SELECT doc_id,
           list_transform(ws, w -> list_reduce(
               list_transform(string_split(w, ''), c -> CAST(ord(c) AS BIGINT)),
               (a, b) -> (a * 31 + b) % 1000000007)) AS hs
    FROM ws_t
),
simv AS (
    SELECT doc_id,
           CASE WHEN len(hs) = 0 THEN 0
                ELSE CAST(list_sum(list_transform(range(0, 16),
                    b -> CASE WHEN 2 * len(list_filter(hs, h -> (h >> b) & 1 = 1)) > len(hs)
                              THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) END AS s
    FROM simh
),
simp AS (
    SELECT a.doc_id AS a_id, b.doc_id AS b_id
    FROM simv a JOIN simv b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.s, b.s)) <= 3
),
m AS (
    SELECT 'minhash_lsh' AS method,
           (SELECT count(*) FROM truth) AS n_true,
           (SELECT count(*) FROM lshp) AS n_found,
           (SELECT count(*) FROM lshp p JOIN truth t
             ON p.a_id = t.a_id AND p.b_id = t.b_id) AS n_hit
    UNION ALL
    SELECT 'minhash_lsh_capped',
           (SELECT count(*) FROM truth),
           (SELECT count(*) FROM lshc),
           (SELECT count(*) FROM lshc p JOIN truth t
             ON p.a_id = t.a_id AND p.b_id = t.b_id)
    UNION ALL
    SELECT 'simhash',
           (SELECT count(*) FROM truth),
           (SELECT count(*) FROM simp),
           (SELECT count(*) FROM simp p JOIN truth t
             ON p.a_id = t.a_id AND p.b_id = t.b_id)
)
SELECT method, CAST(n_true AS BIGINT) AS n_true, CAST(n_found AS BIGINT) AS n_found,
       CAST(n_hit AS BIGINT) AS n_hit,
       round(n_hit / CAST(NULLIF(n_true, 0) AS DOUBLE), 6) AS pair_recall,
       round(n_hit / CAST(NULLIF(n_found, 0) AS DOUBLE), 6) AS pair_precision
FROM m
""",
)
def dedup_pair_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup counterpart of the ANN recall matrix (dedup.
    dedup_pair_quality): per candidate tier (MinHash-LSH, its
    production bucket-capped form, SimHash), recall and precision
    against the exact word-3-gram Jaccard truth — LSH tiers verify by
    exact Jaccard so their precision is 1.0 by construction and recall
    isolates banding coverage; SimHash's precision measures how well
    sketch hamming proxies Jaccard on this corpus. The parameter-
    picking numbers before a 100-TB dedup run."""
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import (
        dedup_pair_quality,
    )

    return dedup_pair_quality(_docs(spark, sf_dir))


@register(
    "repetition_filters",
    f"""
WITH lines AS (
    SELECT doc_id, trim(ln) AS ln
    FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS ln FROM documents)
    WHERE trim(ln) <> ''
),
per_line AS (SELECT doc_id, ln, count(*) AS c FROM lines GROUP BY doc_id, ln),
line_stats AS (
    SELECT doc_id,
           round(sum(CASE WHEN c > 1 THEN c ELSE 0 END) / CAST(sum(c) AS DOUBLE), 6)
               AS dup_line_frac,
           round(sum(CASE WHEN c > 1 THEN c * length(ln) ELSE 0 END)
               / CAST(sum(c * length(ln)) AS DOUBLE), 6) AS dup_line_char_frac
    FROM per_line GROUP BY doc_id
),
ws_rep AS (SELECT doc_id, {_SQL_TOKENS} AS ws FROM documents),
tchars AS (
    SELECT doc_id, CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE) AS tchars
    FROM ws_rep WHERE len(ws) > 0
),
bg AS (
    SELECT doc_id, unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS g
    FROM ws_rep
),
per_bg AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
top_bg AS (
    SELECT doc_id, round(c * (length(g) - 1) / t.tchars, 6) AS top_2gram_char_frac
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g) AS rn
          FROM per_bg) b
    JOIN tchars t USING (doc_id)
    WHERE rn = 1
),
g5 AS (
    SELECT doc_id,
           unnest(range(1, greatest(len(ws) - 3, 1))) - 1 AS pos,
           unnest(list_transform(range(1, greatest(len(ws) - 3, 1)),
               i -> array_to_string(ws[i : i + 4], ' '))) AS g
    FROM ws_rep WHERE len(ws) >= 5
),
g5c AS (SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY doc_id, g),
covered AS (
    SELECT DISTINCT g5.doc_id, g5.pos + unnest([0, 1, 2, 3, 4]) AS pos
    FROM g5 JOIN g5c ON g5.doc_id = g5c.doc_id AND g5.g = g5c.g
    WHERE g5c.c >= 2
),
tokpos AS (
    SELECT doc_id, unnest(range(1, len(ws) + 1)) - 1 AS pos, unnest(ws) AS w
    FROM ws_rep
),
cov_chars AS (
    SELECT c.doc_id, CAST(sum(length(t.w)) AS DOUBLE) AS cchars
    FROM covered c JOIN tokpos t ON c.doc_id = t.doc_id AND c.pos = t.pos
    GROUP BY c.doc_id
)
SELECT d.doc_id,
       COALESCE(ls.dup_line_frac, 0.0) AS dup_line_frac,
       COALESCE(ls.dup_line_char_frac, 0.0) AS dup_line_char_frac,
       COALESCE(tb.top_2gram_char_frac, 0.0) AS top_2gram_char_frac,
       COALESCE(round(cc.cchars / tc.tchars, 6), 0.0) AS dup_5gram_char_frac
FROM documents d
LEFT JOIN line_stats ls USING (doc_id)
LEFT JOIN top_bg tb USING (doc_id)
LEFT JOIN tchars tc USING (doc_id)
LEFT JOIN cov_chars cc USING (doc_id)
""",
)
def repetition_filters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher REPETITION rules (textstats.repetition_filters, Rae et
    al. 2021 table A1 — the half of the Gopher set gopher_quality's
    scalar features don't cover): duplicate-line fractions, the top
    bigram's character share, and the positional character coverage of
    duplicated 5-grams. Three explodes feeding per-doc hash-aggs —
    no corpus-wide window, linear at any scale."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        repetition_filters,
    )

    return repetition_filters(_docs(spark, sf_dir))


@register(
    "compaction_plan",
    """
SELECT source,
       doc_id,
       CAST(length(text) AS BIGINT) AS size_bytes,
       CAST(floor(COALESCE(sum(length(text)) OVER (
           PARTITION BY source ORDER BY length(text) DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 4096.0) AS INT)
           AS compact_bin
FROM documents
""",
)
def compaction_plan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction planning (maintenance.compaction_plan):
    per source partition, greedy first-fit packing of files into
    ~target-byte output bins via one exclusive-frame window sum over
    the LISTING (metadata only, never contents). Exercised here on the
    documents table as the file inventory (doc_id=path,
    length(text)=size, 4 KB target at fixture scale); on a real lake
    the input is the recursive file scan (SRC1/SRC2) and the target is
    ~128 MB row groups."""
    from calculate_file_content_size_for_vector_db_spark.operators.maintenance import (
        compaction_plan,
    )

    docs = _docs(spark, sf_dir)
    return compaction_plan(
        docs.select("source", "doc_id", F.length("text").alias("size_bytes")),
        target_bytes=4096,
        partition_col="source",
        size_col="size_bytes",
        key="doc_id",
    )


@register(
    "lake_vacuum_plan",
    """
WITH waves AS (
    SELECT doc_id, source, 0 AS v FROM documents
    UNION ALL SELECT doc_id, source, 1 FROM documents WHERE doc_id % 5 = 0
    UNION ALL SELECT doc_id, source, 2 FROM documents WHERE doc_id % 5 = 0
),
latest AS (SELECT doc_id, max(v) AS maxv FROM waves GROUP BY doc_id),
per_file AS (
    SELECT w.source, w.v,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN w.v = l.maxv THEN 1 ELSE 0 END) AS BIGINT) AS n_live
    FROM waves w JOIN latest l USING (doc_id)
    GROUP BY w.source, w.v
)
SELECT source, CAST(v AS INT) AS v, n_rows, n_live,
       round(n_live / CAST(n_rows AS DOUBLE), 6) AS live_frac,
       n_live / CAST(n_rows AS DOUBLE) < 0.5 AS vacuum_candidate
FROM per_file
""",
)
def lake_vacuum_plan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-version GC planning (maintenance.vacuum_plan), closing the
    lake-maintenance triad: snapshot_diff = what changed,
    compaction_plan = small files, vacuum_plan = superseded rows. A
    three-wave versioned lake is physically WRITTEN to parquet (wave 0
    = initial load of every doc; waves 1 and 2 re-crawl the doc_id %
    5 == 0 set, so wave 1's file ends up fully dead), read back, and
    every physical file is scored by its live-row fraction under
    latest-version-wins — files below 50% live are vacuum candidates.
    One file per (source, wave) by construction (single-task
    partitioned writes), so the oracle reasons at (source, v)
    granularity while the Spark side attributes rows to REAL files via
    input_file_name — the hash covers the store round-trip and the
    file-attribution seam."""
    import tempfile

    from calculate_file_content_size_for_vector_db_spark.operators.maintenance import (
        vacuum_plan,
    )

    docs = _docs(spark, sf_dir)
    lake = tempfile.mkdtemp(prefix="lake_vacuum_")
    for v, pred in ((0, "1 = 1"), (1, "doc_id % 5 = 0"), (2, "doc_id % 5 = 0")):
        (
            docs.where(pred)
            .select("doc_id", "source", F.lit(v).cast("long").alias("_v"))
            .repartition(1)
            .write.partitionBy("source")
            .mode("append")
            .parquet(lake)
        )
    read = spark.read.parquet(lake).withColumn("_file", F.input_file_name())
    plan = vacuum_plan(read)
    file_ident = read.select("_file", "source", "_v").distinct()
    return plan.join(file_ident, "_file").select(
        "source",
        F.col("_v").cast("int").alias("v"),
        "n_rows",
        "n_live",
        "live_frac",
        "vacuum_candidate",
    )


# ---------------------------------------------------------------------------
# Round-8 wave 17: layout-prune QA (the observable that justifies a
# Z-order rewrite), retrieval-family recall (grading the lexical and
# hybrid paths against the same exact-cosine truth the ANN tiers use),
# and the token-denominated mixing recipe (the unit LLM budgets are
# actually written in).
# ---------------------------------------------------------------------------


@register(
    "zonemap_prune_stats",
    """
WITH span AS (
    SELECT min(o_custkey) AS ck_lo, max(o_custkey) AS ck_hi,
           min(o_orderdate) AS dt_lo, max(o_orderdate) AS dt_hi
    FROM orders
),
wz AS (
    SELECT CAST((o_custkey - ck_lo) * 16 // (ck_hi - ck_lo + 1) AS BIGINT) AS x,
           CAST(date_diff('day', dt_lo, o_orderdate) * 16
                // (date_diff('day', dt_lo, dt_hi) + 1) AS BIGINT) AS y
    FROM orders, span
),
z AS (
    SELECT x, y,
           (((x >> 0) & 1) << 0) + (((y >> 0) & 1) << 1)
         + (((x >> 1) & 1) << 2) + (((y >> 1) & 1) << 3)
         + (((x >> 2) & 1) << 4) + (((y >> 2) & 1) << 5)
         + (((x >> 3) & 1) << 6) + (((y >> 3) & 1) << 7) AS zv
    FROM wz
),
tagged AS (
    SELECT 'zorder' AS layout, CAST(zv // 16 AS INT) AS file_id, x, y FROM z
    UNION ALL
    SELECT 'linear' AS layout, CAST(x AS INT) AS file_id, x, y FROM z
),
boxes AS (
    SELECT layout, file_id, min(x) AS min_x, max(x) AS max_x,
           min(y) AS min_y, max(y) AS max_y
    FROM tagged GROUP BY 1, 2
),
preds AS (
    SELECT * FROM (VALUES
        ('custkey_band', 6, 7, 0, 15),
        ('date_band', 0, 15, 6, 7),
        ('both_bands', 6, 7, 6, 7)) AS t(predicate, px_lo, px_hi, py_lo, py_hi)
),
hit AS (
    SELECT layout, predicate,
           CASE WHEN max_x >= px_lo AND min_x <= px_hi
                 AND max_y >= py_lo AND min_y <= py_hi
           THEN 1 ELSE 0 END AS must_read
    FROM boxes CROSS JOIN preds
)
SELECT layout, predicate,
       CAST(count(*) AS BIGINT) AS files_total,
       CAST(sum(must_read) AS BIGINT) AS files_read,
       round(1.0 - sum(must_read) / CAST(count(*) AS DOUBLE), 6) AS prune_fraction
FROM hit GROUP BY 1, 2
""",
)
def zonemap_prune_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map prunability of Z-order vs linear layout
    (maintenance.zonemap_prune_stats) — the 6-row observable that
    justifies paying for an OPTIMIZE ZORDER rewrite: for the same 16
    files, the custkey-sorted linear layout reads 2/16 files on a
    custkey band but ALL files on a date band, while the Morton layout
    reads a few files on either axis and fewest on the conjunction.
    Faithful zone-map semantics (per-file min/max box intersection, so
    false-positive files count as read, exactly like parquet row-group
    skipping). One span broadcast + one narrow quantize/interleave
    scan + a 32-group hash-agg; the 3-row predicate frame joins
    broadcast."""
    from calculate_file_content_size_for_vector_db_spark.operators.maintenance import (
        zonemap_prune_stats,
    )

    return zonemap_prune_stats(read_table(spark, sf_dir, "orders"))


@register(
    "retrieval_recall_families",
    f"""
WITH {_SQL_BM25_CTES},
ltop AS (
    SELECT query_id, doc_id, rank FROM (
        SELECT query_id, doc_id,
               CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
        FROM sc
    ) WHERE rank <= 10
),
{_SQL_EMB},
vtop AS (
    SELECT query_id, doc_id, rank FROM (
        SELECT CAST(a.vec_id AS INT) AS query_id, b.vec_id AS doc_id,
               CAST(row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC, b.vec_id) AS INT) AS rank
        FROM e a, e b WHERE a.vec_id < 3 AND a.vec_id <> b.vec_id
    ) WHERE rank <= 10
),
fused AS (
    SELECT query_id, doc_id,
           round(coalesce(1.0::DOUBLE / (60 + l.rank), 0) + coalesce(1.0::DOUBLE / (60 + v.rank), 0), 6) AS rrf_score
    FROM ltop l FULL OUTER JOIN vtop v USING (query_id, doc_id)
),
hy AS (
    SELECT query_id, doc_id FROM (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS rank
        FROM fused
    ) WHERE rank <= 10
)
SELECT 'lexical' AS family,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(ap.doc_id) AS BIGINT) AS n_hits,
       round(count(ap.doc_id) / CAST(count(*) AS DOUBLE), 6) AS recall
FROM vtop ex LEFT JOIN ltop ap
  ON ex.query_id = ap.query_id AND ex.doc_id = ap.doc_id
UNION ALL
SELECT 'hybrid' AS family,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(ap.doc_id) AS BIGINT) AS n_hits,
       round(count(ap.doc_id) / CAST(count(*) AS DOUBLE), 6) AS recall
FROM vtop ex LEFT JOIN hy ap
  ON ex.query_id = ap.query_id AND ex.doc_id = ap.doc_id
""",
)
def retrieval_recall_families_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the LEXICAL (BM25) and HYBRID (RRF-fused) retrieval
    families against the exact-cosine truth — extending the recall
    matrix that so far graded only the ANN tiers to the other two
    families the engine serves. The three two-form fixture queries
    (keyword text paired with query vectors 0..2) are retrieved
    lexically and by exact vector search, fused by RRF, and both
    candidate lists are scored against the same brute-force truth the
    ANN recall rows use; the vector side IS that truth, so the hybrid
    row isolates what fusing a (recall-1.0) vector list with a lexical
    list costs or buys. Everything past the BM25 scoring join is
    candidate-list-sized (3 queries x 10 rows); the recall join and
    1-row aggregates never scale with the corpus."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        recall_vs_exact,
        rrf_fuse,
        topk_bruteforce,
    )
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import bm25_search

    emb = _emb(spark, sf_dir)
    exact = topk_bruteforce(emb, emb.where(F.col("vec_id") < 3), k=10)
    lex = bm25_search(_docs(spark, sf_dir), _BM25_QUERIES)
    hyb = rrf_fuse(lex, exact.withColumnRenamed("neighbor_id", "doc_id"), k_rrf=60, topn=10)
    lex_recall = recall_vs_exact(exact, lex.withColumnRenamed("doc_id", "neighbor_id"))
    hyb_recall = recall_vs_exact(exact, hyb.withColumnRenamed("doc_id", "neighbor_id"))
    return lex_recall.select(F.lit("lexical").alias("family"), "*").unionByName(
        hyb_recall.select(F.lit("hybrid").alias("family"), "*")
    )


@register(
    "mix_token_budget",
    f"""
WITH c AS (
    SELECT lang, CAST(sum(len({_SQL_TOKENS})) AS BIGINT) AS n_tokens
    FROM documents GROUP BY lang
),
t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total,
             sum(pow(CAST(n_tokens AS DOUBLE), 0.5)) AS wsum_raw FROM c),
q AS (
    SELECT lang, n_tokens, total,
           n_tokens / CAST(total AS DOUBLE) AS share,
           pow(n_tokens / CAST(total AS DOUBLE), 0.5)
               / (wsum_raw / pow(CAST(total AS DOUBLE), 0.5)) AS mw
    FROM c, t
)
SELECT lang, n_tokens,
       round(share, 6) AS token_share,
       round(mw, 6) AS mix_weight,
       round(mw * 1.0 * total, 6) AS target_tokens,
       CASE WHEN n_tokens > 0
            THEN round(mw * 1.0 * total / CAST(n_tokens AS DOUBLE), 6) END AS epochs,
       CASE WHEN n_tokens > 0
            THEN mw * 1.0 * total / CAST(n_tokens AS DOUBLE) > 1.0 END AS upsampled,
       CASE WHEN n_tokens > 0
            THEN mw * 1.0 * total / CAST(n_tokens AS DOUBLE) > 4.0 END AS over_repeat_cap
FROM q
""",
)
def mix_token_budget_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-denominated temperature mixing recipe (textstats.
    token_budget_recipe, alpha=0.5, budget = one corpus-epoch of
    tokens) — the unit an LLM training budget is actually written in,
    next to mix_temperature_recipe's doc-denominated form. Emits per
    language the implied EPOCH count (target tokens / available
    tokens) plus the two flags a recipe review needs: upsampled
    (repeated beyond one pass) and over_repeat_cap (past the ~4-epoch
    data-constrained-scaling regime where repetition stops helping).
    One corpus scan (narrow size(split()) map, no explode), a
    |langs|-group agg, a 1-row broadcast normalizer; flags compare the
    unrounded ratio so both engines agree at the boundary."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        token_budget_recipe,
    )

    return token_budget_recipe(_docs(spark, sf_dir), alpha=0.5, budget_frac=1.0, max_epochs=4.0)


@register(
    "bpe_fertility_by_lang",
    _sql_bpe_chain(_BPE_N)
    + f""",
vocab AS (
    SELECT word,
           CAST(len(string_split(trim(repr), '  ')) AS BIGINT) AS n_sym
    FROM r{_BPE_N}
),
tk AS (SELECT lang, unnest({_SQL_TOKENS}) AS word FROM documents),
g AS (
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens,
           CAST(sum(length(word)) AS BIGINT) AS n_chars
    FROM tk JOIN vocab USING (word) GROUP BY lang
)
SELECT lang, n_words, n_bpe_tokens, n_chars,
       round(n_bpe_tokens / CAST(n_words AS DOUBLE), 6) AS fertility,
       round(n_chars / CAST(n_bpe_tokens AS DOUBLE), 6) AS chars_per_token
FROM g
""",
)
def bpe_fertility_by_lang_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer FERTILITY (BPE tokens per word) and
    compression (chars per BPE token) under the trained merge table
    (textstats.bpe_fertility) — the multilingual-tokenizer equity
    metric: the language the 8 greedy merges underserve segments into
    more pieces per word and pays more sequence length for the same
    text, making it the first candidate for more merges or more
    training data. The QUALITY half of the tokenizer-staleness pair
    (bpe_vocab_coverage = how much of the batch the vocab has seen;
    this row = how well it segments what it saw). Training is the
    vocab-bounded 8-round chain scanned once from the corpus; serving
    is one explode + broadcast |V|-row join + |langs|-group agg."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        bpe_fertility,
    )

    return bpe_fertility(_docs(spark, sf_dir))


_SQL_TRAIN17 = "(SELECT * FROM documents WHERE doc_id % 17 <> 0)"
_SQL_SERVE17 = "(SELECT * FROM documents WHERE doc_id % 17 = 0)"


@register(
    "serving_pipeline",
    _sql_bpe_chain(_BPE_N, train_where="WHERE doc_id % 17 <> 0")
    + f""",
nw AS (
    SELECT DISTINCT t AS word
    FROM (SELECT unnest({_SQL_TOKENS}) AS t FROM documents WHERE doc_id % 17 = 0)
),
a0 AS (
    SELECT word,
           ' ' || array_to_string(string_split(word, ''), '  ') || ' ' AS repr
    FROM nw
),
"""
    + ",\n".join(
        f"""a{i} AS (
    SELECT word, replace(repr, ' ' || b.lhs || '  ' || b.rhs || ' ',
                         ' ' || b.merged || ' ') AS repr
    FROM a{i - 1} CROSS JOIN b{i} b
)"""
        for i in range(1, _BPE_N + 1)
    )
    + f""",
bvoc AS (
    SELECT word,
           CAST(len(string_split(trim(repr), '  ')) AS BIGINT) AS n_sym
    FROM a{_BPE_N}
),
btk AS (
    SELECT doc_id, unnest({_SQL_TOKENS}) AS word
    FROM documents WHERE doc_id % 17 = 0
),
btok AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens
    FROM btk JOIN bvoc USING (word) GROUP BY doc_id
),
{_sql_logreg_chain(train_src=_SQL_TRAIN17)},
{_sql_hashed_features("f", _SQL_SERVE17)},
zf AS (SELECT f.doc_id, round(sum(f.x * w.wgt), 6) AS z
       FROM featf f JOIN wl2 w USING (b) GROUP BY f.doc_id),
{_SQL_EMB},
eb AS (SELECT * FROM e WHERE vec_id % 17 <> 0),
es AS (SELECT * FROM e WHERE vec_id % 17 = 0),
{_sql_kmeans_chain(src="eb", tag="v")},
centx AS (SELECT cell, cv FROM centv3),
routeb AS (
    SELECT vec_id, cell FROM (
        SELECT a.vec_id, c.cell,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, c.cv), 6) DESC, c.cell) AS rn
        FROM eb a, centx c
    ) WHERE rn = 1
),
routes AS (
    SELECT vec_id, cell, cell_cosine FROM (
        SELECT a.vec_id, c.cell,
               round(list_cosine_similarity(a.v, c.cv), 6) AS cell_cosine,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, c.cv), 6) DESC, c.cell) AS rn
        FROM es a, centx c
    ) WHERE rn = 1
),
nn AS (
    SELECT query_id, neighbor_id, nn_cosine FROM (
        SELECT s.vec_id AS query_id, b.vec_id AS neighbor_id,
               round(list_cosine_similarity(sv.v, bv.v), 6) AS nn_cosine,
               row_number() OVER (PARTITION BY s.vec_id
                   ORDER BY round(list_cosine_similarity(sv.v, bv.v), 6) DESC, b.vec_id) AS rn
        FROM routes s JOIN routeb b ON s.cell = b.cell
        JOIN es sv ON sv.vec_id = s.vec_id
        JOIN eb bv ON bv.vec_id = b.vec_id
    ) WHERE rn = 1
)
SELECT d.doc_id,
       CAST(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS INT) AS label,
       round(1.0 / (1.0 + exp(-zf.z)), 6) AS score,
       btok.n_tokens, btok.n_bpe_tokens,
       CAST(routes.cell AS INT) AS cell, routes.cell_cosine,
       nn.neighbor_id AS nn_id, nn.nn_cosine
FROM {_SQL_SERVE17} d
LEFT JOIN zf USING (doc_id)
LEFT JOIN btok USING (doc_id)
LEFT JOIN routes ON routes.vec_id = d.doc_id
LEFT JOIN nn ON nn.query_id = d.doc_id
""",
)
def serving_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The artifact-SERVING flagship: one lazy plan pushes the same
    held-out ingest batch (doc_id % 17 == 0 — the bpe_apply_oov
    split) through all three trained-artifact families this engine
    stores: (1) the quality classifier trained on the REST of the
    corpus scores the batch via the 17-row weight broadcast, (2) the
    BPE tokenizer trained on the rest segments every batch word by
    replaying the stored merge table (the OOV fold), and (3) the IVF
    index trained on the rest ROUTES each batch embedding to its
    frozen cell and answers the in-cell exact top-1 neighbor. One row
    per batch doc: doc_id, label, score, n_tokens, n_bpe_tokens,
    cell, cell_cosine, nn_id, nn_cosine (NULLs where the doc has no
    tokens or no embedding). This is the daily-ingest shape at 100
    TB: every artifact is train-once (sampled) + broadcast; the only
    batch-vs-corpus join is the cell-pruned neighbor probe, and every
    stage's cost is batch-sized except the one corpus scan each
    training consumes (sampled in production, exercised in full by
    the dedicated per-artifact queries). The parquet store seams are
    covered by sim_topk_ivf_stored / sim_ivf_append; this composition
    pins that the three SERVING paths agree end-to-end in one plan."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import (
        quality_classifier_score,
    )
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        as_double,
        cosine,
        ivf_append_assign,
        ivf_centroids,
    )
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        bpe_apply_oov,
    )

    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    serve_docs = docs.where(F.col("doc_id") % 17 == 0)
    train_docs = docs.where(F.col("doc_id") % 17 != 0)
    scored = quality_classifier_score(
        serve_docs, positive=F.col("lang") == "en", train_df=train_docs
    )
    toks = bpe_apply_oov(docs)
    base = emb.where(F.col("vec_id") % 17 != 0)
    batch = emb.where(F.col("vec_id") % 17 == 0)
    cents = ivf_centroids(base)
    routed = ivf_append_assign(batch, cents)
    base_assign = ivf_append_assign(base, cents)
    qv = batch.select(
        F.col("vec_id").alias("query_id"), as_double("embedding").alias("qv")
    ).join(routed.select(F.col("vec_id").alias("query_id"), "cell"), "query_id")
    cv = base.select(
        F.col("vec_id").alias("neighbor_id"), as_double("embedding").alias("cv")
    ).join(base_assign.select(F.col("vec_id").alias("neighbor_id"), "cell"), "neighbor_id")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("nn_cosine"), F.asc("neighbor_id")
    )
    nn = (
        cv.join(F.broadcast(qv), "cell")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("nn_cosine"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col("query_id").alias("doc_id"),
            F.col("neighbor_id").alias("nn_id"),
            "nn_cosine",
        )
    )
    return (
        scored.join(toks, "doc_id", "left")
        .join(
            routed.select(
                F.col("vec_id").alias("doc_id"),
                F.col("cell").cast("int").alias("cell"),
                "cell_cosine",
            ),
            "doc_id",
            "left",
        )
        .join(nn, "doc_id", "left")
        .select(
            "doc_id",
            "label",
            "score",
            "n_tokens",
            "n_bpe_tokens",
            "cell",
            "cell_cosine",
            "nn_id",
            "nn_cosine",
        )
    )


@register(
    "ingest_pipeline",
    _SQL_MINHASH_BANDS
    + f""",
cand AS (
    SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_hash = b.band_hash
    WHERE a.doc_id % {_INCR_BATCH_MOD} = 0 AND b.doc_id % {_INCR_BATCH_MOD} <> 0
),
dups AS (
    SELECT new_id, CAST(count(*) AS BIGINT) AS n_corpus_dups
    FROM (
        SELECT c.new_id, c.corpus_id,
               len(list_intersect(sa.sh, sb.sh)) AS inter,
               len(sa.sh) AS n_a, len(sb.sh) AS n_b
        FROM cand c
        JOIN sh_t sa ON sa.doc_id = c.new_id
        JOIN sh_t sb ON sb.doc_id = c.corpus_id
    )
    WHERE round(inter / CAST(n_a + n_b - inter AS DOUBLE), 6) >= 0.5
    GROUP BY new_id
),
{_SQL_EMB},
e7 AS (SELECT * FROM e WHERE vec_id % {_INCR_BATCH_MOD} <> 0),
{_sql_kmeans_chain(src="e7", tag="i")},
centi AS (SELECT cell, cv FROM centi3),
assign AS (
    SELECT vec_id, cell, cell_cosine FROM (
        SELECT a.vec_id, c.cell,
               round(list_cosine_similarity(a.v, c.cv), 6) AS cell_cosine,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, c.cv), 6) DESC, c.cell) AS rn
        FROM e a, centi c
        WHERE a.vec_id % {_INCR_BATCH_MOD} = 0
    ) WHERE rn = 1
)
SELECT d.doc_id,
       coalesce(p.n_corpus_dups, 0) AS n_corpus_dups,
       p.new_id IS NULL AS admitted,
       CASE WHEN p.new_id IS NULL THEN CAST(a.cell AS INT) END AS cell,
       CASE WHEN p.new_id IS NULL THEN a.cell_cosine END AS cell_cosine
FROM documents d
LEFT JOIN dups p ON p.new_id = d.doc_id
LEFT JOIN assign a ON a.vec_id = d.doc_id
WHERE d.doc_id % {_INCR_BATCH_MOD} = 0
""",
)
def ingest_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily-INGEST flagship, completing the composed-pipeline
    triad (training_pipeline = offline curation, serving_pipeline =
    artifact serving, this = the write path): one lazy plan pushes
    the daily batch (doc_id % 7 == 0, the incremental family's split)
    through the full admission chain — (1) the Bloom pre-gate probes
    the corpus band bitmap (bounded broadcast; no-false-negatives
    means the gate is invisible to the oracle, the
    dedup_incremental_bloom equality exercised INSIDE a composition),
    (2) gated docs pay the band join against the STORED corpus
    artifacts and verify exact Jaccard, (3) survivors are admitted,
    and (4) admitted docs' embeddings route to their frozen IVF cell
    (ivf_append_assign — the packed-centroid broadcast map), ready to
    append to the assignment store. One row per batch doc: doc_id,
    n_corpus_dups, admitted, cell, cell_cosine (NULL cell for
    rejected docs and docs without embeddings). Every stage is
    batch-sized except the stored-artifact scans the corpus side
    already paid for; at 100 TB the quantizer trains on a sample and
    the bitmap/band/shingle/centroid tables are the parquet stores
    the dedicated per-artifact queries pin."""
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import (
        bloom_neardup_prefilter,
        incremental_neardup_pairs,
        minhash_bands,
        minhash_signature,
        shingle_sets,
    )
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        ivf_append_assign,
        ivf_centroids,
    )

    docs = _docs(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    batch = docs.where(F.col("doc_id") % _INCR_BATCH_MOD == 0)
    corpus = docs.where(F.col("doc_id") % _INCR_BATCH_MOD != 0)
    corpus_bands = minhash_bands(minhash_signature(corpus))
    gate = bloom_neardup_prefilter(batch, corpus_bands)
    batch_flagged = batch.join(
        gate.where(F.col("maybe_neardup")).select("doc_id"), "doc_id", "left_semi"
    )
    pairs = incremental_neardup_pairs(
        batch_flagged, corpus_bands, shingle_sets(corpus)
    )
    dups = pairs.groupBy(F.col("new_id").alias("doc_id")).agg(
        F.count("*").cast("long").alias("_nd")
    )
    cents = ivf_centroids(emb.where(F.col("vec_id") % _INCR_BATCH_MOD != 0))
    routed = ivf_append_assign(
        emb.where(F.col("vec_id") % _INCR_BATCH_MOD == 0), cents
    ).select(F.col("vec_id").alias("doc_id"), "cell", "cell_cosine")
    admitted = F.col("_nd").isNull()
    return (
        batch.select("doc_id")
        .join(dups, "doc_id", "left")
        .join(routed, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("_nd"), F.lit(0)).cast("long").alias("n_corpus_dups"),
            admitted.alias("admitted"),
            F.when(admitted, F.col("cell")).cast("int").alias("cell"),
            F.when(admitted, F.col("cell_cosine")).alias("cell_cosine"),
        )
    )


@register(
    "paragraph_dedup_rewrite",
    """
WITH w AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
    FROM documents
),
p AS (
    SELECT doc_id, pid, para FROM (
        SELECT doc_id, CAST(j AS INT) AS pid,
               array_to_string(ws[j * 5 + 1 : j * 5 + 5], ' ') AS para
        FROM (SELECT doc_id, ws,
                     unnest(range(0, greatest((len(ws) - 1) // 5, 0) + 1)) AS j
              FROM w)
    ) WHERE para <> ''
),
k AS (
    SELECT doc_id, pid, para,
           row_number() OVER (PARTITION BY para ORDER BY doc_id, pid) AS rn
    FROM p
),
kept AS (SELECT doc_id, pid, para FROM k WHERE rn = 1),
t AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras FROM p GROUP BY doc_id),
ka AS (
    SELECT doc_id, array_to_string(list(para ORDER BY pid), ' ') AS text_dedup,
           CAST(count(*) AS BIGINT) AS n_kept
    FROM kept GROUP BY doc_id
)
SELECT d.doc_id, coalesce(ka.text_dedup, '') AS text_dedup,
       CAST(coalesce(t.n_paras, 0) AS BIGINT) AS n_paras,
       CAST(coalesce(ka.n_kept, 0) AS BIGINT) AS n_kept
FROM documents d LEFT JOIN t USING (doc_id) LEFT JOIN ka USING (doc_id)
""",
)
def paragraph_dedup_rewrite_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-document paragraph dedup with rewrite (dedup.
    paragraph_dedup_rewrite) — the unit CCNet actually dedups at:
    every paragraph keeps its corpus-wide FIRST occurrence (smallest
    (doc, position)), later copies are removed from any document, and
    survivors re-join in document order. Completes the rewrite
    granularity ladder (span_dedup_rewrite = 50-token windows
    cross-doc, line_dedup_rewrite = lines within-doc). The fixture's
    single-line docs are re-paragraphed into 5-word groups. First
    occurrence is groupBy-min + equi-join (map-side combine, so a
    billion-copy boilerplate paragraph collapses before the shuffle
    instead of hot-spotting a window partition); paragraphing itself
    is a per-row narrow map."""
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import (
        paragraph_dedup_rewrite,
    )

    return paragraph_dedup_rewrite(_docs(spark, sf_dir))


def _sql_graph_beam_chain(
    k_graph: int = 8, beam: int = 16, hops: int = 3, ed_sql: str | None = None
) -> str:
    """Unrolled NSW-style beam search (the kmeans-chain discipline
    applied to graph ANN): ed = the exact kNN graph (or a caller-
    supplied ``ed_sql`` CTE — the IVF-built approximate graph), m =
    the two smallest ids (entry-point frame), g0 = every query at its
    entry node, then ``hops`` rounds of expand-out-edges / dedup /
    exact rescore / keep-top-beam. Final beam CTE is ``g{hops}``."""
    parts = [
        ed_sql
        or f"""ed AS (
    SELECT src, dst FROM (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC, b.vec_id) AS rn
        FROM e a, e b WHERE a.vec_id <> b.vec_id
    ) WHERE rn <= {k_graph}
)""",
        """m AS (
    SELECT min(vec_id) AS m1, max(vec_id) AS m2
    FROM (SELECT vec_id FROM e ORDER BY vec_id LIMIT 2)
)""",
        """g0 AS (
    SELECT q.vec_id AS query_id, n.vec_id AS node,
           round(list_cosine_similarity(q.v, n.v), 6) AS cosine
    FROM e q CROSS JOIN m
    JOIN e n ON n.vec_id = CASE WHEN q.vec_id = m.m1 THEN m.m2 ELSE m.m1 END
    WHERE q.vec_id < 10
)""",
    ]
    for i in range(1, hops + 1):
        parts.append(
            f"""c{i} AS (
    SELECT DISTINCT query_id, node FROM (
        SELECT query_id, node FROM g{i - 1}
        UNION ALL
        SELECT g.query_id, ed.dst AS node FROM g{i - 1} g JOIN ed ON g.node = ed.src
    ) WHERE node <> query_id
)"""
        )
        parts.append(
            f"""g{i} AS (
    SELECT query_id, node, cosine FROM (
        SELECT c.query_id, c.node,
               round(list_cosine_similarity(q.v, n.v), 6) AS cosine,
               row_number() OVER (PARTITION BY c.query_id
                   ORDER BY round(list_cosine_similarity(q.v, n.v), 6) DESC, c.node) AS rn
        FROM c{i} c JOIN e q ON q.vec_id = c.query_id JOIN e n ON n.vec_id = c.node
    ) WHERE rn <= {beam}
)"""
        )
    return ",\n".join(parts)


_GRAPH_HOPS = 3


@register(
    "sim_topk_graph",
    f"""
WITH {_SQL_EMB},
{_sql_graph_beam_chain(hops=_GRAPH_HOPS)}
SELECT query_id, neighbor_id, cosine, rank FROM (
    SELECT query_id, node AS neighbor_id, cosine,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, node) AS INT) AS rank
    FROM g{_GRAPH_HOPS}
) WHERE rank <= 10
""",
)
def sim_topk_graph_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRAPH-based ANN (similarity.topk_graph): greedy beam search
    over the exact kNN graph — the NSW/HNSW base-layer idea as a
    fixed 3-hop unroll, completing the index-family matrix
    (IVF / LSH / PQ / binary / SQ8 / matryoshka / GRAPH). Per-query
    search cost is (hops x beam x k_graph) candidate scorings —
    independent of corpus size and of any cell's population, the
    property no partition-based tier has. The graph build is the
    once-per-corpus stage (stored-table serving via the edges= hook,
    the sim_topk_ivf_stored contract); the oracle unrolls the
    identical beam rounds CTE-for-CTE."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import topk_graph

    emb = _emb(spark, sf_dir)
    return topk_graph(emb, emb.where(F.col("vec_id") < 10), k=10, hops=_GRAPH_HOPS)


@register(
    "graph_recall_at_10",
    f"""
WITH {_SQL_EMB},
{_sql_graph_beam_chain(hops=_GRAPH_HOPS)},
approx AS (
    SELECT query_id, neighbor_id FROM (
        SELECT query_id, node AS neighbor_id,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, node) AS rank
        FROM g{_GRAPH_HOPS}
    ) WHERE rank <= 10
),
{_SQL_RECALL_TAIL}
""",
)
def graph_recall_at_10_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the 3-hop graph beam search vs exact cosine — the
    graph family's row in the recall matrix. Exact rescoring makes
    recall monotone in BOTH beam width and hop count (a wider beam /
    extra hop only grows the visited set), the same
    candidates-superset guarantee the exact IVF probes carry."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        recall_vs_exact,
        topk_graph,
    )

    emb, q, exact = _recall_queries(spark, sf_dir)
    return recall_vs_exact(exact, topk_graph(emb, q, k=_RECALL_K, hops=_GRAPH_HOPS))


_SQL_GASSIGN = """gassign AS (
    SELECT vec_id, cell FROM (
        SELECT a.vec_id, c.cell,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, c.cv), 6) DESC, c.cell) AS rn
        FROM e a, cent c
    ) WHERE rn <= 2
)"""

_SQL_IVF_ED = """ed AS (
    SELECT src, dst FROM (
        SELECT ga.vec_id AS src, sb.vec_id AS dst,
               row_number() OVER (PARTITION BY ga.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC, sb.vec_id) AS rn
        FROM gassign ga JOIN assign sb ON ga.cell = sb.cell AND ga.vec_id <> sb.vec_id
        JOIN e a ON a.vec_id = ga.vec_id JOIN e b ON b.vec_id = sb.vec_id
    ) WHERE rn <= 8
)"""


@register(
    "knn_graph_ivf",
    f"""
WITH {_SQL_IVF},
{_SQL_GASSIGN},
scored AS (
    SELECT ga.vec_id AS query_id, sb.vec_id AS neighbor_id,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM gassign ga JOIN assign sb ON ga.cell = sb.cell AND ga.vec_id <> sb.vec_id
    JOIN e a ON a.vec_id = ga.vec_id JOIN e b ON b.vec_id = sb.vec_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
    FROM scored
) WHERE rank <= 8
""",
)
def knn_graph_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPROXIMATE kNN graph (similarity.knn_graph_ivf): each
    node's exact top-8 among its top-2 IVF cells' members — the
    100-TB build path for the graph-ANN family. Where knn_graph's
    exact grid pays O(N^2) over the corpus, this pays
    ~2 x sum(|cell|^2), sharded perfectly across cells by ONE cell
    equi-join co-partitioned on both sides. Probe-2 is what keeps the
    graph NAVIGABLE: in-cell-only edges partition into disconnected
    per-cell islands a beam search cannot leave (measured: recall
    0.06 vs 0.37) — boundary nodes' second-cell links reconnect it."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import knn_graph_ivf

    return knn_graph_ivf(_emb(spark, sf_dir))


@register(
    "graph_ivf_recall_at_10",
    f"""
WITH {_SQL_IVF},
{_SQL_GASSIGN},
{_sql_graph_beam_chain(hops=_GRAPH_HOPS, ed_sql=_SQL_IVF_ED)},
approx AS (
    SELECT query_id, neighbor_id FROM (
        SELECT query_id, node AS neighbor_id,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, node) AS rank
        FROM g{_GRAPH_HOPS}
    ) WHERE rank <= 10
),
{_SQL_RECALL_TAIL}
""",
)
def graph_ivf_recall_at_10_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the 3-hop beam search served from the CHEAP
    (IVF-built) graph — the end-to-end number for the production
    graph path: approximate build + beam serve, vs exact truth.
    Compare graph_recall_at_10 (same search over the exact graph):
    the gap is what the O(N^2)-to-sum(|cell|^2) build saving costs
    in edge quality."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        knn_graph_ivf,
        recall_vs_exact,
        topk_graph,
    )

    emb, q, exact = _recall_queries(spark, sf_dir)
    edges = knn_graph_ivf(emb)
    return recall_vs_exact(
        exact, topk_graph(emb, q, k=_RECALL_K, hops=_GRAPH_HOPS, edges=edges)
    )


@register("quality_classifier_score_stored", None)  # oracle assigned below
def quality_classifier_score_stored_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier serving THROUGH the parquet store, under
    quality_classifier_score's oracle verbatim — completing the
    stored-artifact symmetry (index: sim_topk_ivf_stored; tokenizer:
    bpe_apply_stored; classifier: this). The 17-row weight table is
    trained, WRITTEN to parquet, read back, and scoring runs from the
    stored table with zero training lineage in the plan — the hash
    guards the store seam itself (schema drift, a lossy writer, or
    rounding drift in the doubles would mismatch)."""
    import tempfile

    from calculate_file_content_size_for_vector_db_spark.operators.curation import (
        quality_classifier_score,
        quality_classifier_weights,
    )

    docs = _docs(spark, sf_dir)
    store = tempfile.mkdtemp(prefix="clf_store_")
    quality_classifier_weights(docs, positive=F.col("lang") == "en").write.mode(
        "overwrite"
    ).parquet(store)
    return quality_classifier_score(
        docs,
        positive=F.col("lang") == "en",
        weights_df=spark.read.parquet(store),
    )


REGISTRY["quality_classifier_score_stored"].oracle = REGISTRY[
    "quality_classifier_score"
].oracle


@register("bpe_apply_stored", None)  # oracle assigned below
def bpe_apply_stored_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer serving THROUGH the parquet store, under
    bpe_apply_oov's oracle verbatim: the merge table is trained on the
    %17 train split, WRITTEN to parquet, read back, and the held-out
    batch is segmented by replaying the STORED merges — no training
    lineage in the serving plan. The merge table is strings and ints
    (rank, lhs, rhs, merged, pair_count), lossless in parquet, so the
    hash pins the serialization seam exactly as sim_topk_ivf_stored
    does for the index."""
    import tempfile

    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        bpe_apply_oov,
        bpe_train_merges,
    )

    docs = _docs(spark, sf_dir)
    store = tempfile.mkdtemp(prefix="bpe_store_")
    bpe_train_merges(docs.where(F.col("doc_id") % 17 != 0)).write.mode(
        "overwrite"
    ).parquet(store)
    return bpe_apply_oov(docs, merges_df=spark.read.parquet(store))


REGISTRY["bpe_apply_stored"].oracle = REGISTRY["bpe_apply_oov"].oracle


@register(
    "corpus_datacard",
    f"""
WITH m AS (
    SELECT CAST(count(*) AS DOUBLE) AS n_docs,
           CAST(count(DISTINCT source) AS DOUBLE) AS n_sources,
           CAST(count(DISTINCT lang) AS DOUBLE) AS n_langs,
           CAST(sum(len({_SQL_TOKENS})) AS DOUBLE) AS total_tokens,
           CAST(sum(length(text)) AS DOUBLE) AS total_chars,
           CAST(sum(CASE WHEN len({_SQL_TOKENS}) = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n_empty,
           CAST(count(DISTINCT sha256(text)) AS DOUBLE) AS n_uniq
    FROM documents
),
tl AS (
    SELECT CAST(max(c) AS DOUBLE) AS top_lang_docs
    FROM (SELECT count(*) AS c FROM documents GROUP BY lang)
),
r AS (
    SELECT n_docs, n_sources, n_langs, total_tokens, total_chars, n_empty,
           round(n_empty / n_docs, 6) AS empty_fraction,
           round(1.0 - n_uniq / n_docs, 6) AS exact_dup_fraction,
           round(total_tokens / n_docs, 6) AS mean_doc_tokens,
           round(top_lang_docs / n_docs, 6) AS top_lang_share
    FROM m, tl
)
SELECT 'n_docs' AS metric, n_docs AS value FROM r
UNION ALL SELECT 'n_sources', n_sources FROM r
UNION ALL SELECT 'n_langs', n_langs FROM r
UNION ALL SELECT 'total_tokens', total_tokens FROM r
UNION ALL SELECT 'total_chars', total_chars FROM r
UNION ALL SELECT 'n_empty', n_empty FROM r
UNION ALL SELECT 'empty_fraction', empty_fraction FROM r
UNION ALL SELECT 'exact_dup_fraction', exact_dup_fraction FROM r
UNION ALL SELECT 'mean_doc_tokens', mean_doc_tokens FROM r
UNION ALL SELECT 'top_lang_share', top_lang_share FROM r
""",
)
def corpus_datacard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus DATA CARD (textstats.corpus_datacard): the one-frame
    release summary every other QA query drills into — doc/source/
    language counts, token and char mass, empty-doc and exact-dup
    fractions, mean length, and the dominant language's share (the
    skew number that decides whether mixing needs temperature at
    all). ONE corpus scan into a multi-aggregate with map-side
    partials + a |langs| mode agg + an unpivot; nothing after the
    scan scales with rows."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        corpus_datacard,
    )

    return corpus_datacard(_docs(spark, sf_dir))


@register(
    "drift_psi",
    f"""
WITH ha AS (
    SELECT CAST(least(floor(length(text) / 8), 255) AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS ca
    FROM documents WHERE text IS NOT NULL AND doc_id % {_INCR_BATCH_MOD} <> 0
    GROUP BY 1
),
hb AS (
    SELECT CAST(least(floor(length(text) / 8), 255) AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS cb
    FROM documents WHERE text IS NOT NULL AND doc_id % {_INCR_BATCH_MOD} = 0
    GROUP BY 1
),
hj AS (
    SELECT coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
    FROM ha FULL OUTER JOIN hb USING (bin)
),
hn AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM hj),
hp AS (
    SELECT round(sum((p - q) * ln(p / q)), 6) AS psi_length
    FROM (SELECT (ca + 1) / CAST(na + 256 AS DOUBLE) AS p,
                 (cb + 1) / CAST(nb + 256 AS DOUBLE) AS q
          FROM hj, hn)
),
la AS (SELECT lang, CAST(count(*) AS BIGINT) AS ca FROM documents
       WHERE doc_id % {_INCR_BATCH_MOD} <> 0 GROUP BY lang),
lb AS (SELECT lang, CAST(count(*) AS BIGINT) AS cb FROM documents
       WHERE doc_id % {_INCR_BATCH_MOD} = 0 GROUP BY lang),
lk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM
       (SELECT lang FROM la UNION SELECT lang FROM lb)),
lj AS (
    SELECT coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
    FROM la FULL OUTER JOIN lb USING (lang)
),
ln_ AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM lj),
lp AS (
    SELECT round(sum((p - q) * ln(p / q)), 6) AS psi_lang
    FROM (SELECT (ca + 1) / CAST(na + k AS DOUBLE) AS p,
                 (cb + 1) / CAST(nb + k AS DOUBLE) AS q
          FROM lj, ln_, lk)
),
nn AS (
    SELECT CAST(sum(CASE WHEN doc_id % {_INCR_BATCH_MOD} <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
           CAST(sum(CASE WHEN doc_id % {_INCR_BATCH_MOD} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_batch
    FROM documents
)
SELECT n_base, n_batch, psi_length, psi_lang,
       psi_length > 0.2 OR psi_lang > 0.2 AS drift_flag
FROM nn, hp, lp
""",
)
def drift_psi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift between the corpus and the
    daily batch (textstats.drift_psi): psi_length over the equi-width
    length histogram (the quantile_hist_merge binning — at 100 TB
    both sides are the stored per-day histograms, so drift monitoring
    never scans the corpus) and psi_lang over the language mix, with
    Laplace smoothing and the conventional 0.2 action threshold as
    drift_flag. The magnitude companion to split_drift_ks's
    statistical test."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        drift_psi,
    )

    docs = _docs(spark, sf_dir)
    return drift_psi(
        docs.where(F.col("doc_id") % _INCR_BATCH_MOD != 0),
        docs.where(F.col("doc_id") % _INCR_BATCH_MOD == 0),
    )


@register("drift_psi_stored")
def drift_psi_stored_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """drift_psi served from STORED marginals (wave 43's premise made
    a per-round hash check): both sides' (bin,c) length histograms and
    (lang,c) mix tables — the bounded partials psi_length_hist /
    psi_lang_marginal emit and the streaming drift face appends — are
    written to parquet and the PSI row is psi_from_marginals over the
    read-back tables alone; neither corpus appears in the serving
    plan. Oracle = drift_psi's VERBATIM (assigned below), so the hash
    guards the marginal serialization seam itself — counts are BIGINTs
    (lossless in parquet) and bins/langs are exact keys, so the
    round-trip must be exact. This is the *_stored family's fifth row
    (IVF index, classifier, tokenizer, graph edges — now monitoring
    marginals), the read half of the drift face's store."""
    import tempfile

    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        psi_from_marginals,
        psi_lang_marginal,
        psi_length_hist,
    )

    docs = _docs(spark, sf_dir)
    base = docs.where(F.col("doc_id") % _INCR_BATCH_MOD != 0)
    batch = docs.where(F.col("doc_id") % _INCR_BATCH_MOD == 0)
    d = tempfile.mkdtemp(prefix="psi_marginals_")
    psi_length_hist(base).write.mode("overwrite").parquet(f"{d}/hist_base")
    psi_length_hist(batch).write.mode("overwrite").parquet(f"{d}/hist_batch")
    psi_lang_marginal(base).write.mode("overwrite").parquet(f"{d}/langs_base")
    psi_lang_marginal(batch).write.mode("overwrite").parquet(f"{d}/langs_batch")
    return psi_from_marginals(
        spark.read.parquet(f"{d}/hist_base"),
        spark.read.parquet(f"{d}/hist_batch"),
        spark.read.parquet(f"{d}/langs_base"),
        spark.read.parquet(f"{d}/langs_batch"),
    )


REGISTRY["drift_psi_stored"].oracle = REGISTRY["drift_psi"].oracle


@register(
    "quantile_hist_merge",
    """
WITH base AS (
    SELECT CAST(doc_id % 7 AS INT) AS p,
           CAST(least(floor(length(text) / 8), 255) AS INT) AS bin,
           CAST(length(text) AS BIGINT) AS v
    FROM documents WHERE text IS NOT NULL
),
hm AS (
    SELECT bin, sum(c) AS c
    FROM (SELECT p, bin, count(*) AS c FROM base GROUP BY p, bin)
    GROUP BY bin
),
hd AS (SELECT bin, count(*) AS c FROM base GROUP BY bin),
dd AS (
    SELECT CAST(count(*) AS BIGINT) AS n_diff
    FROM hm FULL OUTER JOIN hd USING (bin)
    WHERE NOT (hm.c IS NOT DISTINCT FROM hd.c)
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM base),
cumh AS (SELECT bin, sum(c) OVER (ORDER BY bin) AS cum FROM hm),
cumv AS (
    SELECT v, sum(c) OVER (ORDER BY v) AS cum
    FROM (SELECT v, count(*) AS c FROM base GROUP BY v)
),
e50 AS (SELECT CAST((min(bin) + 1) * 8 AS BIGINT) AS est_p50
        FROM cumh, n WHERE cum >= ceil(0.5 * n_docs)),
e90 AS (SELECT CAST((min(bin) + 1) * 8 AS BIGINT) AS est_p90
        FROM cumh, n WHERE cum >= ceil(0.9 * n_docs)),
e99 AS (SELECT CAST((min(bin) + 1) * 8 AS BIGINT) AS est_p99
        FROM cumh, n WHERE cum >= ceil(0.99 * n_docs)),
x50 AS (SELECT CAST(min(v) AS BIGINT) AS exact_p50
        FROM cumv, n WHERE cum >= ceil(0.5 * n_docs)),
x90 AS (SELECT CAST(min(v) AS BIGINT) AS exact_p90
        FROM cumv, n WHERE cum >= ceil(0.9 * n_docs)),
x99 AS (SELECT CAST(min(v) AS BIGINT) AS exact_p99
        FROM cumv, n WHERE cum >= ceil(0.99 * n_docs))
SELECT n_docs, est_p50, exact_p50, est_p90, exact_p90, est_p99, exact_p99,
       n_diff = 0 AS merged_equals_direct,
       greatest(abs(est_p50 - exact_p50), abs(est_p90 - exact_p90),
                abs(est_p99 - exact_p99)) <= 8 AS within_bin_width
FROM n, e50, e90, e99, x50, x90, x99, dd
""",
)
def quantile_hist_merge_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-quantile MERGE algebra (textstats.quantile_hist_merge):
    per-day partial equi-width histograms merged by per-bin sum must
    equal the from-scratch histogram bin-for-bin, and the histogram's
    p50/p90/p99 must land within one bin width of hand-written
    percentile_disc exact values — the mergeable-percentile pattern a
    100-TB dashboard uses (per-day histograms, query-time merge)
    where approx_percentile_error only bounds the built-in sketch.
    Everything after the one corpus scan is histogram-sized."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        quantile_hist_merge,
    )

    return quantile_hist_merge(_docs(spark, sf_dir))


@register(
    "corpus_datacard_merge",
    f"""
WITH m AS (
    SELECT CAST(count(*) AS DOUBLE) AS n_docs,
           CAST(count(DISTINCT source) AS DOUBLE) AS n_sources,
           CAST(count(DISTINCT lang) AS DOUBLE) AS n_langs,
           CAST(sum(len({_SQL_TOKENS})) AS DOUBLE) AS total_tokens,
           CAST(sum(length(text)) AS DOUBLE) AS total_chars,
           CAST(sum(CASE WHEN len({_SQL_TOKENS}) = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n_empty
    FROM documents
),
tl AS (
    SELECT CAST(max(c) AS DOUBLE) AS top_lang_docs
    FROM (SELECT count(*) AS c FROM documents GROUP BY lang)
),
hh AS (
    SELECT CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h
    FROM documents WHERE text IS NOT NULL
),
rr AS (
    SELECT CAST(h % 256 AS INT) AS reg,
           max(CAST(CASE WHEN h // 256 = 0 THEN 53
               ELSE 53 - length(bin(h // 256)) END AS INT)) AS rho
    FROM hh GROUP BY 1
),
uq AS (
    SELECT round(CASE WHEN raw <= CAST(640.0 AS DOUBLE) AND zeros > 0
                 THEN CAST(256.0 AS DOUBLE) * ln(CAST(256.0 AS DOUBLE) / zeros)
                 ELSE raw END, 6) AS est_uniq_texts
    FROM (SELECT CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE) / 256) * 256 * 256
                     / (sum(pow(CAST(2.0 AS DOUBLE), -rho)) + (256 - count(*))) AS raw,
                 CAST(256 - count(*) AS DOUBLE) AS zeros
          FROM rr)
),
r AS (
    SELECT n_docs, n_sources, n_langs, total_tokens, total_chars, n_empty,
           round(n_empty / n_docs, 6) AS empty_fraction,
           est_uniq_texts,
           round(greatest(CAST(0.0 AS DOUBLE), 1.0 - est_uniq_texts / n_docs), 6)
               AS approx_dup_fraction,
           round(total_tokens / n_docs, 6) AS mean_doc_tokens,
           round(top_lang_docs / n_docs, 6) AS top_lang_share
    FROM m, tl, uq
)
SELECT 'n_docs' AS metric, n_docs AS value FROM r
UNION ALL SELECT 'n_sources', n_sources FROM r
UNION ALL SELECT 'n_langs', n_langs FROM r
UNION ALL SELECT 'total_tokens', total_tokens FROM r
UNION ALL SELECT 'total_chars', total_chars FROM r
UNION ALL SELECT 'n_empty', n_empty FROM r
UNION ALL SELECT 'empty_fraction', empty_fraction FROM r
UNION ALL SELECT 'est_uniq_texts', est_uniq_texts FROM r
UNION ALL SELECT 'approx_dup_fraction', approx_dup_fraction FROM r
UNION ALL SELECT 'mean_doc_tokens', mean_doc_tokens FROM r
UNION ALL SELECT 'top_lang_share', top_lang_share FROM r
""",
)
def corpus_datacard_merge_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGEABLE data card (textstats.corpus_datacard_merge): the
    Spark side splits the corpus into 7 synthetic days, builds each
    day's bounded partial state (scalar sums, per-lang/per-source
    count tables, an m-register HLL over text hashes), and MERGES;
    the oracle computes every metric DIRECT — the hash equality is
    the mergeability proof metric-for-metric, which is what makes the
    release summary maintainable per-ingest at 100 TB instead of a
    nightly corpus re-scan. Unique texts are necessarily a sketch
    here (exact distinct cannot merge in bounded state), so the card
    ships est_uniq_texts/approx_dup_fraction next to
    corpus_datacard's exact fraction."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        corpus_datacard_merge,
    )

    return corpus_datacard_merge(_docs(spark, sf_dir))


@register(
    "hll_merge_sources",
    """
WITH base AS (
    SELECT source AS grp,
           CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h
    FROM documents WHERE text IS NOT NULL
),
rr AS (
    SELECT grp, CAST(h % 256 AS INT) AS reg,
           CAST(CASE WHEN h // 256 = 0 THEN 53
                ELSE 53 - length(bin(h // 256)) END AS INT) AS rho
    FROM base
),
per_src AS (SELECT grp, reg, max(rho) AS rho FROM rr GROUP BY grp, reg),
merged AS (SELECT reg, max(rho) AS rho FROM per_src GROUP BY reg),
direct AS (SELECT reg, max(rho) AS rho FROM rr GROUP BY reg),
em AS (
    SELECT round(CASE WHEN raw <= CAST(640.0 AS DOUBLE) AND zeros > 0
                 THEN CAST(256.0 AS DOUBLE) * ln(CAST(256.0 AS DOUBLE) / zeros)
                 ELSE raw END, 6) AS est_merged
    FROM (SELECT CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE) / 256) * 256 * 256
                     / (sum(pow(CAST(2.0 AS DOUBLE), -rho)) + (256 - count(*))) AS raw,
                 CAST(256 - count(*) AS DOUBLE) AS zeros
          FROM merged)
),
ed AS (
    SELECT round(CASE WHEN raw <= CAST(640.0 AS DOUBLE) AND zeros > 0
                 THEN CAST(256.0 AS DOUBLE) * ln(CAST(256.0 AS DOUBLE) / zeros)
                 ELSE raw END, 6) AS est_direct
    FROM (SELECT CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE) / 256) * 256 * 256
                     / (sum(pow(CAST(2.0 AS DOUBLE), -rho)) + (256 - count(*))) AS raw,
                 CAST(256 - count(*) AS DOUBLE) AS zeros
          FROM direct)
),
dd AS (
    SELECT CAST(count(*) AS BIGINT) AS n_diff
    FROM merged m FULL OUTER JOIN direct d USING (reg)
    WHERE NOT (m.rho IS NOT DISTINCT FROM d.rho)
),
ex AS (SELECT CAST(count(DISTINCT text) AS BIGINT) AS n_exact
       FROM documents WHERE text IS NOT NULL)
SELECT CAST(256 AS INT) AS m, n_exact, est_merged, est_direct,
       n_diff = 0 AS merged_equals_direct,
       round(abs(est_direct - n_exact) / CAST(n_exact AS DOUBLE), 6) AS rel_error,
       abs(est_direct - n_exact) / CAST(n_exact AS DOUBLE) <= 0.2 AS within_bound
FROM ex, em, ed, dd
""",
)
def hll_merge_sources_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog MERGE algebra on a hand-built, engine-exact sketch
    (textstats.hll_merge_sources): per-source register sketches
    max-merged must equal the from-scratch global sketch — the
    property that makes HLL the 100-TB distinct counter (per-
    partition/day/source partial sketches union freely). The existing
    approx_distinct_error row proves the built-in sketch's BOUND;
    this row proves the ALGEBRA register-for-register, plus the
    estimator itself (harmonic mean + linear-counting correction) in
    portable arithmetic both engines reproduce bit-for-bit."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        hll_merge_sources,
    )

    return hll_merge_sources(_docs(spark, sf_dir))


@register(
    "hll_overlap_sources",
    """
WITH base AS (
    SELECT source AS grp,
           CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h
    FROM documents WHERE text IS NOT NULL
),
rr AS (
    SELECT grp, CAST(h % 256 AS INT) AS reg,
           CAST(CASE WHEN h // 256 = 0 THEN 53
                ELSE 53 - length(bin(h // 256)) END AS INT) AS rho
    FROM base
),
per_src AS (SELECT grp, reg, max(rho) AS rho FROM rr GROUP BY grp, reg),
grps AS (SELECT DISTINCT grp FROM base),
dense AS (
    SELECT g.grp, CAST(r.range AS INT) AS reg, coalesce(p.rho, 0) AS rho
    FROM grps g CROSS JOIN range(256) r
    LEFT JOIN per_src p ON p.grp = g.grp AND p.reg = r.range
),
e1 AS (
    SELECT grp,
           round(CASE WHEN raw <= CAST(640.0 AS DOUBLE) AND zeros > 0
                 THEN CAST(256.0 AS DOUBLE) * ln(CAST(256.0 AS DOUBLE) / zeros)
                 ELSE raw END, 6) AS est
    FROM (SELECT grp,
                 CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE) / 256) * 256 * 256
                     / sum(pow(CAST(2.0 AS DOUBLE), -rho)) AS raw,
                 CAST(sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS zeros
          FROM dense GROUP BY grp)
),
pu AS (
    SELECT a.grp AS src_a, b.grp AS src_b, a.reg, greatest(a.rho, b.rho) AS rho
    FROM dense a JOIN dense b ON a.reg = b.reg AND a.grp < b.grp
),
eu AS (
    SELECT src_a, src_b,
           round(CASE WHEN raw <= CAST(640.0 AS DOUBLE) AND zeros > 0
                 THEN CAST(256.0 AS DOUBLE) * ln(CAST(256.0 AS DOUBLE) / zeros)
                 ELSE raw END, 6) AS est_union
    FROM (SELECT src_a, src_b,
                 CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE) / 256) * 256 * 256
                     / sum(pow(CAST(2.0 AS DOUBLE), -rho)) AS raw,
                 CAST(sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS zeros
          FROM pu GROUP BY src_a, src_b)
),
dt AS (SELECT DISTINCT source AS grp, sha256(text) AS th
       FROM documents WHERE text IS NOT NULL),
ex AS (
    SELECT x.grp AS src_a, y.grp AS src_b, count(*) AS nx
    FROM dt x JOIN dt y ON x.th = y.th AND x.grp < y.grp
    GROUP BY 1, 2
)
SELECT eu.src_a, eu.src_b, ea.est AS est_a, eb.est AS est_b, eu.est_union,
       round(greatest(CAST(0.0 AS DOUBLE), ea.est + eb.est - eu.est_union), 6)
           AS est_intersect,
       CAST(coalesce(ex.nx, 0) AS BIGINT) AS n_exact_intersect,
       abs(round(greatest(CAST(0.0 AS DOUBLE), ea.est + eb.est - eu.est_union), 6)
           - coalesce(ex.nx, 0))
           <= CAST(0.2 AS DOUBLE) * (ea.est + eb.est + eu.est_union) AS within_bound
FROM eu
JOIN e1 ea ON ea.grp = eu.src_a
JOIN e1 eb ON eb.grp = eu.src_b
LEFT JOIN ex ON ex.src_a = eu.src_a AND ex.src_b = eu.src_b
""",
)
def hll_overlap_sources_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise corpus overlap between sources by HLL SET ALGEBRA
    (textstats.hll_overlap_sources): union by per-register max merge,
    intersection by inclusion-exclusion, both in the same portable
    arithmetic both engines reproduce bit-for-bit. The 100-TB shape:
    the pairwise stage touches only the m-register sketches each
    source already keeps for its distinct count — |S|²·m rows, corpus-
    independent — where the exact answer (carried here as the QA
    baseline column, the hll_merge_sources n_exact pattern) is a full
    distinct self-join of the corpus. within_bound pins the
    inclusion-exclusion error against the exact intersection."""
    from calculate_file_content_size_for_vector_db_spark.operators.textstats import (
        hll_overlap_sources,
    )

    return hll_overlap_sources(_docs(spark, sf_dir))


@register(
    "dedup_canonical",
    """
WITH h AS (
    SELECT doc_id,
           sha256(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
                                      '\\s+', ' ', 'g'))) AS content_hash,
           sha256(text) AS raw_hash
    FROM documents
)
SELECT content_hash, CAST(min(doc_id) AS BIGINT) AS keeper_id,
       CAST(count(*) AS BIGINT) AS dup_count,
       CAST(count(DISTINCT raw_hash) AS BIGINT) AS raw_distinct
FROM h GROUP BY content_hash
""",
)
def dedup_canonical_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-form exact dedup (dedup.canonical_dedup): lowercase +
    strip punctuation + collapse whitespace, then the exact_dedup
    hash-agg — the normalize-then-hash tier between byte-exact dedup
    and MinHash that catches re-encoded/re-wrapped/case-mangled copies
    at hash-agg cost. raw_distinct > 1 rows are the copies ONLY
    canonicalization finds, pricing the tier against exact_dedup.
    Narrow regex chain fused into the scan; one linear hash-agg."""
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import canonical_dedup

    return canonical_dedup(_docs(spark, sf_dir))


def _sql_power_iteration_chain(rounds: int = 3) -> str:
    """Unrolled power-iteration chain (the kmeans/GD/BPE discipline
    applied to eigen-decomposition): v0 = normalized 6-rounded mean,
    each round = per-row dot (index-order fold), 6-rounded per-dim
    weighted sums, 6-rounded normalization."""
    parts = [
        "tot AS (SELECT sum(list_sum(list_transform(v, x -> x * x))) AS t2 FROM e)",
        """m0 AS (
    SELECT t.pos AS pos, round(avg(v[t.pos]), 6) AS w
    FROM e, (SELECT CAST(unnest(range(1, 65)) AS INT) AS pos) t
    GROUP BY t.pos
)""",
        "p0 AS (SELECT list(w ORDER BY pos) AS wv FROM m0)",
        """v0 AS (
    SELECT list_transform(wv,
        x -> round(x / sqrt(list_sum(list_transform(wv, y -> y * y))), 6)) AS bv
    FROM p0
)""",
    ]
    for r in range(1, rounds + 1):
        parts += [
            f"""d{r} AS (
    SELECT v, list_sum(list_transform(range(1, 65),
        j -> v[CAST(j AS INT)] * bv[CAST(j AS INT)])) AS d
    FROM e, v{r - 1}
)""",
            f"""ray{r} AS (
    SELECT {r} AS rnd, round(sum(d * d) / (SELECT t2 FROM tot), 6) AS rayleigh_share
    FROM d{r}
)""",
            f"""w{r} AS (
    SELECT t.pos AS pos, round(sum(v[t.pos] * d), 6) AS w
    FROM d{r}, (SELECT CAST(unnest(range(1, 65)) AS INT) AS pos) t
    GROUP BY t.pos
)""",
            f"p{r} AS (SELECT list(w ORDER BY pos) AS wv FROM w{r})",
            f"""v{r} AS (
    SELECT list_transform(wv,
        x -> round(x / sqrt(list_sum(list_transform(wv, y -> y * y))), 6)) AS bv
    FROM p{r}
)""",
        ]
    return ",\n".join(parts)


@register(
    "embedding_pca_power",
    f"""
WITH {_SQL_EMB},
{_sql_power_iteration_chain(3)}
"""
    + "\nUNION ALL\n".join(
        f"""SELECT CAST(rnd AS INT) AS round, rayleigh_share,
       CAST(to_json(list_transform(bv, x -> CAST(round(x * 1000000.0) AS BIGINT))) AS VARCHAR)
           AS component_fp
FROM ray{r}, v{r}"""
        for r in range(1, 4)
    ),
)
def embedding_pca_power_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus by matrix-free
    POWER ITERATION (similarity.pca_power_iteration, 3 unrolled
    rounds) — eigen-decomposition joins kmeans, gradient descent, BPE
    and star-CC in the unrolled-iteration family. rayleigh_share
    (evaluated at each round's input iterate; component_fp is the
    round's output, fixed-point JSON like sim_ivf_centroids) is the
    anisotropy QA: near 1.0 means the space has collapsed onto one
    direction — the embedding-space analogue of a collapsed coarse
    quantizer. Each round is ONE corpus scan (broadcast dot + 64-group
    hash-agg, Gram matrix never materialized) + a 1-row normalize;
    per-round 6-rounding makes the oracle chain bit-exact. At 100 TB
    the iteration runs on a sample like every trainer here."""
    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        pca_power_iteration,
    )

    return pca_power_iteration(_emb(spark, sf_dir), rounds=3)


@register("dedup_ngram_prefix", None)  # oracle assigned below — identical to dedup_ngram_jaccard
def dedup_ngram_prefix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered exact Jaccard (dedup.ngram_jaccard_prefix_pairs)
    under dedup_ngram_jaccard's oracle VERBATIM — the SSJoin/PPJoin
    candidate reducer's no-false-negatives theorem (two sets with
    J >= t must share a rarity-ordered prefix token) as a per-round
    hash check: if the prefix bound ever dropped a true pair, this
    row would mismatch. The principled alternative to the
    max_shingle_freq brute cap: prefixes hold each doc's RAREST
    shingles, so the join keys are exactly the low-fanout ones, with
    zero recall loss by construction."""
    from calculate_file_content_size_for_vector_db_spark.operators.dedup import (
        ngram_jaccard_prefix_pairs,
    )

    return ngram_jaccard_prefix_pairs(_docs(spark, sf_dir), threshold=0.5)


REGISTRY["dedup_ngram_prefix"].oracle = REGISTRY["dedup_ngram_jaccard"].oracle


@register("sim_topk_graph_stored", None)  # oracle assigned below
def sim_topk_graph_stored_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-ANN serving THROUGH the parquet store, under
    sim_topk_graph's oracle verbatim — the store-seam row for the
    FOURTH artifact family (index: sim_topk_ivf_stored; classifier:
    quality_classifier_score_stored; tokenizer: bpe_apply_stored;
    graph: this). The exact kNN edge table is built once, WRITTEN to
    parquet, read back, and the 3-hop beam search serves from the
    stored edges with zero build lineage in the plan; edges are pure
    int pairs, lossless in parquet, so the hash pins the
    serialization seam."""
    import tempfile

    from calculate_file_content_size_for_vector_db_spark.operators.similarity import (
        topk_graph,
        topk_grid,
    )

    emb = _emb(spark, sf_dir)
    store = tempfile.mkdtemp(prefix="graph_store_")
    topk_grid(emb, emb, k=8).select("query_id", "neighbor_id").write.mode(
        "overwrite"
    ).parquet(store)
    return topk_graph(
        emb,
        emb.where(F.col("vec_id") < 10),
        k=10,
        hops=_GRAPH_HOPS,
        edges=spark.read.parquet(store),
    )


REGISTRY["sim_topk_graph_stored"].oracle = REGISTRY["sim_topk_graph"].oracle


@register(
    "weighted_sample_es",
    """
WITH keyed AS (
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
           CASE WHEN n_chars > 0 THEN
               pow((CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                        + CAST(1.0 AS DOUBLE))
                   / CAST(1152921504606846977 AS DOUBLE),
                   CAST(1.0 AS DOUBLE) / CAST(n_chars AS DOUBLE))
           ELSE CAST(0.0 AS DOUBLE) END AS es
    FROM documents
)
SELECT doc_id, weight, round(es, 6) AS es_key,
       CAST(row_number() OVER (ORDER BY es DESC, doc_id) AS INT) AS rank
FROM keyed QUALIFY rank <= 100
""",
)
def weighted_sample_es_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement by the Efraimidis-
    Spirakis A-ES reservoir (curation.weighted_sample_es): top-100
    documents by u^(1/weight) with weight = n_chars — length-weighted
    corpus subsetting, the one-pass distributed algorithm (per-
    partition partial top-k via TakeOrdered, no sequential reservoir
    state, no global sort). Randomness is the deterministic 60-bit
    md5 draw (the Bloom/HLL hash plumbing), so the sample is
    reproducible across runs, engines and partitionings — seeded
    sampling as a hash-checked correctness property."""
    from calculate_file_content_size_for_vector_db_spark.operators.curation import (
        weighted_sample_es,
    )

    return weighted_sample_es(_docs(spark, sf_dir), k=100)


# ---------------------------------------------------------------------------
# Registry iteration order. The round-1 driver verified only the first
# 50 registered queries (CORRECTNESS_r01.json stops at entry 50), so
# registration order is also verification priority. Put the queries
# that have never received a driver row FIRST, then the already-proven
# surface in its original order — every query gets a green row across
# rounds even if the driver caps or timeboxes its sweep.
# ---------------------------------------------------------------------------

# Round-9 priority (the driver caps its per-round sweep at ~50 rows).
# VERDICT r08 item 1: registry growth is FROZEN this round (zero new
# registrations) and the entire window is spent on verification debt —
# first the 3 queries that have never received a driver row in any
# round, then all 49 rows whose latest driver row is r04 (four rounds
# stale). 3 + 49 = 52 against a 50-row cap, so two rows must sit at
# positions 51-52; we chose the two building-block rows whose
# semantics are exercised by in-window composites (`minhash_signature`
# feeds `dedup_minhash_lsh`, `duplicated_spans` feeds the span/line/
# paragraph dedup rewrites, all in-window or r07-green). Everything
# else queues behind — each is still re-verified at sf0.001 by every
# pytest run, and the full registry sf0.01 sweep is committed
# per-round as ORACLES_r{N}.json (tests/check_oracles.py), so window
# position is about the driver's independent signal, not the only
# verification.
_VERIFY_FIRST = [
    # --- 1. never driver-checked (registered r08, slipped the window) ---
    "dedup_canonical",  # normalize-then-hash dedup tier (wave 26)
    "embedding_pca_power",  # matrix-free power iteration, anisotropy QA (wave 27)
    "weighted_sample_es",  # deterministic A-ES weighted reservoir (wave 30)
    # --- 2. r04-stale: similarity family first (contains the one
    # perf-weak row, sim_nearest_neighbor — VERDICT r08 item 4) ---
    "sim_nearest_neighbor",
    "sim_topk_bruteforce",
    "sim_topk_lsh",
    "sim_topk_ivf",
    "sim_ivf_assign",
    "sim_lsh_buckets",
    # --- 3. r04-stale: core dedup production family ---
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_capped",
    "dedup_simhash",
    "dedup_embedding",
    "simhash_pairs",
    # --- 4. r04-stale: events / streaming-batch faces ---
    "events_asof_join",
    "events_json",
    "events_lag_delta",
    "events_session",
    "events_sessionize_lag",
    "events_sliding",
    "events_topk_per_user",
    "events_tumbling",
    # --- 5. r04-stale: text analysis ---
    "text_fingerprint",
    "text_lang_id",
    "text_quality",
    "text_tokens",
    # --- 6. r04-stale: multimodal plumbing ---
    "multimodal_frames",
    "multimodal_image_meta",
    # --- 7. r04-stale: TPC-H completion set ---
    "tpch_q1",
    "tpch_q2",
    "tpch_q3",
    "tpch_q5",
    "tpch_q8",
    "tpch_q9",
    "tpch_q11",
    "tpch_q12",
    "tpch_q13",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    # --- 8. r04-stale: relational misc (set ops, cube, pivot, semi/anti) ---
    "nation_set_ops",
    "doc_cube",
    "lang_pivot",
    "langs_per_source",
    "semi_join_customers",
    "anti_join_customers",
    # --- 9. the two documented slip candidates (positions 51-52):
    # building blocks subsumed by in-window composites ---
    "minhash_signature",  # subsumed by dedup_minhash_lsh (position 11)
    "duplicated_spans",  # subsumed by line/paragraph dedup rewrites (r07/r08 green)
]

REGISTRY = {name: REGISTRY[name] for name in _VERIFY_FIRST} | {
    name: q for name, q in REGISTRY.items() if name not in _VERIFY_FIRST
}
