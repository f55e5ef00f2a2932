"""Size metrics, windows, rollups (SURVEY.md sections 2.4/2.5/2.8).

The reference computes, per file: pages, chunk count, file bytes,
extracted-text chars (post-preprocessing, Q3), ratio = file/text
(pdf_reader.py:489-502); then a corpus SUM TOTAL where the total ratio
is a ratio of sums — NOT an average of ratios (Q7, pdf_reader.py:148).
Zero-text files crash the reference with ZeroDivisionError (Q2,
pdf_reader.py:491); here try_divide yields NULL — documented divergence.

Scale notes:
- per-doc aggregation is one hash-agg shuffle on the doc key with
  map-side partial aggregation — the only shuffle in the core pipeline;
- the file<-chunk-stats join broadcasts the small side when Spark's
  stats allow, and at 100 TB both sides are pre-partitioned on the doc
  key by the same shuffle, so AQE converts it to a local join;
- rollup(filename) computes per-file rows AND the grand total in ONE
  pass (no second scan, no union of a separately-computed total row —
  the reference materializes the whole result list in driver memory and
  loops, pdf_reader.py:130-164).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SUM_TOTAL_LABEL = "SUM TOTAL"  # pdf_reader.py:156


def ratio(file_size: Column | str, text_size: Column | str, decimals: int = 6) -> Column:
    """P3/Q2: file bytes per extracted-text char; NULL (not crash/Inf)
    when text_size is 0 (pdf_reader.py:491 would raise)."""
    f = F.col(file_size) if isinstance(file_size, str) else file_size
    t = F.col(text_size) if isinstance(text_size, str) else text_size
    return F.round(F.try_divide(f.cast("double"), t.cast("double")), decimals)


def chunk_aggregates(chunks: DataFrame, key: str = "doc_id", length_col: str = "chunk_length") -> DataFrame:
    """A1+A3: per-doc chunk count and text_size = sum of chunk lengths
    (Q5: overlapping chars count multiple times, by definition)."""
    return chunks.groupBy(key).agg(
        F.count("*").alias("chunks"),
        F.sum(length_col).cast("long").alias("text_size"),
    )


def file_chunk_join(
    files: DataFrame, chunk_stats: DataFrame, key: str = "doc_id"
) -> DataFrame:
    """Section 2.8: the one equi-join of the core model. LEFT join so
    zero-chunk files survive (their text_size becomes 0, ratio NULL)."""
    joined = files.join(chunk_stats, key, "left")
    return joined.withColumn("chunks", F.coalesce(F.col("chunks"), F.lit(0))).withColumn(
        "text_size", F.coalesce(F.col("text_size"), F.lit(0))
    )


def running_offset(
    chunks: DataFrame,
    key: str = "doc_id",
    order_col: str = "chunk_index",
    length_col: str = "chunk_length",
    out_col: str = "chunk_offset_in_file",
) -> DataFrame:
    """W1 (pdf_reader.py:483-485): exclusive running sum of chunk
    lengths within a file — offset of each chunk into the concatenation
    of processed chunks. Exclusive frame == the loop's post-increment."""
    w = (
        Window.partitionBy(key)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return chunks.withColumn(
        out_col, F.coalesce(F.sum(length_col).over(w), F.lit(0)).cast("long")
    )


def chunk_enumerate(
    chunks: DataFrame,
    key: str = "doc_id",
    order_cols: list[str] | None = None,
    out_col: str = "chunk_seq",
) -> DataFrame:
    """W2 (pdf_reader.py:459): 0-based chunk position within its file."""
    order = order_cols or ["chunk_index"]
    w = Window.partitionBy(key).orderBy(*order)
    return chunks.withColumn(out_col, (F.row_number().over(w) - 1).cast("int"))


def corpus_totals(per_file: DataFrame, file_size_col: str = "file_size") -> DataFrame:
    """A4+A5 (pdf_reader.py:130-148): one-row corpus summary; ratio of
    sums per Q7."""
    return per_file.agg(
        F.count("*").alias("n_files"),
        F.sum(file_size_col).cast("long").alias("total_file_size"),
        F.sum("text_size").cast("long").alias("total_text_size"),
        F.sum("chunks").cast("long").alias("total_chunks"),
        ratio(F.sum(file_size_col), F.sum("text_size")).alias("total_ratio"),
    )


def rollup_summary(
    per_file: DataFrame,
    name_col: str = "filename",
    file_size_col: str = "file_size",
) -> DataFrame:
    """A4/A5/U1 as ONE rollup pass: per-file rows + SUM TOTAL row.

    The reference builds the total by a driver-side accumulator loop and
    appends a synthetic row (pdf_reader.py:130-164); rollup() computes
    both grouping levels in a single shuffle. The grouping_id()==1 row
    becomes the SUM TOTAL label. Ratio recomputed per grouping level so
    the total row is sum/sum (Q7), not an avg of per-file ratios.
    """
    return (
        per_file.rollup(name_col)
        .agg(
            F.sum(file_size_col).cast("long").alias("file_size"),
            F.sum("text_size").cast("long").alias("text_size"),
            F.sum("chunks").cast("long").alias("chunks"),
            ratio(F.sum(file_size_col), F.sum("text_size")).alias("ratio"),
        )
        .withColumn(name_col, F.coalesce(F.col(name_col), F.lit(SUM_TOTAL_LABEL)))
    )


def extrapolate_estimate(totals: DataFrame, corpus_gb: float = 100.0) -> DataFrame:
    """P4 (pdf_reader.py:191): '100 GB of files -> X GB of text'."""
    return totals.select(
        F.lit(corpus_gb).alias("corpus_gb"),
        F.round(F.lit(corpus_gb) / F.col("total_ratio"), 6).alias("estimated_text_gb"),
    )


def sort_by_size(per_file: DataFrame, file_size_col: str = "file_size") -> DataFrame:
    """O1 (pdf_reader.py:361-388): size-desc ordering. In the reference
    this is LPT scheduling for the process pool; Spark schedules tasks
    itself, so this survives only as a display ordering."""
    return per_file.orderBy(F.desc(file_size_col), per_file.columns[0])
