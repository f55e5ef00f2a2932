"""Unit tests for metric operators: window semantics, ratio-of-sums,
zero-text NULL behavior (SURVEY.md Q2/Q7, W1)."""

from pyspark.sql import functions as F

from calculate_file_content_size_for_vector_db_spark.operators import metrics
from calculate_file_content_size_for_vector_db_spark.plans.pipeline import DocumentPipeline


def test_running_offset_matches_hand_loop(spark):
    # reference semantics (pdf_reader.py:483-485): offset assigned BEFORE
    # adding the current chunk's length
    lengths = [5, 3, 7, 2]
    rows = [(0, i, n) for i, n in enumerate(lengths)]
    df = spark.createDataFrame(rows, "doc_id long, chunk_index int, chunk_length int")
    got = {
        r.chunk_index: r.chunk_offset_in_file
        for r in metrics.running_offset(df).collect()
    }
    expected, acc = {}, 0
    for i, n in enumerate(lengths):
        expected[i] = acc
        acc += n
    assert got == expected


def test_ratio_of_sums_not_avg_of_ratios(spark):
    # Q7 (pdf_reader.py:148): two files with ratios 10.0 and 1.0 but very
    # different sizes -> total must be sum/sum, not 5.5
    per_file = spark.createDataFrame(
        [(0, 1000, 100, 1), (1, 10, 10, 1)],
        "doc_id long, file_size long, text_size long, chunks long",
    )
    row = metrics.corpus_totals(per_file).collect()[0]
    assert row.total_ratio == round(1010 / 110, 6)


def test_zero_text_ratio_null_not_crash(spark):
    # Q2: reference raises ZeroDivisionError (pdf_reader.py:491)
    df = spark.createDataFrame([(0, 100, 0)], "doc_id long, file_size long, text_size long")
    assert df.select(metrics.ratio("file_size", "text_size").alias("r")).collect()[0].r is None


def test_rollup_total_row_identities(spark):
    docs = spark.createDataFrame(
        [(0, "hello world foo", 15), (1, "bar", 3), (2, "", 9)],
        "doc_id long, text string, n_chars long",
    )
    pipe = DocumentPipeline(spark, chunk_size=4)
    rows = pipe.summary(docs).collect()
    total = next(r for r in rows if r.filename == metrics.SUM_TOTAL_LABEL)
    per = [r for r in rows if r.filename != metrics.SUM_TOTAL_LABEL]
    assert len(per) == 3
    assert total.file_size == sum(r.file_size for r in per)
    assert total.text_size == sum(r.text_size for r in per)
    assert total.chunks == sum(r.chunks for r in per)
    # zero-text doc contributes 0 chunks and has NULL ratio
    zero = next(r for r in per if r.filename == "2")
    assert zero.chunks == 0 and zero.ratio is None


def test_content_pruned_from_plan(spark):
    # P2: not selecting `content` must prune it before the agg
    docs = spark.createDataFrame([(0, "abcdef", 6)], "doc_id long, text string, n_chars long")
    plan = (
        DocumentPipeline(spark, chunk_size=3)
        .per_file(docs)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "content" not in plan.lower() or "chunk_text" not in plan
