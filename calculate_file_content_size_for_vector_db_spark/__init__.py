"""PySpark-native analytics engine with the capabilities of
aws-samples/calculate-file-content-size-for-vector-db.

Not a port: the reference (/root/reference/pdf_reader.py, a single-file
multiprocessing ETL script) defines WHAT to compute — scan files, extract
text, chunk it, measure file-bytes vs text-chars, roll up to a corpus
summary. This package re-expresses that surface as idiomatic Spark
DataFrame pipelines designed for 100 TB scale, plus LLM-data-pipeline
extensions (dedup, similarity search, text analysis, streaming windows,
multimodal column plumbing).

Layout (SURVEY.md section 7):
    session.py      SparkSession builder
    sources/        scans (parquet fixtures, binaryFile) + sinks + pdf extract
    functions/      scalar column functions (text preprocessing, formatting)
    operators/      chunking, metrics, dedup, similarity, textstats, multimodal
    plans/          end-to-end pipelines (the reference's entry points)
    streaming/      Structured Streaming surface + batch-mode equivalents
"""

from calculate_file_content_size_for_vector_db_spark.session import get_spark

__all__ = ["get_spark"]
