"""Partitioned sinks + partition pruning: writing with partitionBy and
filtering on the partition column must prune directories at the scan
(PartitionFilters), not read-and-filter."""

from pyspark.sql import functions as F

from calculate_file_content_size_for_vector_db_spark.sources.io import read_table

SF = "/root/testdata/sf0.001"


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    docs = read_table(spark, SF, "documents")
    out = str(tmp_path / "docs_by_lang")
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)

    back = spark.read.parquet(out).where(F.col("lang") == "en")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = back._jdf.queryExecution().explainString(mode)
    pf = [l.strip() for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "lang" in pf[0], plan
    # pruned read returns exactly the en docs
    assert back.count() == docs.where("lang = 'en'").count()
