"""Bucketing: pre-bucketing both sides of a recurring join on the join
key lets Spark sort-merge-join with ZERO shuffle — the co-located-join
pattern for fact-fact joins repeated across a 100 TB pipeline."""

from pyspark.sql import functions as F

from calculate_file_content_size_for_vector_db_spark.sources.io import read_table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark):
    orders = read_table(spark, SF, "orders")
    customer = read_table(spark, SF, "customer")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    # a fresh session's in-memory catalog doesn't know tables left in
    # the warehouse dir by a previous run — clear the locations too
    import shutil

    shutil.rmtree("/tmp/spark-warehouse/orders_b", ignore_errors=True)
    shutil.rmtree("/tmp/spark-warehouse/customer_b", ignore_errors=True)
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("orders_b")
    )
    (
        customer.withColumnRenamed("c_custkey", "o_custkey")
        .write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("customer_b")
    )
    joined = (
        spark.table("orders_b")
        .hint("merge")
        .join(spark.table("customer_b"), "o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the JOIN itself must not shuffle; the only exchange is the groupBy
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    # and it still returns correct results
    direct = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, direct.collect()))
