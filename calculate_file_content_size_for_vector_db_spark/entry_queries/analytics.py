"""Analytics query family (split from the entry_queries monolith;
see entry_queries/__init__.py for the assembled registry)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from calculate_file_content_size_for_vector_db_spark.sources.io import read_table

from calculate_file_content_size_for_vector_db_spark.entry_queries._core import _docs, _events, register


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
