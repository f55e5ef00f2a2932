"""Relational analytics coverage (joins, aggregation, top-k, set ops,
cube, pivot, as-of join) over the TPC-H-ish fixture star schema.

The reference performs zero joins (SURVEY.md section 2.8) — this module
is the engine's general-purpose relational surface, shaped after the
classic OLAP patterns (TPC-H Q1/Q3/Q5 style) so the join/agg planner
paths are exercised and benchmarked.

Scale notes per operator are inline; the common themes:
- dimension tables (region/nation/supplier/customer) broadcast —
  no shuffle on the fact side for those joins;
- fact-fact joins (orders-lineitem) shuffle on the join key once, and
  AQE handles skew;
- top-k uses window rank, which shuffles on the partition key only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregation with derived
    expressions. One shuffle (4 groups); everything else is map-side."""
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # money sums in DECIMAL: double summation is partition-order
            # dependent (~1e-5 absolute on a 1e9 sum) and can flip the
            # 2-decimal rounding boundary; decimal addition is exact and
            # associative, so the result is bit-stable on ANY cluster
            # layout (and matches the DuckDB oracle's decimal sums)
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("sum_base_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
                ),
                2,
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice").cast("decimal(18,4)")
                        * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
                    ).cast("decimal(28,8)")
                    * (F.lit(1).cast("decimal(18,4)") + F.col("l_tax").cast("decimal(18,4)"))
                ),
                2,
            )
            .cast("double")
            .alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> broadcast join into the
    fact chain -> grouped revenue -> deterministic top-10."""
    revenue = (
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
    joined = (
        F.broadcast(customer.where(F.col("c_mktsegment") == segment))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp"))
        .join(
            lineitem.where(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
    )
    grouped = joined.groupBy(
        "o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        "o_orderpriority",
    ).agg(revenue)
    return grouped.orderBy(F.desc("revenue"), F.asc("o_orderkey")).limit(10)


def local_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join where customer and supplier must
    share a nation; revenue per nation. All dims broadcast; the single
    big shuffle is orders-lineitem."""
    dims = (
        F.broadcast(
            region.where(F.col("r_name") == region_name)
            .join(nation, F.col("n_regionkey") == F.col("r_regionkey"))
        )
    )
    joined = (
        customer.join(dims, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
    )
    return joined.groupBy("n_name").agg(
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


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Anti join: customers that never ordered."""
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


def customers_with_orders_count(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Semi join + count: how many customers have ordered at all."""
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .agg(F.count("*").alias("n_customers"))
    )


def nation_set_ops(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """Set-op surface: nation keys with customers INTERSECT suppliers,
    and customers EXCEPT suppliers, labeled and unioned."""
    c = customer.select(F.col("c_nationkey").alias("nationkey")).distinct()
    s = supplier.select(F.col("s_nationkey").alias("nationkey")).distinct()
    both = c.intersect(s).withColumn("set_op", F.lit("both"))
    only_c = c.exceptAll(s).withColumn("set_op", F.lit("customers_only"))
    return both.unionByName(only_c)


def doc_cube(documents: DataFrame) -> DataFrame:
    """CUBE over (lang, source): counts + char sums at all 4 grouping
    levels (grouping-sets surface)."""
    return (
        documents.cube("lang", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").cast("long").alias("chars"))
        .select(
            F.coalesce("lang", F.lit("ALL")).alias("lang_g"),
            F.coalesce("source", F.lit("ALL")).alias("source_g"),
            "n_docs",
            "chars",
        )
    )


def lang_pivot(documents: DataFrame, langs: list[str]) -> DataFrame:
    """Pivot: docs per source with one count column per language."""
    pivoted = documents.groupBy("source").pivot("lang", langs).count()
    renamed = pivoted.select(
        "source", *[F.coalesce(F.col(lg), F.lit(0)).alias(f"n_{lg}") for lg in langs]
    )
    return renamed


def asof_join_events(events: DataFrame) -> DataFrame:
    """As-of join (Spark has no native one — SURVEY.md section 4 /
    guide 'common OLAP patterns'): attach to every event the most
    recent PRIOR purchase value of the same user.

    Implementation: union the reference rows into the probe stream and
    carry the last non-null reference value forward with a window —
    one shuffle on (user_id), no range-join blowup. The DuckDB oracle
    uses its native ASOF JOIN.
    """
    probes = events.select(
        "event_id", "user_id", "ts", F.lit(None).cast("double").alias("ref_value"), F.lit(1).alias("is_probe")
    )
    refs = events.where(F.col("event_type") == "purchase").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.col("value").alias("ref_value"),
        F.lit(0).alias("is_probe"),
    )
    unioned = probes.unionByName(refs)
    # order refs before probes at identical ts: "most recent prior or
    # simultaneous" = strictly-before semantics needs refs first only
    # when ts strictly less; use is_probe ASC so a ref at the same ts
    # is visible to the probe (ASOF >= semantics, matching DuckDB)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_probe").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "last_purchase_value", F.round(F.last("ref_value", ignorenulls=True).over(w), 6)
    )
    return carried.where(F.col("is_probe") == 1).select(
        "event_id", "user_id", "last_purchase_value"
    )


def _revenue_expr():
    return (
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


def returned_item_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: which customers returned the most revenue in a
    quarter. Fact chain filtered early (returnflag + quarter window
    push to the scans), dims broadcast, deterministic top-k."""
    joined = (
        orders.where(
            (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(
            lineitem.where(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
    )
    return (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_revenue_expr())
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(k)
    )


def promo_revenue_ratio(
    lineitem: DataFrame,
    part: DataFrame,
    month_from: str = "1996-01-01",
    month_to: str = "1996-02-01",
) -> DataFrame:
    """TPC-H Q14 shape: percentage of a month's revenue from PROMO
    parts. One broadcast join + one ungrouped agg with a conditional
    numerator — the classic promotion-effect probe."""
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    joined = lineitem.where(
        (F.col("l_shipdate") >= F.lit(month_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(month_to).cast("timestamp"))
    ).join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,4)")))
            / F.sum(rev),
            6,
        )
        .cast("double")
        .alias("promo_revenue_pct")
    )


def scd2_history(events: DataFrame) -> DataFrame:
    """Type-2 slowly-changing-dimension history of each user's event
    state: collapse the per-user event stream into (state, valid_from,
    valid_to) intervals — valid_to is NULL for the current state. The
    standard way a warehouse materializes dimension history from a
    change stream.

    Plan shape: one shuffle on user_id drives everything — the lag()
    change filter and the lead() interval close ride the same
    (user_id, ts) sort; ties on ts break by event_id so the history is
    deterministic."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(F.lead("ts").over(w2), "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
    )


def disjunctive_part_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of brand/size/quantity
    conjunctions — the disjunctive-predicate pushdown probe. The OR
    evaluates after the broadcast join; each disjunct alone is
    scan-prunable."""
    joined = lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 15)
        & (F.col("l_quantity") >= 10)
    ) | (
        (F.col("p_brand") == "Brand#15")
        & F.col("p_size").between(10, 30)
        & (F.col("l_quantity") >= 20)
    )
    return joined.where(cond).agg(_revenue_expr())


def rolling_anomalies(
    events: DataFrame,
    n_prev: int = 20,
    min_prev: int = 5,
    z_threshold: float = 3.0,
) -> DataFrame:
    """(event_id, user_id, value, mean_prev, z): events whose value
    sits more than ``z_threshold`` sample standard deviations from the
    mean of the SAME USER's previous ``n_prev`` events — streaming-
    style anomaly detection expressed as a bounded preceding window
    (the exclusive frame means an event never scores against itself).
    Rows with fewer than ``min_prev`` history events or zero variance
    are not scored (no cold-start false positives).

    Plan shape: one hash-partition exchange on user_id + an in-
    partition sort — the same single-shuffle shape as the other event
    window queries; the frame is bounded so state per row is O(n_prev)
    regardless of history length. Sample std derives from the frame's
    (sum, sum-of-squares, count) — the algebraic form both engines
    share."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-n_prev, -1)
    )
    n = F.count("value").over(w)
    s = F.sum("value").over(w)
    s2 = F.sum(F.col("value") * F.col("value")).over(w)
    mean = s / n
    var = (s2 - s * s / n) / (n - 1)
    z = F.try_divide(F.col("value") - mean, F.sqrt(var))
    return (
        events.select(
            "event_id",
            "user_id",
            "value",
            n.alias("_n"),
            F.round(mean, 6).alias("mean_prev"),
            z.alias("_z"),
        )
        .where((F.col("_n") >= min_prev) & (F.abs("_z") > z_threshold))
        .select(
            "event_id",
            "user_id",
            F.round("value", 6).alias("value"),
            "mean_prev",
            F.round("_z", 6).alias("z"),
        )
    )


def cohort_retention(events: DataFrame) -> DataFrame:
    """(cohort_week, week_n, n_users): classic cohort-retention matrix
    — users grouped by their first-activity week, counted in each
    subsequent week they were active. The engagement-analytics shape
    every event warehouse reports.

    Plan shape: one user_id hash-agg for first-seen weeks, one
    (user, week) distinct, an equi-join on user_id, one keyed count —
    all linear; no per-user windows, no self-joins."""
    wk = F.date_trunc("week", F.col("ts"))
    first = events.groupBy("user_id").agg(F.min(wk).alias("cohort_wk"))
    active = events.select("user_id", wk.alias("wk")).distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("wk"), F.col("cohort_wk")) / 7).cast("int").alias("week_n"),
        )
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def rfm_segments(orders: DataFrame) -> DataFrame:
    """(o_custkey, recency_days, frequency, monetary, r_score,
    f_score, m_score, segment): RFM customer segmentation — quartile
    scores for recency (1 = most recent), frequency and monetary
    (1 = highest), concatenated into the classic 3-digit segment code.

    Plan shape: one 1-row max-date broadcast (the recency reference),
    one custkey hash-agg, then three ntile windows over the
    CUSTOMERS-sized aggregated frame (the bounded global-window
    pattern of customer_balance_ntile); ties break on custkey so the
    quartile assignment is deterministic and oracle-checkable.
    Monetary sums ride DECIMAL(18,4), exact in both engines."""
    from pyspark.sql import Window

    ref = orders.agg(F.max("o_orderdate").alias("_ref"))
    per = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("_last"),
            F.count("*").cast("long").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("_mon"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "o_custkey",
            F.datediff(F.col("_ref"), F.col("_last")).cast("int").alias("recency_days"),
            "frequency",
            # round on the DECIMAL (exact), then cast — double-first
            # rounding would reintroduce float boundary noise
            F.round(F.col("_mon"), 2).cast("double").alias("monetary"),
        )
    )
    r_w = Window.orderBy(F.asc("recency_days"), F.asc("o_custkey"))
    f_w = Window.orderBy(F.desc("frequency"), F.asc("o_custkey"))
    m_w = Window.orderBy(F.desc("monetary"), F.asc("o_custkey"))
    return per.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4).over(r_w).cast("int").alias("r_score"),
        F.ntile(4).over(f_w).cast("int").alias("f_score"),
        F.ntile(4).over(m_w).cast("int").alias("m_score"),
    ).withColumn(
        "segment",
        F.concat_ws("", F.col("r_score"), F.col("f_score"), F.col("m_score")),
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """(prev_type, event_type, n, prob): the first-order Markov
    transition matrix of the per-user event stream — counts of each
    (previous type -> type) step and row-normalized probabilities, the
    session-path-analysis summary behind funnels and next-action
    prediction baselines.

    Plan shape: one user_id exchange for the lag window, then one tiny
    keyed count (|types|^2 groups, map-side partial) and a windowed
    row-normalizer over that tiny frame."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
    )
    counts = steps.groupBy("prev_type", "event_type").agg(
        F.count("*").cast("long").alias("n")
    )
    norm = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "event_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(norm).cast("double"), 6).alias("prob"),
    )


def weekday_seasonality(orders: DataFrame) -> DataFrame:
    """(dow, n_orders, revenue, revenue_share, seasonal_index):
    revenue profile by ISO day-of-week with each day's share indexed
    against the uniform 1/7 — the seasonality diagnostic behind
    forecasting baselines and anomaly thresholds (index > 1 = an
    over-trading day). One 7-group hash-agg + a windowed normalizer
    over the 7-row frame; revenue sums ride DECIMAL."""
    per = orders.groupBy(
        F.expr("extract(DAYOFWEEK_ISO FROM o_orderdate)").cast("int").alias("dow")
    ).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("revenue"),
    )
    w = Window.partitionBy()
    share = F.col("revenue") / F.sum("revenue").over(w)
    return per.select(
        "dow",
        "n_orders",
        "revenue",
        F.round(share, 6).alias("revenue_share"),
        F.round(share * 7, 6).alias("seasonal_index"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """(key, status): dataset-versioning diff between two corpus
    snapshots — 'added' (key only in new), 'removed' (key only in old),
    'changed' (both, content fingerprint differs). Unchanged rows are
    not emitted: at 100 TB the diff is the small output, the snapshots
    are the big inputs.

    Each side is reduced map-side to (key, sha256(content)) before ONE
    full-outer shuffle on the key — content bytes never move, only
    64-hex fingerprints. With both snapshot tables bucketed by the key
    (sources/io bucketed writes) the join is co-located and shuffle-
    free. NULL contents compare via null-safe equality: NULL -> NULL
    is unchanged, NULL -> text is changed.
    """
    # presence flags, not fingerprint nullness, decide added/removed:
    # a row whose content is NULL still EXISTS in its snapshot
    fp = F.sha2(F.col(content_col), 256)
    o = old.select(F.col(key), fp.alias("old_fp"), F.lit(True).alias("_in_old"))
    n = new.select(F.col(key), fp.alias("new_fp"), F.lit(True).alias("_in_new"))
    j = o.join(n, key, "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(~F.col("old_fp").eqNullSafe(F.col("new_fp")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(F.col(key), status.alias("status"))
        .where(F.col("status") != "unchanged")
    )


def scd2_temporal_join(facts: DataFrame, history: DataFrame) -> DataFrame:
    """(event_id, user_id, ts, state): POINT-IN-TIME join — each fact
    row picks up the dimension version that was valid AT ITS OWN
    timestamp (ts in [valid_from, valid_to), half-open so a change at
    exactly ts wins), the correctness op behind every as-was report
    and leakage-free feature join (training a model on TODAY'S user
    state for YESTERDAY'S purchase is label leakage — this join is
    the remedy).

    Plan shape: the validity range rides as a residual condition on a
    plain user_id EQUI-join — Spark hashes on the equality and
    filters the per-key version fanout, so cost is |facts| x
    versions-per-key, never a range BNLJ. At 100 TB the fanout bound
    is the per-key version count (SCD2 dims change slowly by
    definition); a dimension with pathologically many versions per
    key calls for validity-interval bucketing instead. Timestamps
    compare as 'yyyy-MM-dd HH:mm:ss' strings (lexical == temporal for
    this format, and both engines share it — the scd2_history
    serialization). Facts before the key's first version (or with no
    dimension key at all) keep their row with NULL state (left
    join)."""
    f = facts.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
    )
    h = history.select(
        F.col("user_id").alias("_u"), "state", "valid_from", "valid_to"
    )
    cond = (
        (f["user_id"] == h["_u"])
        & (f["ts"] >= h["valid_from"])
        & (h["valid_to"].isNull() | (f["ts"] < h["valid_to"]))
    )
    return f.join(h, cond, "left").select("event_id", "user_id", "ts", "state")
