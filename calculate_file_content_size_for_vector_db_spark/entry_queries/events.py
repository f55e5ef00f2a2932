"""Events query family (split from the entry_queries monolith;
see entry_queries/__init__.py for the assembled registry)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calculate_file_content_size_for_vector_db_spark.entry_queries._core import _events, register


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
