"""Registry entries for the time-window operators (batch-mode parity
surface of the streaming engine — the same builders run under
readStream; tests/test_streaming.py proves the streaming path).
Imported by queries.py for its side effects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_25_5_3_75_stable_spark.functions.numeric import dsum, dsum_sql
from clickhouse_25_5_3_75_stable_spark.queries import register, t
from clickhouse_25_5_3_75_stable_spark.streaming.windows import window_view


@register(
    "window_tumble_hourly",
    oracle=f"""
    SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS window_start,
           CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR AS TIMESTAMP)
             AS window_end,
           event_type,
           COUNT(*) AS n, {dsum_sql('value', 'sum_value')}
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY window_start, event_type
    """,
    bucket="heavy",
    tags=("streaming", "tumble"),
)
def window_tumble_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tumble(1h) windowed aggregation (reference StorageWindowView +
    FunctionsTimeWindow tumble) — batch run of the streaming builder."""
    ev = t(spark, sf_dir, "events")
    return window_view(
        ev,
        ts="ts",
        size="1 hour",
        agg_exprs=[F.count(F.lit(1)).alias("n"), dsum("value", "sum_value")],
        group_cols=["event_type"],
    ).orderBy("window_start", "event_type")


@register(
    "window_hop_30min",
    oracle=f"""
    WITH shifted AS (
        SELECT s.off AS off,
               CAST(to_timestamp(
                   CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 1800) AS BIGINT) * 1800 - s.off)
                 AS TIMESTAMP) AS window_start,
               value
        FROM events, (SELECT unnest([0, 1800]) AS off) s
        WHERE epoch(CAST(ts AS TIMESTAMP))
              < CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 1800) AS BIGINT) * 1800 - s.off + 3600
    )
    SELECT window_start,
           CAST(window_start + INTERVAL 1 HOUR AS TIMESTAMP) AS window_end,
           COUNT(*) AS n, {dsum_sql('value', 'sum_value')}
    FROM shifted
    GROUP BY 1, 2
    ORDER BY window_start
    """,
    tags=("streaming", "hop"),
)
def window_hop_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hop(size 1h, slide 30m): each event lands in two windows
    (reference FunctionsTimeWindow hop)."""
    ev = t(spark, sf_dir, "events")
    return window_view(
        ev,
        ts="ts",
        size="1 hour",
        slide="30 minutes",
        agg_exprs=[F.count(F.lit(1)).alias("n"), dsum("value", "sum_value")],
    ).orderBy("window_start")


@register(
    "window_session_user_gaps",
    oracle=None,  # session windows are stateful/iterative (no closed-form
    # SQL); equivalence with a window-lag SQL formulation is unit-tested
    tags=("streaming", "session"),
)
def window_session_user_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user with a 30-minute inactivity gap —
    native session_window (bonus vs the reference, SURVEY §2.9)."""
    ev = t(spark, sf_dir, "events")
    out = ev.groupBy(F.session_window("ts", "30 minutes"), F.col("user_id")).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "sum_value"),
    )
    return out.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "user_id",
        "n_events",
        "sum_value",
    ).orderBy("user_id", "session_start")
