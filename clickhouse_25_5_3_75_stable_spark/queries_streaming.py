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
    # gaps-and-islands restatement: a new session starts when the event
    # is >= gap after the previous one (Spark merges session windows
    # only while they strictly overlap: [t, t+gap) ∩ next ≠ ∅);
    # session_end = last event + gap, matching session_window's end
    oracle=f"""
    WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS tts, value FROM events
    ), f AS (
        SELECT user_id, tts, value,
               CASE WHEN tts < lag(tts) OVER w + INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS ns
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tts)
    ), g AS (
        SELECT user_id, tts, value,
               SUM(ns) OVER (PARTITION BY user_id ORDER BY tts
                             ROWS UNBOUNDED PRECEDING) AS sid
        FROM f
    )
    SELECT min(tts) AS session_start,
           max(tts) + INTERVAL 30 MINUTE AS session_end,
           user_id,
           COUNT(*) AS n_events,
           {dsum_sql('value', 'sum_value')}
    FROM g
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
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


@register(
    "matview_insert_cascade",
    # the MV chain must reproduce the direct query over the source:
    # hourly partial states merged to (event_type, day) rollups
    oracle=f"""
    SELECT event_type,
           CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
           COUNT(*) AS n, {dsum_sql('value', 'sum_value')}
    FROM events
    GROUP BY 1, 2
    ORDER BY event_type, day
    """,
    tags=("streaming", "matview"),
)
def matview_insert_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view cascade (reference
    buildPushingToViewsChain.cpp): events inserted in three blocks
    through a streaming source trigger an hourly partial-state MV,
    which cascades into a daily rollup MV; reading the daily target
    with a final merge must equal the direct query over all events —
    proving maintenance is incremental AND exact however inserts are
    batched."""
    import shutil
    import tempfile

    from clickhouse_25_5_3_75_stable_spark.streaming.matview import (
        MatView,
        attach_views,
        merge_counts,
        merge_dsum,
        partial_count,
        partial_dsum,
        read_final,
    )

    ev = t(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="matview_q_")
    try:
        src = f"{base}/src"
        # three separate inserts (parquet files) = three micro-batches
        for i in range(3):
            ev.filter(F.col("event_id") % 3 == i).write.mode("append").parquet(src)

        hourly = MatView(
            name="mv_hourly",
            select=lambda block: block.groupBy(
                "event_type", F.date_trunc("hour", "ts").alias("hour")
            ).agg(partial_count("cnt"), partial_dsum("value", "sval")),
            target=f"{base}/mv_hourly",
        )
        daily = MatView(
            name="mv_daily",
            select=lambda block: block.groupBy(
                "event_type", F.date_trunc("day", "hour").alias("day")
            ).agg(
                F.sum("cnt").alias("cnt"), F.sum("sval").cast("decimal(25,6)").alias("sval")
            ),
            target=f"{base}/mv_daily",
        )
        hourly.children.append(daily)

        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = attach_views(stream, [hourly], checkpoint_dir=f"{base}/ckpt")
        q.awaitTermination(300)

        out = read_final(
            spark,
            daily,
            keys=["event_type", "day"],
            merge_exprs=[merge_counts("cnt", "n"), merge_dsum("sval", "sum_value")],
        ).orderBy("event_type", "day")
        # materialize before the temp dir disappears
        final = spark.createDataFrame(out.collect(), out.schema)
        return final
    finally:
        shutil.rmtree(base, ignore_errors=True)
