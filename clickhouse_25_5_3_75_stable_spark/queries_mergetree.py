"""Registry entries for the MergeTree engine-family FINAL semantics
(operators/mergetree.py), exercised over the events table as the
append-only fact stream. Imported by queries.py for its side effects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_25_5_3_75_stable_spark.functions.numeric import dsum, dsum_sql
from clickhouse_25_5_3_75_stable_spark.operators.mergetree import (
    collapsing_final,
    replacing_final,
    summing_final,
)
from clickhouse_25_5_3_75_stable_spark.queries import register, t


@register(
    "mergetree_replacing_final",
    oracle="""
    SELECT user_id, event_type, event_id, value
    FROM (
        SELECT user_id, event_type, event_id, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    ORDER BY user_id, event_type
    """,
    tags=("mergetree", "replacing"),
)
def mergetree_replacing_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReplacingMergeTree(ts) FINAL keyed on (user_id, event_type)
    (/root/reference/src/Storages/MergeTree/registerStorageMergeTree.cpp:924)."""
    ev = t(spark, sf_dir, "events")
    return (
        replacing_final(ev, ["user_id", "event_type"], version="ts", tiebreak=["event_id"])
        .select("user_id", "event_type", "event_id", "value")
        .orderBy("user_id", "event_type")
    )


@register(
    "mergetree_summing_final",
    oracle=f"""
    SELECT user_id, event_type, {dsum_sql('value', 'value_sum')}, COUNT(*) AS n_rows
    FROM events
    GROUP BY user_id, event_type
    ORDER BY user_id, event_type
    """,
    tags=("mergetree", "summing"),
)
def mergetree_summing_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SummingMergeTree((value)) FINAL keyed on (user_id, event_type)."""
    ev = t(spark, sf_dir, "events")
    return summing_final(
        ev,
        ["user_id", "event_type"],
        [dsum("value", "value_sum"), F.count(F.lit(1)).alias("n_rows")],
    ).orderBy("user_id", "event_type")


@register(
    "mergetree_collapsing_final",
    oracle="""
    WITH signed AS (
        SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS uts,
               CASE WHEN event_id % 2 = 0 THEN 1 ELSE -1 END AS sign
        FROM events
    ), survivors AS (
        SELECT user_id, event_type FROM signed
        GROUP BY user_id, event_type HAVING SUM(sign) > 0
    ), latest_pos AS (
        SELECT user_id, event_type, event_id FROM (
            SELECT user_id, event_type, event_id,
                   row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY uts DESC, event_id DESC) AS rn
            FROM signed WHERE sign > 0
        ) WHERE rn = 1
    )
    SELECT l.user_id, l.event_type, l.event_id
    FROM latest_pos l SEMI JOIN survivors s
      ON l.user_id = s.user_id AND l.event_type = s.event_type
    ORDER BY l.user_id, l.event_type
    """,
    tags=("mergetree", "collapsing"),
)
def mergetree_collapsing_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollapsingMergeTree(sign) FINAL: +1/-1 rows cancel per key;
    surviving keys keep their latest +1 row (sign synthesized from
    event parity for determinism)."""
    ev = t(spark, sf_dir, "events").withColumn(
        "sign", F.when(F.col("event_id") % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    )
    return (
        collapsing_final(ev, ["user_id", "event_type"], sign="sign", order=["ts", "event_id"])
        .select("user_id", "event_type", "event_id")
        .orderBy("user_id", "event_type")
    )


@register(
    "mergetree_aggregating_final",
    oracle=f"""
    SELECT user_id,
           min(value) AS min_v, max(value) AS max_v,
           {dsum_sql('value', 'sum_v')},
           COUNT(DISTINCT event_type) AS n_types,
           arg_max(event_id, CAST(ts AS TIMESTAMP)) AS last_event
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("mergetree", "aggregating"),
)
def mergetree_aggregating_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AggregatingMergeTree FINAL — arbitrary per-key aggregate fold;
    argMax keyed by (ts, event_id) uniqueness via max_by on a struct
    would be ambiguous, so ts ties break on nothing (ts is unique in
    the synthetic stream)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
            dsum("value", "sum_v"),
            F.count_distinct("event_type").alias("n_types"),
            F.max_by("event_id", F.col("ts")).alias("last_event"),
        )
        .orderBy("user_id")
    )


@register(
    "mergetree_versioned_collapsing_final",
    # sign = +1 for even event_id, -1 for odd; version = user_id % 7:
    # a (key, version) survives iff its net sign is positive, and FINAL
    # returns its +1 rows
    oracle="""
    WITH signed AS (
        SELECT event_type, user_id % 7 AS ver,
               CASE WHEN event_id % 2 = 0 THEN 1 ELSE -1 END AS sign,
               event_id
        FROM events
    ), net AS (
        SELECT event_type, ver FROM signed
        GROUP BY event_type, ver HAVING SUM(sign) > 0
    )
    SELECT s.event_type, s.ver, COUNT(*) AS n_rows, MAX(s.event_id) AS max_id
    FROM signed s JOIN net USING (event_type, ver)
    WHERE s.sign > 0
    GROUP BY s.event_type, s.ver
    ORDER BY s.event_type, s.ver
    """,
    tags=("mergetree", "versioned_collapsing"),
)
def mergetree_versioned_collapsing_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VersionedCollapsingMergeTree FINAL (reference
    registerStorageMergeTree.cpp:929): synthesized sign/version over
    events; surviving +1 rows aggregated per (key, version)."""
    from clickhouse_25_5_3_75_stable_spark.operators.mergetree import (
        versioned_collapsing_final,
    )

    ev = t(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 7).alias("ver"),
        F.when(F.col("event_id") % 2 == 0, F.lit(1)).otherwise(F.lit(-1)).alias("sign"),
        "event_id",
    )
    fin = versioned_collapsing_final(ev, ["event_type"], sign="sign", version="ver")
    return (
        fin.groupBy("event_type", "ver")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.max("event_id").alias("max_id"))
        .orderBy("event_type", "ver")
    )


@register(
    "mergetree_graphite_rollup",
    # rules: points >= 3 days old roll to 1-day buckets, >= 1 day to
    # 6h buckets, fresher keep 1h buckets; 'now' anchors to max(ts)
    oracle="""
    WITH anchor AS (
        SELECT CAST(floor(epoch(max(CAST(ts AS TIMESTAMP)))) AS BIGINT) AS now_e FROM events
    ), pts AS (
        SELECT event_type AS path,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS e, value,
               CASE WHEN (SELECT now_e FROM anchor) - CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) >= 259200 THEN 86400
                    WHEN (SELECT now_e FROM anchor) - CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) >= 86400 THEN 21600
                    ELSE 3600 END AS prec
        FROM events
    )
    SELECT path,
           CAST(to_timestamp(CAST(e // prec AS BIGINT) * prec) AS TIMESTAMP) AS bucket,
           CAST(CAST(SUM(CAST(CAST(value AS VARCHAR) AS DECIMAL(25,6))) AS STRING) AS DOUBLE)
             / COUNT(value) AS value,
           COUNT(*) AS n_points
    FROM pts
    GROUP BY 1, 2
    ORDER BY path, bucket
    """,
    tags=("mergetree", "graphite"),
)
def mergetree_graphite_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphiteMergeTree age-based rollup (reference
    registerStorageMergeTree.cpp:930, GraphiteRollupSortedAlgorithm.h):
    retention rules pick per-point precision, one hash agg per
    (path, bucket)."""
    from clickhouse_25_5_3_75_stable_spark.operators.mergetree import graphite_rollup

    ev = t(spark, sf_dir, "events")
    now = ev.agg(F.max(F.col("ts").cast("timestamp"))).collect()[0][0]
    out = graphite_rollup(
        ev,
        path_col="event_type",
        time_col="ts",
        value_col="value",
        rules=[(259200, 86400), (86400, 21600), (0, 3600)],
        now_expr=F.lit(now).cast("timestamp"),
        agg="avg",
    )
    return out.orderBy("path", "bucket")
