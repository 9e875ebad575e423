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
