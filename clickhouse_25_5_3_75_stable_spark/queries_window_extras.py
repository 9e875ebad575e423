"""Registry entries for the non-standard window functions and the
remaining aggregate families (topK / histogram / entropy).
Imported by queries.py for its side effects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_25_5_3_75_stable_spark.operators.window_extras import (
    exp_time_decayed_sum,
    groups_frame_agg,
    neighbor,
    non_negative_derivative,
    running_difference,
)
from clickhouse_25_5_3_75_stable_spark.queries import register, t


@register(
    "window_running_difference_neighbor",
    oracle="""
    SELECT event_id,
           coalesce(value - lag(value) OVER w, 0.0) AS run_diff,
           lead(value, 1) OVER w AS next_1,
           lag(value, 2) OVER w AS prev_2
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS uts, value FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY uts, event_id)
    ORDER BY event_id
    """,
    tags=("window", "running_difference", "neighbor"),
)
def window_running_difference_neighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """runningDifference + neighbor(±n) as order-explicit window ops
    (the reference's block-order-dependent scalars made deterministic —
    SURVEY §2.8 'Introspection/misc')."""
    ev = t(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    part = [F.col("user_id")]
    return ev.select(
        "event_id",
        running_difference(F.col("value"), order, part).alias("run_diff"),
        neighbor(F.col("value"), 1, order, part).alias("next_1"),
        neighbor(F.col("value"), -2, order, part).alias("prev_2"),
    ).orderBy("event_id")


@register(
    "window_non_negative_derivative",
    oracle="""
    SELECT event_id,
           CASE WHEN epoch_us(uts) - epoch_us(lag(uts) OVER w) > 0
                THEN greatest((value - lag(value) OVER w)
                     / (CAST(epoch_us(uts) - epoch_us(lag(uts) OVER w) AS DOUBLE) / 1e6),
                     0.0)
                END AS deriv
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS uts, value FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY uts, event_id)
    ORDER BY event_id
    """,
    tags=("window", "derivative"),
)
def window_non_negative_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nonNegativeDerivative(value, ts)
    (/root/reference/src/Processors/Transforms/WindowTransform.cpp:2570)."""
    ev = t(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    part = [F.col("user_id")]
    return ev.select(
        "event_id",
        non_negative_derivative(F.col("value"), F.col("ts"), order, part).alias("deriv"),
    ).orderBy("event_id")


@register(
    "window_groups_frame_sum",
    oracle="""
    WITH grp AS (
        SELECT l_returnflag, l_quantity,
               SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS gs
        FROM lineitem GROUP BY 1, 2
    ), wins AS (
        SELECT l_returnflag, l_quantity,
               SUM(gs) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                             ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS w
        FROM grp
    )
    SELECT li.l_orderkey, li.l_linenumber, CAST(w.w AS STRING) AS grp_sum
    FROM lineitem li JOIN wins w
      ON li.l_returnflag = w.l_returnflag AND li.l_quantity = w.l_quantity
    ORDER BY li.l_orderkey, li.l_linenumber
    """,
    bucket="heavy",
    tags=("window", "groups_frame"),
)
def window_groups_frame_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPS frame emulation (Spark lacks GROUPS — SURVEY §2.5):
    dense_rank turns peer groups into integers, RANGE over the rank ==
    GROUPS. The oracle restates it independently: per-peer-group sums +
    a ROWS frame over the distinct groups, joined back. Decimal sum
    emitted as string (Spark's decimal sum scale differs from DuckDB's;
    the digits don't)."""
    li = t(spark, sf_dir, "lineitem")
    out = groups_frame_agg(
        li,
        lambda c: F.sum(c),
        F.col("l_extendedprice").cast("decimal(25,6)"),
        partition=["l_returnflag"],
        order=["l_quantity"],
        preceding=1,
        following=0,
        out="grp_sum_dec",
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.col("grp_sum_dec").cast("decimal(35,6)").cast("string").alias("grp_sum"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "window_exp_time_decayed_sum",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS tu
        FROM events
    )
    SELECT a.user_id, a.event_id,
           CAST(CAST(SUM(b.value * exp(-CAST(a.tu - b.tu AS DOUBLE) / 3600e6))
                AS DECIMAL(20,6)) AS DOUBLE) AS decayed_sum
    FROM ev a JOIN ev b
      ON a.user_id = b.user_id
     AND (b.tu < a.tu OR (b.tu = a.tu AND b.event_id <= a.event_id))
    GROUP BY a.user_id, a.event_id
    ORDER BY a.user_id, a.event_id
    """,
    bucket="heavy",
    tags=("window", "exp_decay"),
)
def window_exp_time_decayed_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exponentialTimeDecayedSum(1h)
    (/root/reference/src/Processors/Transforms/WindowTransform.cpp:1617).

    Spark runs the O(n) per-key recurrence (operators/window_extras);
    the oracle recomputes each row's sum directly O(n²). Both round to
    6 decimals: recurrence vs direct summation (and libm-vs-JVM exp
    ULPs) agree far below that scale."""
    ev = t(spark, sf_dir, "events")
    out = exp_time_decayed_sum(
        ev, value="value", ts="ts", decay_seconds=3600.0,
        partition=["user_id"], ev_id="event_id",
    )
    return out.select(
        "user_id",
        "event_id",
        F.col("decayed_sum").cast("decimal(20,6)").cast("double").alias("decayed_sum"),
    ).orderBy("user_id", "event_id")


# ---------------------------------------------------------------------------
# topK / histogram / entropy aggregates
# ---------------------------------------------------------------------------


@register(
    "agg_topk_event_types",
    oracle="""
    WITH counted AS (
        SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2
    ), ranked AS (
        SELECT user_id, event_type, c,
               row_number() OVER (PARTITION BY user_id ORDER BY c DESC, event_type) AS rn
        FROM counted
    )
    SELECT user_id,
           array_to_string(list(event_type ORDER BY rn), ',') AS top3
    FROM ranked WHERE rn <= 3
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("agg", "topk"),
)
def agg_topk_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """topK(3)(event_type) per user (reference
    AggregateFunctionTopK.h — SpaceSaving sketch; exact count+rank here,
    which IS the sketch's answer whenever the heavy hitters fit, and the
    deterministic definition for the oracle gate). Two-phase: count
    groupBy (map-combinable) then per-user top-n window."""
    ev = t(spark, sf_dir, "events")
    counted = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy(F.desc("c"), F.col("event_type"))
    ranked = counted.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    return (
        ranked.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                    lambda s: s["event_type"],
                ),
                ",",
            ).alias("top3")
        )
        .orderBy("user_id")
    )


@register(
    "agg_histogram_values",
    oracle="""
    SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           min(value) AS lo, max(value) AS hi
    FROM events
    GROUP BY 1
    ORDER BY bucket
    """,
    tags=("agg", "histogram"),
)
def agg_histogram_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of events.value (reference histogram() is
    adaptive-bin; fixed bins are its deterministic counterpart — one
    map-combinable groupBy, no second pass)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.floor(F.col("value") / 25.0).cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "agg_entropy_event_types",
    oracle="""
    WITH counted AS (
        SELECT user_id, event_type, CAST(COUNT(*) AS DOUBLE) AS c
        FROM events GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(CAST(ln(SUM(c)) - SUM(c * ln(c)) / SUM(c) AS DECIMAL(18,6)) AS DOUBLE)
             AS entropy
    FROM counted
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("agg", "entropy"),
)
def agg_entropy_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the per-user event-type distribution
    (reference AggregateFunctionEntropy.h): ln(N) − Σc·ln(c)/N over a
    counted subquery. Rounded to 6 decimals (the repo's float-pinning
    convention): ln differs between libm and the JVM in the last ulp
    and double-sum order differs between engines; the measured minimum
    distance to a 1e-6 rounding boundary at sf0.01 is 4.8e-11, ~500x
    any plausible cross-engine noise (at 9dp the margin was only
    3.4e-12 — the round-5 s2 hazard class)."""
    ev = t(spark, sf_dir, "events")
    counted = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    ent = F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c")
    return (
        counted.groupBy("user_id")
        .agg(ent.cast("decimal(18,6)").cast("double").alias("entropy"))
        .orderBy("user_id")
    )


@register(
    "window_exp_time_decayed_family",
    # direct O(n²) restatement per row; max over v_j*exp(-Δ/L); all
    # rounded at 6 decimals (recurrence vs direct + libm ULPs)
    oracle="""
    WITH ev AS (
        SELECT user_id, event_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS tu
        FROM events WHERE user_id % 10 = 3
    )
    SELECT a.user_id, a.event_id,
           CAST(CAST(SUM(b.value * exp(-CAST(a.tu - b.tu AS DOUBLE) / 3600e6))
                AS DECIMAL(20,6)) AS DOUBLE) AS decayed_sum,
           CAST(CAST(SUM(exp(-CAST(a.tu - b.tu AS DOUBLE) / 3600e6))
                AS DECIMAL(20,6)) AS DOUBLE) AS decayed_count,
           CAST(CAST(MAX(b.value * exp(-CAST(a.tu - b.tu AS DOUBLE) / 3600e6))
                AS DECIMAL(20,6)) AS DOUBLE) AS decayed_max,
           CAST(CAST(SUM(b.value * exp(-CAST(a.tu - b.tu AS DOUBLE) / 3600e6))
                / SUM(exp(-CAST(a.tu - b.tu AS DOUBLE) / 3600e6))
                AS DECIMAL(20,6)) AS DOUBLE) AS decayed_avg
    FROM ev a JOIN ev b
      ON a.user_id = b.user_id
     AND (b.tu < a.tu OR (b.tu = a.tu AND b.event_id <= a.event_id))
    GROUP BY a.user_id, a.event_id
    ORDER BY a.user_id, a.event_id
    """,
    tags=("window", "exp_decay"),
)
def window_exp_time_decayed_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full exponentialTimeDecayed{Sum,Count,Max,Avg} family
    (WindowTransform.cpp:1617-1874) from ONE per-key O(n) fold."""
    from clickhouse_25_5_3_75_stable_spark.operators.window_extras import (
        exp_time_decayed_family,
    )

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 3)
    out = exp_time_decayed_family(
        ev, value="value", ts="ts", decay_seconds=3600.0,
        partition=["user_id"], ev_id="event_id",
    )
    r6 = lambda c: F.col(c).cast("decimal(20,6)").cast("double").alias(c)  # noqa: E731
    return out.select(
        "user_id", "event_id",
        r6("decayed_sum"), r6("decayed_count"), r6("decayed_max"), r6("decayed_avg"),
    ).orderBy("user_id", "event_id")
