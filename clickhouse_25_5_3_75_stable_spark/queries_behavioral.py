"""Registry entries for the behavioral-analytics aggregates
(windowFunnel / sequenceMatch / sequenceCount / retention) over the
`events` table. Imported by queries.py for its side effects.

Oracles intentionally use an INDEPENDENT formulation (EXISTS-join
chains) rather than replaying the Spark fold — agreement then checks
the algorithm, not just the transcription.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_25_5_3_75_stable_spark.operators.funnel import (
    retention,
    retention_sql,
    sequence_count,
    sequence_match,
    window_funnel,
    window_funnel_oracle_sql,
)
from clickhouse_25_5_3_75_stable_spark.queries import register, t

_FUNNEL_CONDS = ["view", "click", "purchase"]


@register(
    "funnel_view_click_purchase",
    oracle=window_funnel_oracle_sql(
        "events",
        key="user_id",
        ts="ts",
        ev_id="event_id",
        conds=[f"{{e}}.event_type = '{et}'" for et in _FUNNEL_CONDS],
        window="1 hour",
    )
    + " ORDER BY user_id",
    bucket="heavy",
    tags=("behavioral", "funnel"),
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel('1 hour')(view→click→purchase) per user
    (/root/reference/src/AggregateFunctions/AggregateFunctionWindowFunnel.h)."""
    ev = t(spark, sf_dir, "events")
    et = F.col("event_type")
    conds = [et == v for v in _FUNNEL_CONDS]
    return (
        ev.groupBy("user_id")
        .agg(
            window_funnel(F.col("ts"), F.col("event_id"), conds, window="1 hour").alias(
                "funnel_level"
            )
        )
        .orderBy("user_id")
    )


@register(
    "sequence_match_signup_purchase",
    oracle="""
    WITH ev AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tu, event_id AS id, event_type
        FROM events
    )
    SELECT u.user_id,
           EXISTS (
               SELECT 1 FROM ev a JOIN ev b ON a.user_id = b.user_id
               WHERE a.user_id = u.user_id
                 AND a.event_type = 'signup' AND b.event_type = 'purchase'
                 AND (b.tu > a.tu OR (b.tu = a.tu AND b.id > a.id))
           ) AS matched
    FROM (SELECT DISTINCT user_id FROM ev) u
    ORDER BY user_id
    """,
    tags=("behavioral", "sequence"),
)
def sequence_match_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequenceMatch('(?1).*(?2)')(ts, signup, purchase) per user
    (/root/reference/src/AggregateFunctions/AggregateFunctionSequenceMatch.h)."""
    ev = t(spark, sf_dir, "events")
    et = F.col("event_type")
    return (
        ev.groupBy("user_id")
        .agg(
            sequence_match(
                F.col("ts"), F.col("event_id"), [et == "signup", et == "purchase"]
            ).alias("matched")
        )
        .orderBy("user_id")
    )


@register(
    "sequence_count_view_click",
    # closed form of the greedy non-overlap automaton for the 2-step
    # pattern: a match completes exactly on each 'click' whose previous
    # view/click event (in (tu, id) order) is a 'view' — the machine is
    # in state 1 iff the last relevant event was a view. (A list_reduce
    # restatement of the packed-state fold is NOT usable: DuckDB 1.0's
    # list_reduce miscomputes over grouped variable-length lists.)
    oracle="""
    WITH vc AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS prev
        FROM events WHERE event_type IN ('view', 'click')
    ), agg AS (
        SELECT user_id,
               COUNT(*) FILTER (WHERE event_type = 'click' AND prev = 'view') AS n
        FROM vc GROUP BY user_id
    )
    SELECT u.user_id, CAST(COALESCE(a.n, 0) AS BIGINT) AS n_matches
    FROM (SELECT DISTINCT user_id FROM events) u LEFT JOIN agg a USING (user_id)
    ORDER BY user_id
    """,
    tags=("behavioral", "sequence"),
)
def sequence_count_view_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequenceCount('(?1).*(?2)')(ts, view, click) per user."""
    ev = t(spark, sf_dir, "events")
    et = F.col("event_type")
    return (
        ev.groupBy("user_id")
        .agg(
            sequence_count(F.col("ts"), F.col("event_id"), [et == "view", et == "click"]).alias(
                "n_matches"
            )
        )
        .orderBy("user_id")
    )


_RET_CONDS_SQL = [
    "event_type = 'signup'",
    "event_type = 'view'",
    "event_type = 'purchase'",
]


@register(
    "retention_signup_view_purchase",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id, {retention_sql(_RET_CONDS_SQL)} AS r
        FROM events GROUP BY user_id
    )
    SELECT user_id, r[1] AS r1, r[2] AS r2, r[3] AS r3
    FROM per_user
    ORDER BY user_id
    """,
    tags=("behavioral", "retention"),
)
def retention_signup_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """retention(signup, view, purchase) per user
    (/root/reference/src/AggregateFunctions/AggregateFunctionRetention.h)."""
    ev = t(spark, sf_dir, "events")
    et = F.col("event_type")
    r = retention([et == "signup", et == "view", et == "purchase"])
    return (
        ev.groupBy("user_id")
        .agg(r.alias("r"))
        .select(
            "user_id",
            F.element_at("r", 1).alias("r1"),
            F.element_at("r", 2).alias("r2"),
            F.element_at("r", 3).alias("r3"),
        )
        .orderBy("user_id")
    )


@register(
    "sequence_match_timed_view_purchase",
    oracle="""
    WITH ev AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tu, event_id AS id, event_type
        FROM events
    )
    SELECT u.user_id,
           EXISTS (
               SELECT 1 FROM ev a JOIN ev b ON a.user_id = b.user_id
               WHERE a.user_id = u.user_id
                 AND a.event_type = 'view' AND b.event_type = 'purchase'
                 AND (b.tu > a.tu OR (b.tu = a.tu AND b.id > a.id))
                 AND b.tu - a.tu <= 1800000 * 1000
           ) AS matched
    FROM (SELECT DISTINCT user_id FROM ev) u
    ORDER BY user_id
    """,
    tags=("behavioral", "sequence", "time_constraint"),
)
def sequence_match_timed_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequenceMatch('(?1)(?t<=1800000)(?2)') — pattern-language time
    constraint (reference AggregateFunctionSequenceMatch.h actions
    TimeLessOrEqual): purchase within 30 min of a view. The oracle is
    the independent EXISTS-join formulation with the same gap bound."""
    from clickhouse_25_5_3_75_stable_spark.operators.funnel import (
        sequence_match_pattern,
    )

    ev = t(spark, sf_dir, "events")
    et = F.col("event_type")
    return (
        ev.groupBy("user_id")
        .agg(
            sequence_match_pattern(
                F.col("ts"),
                F.col("event_id"),
                [et == "view", et == "purchase"],
                "(?1)(?t<=1800000)(?2)",
            ).alias("matched")
        )
        .orderBy("user_id")
    )
