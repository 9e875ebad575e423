"""Aggregate-function breadth, part 2 (SURVEY §2.4): statistical tests
(welchTTest/studentTTest — reference
/root/reference/src/AggregateFunctions/AggregateFunctionTTest.h),
rank correlation (AggregateFunctionRankCorrelation.h),
Kolmogorov-Smirnov (AggregateFunctionKolmogorovSmirnovTest.cpp),
interval aggregates (AggregateFunctionIntervalLengthSum.cpp,
AggregateFunctionMaxIntersections.cpp), moving sums
(AggregateFunctionGroupArrayMoving.cpp), avgWeighted / groupConcat
(AggregateFunctionAvgWeighted.cpp, AggregateFunctionGroupConcat.cpp),
and sequenceNextNode (AggregateFunctionSequenceNextNode.cpp).

All are re-expressed as native Spark window/agg pipelines — no Python
UDFs — and every statistic is derived from exact integer or decimal
moments so the double math is bitwise-identical to the DuckDB oracle.
Imported by queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from clickhouse_25_5_3_75_stable_spark.functions.numeric import (
    dec_to_double_sql,
    dsum,
    dsum_sql,
)
from clickhouse_25_5_3_75_stable_spark.queries import _sql, register, t


@register(
    "agg_avg_weighted_concat",
    oracle=f"""
    SELECT l_returnflag,
           {dec_to_double_sql("SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(25,6)))")}
             / {dec_to_double_sql("SUM(CAST(l_quantity AS DECIMAL(25,6)))")}
             AS avg_weighted_price,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "avg_weighted"),
)
def agg_avg_weighted_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avgWeighted(price, qty) + groupConcat(DISTINCT status)
    (/root/reference/src/AggregateFunctions/AggregateFunctionAvgWeighted.h,
    AggregateFunctionGroupConcat.cpp) — weighted mean from two exact
    decimal sums; concat emitted sorted so the hash is order-free."""
    li = t(spark, sf_dir, "lineitem")
    wsum = dsum(F.col("l_extendedprice") * F.col("l_quantity"))
    qsum = dsum("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            (wsum / qsum).alias("avg_weighted_price"),
            F.array_join(F.array_sort(F.collect_set("l_linestatus")), ",").alias("statuses"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_moving_sum_avg",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           {dec_to_double_sql('''SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)''')} AS moving_sum3,
           {dec_to_double_sql('''SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)''')}
             / CAST(COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_avg3
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("agg", "moving"),
)
def agg_moving_sum_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupArrayMovingSum(3)/MovingAvg(3)
    (/root/reference/src/AggregateFunctions/AggregateFunctionGroupArrayMoving.cpp)
    — the array-of-windows result re-expressed as one row per element
    (scale-correct: no per-group array materialization)."""
    orders = t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, W.currentRow)
    )
    msum = F.sum(F.col("o_totalprice").cast("decimal(25,6)")).over(w).cast("double")
    mcnt = F.count(F.lit(1)).over(w).cast("double")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        msum.alias("moving_sum3"),
        (msum / mcnt).alias("moving_avg3"),
    ).orderBy("o_custkey", "o_orderkey")


# Shared-text SQL (valid in both Spark SQL and DuckDB) for the
# gaps-and-islands interval aggregates: integer interval endpoints
# derived deterministically from (value, event_id).
_INTERVAL_SRC = """
        SELECT user_id,
               CAST(FLOOR(value * 100) AS BIGINT) AS s,
               CAST(FLOOR(value * 100) AS BIGINT) + 1 + event_id % 50 AS e,
               event_id
        FROM events
"""

_INTERVAL_LENGTH_SUM_SQL = f"""
    WITH iv AS ({_INTERVAL_SRC}),
    m AS (
        SELECT user_id, s, e, event_id,
               MAX(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        FROM iv
    ),
    g AS (
        SELECT user_id, s, e,
               SUM(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY s, e, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM m
    ),
    islands AS (
        SELECT user_id, island, MAX(e) - MIN(s) AS covered
        FROM g GROUP BY user_id, island
    )
    SELECT user_id,
           -- CAST: DuckDB SUM(BIGINT) widens to HUGEINT, Spark stays
           -- BIGINT — pin one dtype for the driver's hash
           CAST(SUM(covered) AS BIGINT) AS interval_length_sum,
           COUNT(*) AS n_islands
    FROM islands GROUP BY user_id ORDER BY user_id
"""


@register(
    "agg_interval_length_sum",
    oracle=_INTERVAL_LENGTH_SUM_SQL,
    tags=("agg", "interval"),
)
def agg_interval_length_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intervalLengthSum (/root/reference/src/AggregateFunctions/
    AggregateFunctionIntervalLengthSum.cpp): total length of the union
    of per-user intervals — gaps-and-islands with a running-max window,
    all integer arithmetic. One shuffle on user_id; windows reuse it."""
    return _sql(spark, sf_dir, _INTERVAL_LENGTH_SUM_SQL)


_MAX_INTERSECTIONS_SQL = f"""
    WITH iv AS ({_INTERVAL_SRC}),
    pts AS (
        SELECT user_id, s AS p, 1 AS delta, event_id FROM iv
        UNION ALL
        SELECT user_id, e AS p, -1 AS delta, event_id FROM iv
    ),
    running AS (
        SELECT user_id,
               SUM(delta) OVER (PARTITION BY user_id ORDER BY p, delta DESC, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
        FROM pts
    )
    SELECT user_id, CAST(MAX(conc) AS BIGINT) AS max_intersections
    FROM running GROUP BY user_id ORDER BY user_id
"""


@register(
    "agg_max_intersections",
    oracle=_MAX_INTERSECTIONS_SQL,
    tags=("agg", "interval"),
)
def agg_max_intersections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """maxIntersections (/root/reference/src/AggregateFunctions/
    AggregateFunctionMaxIntersections.cpp): peak number of concurrently
    open intervals per user — sweep-line as +1/-1 deltas with a running
    sum (closed intervals: starts sort before ends at equal points)."""
    return _sql(spark, sf_dir, _MAX_INTERSECTIONS_SQL)


_TTEST_SQL = f"""
    WITH s AS (
        SELECT event_type, value FROM events
        WHERE event_type IN ('click', 'view')
    ),
    m AS (
        SELECT event_type,
               COUNT(*) AS n,
               {dsum_sql('value', 'sx')},
               {dsum_sql('value * value', 'sxx')}
        FROM s GROUP BY event_type
    ),
    stats AS (
        SELECT event_type, n,
               sx / CAST(n AS DOUBLE) AS mean,
               (sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS var
        FROM m
    )
    SELECT a.mean - b.mean AS mean_diff,
           (a.mean - b.mean)
             / sqrt(a.var / CAST(a.n AS DOUBLE) + b.var / CAST(b.n AS DOUBLE)) AS welch_t,
           (a.mean - b.mean)
             / sqrt(((CAST(a.n - 1 AS DOUBLE) * a.var + CAST(b.n - 1 AS DOUBLE) * b.var)
                     / CAST(a.n + b.n - 2 AS DOUBLE))
                    * (1.0 / CAST(a.n AS DOUBLE) + 1.0 / CAST(b.n AS DOUBLE))) AS student_t,
           a.n AS n_click, b.n AS n_view
    FROM (SELECT * FROM stats WHERE event_type = 'click') a
    CROSS JOIN (SELECT * FROM stats WHERE event_type = 'view') b
"""


@register(
    "agg_ttest_click_vs_view",
    oracle=_TTEST_SQL,
    tags=("agg", "stattest"),
)
def agg_ttest_click_vs_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """welchTTest / studentTTest (/root/reference/src/AggregateFunctions/
    AggregateFunctionTTest.h, registerAggregateFunctions.cpp:183-196):
    the t statistics derived from exact decimal moments (single scan,
    one 2-row aggregate), so no scipy and no row collection."""
    return _sql(spark, sf_dir, _TTEST_SQL)


_KS_SQL = """
    WITH s AS (
        SELECT value,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS c1,
               CASE WHEN event_type = 'view'  THEN 1 ELSE 0 END AS c2
        FROM events WHERE event_type IN ('click', 'view')
    ),
    cum AS (
        SELECT value,
               SUM(c1) OVER (ORDER BY value
                             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1,
               SUM(c2) OVER (ORDER BY value
                             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f2,
               SUM(c1) OVER () AS n1,
               SUM(c2) OVER () AS n2
        FROM s
    )
    SELECT MAX(ABS(CAST(f1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                 - CAST(f2 AS DOUBLE) / CAST(n2 AS DOUBLE))) AS ks_d,
           CAST(MAX(n1) AS BIGINT) AS n_click, CAST(MAX(n2) AS BIGINT) AS n_view
    FROM cum
"""


@register(
    "agg_ks_test_click_vs_view",
    oracle=_KS_SQL,
    tags=("agg", "stattest"),
)
def agg_ks_test_click_vs_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kolmogorovSmirnovTest (/root/reference/src/AggregateFunctions/
    AggregateFunctionKolmogorovSmirnovTest.cpp): D = max |ECDF1 - ECDF2|
    via RANGE-frame cumulative counts (ties are peers, matching the
    reference's sorted-merge sweep). Counts are integers; the single
    division per row is IEEE-identical cross-engine.

    Scale note: the global ORDER BY value window is a single-partition
    sort at 100 TB — the production path would pre-bucket values
    (histogram ECDF); exactness here is the oracle-gate variant."""
    return _sql(spark, sf_dir, _KS_SQL)


_RANK_CORR_SQL = """
    WITH ranked AS (
        SELECT event_type,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rx,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY CAST(ts AS TIMESTAMP), event_id) AS ry
        FROM events
    ),
    moments AS (
        SELECT event_type,
               COUNT(*) AS n,
               SUM(rx) AS sx, SUM(ry) AS sy,
               SUM(rx * ry) AS sxy,
               SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy
        FROM ranked GROUP BY event_type
    )
    SELECT event_type,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS spearman_rho,
           n
    FROM moments
    ORDER BY event_type
"""


@register(
    "agg_rank_corr_value_time",
    oracle=_RANK_CORR_SQL,
    tags=("agg", "stattest"),
)
def agg_rank_corr_value_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rankCorr (/root/reference/src/AggregateFunctions/
    AggregateFunctionRankCorrelation.h): Spearman rho of (value, time)
    per event type — Pearson on deterministic integer ranks; all sums
    are exact BIGINTs so the final double formula matches bitwise."""
    return _sql(spark, sf_dir, _RANK_CORR_SQL)


_SEQ_NEXT_NODE_SQL = """
    WITH ordered AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY CAST(ts AS TIMESTAMP), event_id)
                 AS next_type,
               CASE WHEN event_type = 'view' THEN
                   row_number() OVER (PARTITION BY user_id,
                                      CASE WHEN event_type = 'view' THEN 1 ELSE 0 END
                                      ORDER BY CAST(ts AS TIMESTAMP), event_id)
               END AS view_rank
        FROM events
    )
    SELECT user_id, next_type
    FROM ordered
    WHERE view_rank = 1
    ORDER BY user_id
"""


@register(
    "agg_sequence_next_node",
    oracle=_SEQ_NEXT_NODE_SQL,
    tags=("agg", "behavioral"),
)
def agg_sequence_next_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequenceNextNode (/root/reference/src/AggregateFunctions/
    AggregateFunctionSequenceNextNode.cpp): the event that follows the
    first 'view' in each user's timeline — lead() + first-match filter,
    one shuffle on user_id."""
    ev = t(spark, sf_dir, "events")
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    wv = W.partitionBy("user_id", F.col("event_type") == "view").orderBy("ts", "event_id")
    return (
        ev.withColumn("next_type", F.lead("event_type").over(wo))
        .withColumn(
            "view_rank",
            F.when(F.col("event_type") == "view", F.row_number().over(wv)),
        )
        .filter(F.col("view_rank") == 1)
        .select("user_id", "next_type")
        .orderBy("user_id")
    )
