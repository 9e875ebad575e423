"""Aggregate-function breadth, part 3 (SURVEY §2.4): regression
(simpleLinearRegression — reference /root/reference/src/
AggregateFunctions/AggregateFunctionSimpleLinearRegression.cpp),
categorical association statistics (cramersV / theilsU / contingency —
AggregateFunctionsStatisticsSimple.h family, CrossTab.h),
minMap / maxMap (AggregateFunctionSumMap.h keyed min/max),
uniqUpTo (AggregateFunctionUniqUpTo.h), boundingRatio
(AggregateFunctionBoundingRatio.h), sumCount (AggregateFunctionSumCount
.cpp), and groupArrayIntersect (AggregateFunctionGroupArrayIntersect
.cpp).

Exactness strategy: every statistic is reduced to integer counts plus
decimal-accumulated moments (functions/numeric.py convention), so the
final double math runs on bitwise-identical inputs in both engines.
Where a term is a rational number that can land on an exact decimal
midpoint (chi-squared cells), the oracle routes the cast through
VARCHAR to reproduce the JVM's HALF_UP-on-shortest-repr rounding.
Imported by queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_25_5_3_75_stable_spark.functions.numeric import dsum
from clickhouse_25_5_3_75_stable_spark.queries import arr_csv, arr_csv_dec, register, t

_DEC6 = "decimal(25,6)"


def _dec6_sum_sql(expr: str) -> str:
    """Order-free sum of per-row doubles: VARCHAR-routed decimal cast
    (matches the JVM's rounding), decimal SUM, STRING-routed back."""
    return (
        f"CAST(CAST(SUM(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(25,6)))"
        f" AS STRING) AS DOUBLE)"
    )


@register(
    "agg_linreg_family",
    oracle=f"""
    WITH m AS (
        SELECT event_type,
               COUNT(*) AS n,
               SUM(user_id) AS sx,
               SUM(user_id * user_id) AS sxx,
               {_dec6_sum_sql('value')} AS sy,
               {_dec6_sum_sql('user_id * value')} AS sxy,
               MIN(value) AS min_y, MAX(value) AS max_y,
               MIN(user_id) AS min_x, MAX(user_id) AS max_x
        FROM events GROUP BY event_type
    )
    SELECT event_type,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept,
           (max_y - min_y) / (max_x - min_x) AS bounding_ratio,
           sy AS sum_v, n AS count_v
    FROM m
    ORDER BY event_type
    """,
    tags=("agg", "regression"),
)
def agg_linreg_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """simpleLinearRegression(user_id, value) per event_type from exact
    moments (integer Sx/Sxx + decimal Sy/Sxy), plus boundingRatio and
    sumCount. One map-combinable groupBy — scale-safe."""
    ev = t(spark, sf_dir, "events")
    x, y = F.col("user_id"), F.col("value")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        dsum(y).alias("sy"),
        dsum(x * y).alias("sxy"),
        F.min(y).alias("min_y"),
        F.max(y).alias("max_y"),
        F.min(x).alias("min_x"),
        F.max(x).alias("max_x"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, sxy = F.col("sy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "event_type",
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
        ((F.col("max_y") - F.col("min_y")) / (F.col("max_x") - F.col("min_x"))).alias(
            "bounding_ratio"
        ),
        sy.alias("sum_v"),
        n.alias("count_v"),
    ).orderBy("event_type")


@register(
    "agg_assoc_family",
    oracle=f"""
    WITH cells AS (
        SELECT o_orderpriority AS a, o_orderstatus AS b,
               CAST(COUNT(*) AS DOUBLE) AS o
        FROM orders GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(SUM(o) AS DOUBLE) AS n,
                   COUNT(DISTINCT a) AS r, COUNT(DISTINCT b) AS c FROM cells),
    rows_ AS (SELECT a, SUM(o) AS ra FROM cells GROUP BY a),
    cols_ AS (SELECT b, SUM(o) AS cb FROM cells GROUP BY b),
    chi AS (
        SELECT {_dec6_sum_sql(
            '(cells.o - rows_.ra * cols_.cb / tot.n)'
            ' * (cells.o - rows_.ra * cols_.cb / tot.n)'
            ' / (rows_.ra * cols_.cb / tot.n)'
        )} AS chi2
        FROM cells, tot
        JOIN rows_ ON cells.a = rows_.a
        JOIN cols_ ON cells.b = cols_.b
    ),
    hx AS (SELECT {_dec6_sum_sql('(ra / n) * ln(ra / n)')} * -1 AS h
           FROM rows_, tot),
    hxy AS (SELECT {_dec6_sum_sql('(o / n) * ln(o / (SELECT cb FROM cols_ WHERE cols_.b = cells.b))')} * -1 AS h
            FROM cells, tot)
    SELECT sqrt(chi.chi2 / (tot.n * (CASE WHEN tot.r < tot.c THEN tot.r ELSE tot.c END - 1)))
             AS cramers_v,
           sqrt(chi.chi2 / (chi.chi2 + tot.n)) AS contingency_coef,
           (hx.h - hxy.h) / hx.h AS theils_u,
           CAST(tot.n AS BIGINT) AS n
    FROM chi, tot, hx, hxy
    """,
    tags=("agg", "association"),
)
def agg_assoc_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cramersV / contingency coefficient / theilsU(priority|status)
    over the orders priority x status contingency table (reference
    CrossTab.h). All inputs are integer cell counts; chi-squared and
    entropy terms accumulate in decimal so the cell-sum order cannot
    perturb the double result."""
    od = t(spark, sf_dir, "orders")
    cells = od.groupBy(
        F.col("o_orderpriority").alias("a"), F.col("o_orderstatus").alias("b")
    ).agg(F.count(F.lit(1)).cast("double").alias("o"))
    tot = cells.agg(
        F.sum("o").cast("double").alias("n"),
        F.countDistinct("a").alias("r"),
        F.countDistinct("b").alias("c"),
    )
    rows_ = cells.groupBy("a").agg(F.sum("o").alias("ra"))
    cols_ = cells.groupBy("b").agg(F.sum("o").alias("cb"))
    joined = cells.join(rows_, "a").join(cols_, "b").crossJoin(F.broadcast(tot))
    exp = F.col("ra") * F.col("cb") / F.col("n")
    chi2 = (
        joined.agg(
            F.sum(((F.col("o") - exp) * (F.col("o") - exp) / exp).cast(_DEC6))
            .cast("double")
            .alias("chi2")
        )
    )
    hx = (
        rows_.crossJoin(F.broadcast(tot))
        .agg((-F.sum(((F.col("ra") / F.col("n")) * F.log(F.col("ra") / F.col("n"))).cast(_DEC6))).cast("double").alias("hx"))
    )
    hxy = (
        cells.join(cols_, "b")
        .crossJoin(F.broadcast(tot))
        .agg((-F.sum(((F.col("o") / F.col("n")) * F.log(F.col("o") / F.col("cb"))).cast(_DEC6))).cast("double").alias("hxy"))
    )
    r_, c_, n_ = F.col("r"), F.col("c"), F.col("n")
    return (
        chi2.crossJoin(tot)
        .crossJoin(hx)
        .crossJoin(hxy)
        .select(
            F.sqrt(F.col("chi2") / (n_ * (F.least(r_, c_) - 1))).alias("cramers_v"),
            F.sqrt(F.col("chi2") / (F.col("chi2") + n_)).alias("contingency_coef"),
            ((F.col("hx") - F.col("hxy")) / F.col("hx")).alias("theils_u"),
            n_.cast("bigint").alias("n"),
        )
    )


@register(
    "agg_minmax_map_family",
    oracle="""
    SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 5 AS k_bucket,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           LEAST(COUNT(DISTINCT user_id), 6) AS uniq_upto_5
    FROM events
    GROUP BY event_type, k_bucket
    ORDER BY event_type, k_bucket
    """,
    tags=("agg", "minmax_map"),
)
def agg_minmax_map_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minMap/maxMap keyed by props.k bucket (reference
    AggregateFunctionSumMap.h keyed-min/max variants) in the exploded
    shape — per-key rows, map-side combinable — plus uniqUpTo(5)
    (AggregateFunctionUniqUpTo.h: exact count up to N, else N+1)."""
    ev = t(spark, sf_dir, "events")
    k_bucket = (F.get_json_object("props", "$.k").cast("bigint") % 5).alias("k_bucket")
    return (
        ev.groupBy("event_type", k_bucket)
        .agg(
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.least(F.countDistinct("user_id"), F.lit(6)).alias("uniq_upto_5"),
        )
        .orderBy("event_type", "k_bucket")
    )


@register(
    "agg_group_array_intersect",
    oracle="""
    WITH days AS (
        SELECT event_type, CAST(ts AS DATE) AS d, user_id
        FROM events GROUP BY 1, 2, 3
    ),
    per_type_days AS (
        SELECT event_type, COUNT(DISTINCT d) AS nd FROM days GROUP BY 1
    ),
    everyday AS (
        SELECT days.event_type, user_id
        FROM days
        GROUP BY days.event_type, user_id
        HAVING COUNT(DISTINCT d) = (SELECT nd FROM per_type_days p
                                    WHERE p.event_type = days.event_type)
    )
    SELECT event_type,
           COALESCE(array_to_string(list_sort(list(user_id)), ','), '') AS everyday_users,
           COUNT(*) AS n_everyday
    FROM everyday
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("agg", "group_array_intersect"),
)
def agg_group_array_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupArrayIntersect semantics (reference
    AggregateFunctionGroupArrayIntersect.cpp): intersect the per-day
    user sets within each event_type — re-expressed as a relational
    count-distinct-days filter (no array build-up on the shuffle), the
    shape that scales: state per (type,user) is one counter."""
    ev = t(spark, sf_dir, "events")
    days = ev.select(
        "event_type", F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    per_type = days.groupBy("event_type").agg(F.countDistinct("d").alias("nd"))
    everyday = (
        days.groupBy("event_type", "user_id")
        .agg(F.countDistinct("d").alias("ud"))
        .join(F.broadcast(per_type), "event_type")
        .filter(F.col("ud") == F.col("nd"))
    )
    return (
        everyday.groupBy("event_type")
        .agg(
            arr_csv(F.array_sort(F.collect_list("user_id"))).alias("everyday_users"),
            F.count(F.lit(1)).alias("n_everyday"),
        )
        .orderBy("event_type")
    )
