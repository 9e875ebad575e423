"""Vector-distance and bitmap families (SURVEY §2.8).

Vector distances: reference /root/reference/src/Functions/array/
arrayDistance.cpp:58,702 (L1/L2/L2Squared/Linf/cosineDistance),
arrayDotProduct.cpp, arrayNorm.cpp. Spark shape: zip_with/transform +
decimal-accumulated folds (order-independent, bitwise-equal to the
DuckDB oracle); Linf is a max — order-free in double.

Bitmaps: reference /root/reference/src/Functions/FunctionsBitmap.h and
groupBitmap aggregates (src/AggregateFunctions/
AggregateFunctionGroupBitmap.cpp). The reference stores RoaringBitmaps;
here a bitmap is a SORTED DISTINCT ARRAY so the same set algebra runs
on native array_intersect/union/except, serializes deterministically,
and the whole plan stays inside whole-stage codegen. Imported by
queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_25_5_3_75_stable_spark.functions.dialect import ch
from clickhouse_25_5_3_75_stable_spark.queries import arr_csv, register, t

# --- DuckDB spellings of the decimal-fold distance math (mirrors the
# Spark side exactly; STRING-routed final cast per functions/numeric.py)

_N = 64  # embedding dim (TESTDATA embeddings.parquet)


def _dec_sum_sql(elem: str) -> str:
    # Element cast routes through VARCHAR: float32-derived doubles are
    # dyadic and DO land on exact .5e-12 midpoints, where DuckDB's
    # binary cast rounds half-even but the JVM rounds the shortest
    # string repr HALF_UP. VARCHAR-routing reproduces the JVM.
    prods = (
        f"list_transform(range(1, {_N} + 1),"
        f" i -> CAST(CAST({elem} AS VARCHAR) AS DECIMAL(20,12)))"
    )
    return f"CAST(CAST(list_aggregate({prods}, 'sum') AS STRING) AS DOUBLE)"


def _dot_sql(a: str, b: str) -> str:
    return _dec_sum_sql(f"CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)")


def _l1_sql(a: str, b: str) -> str:
    return _dec_sum_sql(f"abs(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))")


def _l2sq_sql(a: str, b: str) -> str:
    return _dec_sum_sql(
        f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
        f" * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
    )


def _linf_sql(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(range(1, {_N} + 1),"
        f" i -> abs(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))), 'max')"
    )


@register(
    "func_vector_distance_family",
    oracle=f"""
    WITH pairs AS (
        SELECT vec_id, embedding AS a, list_reverse(embedding) AS b
        FROM embeddings
    )
    SELECT vec_id,
           {_dot_sql('a', 'b')} AS dot_ab,
           {_l1_sql('a', 'b')} AS l1,
           {_l2sq_sql('a', 'b')} AS l2sq,
           sqrt({_l2sq_sql('a', 'b')}) AS l2,
           {_linf_sql('a', 'b')} AS linf,
           sqrt({_dot_sql('a', 'a')}) AS l2norm_a,
           {_dec_sum_sql("abs(CAST(a[i] AS DOUBLE))")} AS l1norm_a,
           1.0 - {_dot_sql('a', 'b')}
               / (sqrt({_dot_sql('a', 'a')}) * sqrt({_dot_sql('b', 'b')})) AS cos_dist
    FROM pairs
    ORDER BY vec_id
    """,
    tags=("functions", "vector"),
)
def func_vector_distance_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dotProduct / L1 / L2 / L2Squared / Linf distances + norms +
    cosineDistance of each embedding against its own reverse — every
    fold decimal-accumulated so both engines agree bitwise."""
    emb = t(spark, sf_dir, "embeddings")
    a = F.col("embedding")
    b = F.reverse(F.col("embedding"))
    return emb.select(
        "vec_id",
        ch("dotProduct", a, b).alias("dot_ab"),
        ch("L1Distance", a, b).alias("l1"),
        ch("L2SquaredDistance", a, b).alias("l2sq"),
        ch("L2Distance", a, b).alias("l2"),
        ch("LinfDistance", a, b).alias("linf"),
        ch("L2Norm", a).alias("l2norm_a"),
        ch("L1Norm", a).alias("l1norm_a"),
        ch("cosineDistance", a, b).alias("cos_dist"),
    ).orderBy("vec_id")


@register(
    "agg_bitmap_per_type",
    oracle="""
    SELECT event_type,
           COALESCE(array_to_string(list_sort(list(DISTINCT user_id)), ','), '') AS user_bitmap,
           COUNT(DISTINCT user_id) AS card,
           MIN(user_id) AS bm_min,
           MAX(user_id) AS bm_max
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("agg", "bitmap"),
)
def agg_bitmap_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBitmapState per event_type (sorted-distinct-array model) +
    bitmapCardinality/Min/Max. Map-side partial collect_set keeps the
    shuffle at |distinct users per type| per partition."""
    ev = t(spark, sf_dir, "events")
    bm = F.array_sort(F.collect_set("user_id"))
    return (
        ev.groupBy("event_type")
        .agg(bm.alias("__bm"))
        .select(
            "event_type",
            arr_csv(F.col("__bm")).alias("user_bitmap"),
            # bigint: CH bitmapCardinality is UInt64; Spark size() is INT
            # and the oracle's COUNT(DISTINCT) is BIGINT (dtype parity)
            ch("bitmapCardinality", F.col("__bm")).cast("bigint").alias("card"),
            ch("bitmapMin", F.col("__bm")).alias("bm_min"),
            ch("bitmapMax", F.col("__bm")).alias("bm_max"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_bitmap_setops",
    oracle="""
    WITH b AS (
        SELECT event_type, list_sort(list(DISTINCT user_id)) AS bm
        FROM events
        WHERE event_type IN ('click', 'purchase')
        GROUP BY event_type
    ),
    c AS (SELECT bm FROM b WHERE event_type = 'click'),
    p AS (SELECT bm FROM b WHERE event_type = 'purchase')
    SELECT
        COALESCE(array_to_string(list_sort(list_intersect(c.bm, p.bm)), ','), '') AS bm_and,
        len(list_intersect(c.bm, p.bm)) AS card_and,
        len(list_distinct(list_concat(c.bm, p.bm))) AS card_or,
        len(list_filter(c.bm, x -> NOT list_contains(p.bm, x)))
          + len(list_filter(p.bm, x -> NOT list_contains(c.bm, x))) AS card_xor,
        COALESCE(array_to_string(list_sort(list_filter(c.bm, x -> NOT list_contains(p.bm, x))), ','), '') AS bm_andnot,
        list_has_any(c.bm, p.bm) AS has_any,
        len(list_filter(p.bm, x -> NOT list_contains(c.bm, x))) = 0 AS has_all,
        list_contains(c.bm, 7) AS contains_7
    FROM c, p
    """,
    tags=("agg", "bitmap"),
)
def agg_bitmap_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bitmapAnd/Or/Xor/Andnot (+Cardinality), bitmapHasAny/HasAll/
    Contains between the click-user and purchase-user bitmaps. Two
    1-row aggregates cross-joined — broadcast-trivial at any scale."""
    ev = t(spark, sf_dir, "events")
    bm = F.array_sort(F.collect_set("user_id"))
    click = (
        ev.filter(F.col("event_type") == "click").agg(bm.alias("c"))
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase").agg(bm.alias("p"))
    )
    c, p = F.col("c"), F.col("p")
    return click.crossJoin(purch).select(
        arr_csv(ch("bitmapAnd", c, p)).alias("bm_and"),
        # bigint: CH *Cardinality are UInt64; oracle len() is BIGINT
        ch("bitmapAndCardinality", c, p).cast("bigint").alias("card_and"),
        ch("bitmapOrCardinality", c, p).cast("bigint").alias("card_or"),
        ch("bitmapXorCardinality", c, p).cast("bigint").alias("card_xor"),
        arr_csv(ch("bitmapAndnot", c, p)).alias("bm_andnot"),
        ch("bitmapHasAny", c, p).alias("has_any"),
        ch("bitmapHasAll", c, p).alias("has_all"),
        ch("bitmapContains", c, F.lit(7)).alias("contains_7"),
    )
