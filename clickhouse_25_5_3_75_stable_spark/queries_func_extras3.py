"""Registry entries: dialect-extras family query (part-3 scalar names:
gcd/lcm/clamp/sigmoid, calendar extras, INET codecs, array extras).
Imported by queries.py for its side effects."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_25_5_3_75_stable_spark.functions.dialect import ch
from clickhouse_25_5_3_75_stable_spark.queries import arr_csv, arr_csv_dec, register, t


@register(
    "func_extras3_family",
    oracle="""
    SELECT o_orderkey,
           gcd(o_orderkey, o_custkey) AS g,
           lcm(o_orderkey % 12 + 1, 8) AS l,
           greatest(least(o_totalprice, 100000.0), 50000.0) AS clamped,
           1.0 / (1.0 + exp(-(o_orderkey % 7 - 3))) AS sig,
           strftime(o_orderdate, '%B') AS mn,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS ldm,
           CAST(strftime(o_orderdate, '%Y%m%d%H%M%S') AS BIGINT) AS ymd,
           CAST(o_orderkey % 256 AS BIGINT) * 16777216
             + CAST(o_custkey % 256 AS BIGINT) * 65536
             + CAST(o_orderkey % 100 AS BIGINT) * 256 + 4 AS ipnum,
           CAST(list_aggregate([CAST(o_orderkey % 5 + 1 AS DOUBLE),
                                CAST(o_custkey % 3 + 1 AS DOUBLE)], 'product')
                AS DOUBLE) AS arr_prod,
           COALESCE(array_to_string(list_concat(list_slice([o_orderkey, o_custkey, 7], 2, 3),
                       list_slice([o_orderkey, o_custkey, 7], 1, 1)), ','), '') AS rot
    FROM orders
    ORDER BY o_orderkey
    """,
    tags=("functions", "extras"),
)
def func_extras3_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-3 dialect names end-to-end (reference src/Functions/gcd.cpp,
    lcm.cpp, clamp registration, sigmoid.cpp, monthName registration in
    dateName.cpp, lastDay alias, FunctionsCodingIP.cpp INET_ATON,
    array/arrayProduct.cpp, arrayRotate.cpp)."""
    o = t(spark, sf_dir, "orders")
    ok, ck = F.col("o_orderkey"), F.col("o_custkey")
    ip = (
        (ok % 256).cast("bigint") * 16777216
        + (ck % 256).cast("bigint") * 65536
        + (ok % 100).cast("bigint") * 256
        + 4
    )
    arr = F.array((ok % 5 + 1).cast("double"), (ck % 3 + 1).cast("double"))
    rot_in = F.array(ok, ck, F.lit(7).cast("bigint"))
    return o.select(
        ok.alias("o_orderkey"),
        ch("gcd", ok, ck).alias("g"),
        ch("lcm", ok % 12 + 1, F.lit(8)).alias("l"),
        ch("clamp", F.col("o_totalprice"), F.lit(50000.0), F.lit(100000.0)).alias("clamped"),
        ch("sigmoid", (ok % 7 - 3).cast("double")).alias("sig"),
        ch("monthName", F.col("o_orderdate")).alias("mn"),
        ch("toLastDayOfMonth", F.col("o_orderdate").cast("date")).alias("ldm"),
        ch("toYYYYMMDDhhmmss", F.col("o_orderdate")).alias("ymd"),
        # round-trip: build the dotted quad, parse it back to the number
        ch("INET_ATON", ch("INET_NTOA", ip)).alias("ipnum"),
        ch("arrayProduct", arr).alias("arr_prod"),
        arr_csv(ch("arrayRotateLeft", rot_in, F.lit(1))).alias("rot"),
    ).orderBy("o_orderkey")


@register(
    "func_map_extras_family",
    oracle="""
    SELECT event_id,
           COALESCE(array_to_string(list_sort([event_type, 'k']), ','), '') AS sorted_keys,
           event_type LIKE 'c%' AS has_c_key,
           COALESCE(array_to_string(list_sort(list_filter([event_type, 'k'], x -> x LIKE '%e%')), ','), '') AS e_keys,
           COALESCE(array_to_string(list_transform(range(1, CAST(event_id % 4 AS BIGINT) + 3),
               i -> CASE WHEN i = 1 THEN CAST(event_id % 100 AS BIGINT)
                         WHEN i = CAST(event_id % 4 AS BIGINT) + 2
                              THEN CAST(event_id % 100 AS BIGINT) * 2
                         ELSE 0 END), ','), '') AS dense_vals
    FROM events
    ORDER BY event_id
    """,
    tags=("functions", "map"),
)
def func_map_extras_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-extras family (reference FunctionsMapMiscellaneous.cpp:
    mapSort, mapContainsKeyLike, mapExtractKeyLike, mapPopulateSeries)
    — oracle replicates the *values* with list expressions, proving the
    map semantics without requiring DuckDB map support."""
    ev = t(spark, sf_dir, "events")
    k = (F.col("event_id") % 100).cast("bigint")
    m = F.create_map(F.col("event_type"), k, F.lit("k"), k * 2)
    hi = (F.col("event_id") % 4).cast("bigint") + 2
    m2 = F.map_from_arrays(F.array(F.lit(1).cast("bigint"), hi), F.array(k, k * 2))
    dense = F.transform(
        F.sequence(F.lit(1).cast("bigint"), hi),
        lambda i: F.coalesce(F.element_at(m2, i), F.lit(0).cast("bigint")),
    )
    return ev.select(
        "event_id",
        arr_csv(F.map_keys(ch("mapSort", m))).alias("sorted_keys"),
        ch("mapContainsKeyLike", m, "c%").alias("has_c_key"),
        arr_csv(F.array_sort(F.map_keys(ch("mapExtractKeyLike", m, "%e%")))).alias("e_keys"),
        arr_csv(dense).alias("dense_vals"),
    ).orderBy("event_id")
