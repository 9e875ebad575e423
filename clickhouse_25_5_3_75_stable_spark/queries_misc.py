"""Registry entries: forward ASOF join, WITH FILL + INTERPOLATE,
second array-function family (cumulative/positional ops), map/struct
family. Imported by queries.py for its side effects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_25_5_3_75_stable_spark.operators.fill import with_fill_dates
from clickhouse_25_5_3_75_stable_spark.operators.joins import asof_join
from clickhouse_25_5_3_75_stable_spark.queries import register, t


@register(
    "join_asof_forward_next_purchase",
    oracle="""
    SELECT c.event_id,
           (SELECT min(CAST(p.ts AS TIMESTAMP)) FROM events p
             WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
               AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)) AS next_purchase_ts
    FROM events c WHERE c.event_type = 'click'
    ORDER BY c.event_id
    """,
    tags=("join", "asof", "forward"),
)
def join_asof_forward_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward ASOF: each click's next purchase at-or-after it per user
    (reference ASOF >= inequality, src/Core/Joins.h:78)."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("ts").alias("purchase_ts")
    )
    joined = asof_join(
        clicks,
        purchases,
        by=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_values=["purchase_ts"],
        strict=False,
        how="left",
        direction="forward",
    )
    return joined.select(
        "event_id", F.col("purchase_ts").alias("next_purchase_ts")
    ).orderBy("event_id")


@register(
    "with_fill_interpolate_daily_max",
    oracle="""
    WITH days AS (
        SELECT CAST(d AS DATE) AS day
        FROM generate_series(DATE '1996-01-01', DATE '1996-03-31', INTERVAL 1 DAY) AS s(d)
    ), daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               COUNT(*) AS n_orders, max(o_totalprice) AS max_price
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY 1
    )
    SELECT day, COALESCE(n_orders, 0) AS n_orders,
           last_value(max_price IGNORE NULLS) OVER (
               ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS max_price_filled
    FROM days LEFT JOIN daily USING (day)
    ORDER BY day
    """,
    tags=("with_fill", "interpolate"),
)
def with_fill_interpolate_daily_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH FILL + INTERPOLATE (reference FillingStep.h:9-10 +
    ParserSelectQuery.cpp:311): dense daily axis, zero-fill counts,
    forward-fill the running max price across gap days."""
    orders = t(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_orders"), F.max("o_totalprice").alias("max_price"))
    )
    filled = with_fill_dates(
        spark,
        daily,
        "day",
        "1996-01-01",
        "1996-03-31",
        fill_zero=["n_orders"],
        fill_forward=["max_price"],
    )
    return filled.select(
        "day", "n_orders", F.col("max_price").alias("max_price_filled")
    ).orderBy("day")


@register(
    "func_array_positional_family",
    oracle="""
    WITH t AS (
        SELECT user_id,
               list_transform(list_sort(list(CAST(value AS DECIMAL(18,4)))),
                              x -> CAST(x AS DOUBLE)) AS vals
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           len(vals) AS n,
           vals[1] AS first_v,
           vals[len(vals)] AS last_v,
           COALESCE(array_to_string(list_transform(list_slice(vals, 1, 5),
               x -> CAST(x AS STRING)), ','), '') AS first5,
           CAST(CAST(list_aggregate(list_transform(vals, x -> CAST(x AS DECIMAL(18,4))),
                'sum') AS STRING) AS DOUBLE) AS total,
           COALESCE(array_to_string(list_transform(
               list_transform(range(1, least(len(vals), 5) + 1),
                   i -> CAST(list_aggregate(list_transform(list_slice(vals, 1, i),
                        x -> CAST(x AS DECIMAL(18,4))), 'sum') AS DECIMAL(25,4))),
               x -> CAST(x AS STRING)), ','), '') AS cumsum5,
           COALESCE(array_to_string(list_transform(
               list_transform(range(2, least(len(vals), 5) + 1),
                   i -> CAST(CAST(vals[i] AS DECIMAL(18,4))
                        - CAST(vals[i-1] AS DECIMAL(18,4)) AS DECIMAL(25,4))),
               x -> CAST(x AS STRING)), ','), '') AS diff4
    FROM t
    ORDER BY user_id
    """,
    tags=("functions", "array", "cumulative"),
)
def func_array_positional_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array positional/cumulative family (reference src/Functions/array/:
    arrayCumSum, arrayDifference, arraySlice, arrayElement) — decimal
    strings keep the per-element arithmetic engine-portable."""
    ev = t(spark, sf_dir, "events")
    base = ev.groupBy("user_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.col("value").cast("decimal(18,4)"))),
            lambda x: x.cast("double"),
        ).alias("vals")
    )
    vals = F.col("vals")
    dec = lambda c: c.cast("decimal(18,4)")  # noqa: E731
    cum_idx = F.sequence(F.lit(1), F.least(F.size(vals), F.lit(5)))
    diff_idx = F.sequence(F.lit(2), F.least(F.size(vals), F.lit(5)))
    return base.select(
        "user_id",
        F.size(vals).cast("bigint").alias("n"),
        F.element_at(vals, 1).alias("first_v"),
        F.element_at(vals, -1).alias("last_v"),
        F.concat_ws(",", F.transform(F.slice(vals, 1, 5), lambda x: x.cast("string"))).alias(
            "first5"
        ),
        F.aggregate(
            vals,
            F.lit(0).cast("decimal(30,4)"),
            lambda acc, x: (acc + dec(x)).cast("decimal(30,4)"),
        ).cast("double").alias("total"),
        F.concat_ws(
            ",",
            F.transform(
                cum_idx,
                lambda i: F.aggregate(
                    F.slice(vals, 1, i),
                    F.lit(0).cast("decimal(25,4)"),
                    lambda acc, x: (acc + dec(x)).cast("decimal(25,4)"),
                ).cast("string"),
            ),
        ).alias("cumsum5"),
        F.concat_ws(
            ",",
            F.transform(
                diff_idx,
                lambda i: (dec(F.element_at(vals, i)) - dec(F.element_at(vals, i - 1)))
                .cast("decimal(25,4)")
                .cast("string"),
            ),
        ).alias("diff4"),
    ).orderBy("user_id")


@register(
    "func_map_struct_family",
    oracle="""
    SELECT event_id,
           array_to_string(map_keys(m), ',') AS ks,
           array_to_string(CAST(map_values(m) AS BIGINT[]), ',') AS vs,
           m['k'][1]::BIGINT AS k_val,
           list_contains(map_keys(m), 'k') AS has_k,
           CAST(cardinality(m) AS BIGINT) AS n_entries,
           s.a AS struct_a, s.b AS struct_b
    FROM (
        SELECT event_id,
               MAP(['k', 'twice'],
                   [CAST(json_extract_string(props, '$.k') AS BIGINT),
                    CAST(json_extract_string(props, '$.k') AS BIGINT) * 2]) AS m,
               {'a': user_id, 'b': event_type} AS s
        FROM events)
    ORDER BY event_id
    """,
    tags=("functions", "map", "tuple"),
)
def func_map_struct_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map + Tuple(struct) family (reference src/Functions/map.cpp,
    tuple.cpp): construction, key/value extraction, membership."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    m = F.create_map(F.lit("k"), k, F.lit("twice"), k * 2)
    s = F.struct(F.col("user_id").alias("a"), F.col("event_type").alias("b"))
    from clickhouse_25_5_3_75_stable_spark.queries import arr_csv

    return ev.select(
        "event_id",
        arr_csv(F.map_keys(m)).alias("ks"),
        arr_csv(F.map_values(m)).alias("vs"),
        F.element_at(m, "k").alias("k_val"),
        F.array_contains(F.map_keys(m), "k").alias("has_k"),
        F.size(m).cast("bigint").alias("n_entries"),
        s["a"].alias("struct_a"),
        s["b"].alias("struct_b"),
    ).orderBy("event_id")


@register(
    "type_uint64_beyond_int64",
    # Decimal cells rendered as VARCHAR on BOTH engines: DECIMAL
    # arithmetic widens to different (p,s) per engine/version and the
    # driver's row hash is dtype-sensitive (round-3 red) — scale-0
    # decimals print identically as plain digit strings.
    oracle="""
    SELECT o_orderpriority,
           CAST(MAX(CAST(o_orderkey AS DECIMAL(20,0)) + 9223372036854775807)
                AS VARCHAR) AS max_u64,
           CAST(MIN(CAST(o_orderkey AS DECIMAL(20,0)) + 9223372036854775807)
                AS VARCHAR) AS min_u64,
           CAST(CAST(SUM(CAST(o_orderkey AS DECIMAL(20,0)) + 9223372036854775807)
                AS DECIMAL(38,0)) AS VARCHAR) AS sum_u64,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("types", "uint64"),
)
def type_uint64_beyond_int64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UInt64 correctness mode (SURVEY §1.2, functions/typemap.py):
    values pushed past Int64 max ride DECIMAL(20,0) so aggregation
    cannot wrap negative — every output here exceeds 2^63-1, which a
    bigint mapping would corrupt. Reference domain:
    src/DataTypes/DataTypesNumber.h UInt64."""
    from clickhouse_25_5_3_75_stable_spark.functions.typemap import uint64_col

    od = t(spark, sf_dir, "orders")
    u = uint64_col("o_orderkey") + F.lit(9223372036854775807).cast("decimal(20,0)")
    return (
        od.groupBy("o_orderpriority")
        .agg(
            F.max(u).cast("string").alias("max_u64"),
            F.min(u).cast("string").alias("min_u64"),
            F.sum(u).cast("decimal(38,0)").cast("string").alias("sum_u64"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "orderby_collation_ci",
    # lower(x) pre-key reproduces UNICODE_CI order for ASCII data; the
    # raw value breaks ties identically in both engines
    oracle="""
    WITH mixed AS (
        SELECT CASE WHEN n_nationkey % 2 = 0 THEN upper(n_name)
                    ELSE lower(n_name) END AS name
        FROM nation
    )
    SELECT name,
           CAST(row_number() OVER (ORDER BY lower(name), name) AS INTEGER) AS ci_rank
    FROM mixed
    ORDER BY ci_rank
    """,
    tags=("orderby", "collation"),
)
def orderby_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ... COLLATE (reference src/Columns/Collator.h) via
    Spark 4 native UNICODE_CI collation — case-insensitive rank over
    mixed-case nation names, JVM-side, no UDF. 25 rows: the window is
    demo-scale; a full sort would be orderBy(collate(...)), which
    range-partitions like any global sort."""
    from pyspark.sql.window import Window as W2

    from clickhouse_25_5_3_75_stable_spark.operators.collation import collate

    na = t(spark, sf_dir, "nation")
    mixed = na.select(
        F.when(F.col("n_nationkey") % 2 == 0, F.upper("n_name"))
        .otherwise(F.lower("n_name"))
        .alias("name")
    )
    w = W2.orderBy(collate("name", "ci"), F.col("name"))
    return mixed.select(
        "name", F.row_number().over(w).alias("ci_rank")
    ).orderBy("ci_rank")


@register(
    "type_int128_decimal38",
    # Int128-domain arithmetic rides DECIMAL(38,0): products near 10^28
    # are far beyond both Int64 and UInt64
    oracle="""
    SELECT o_orderpriority,
           CAST(MAX(CAST(o_orderkey AS DECIMAL(38,0)) * CAST(o_custkey AS DECIMAL(38,0))
               * 1000000000000 + 170141183460469231731687303715884105) AS VARCHAR)
               AS max_i128,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("types", "int128"),
)
def type_int128_decimal38(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int128/Int256 mapping (SURVEY §1.2, functions/typemap.py →
    DECIMAL(38,0)): arithmetic on values around 10^35 — beyond any
    64-bit domain — stays exact through the aggregate.

    The aggregate is transported as a digit string (the pattern proven by
    type_int256_string_transport): DECIMAL×DECIMAL result typing at
    overflow precision is DuckDB-version-dependent, and the driver's row
    hash is dtype-sensitive — VARCHAR on both engines removes the hazard
    (round-5 official red, r6 fix)."""
    od = t(spark, sf_dir, "orders")
    v = (
        F.col("o_orderkey").cast("decimal(38,0)")
        * F.col("o_custkey").cast("decimal(38,0)")
        * F.lit(1000000000000).cast("decimal(38,0)")
        + F.lit("170141183460469231731687303715884105").cast("decimal(38,0)")
    )
    return (
        od.groupBy("o_orderpriority")
        .agg(
            F.max(v).cast("string").alias("max_i128"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "with_fill_linear_interpolate",
    # linear interpolation between surrounding daily averages; rounded
    # at 6dp (division order identical in both engines, but keep the
    # repo convention for window-vs-window float math)
    oracle="""
    WITH days AS (
        SELECT CAST(d AS DATE) AS day
        FROM generate_series(DATE '1996-01-01', DATE '1996-03-31', INTERVAL 1 DAY) AS s(d)
    ), daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(CAST(avg(o_totalprice) AS DECIMAL(20,6)) AS DOUBLE) AS avg_price
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND o_orderkey % 5 = 0
        GROUP BY 1
    ), joined AS (
        SELECT days.day, daily.avg_price,
               epoch(CAST(days.day AS TIMESTAMP)) AS x
        FROM days LEFT JOIN daily USING (day)
    ), ctx AS (
        SELECT day, avg_price, x,
           last_value(avg_price IGNORE NULLS) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
           last_value(CASE WHEN avg_price IS NOT NULL THEN x END IGNORE NULLS)
               OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS px,
           first_value(avg_price IGNORE NULLS) OVER (ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
           first_value(CASE WHEN avg_price IS NOT NULL THEN x END IGNORE NULLS)
               OVER (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nx
        FROM joined
    )
    SELECT day,
           CAST(CAST(
             CASE WHEN avg_price IS NOT NULL THEN avg_price
                  WHEN pv IS NOT NULL AND nv IS NOT NULL AND nx <> px
                       THEN pv + (nv - pv) * (x - px) / (nx - px)
                  ELSE pv END
           AS DECIMAL(20,6)) AS DOUBLE) AS avg_price_interp
    FROM ctx
    ORDER BY day
    """,
    tags=("with_fill", "interpolate", "linear"),
)
def with_fill_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH FILL + linear INTERPOLATE (reference FillingStep.h:9-10):
    sparse daily averages densified to every day with straight-line
    interpolation between known points."""
    from clickhouse_25_5_3_75_stable_spark.operators.fill import (
        fill_linear,
        with_fill_dates,
    )

    orders = t(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
            & (F.col("o_orderkey") % 5 == 0)
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.avg("o_totalprice").cast("decimal(20,6)").cast("double").alias("avg_price"))
    )
    dense = with_fill_dates(spark, daily, "day", "1996-01-01", "1996-03-31")
    out = fill_linear(dense, "day", ["avg_price"])
    return out.select(
        "day",
        F.col("avg_price").cast("decimal(20,6)").cast("double").alias("avg_price_interp"),
    ).orderBy("day")
