"""Registry entries for -State/-Merge two-phase aggregation, dictGet,
and table functions. Imported by queries.py for its side effects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_25_5_3_75_stable_spark.functions import states as S
from clickhouse_25_5_3_75_stable_spark.functions.numeric import dsum_sql
from clickhouse_25_5_3_75_stable_spark.operators.dictionary import Dictionary
from clickhouse_25_5_3_75_stable_spark.queries import register, t
from clickhouse_25_5_3_75_stable_spark.sources.table_functions import numbers


@register(
    "state_merge_two_phase",
    oracle=f"""
    SELECT o_orderpriority,
           {dsum_sql('o_totalprice', 'total')},
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS STRING) AS DOUBLE)
             / CAST(COUNT(o_totalprice) AS DOUBLE) AS avg_price,
           COUNT(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("state_merge",),
)
def state_merge_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """-State/-Merge round trip (SURVEY §7 hard part 3): phase 1 builds
    persistable partial states at a FINER key ((priority, status)),
    phase 2 merges them up to priority — algebraically identical to a
    direct aggregation, which is exactly what the oracle computes.
    This is the incremental-pipeline contract: daily states + cheap
    merge instead of re-scanning history."""
    orders = t(spark, sf_dir, "orders")
    states = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        S.sum_state("o_totalprice").alias("sum_st"),
        S.avg_state("o_totalprice").alias("avg_st"),
        S.count_state().alias("cnt_st"),
        S.min_state("o_totalprice").alias("min_st"),
        S.max_state("o_totalprice").alias("max_st"),
    )
    return (
        states.groupBy("o_orderpriority")
        .agg(
            S.sum_merge("sum_st").alias("total"),
            S.avg_merge("avg_st").alias("avg_price"),
            S.count_merge("cnt_st").alias("n"),
            S.min_merge("min_st").alias("lo"),
            S.max_merge("max_st").alias("hi"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "state_quantile_merge",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.95) AS p95_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("state_merge", "quantile"),
)
def state_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quantileExactState per (flag, status) → merge to flag → exact
    interpolated percentile — matches a direct quantile_cont."""
    li = t(spark, sf_dir, "lineitem")
    states = li.groupBy("l_returnflag", "l_linestatus").agg(
        S.quantile_exact_state("l_quantity").alias("q_st")
    )
    return (
        states.groupBy("l_returnflag")
        .agg(
            S.quantile_exact_merge("q_st", 0.5).alias("median_qty"),
            S.quantile_exact_merge("q_st", 0.95).alias("p95_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "state_uniq_hll_merge",
    oracle=None,  # sketch estimates are engine-specific; accuracy is
    # asserted against exact counts in tests/test_states.py
    tags=("state_merge", "uniq", "hll"),
    driver=False,  # HLL estimate values cannot match any other engine
)
def state_uniq_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """uniqState/uniqMerge via Datasketches HLL: binary sketch states
    built per (priority, status), unioned up to priority."""
    orders = t(spark, sf_dir, "orders")
    states = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        S.uniq_state("o_custkey").alias("u_st")
    )
    return (
        states.groupBy("o_orderpriority")
        .agg(S.uniq_merge("u_st").alias("uniq_cust_est"))
        .orderBy("o_orderpriority")
    )


@register(
    "dict_get_nation_region",
    oracle="""
    SELECT n.n_name AS nation, r.r_name AS region, COUNT(*) AS n_suppliers
    FROM supplier s
    LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    ORDER BY nation
    """,
    tags=("dictionary",),
)
def dict_get_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dictGet chain (supplier → nation dict → region dict), each a
    broadcast join (/root/reference/src/Functions/
    FunctionsExternalDictionaries.h → DirectJoin)."""
    supp = t(spark, sf_dir, "supplier")
    nation_dict = Dictionary(t(spark, sf_dir, "nation"), key="n_nationkey")
    region_dict = Dictionary(t(spark, sf_dir, "region"), key="r_regionkey")
    with_nation = nation_dict.dict_get(
        supp, F.col("s_nationkey"), {"nation": "n_name", "n_regionkey": "n_regionkey"}
    )
    with_region = region_dict.dict_get(
        with_nation, F.col("n_regionkey"), {"region": "r_name"}
    )
    return (
        with_region.groupBy("nation", "region")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
        .orderBy("nation")
    )


@register(
    "table_function_numbers",
    oracle="""
    SELECT number % 7 AS bucket,
           COUNT(*) AS n,
           -- CAST: DuckDB SUM(BIGINT) widens to HUGEINT (driver hash)
           CAST(SUM(number) AS BIGINT) AS total,
           CAST(SUM(number * number) AS BIGINT) AS sum_sq
    FROM (SELECT unnest(range(0, 100000)) AS number)
    GROUP BY 1
    ORDER BY bucket
    """,
    tags=("table_function", "numbers"),
)
def table_function_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """numbers(100000) generator (reference numbers table function,
    src/TableFunctions/registerTableFunctions.cpp:12) — spark.range
    splits the generation across the cluster."""
    n = numbers(spark, 100_000)
    return (
        n.groupBy((F.col("number") % 7).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("number").alias("total"),
            F.sum(F.col("number") * F.col("number")).alias("sum_sq"),
        )
        .orderBy("bucket")
    )
