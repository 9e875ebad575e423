"""-State/-Merge round-trip tests: persistence to parquet and sketch
accuracy (the parts the SQL oracle can't check)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from clickhouse_25_5_3_75_stable_spark.functions import states as S
from tests.conftest import SF_SMOKE


def test_states_survive_parquet_roundtrip(spark):
    """The whole point of -State: write partial states, read them back
    in a later job, merge — totals must equal a direct aggregation."""
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    states = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        S.sum_state("o_totalprice").alias("sum_st"),
        S.avg_state("o_totalprice").alias("avg_st"),
        S.count_state().alias("cnt_st"),
    )
    d = tempfile.mkdtemp(prefix="states_")
    try:
        states.write.mode("overwrite").parquet(d)
        reloaded = spark.read.parquet(d)
        merged = (
            reloaded.groupBy("o_orderpriority")
            .agg(
                S.sum_merge("sum_st").alias("total"),
                S.avg_merge("avg_st").alias("avg_price"),
                S.count_merge("cnt_st").alias("n"),
            )
            .orderBy("o_orderpriority")
        )
        direct = (
            orders.groupBy("o_orderpriority")
            .agg(
                F.sum(F.col("o_totalprice").cast("decimal(25,6)")).cast("double").alias("total"),
                (
                    F.sum(F.col("o_totalprice").cast("decimal(25,6)")).cast("double")
                    / F.count("o_totalprice").cast("double")
                ).alias("avg_price"),
                F.count(F.lit(1)).alias("n"),
            )
            .orderBy("o_orderpriority")
        )
        assert [tuple(r) for r in merged.collect()] == [tuple(r) for r in direct.collect()]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_hll_uniq_estimate_close_to_exact(spark):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    states = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        S.uniq_state("o_custkey").alias("u_st")
    )
    est = {
        r["o_orderpriority"]: r["e"]
        for r in states.groupBy("o_orderpriority").agg(S.uniq_merge("u_st").alias("e")).collect()
    }
    exact = {
        r["o_orderpriority"]: r["e"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("e"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for k in exact:
        assert abs(est[k] - exact[k]) <= max(2, 0.05 * exact[k]), (k, est[k], exact[k])


def test_quantile_state_merge_equals_direct(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    states = li.groupBy("l_returnflag", "l_linestatus").agg(
        S.quantile_exact_state("l_quantity").alias("q_st")
    )
    merged = {
        r["l_returnflag"]: r["m"]
        for r in states.groupBy("l_returnflag")
        .agg(S.quantile_exact_merge("q_st", 0.5).alias("m"))
        .collect()
    }
    direct = {
        r["l_returnflag"]: r["m"]
        for r in li.groupBy("l_returnflag")
        .agg(F.percentile("l_quantity", F.lit(0.5)).alias("m"))
        .collect()
    }
    assert merged == direct
