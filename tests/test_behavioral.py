"""Hand-built event streams for the behavioral aggregates — covers the
semantics the SQL oracle can't (sequenceCount) and known-tricky funnel
cases."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from clickhouse_25_5_3_75_stable_spark.operators.funnel import (
    sequence_count,
    sequence_match,
    window_funnel,
)


def _events(spark, rows):
    # rows: (user, minutes_offset, type)
    data = [
        (u, datetime(2024, 1, 1, 0, 0).replace(minute=0), m, et) for (u, m, et) in rows
    ]
    df = spark.createDataFrame(data, ["user_id", "base", "minutes", "event_type"])
    return df.select(
        "user_id",
        (F.unix_timestamp("base") + F.col("minutes") * 60).cast("timestamp").alias("ts"),
        F.monotonically_increasing_id().alias("event_id"),
        "event_type",
    )


def _funnel_levels(spark, rows, window="1 hour"):
    ev = _events(spark, rows)
    et = F.col("event_type")
    out = ev.groupBy("user_id").agg(
        window_funnel(
            F.col("ts"), F.col("event_id"), [et == "a", et == "b", et == "c"], window=window
        ).alias("lvl")
    )
    return {r["user_id"]: r["lvl"] for r in out.collect()}


def test_funnel_basic_chain(spark):
    got = _funnel_levels(
        spark,
        [(1, 0, "a"), (1, 10, "b"), (1, 20, "c"), (2, 0, "a"), (2, 10, "b"), (3, 0, "c")],
    )
    assert got == {1: 3, 2: 2, 3: 0}


def test_funnel_window_cutoff(spark):
    # c lands 70 min after the chain start -> outside the 1h window
    got = _funnel_levels(spark, [(1, 0, "a"), (1, 30, "b"), (1, 70, "c")])
    assert got == {1: 2}


def test_funnel_restart_uses_latest_chain_start(spark):
    """A later 'a' must be able to start a fresh chain even though an
    earlier stale 'a' exists — the case a min-start greedy gets wrong."""
    got = _funnel_levels(
        spark,
        [(1, 0, "a"), (1, 30, "b"), (1, 120, "a"), (1, 150, "b"), (1, 170, "c")],
    )
    assert got == {1: 3}


def test_funnel_out_of_order_events_dont_chain(spark):
    # b precedes a -> only level 1
    got = _funnel_levels(spark, [(1, 10, "b"), (1, 20, "a")])
    assert got == {1: 1}


def _seq(spark, rows, conds, agg):
    ev = _events(spark, rows)
    et = F.col("event_type")
    out = ev.groupBy("user_id").agg(
        agg(F.col("ts"), F.col("event_id"), [et == c for c in conds]).alias("v")
    )
    return {r["user_id"]: r["v"] for r in out.collect()}


def test_sequence_match_in_order_with_noise(spark):
    got = _seq(
        spark,
        [(1, 0, "a"), (1, 5, "x"), (1, 9, "b"), (2, 0, "b"), (2, 5, "a")],
        ["a", "b"],
        sequence_match,
    )
    assert got == {1: True, 2: False}


def test_sequence_count_non_overlapping(spark):
    # a b a b a  -> two complete (a,b) matches, trailing a unmatched
    got = _seq(
        spark,
        [(1, 0, "a"), (1, 1, "b"), (1, 2, "a"), (1, 3, "b"), (1, 4, "a")],
        ["a", "b"],
        sequence_count,
    )
    assert got == {1: 2}


def test_sequence_count_no_match(spark):
    got = _seq(spark, [(1, 0, "b"), (1, 1, "b")], ["a", "b"], sequence_count)
    assert got == {1: 0}
