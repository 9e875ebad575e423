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


def test_window_funnel_strict_modes(spark):
    """Reference mode semantics (AggregateFunctionWindowFunnel.h):
    strict_order kills live chains on a non-continuing event
    (docs example A->B->D->C stops at 2), strict_dedup stops the scan
    at a repeated condition, strict_increase refuses equal-timestamp
    extension."""
    from clickhouse_25_5_3_75_stable_spark.operators.funnel import window_funnel

    def run(events, modes=()):
        # events: list of (t_us, name); funnel A -> B -> C
        df = spark.createDataFrame(
            [(1, t, i, n) for i, (t, n) in enumerate(events)],
            "k int, tu long, id long, name string",
        ).withColumn("ts", F.timestamp_micros(F.col("tu")))
        conds = [F.col("name") == c for c in ("A", "B", "C")]
        out = df.groupBy("k").agg(
            window_funnel(
                F.col("ts"), F.col("id"), conds, window="1 hour", modes=modes
            ).alias("lvl")
        )
        return out.collect()[0].lvl

    abdc = [(1, "A"), (2, "B"), (3, "D"), (4, "C")]
    assert run(abdc) == 3                      # default: D ignored
    assert run(abdc, ("strict_order",)) == 2   # D kills the A->B chain

    abbc = [(1, "A"), (2, "B"), (3, "B"), (4, "C")]
    assert run(abbc) == 3
    assert run(abbc, ("strict_dedup",)) == 2   # repeated B stops at level 2

    same_t = [(1, "A"), (1, "B"), (2, "C")]
    assert run(same_t) == 3                    # default: (tu,id) order extends
    assert run(same_t, ("strict_increase",)) == 1  # B at equal t can't extend

    inc_ok = [(1, "A"), (2, "B"), (3, "C")]
    assert run(inc_ok, ("strict_increase",)) == 3
    assert run(inc_ok, ("strict_order", "strict_dedup", "strict_increase")) == 3


def test_sequence_match_time_constraints(spark):
    from clickhouse_25_5_3_75_stable_spark.operators.funnel import (
        parse_sequence_pattern,
        sequence_match_pattern,
    )
    import pytest

    assert parse_sequence_pattern("(?1).*(?2)") == [(1, None, 0), (2, None, 0)]
    assert parse_sequence_pattern("(?1)(?t<=500)(?2)") == [
        (1, None, 0),
        (2, "<=", 500),
    ]
    with pytest.raises(ValueError):
        parse_sequence_pattern("(?1)(?2)")  # strict adjacency unsupported
    with pytest.raises(ValueError):
        parse_sequence_pattern("(?1)(?t==5)(?2)")

    def run(events, pattern):
        # events: (t_ms, name); conds A, B
        df = spark.createDataFrame(
            [(1, t * 1000, i, n) for i, (t, n) in enumerate(events)],
            "k int, tu long, id long, name string",
        ).withColumn("ts", F.timestamp_micros(F.col("tu")))
        conds = [F.col("name") == c for c in ("A", "B")]
        return (
            df.groupBy("k")
            .agg(
                sequence_match_pattern(
                    F.col("ts"), F.col("id"), conds, pattern
                ).alias("m")
            )
            .collect()[0]
            .m
        )

    # A at 0ms and 400ms, B at 600ms
    evs = [(0, "A"), (400, "A"), (600, "B")]
    assert run(evs, "(?1).*(?2)") is True
    assert run(evs, "(?1)(?t<=500)(?2)") is True    # uses the 400ms A
    assert run(evs, "(?1)(?t>=600)(?2)") is True    # uses the 0ms A
    assert run(evs, "(?1)(?t>600)(?2)") is False    # max gap is exactly 600
    assert run(evs, "(?1)(?t<200)(?2)") is False    # min gap is exactly 200
    assert run(evs, "(?1)(?t<=200)(?2)") is True
