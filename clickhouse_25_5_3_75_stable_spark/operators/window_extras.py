"""Non-standard window functions from the reference's WindowTransform
(/root/reference/src/Processors/Transforms/WindowTransform.cpp):
exponentialTimeDecayed{Sum,Avg} (:1617,1874), nonNegativeDerivative
(:2570), runningDifference / neighbor (order-dependent scalar fns from
src/Functions/, re-expressed as window ops per SURVEY §2.8), and a
GROUPS-frame rewrite (Spark frames support ROWS/RANGE only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window, WindowSpec


def running_difference(col: Column, order: list[Column], partition: list[Column] | None = None) -> Column:
    """runningDifference(x): x - lag(x), 0 for the first row (reference
    keeps first-row value 0, not NULL)."""
    w = Window.partitionBy(*(partition or [])).orderBy(*order)
    return F.coalesce(col - F.lag(col).over(w), F.lit(0.0))


def neighbor(col: Column, offset: int, order: list[Column], partition: list[Column] | None = None) -> Column:
    """neighbor(x, n): value n rows away in the given order (NULL
    outside the partition — reference returns default/0; callers add
    coalesce when they need that)."""
    w = Window.partitionBy(*(partition or [])).orderBy(*order)
    return F.lead(col, offset).over(w) if offset >= 0 else F.lag(col, -offset).over(w)


def non_negative_derivative(
    value: Column, ts: Column, order: list[Column], partition: list[Column] | None = None
) -> Column:
    """nonNegativeDerivative: max(0, Δvalue/Δseconds) per step."""
    w = Window.partitionBy(*(partition or [])).orderBy(*order)
    dv = value - F.lag(value).over(w)
    tsc = ts.cast("timestamp")  # NTZ-safe under UTC session tz
    dt = (F.unix_micros(tsc) - F.unix_micros(F.lag(tsc).over(w))).cast("double") / 1e6
    return F.when(dt > 0, F.greatest(dv / dt, F.lit(0.0))).otherwise(F.lit(None))


def groups_frame_agg(
    df: DataFrame,
    agg_fn,
    value: Column,
    partition: list[str],
    order: list[str],
    preceding: int,
    following: int = 0,
    out: str = "groups_agg",
) -> DataFrame:
    """GROUPS BETWEEN n PRECEDING AND m FOLLOWING rewrite: Spark lacks
    the GROUPS frame mode, but dense_rank over the ORDER BY key turns
    peer groups into consecutive integers, so a RANGE frame over the
    rank is exactly a GROUPS frame (SURVEY §2.5)."""
    wr = Window.partitionBy(*partition).orderBy(*order)
    ranked = df.withColumn("__grp", F.dense_rank().over(wr))
    wg = (
        Window.partitionBy(*partition)
        .orderBy("__grp")
        .rangeBetween(-preceding, following)
    )
    return ranked.withColumn(out, agg_fn(value).over(wg)).drop("__grp")


def exp_time_decayed_sum(
    df: DataFrame,
    value: str,
    ts: str,
    decay_seconds: float,
    partition: list[str],
    ev_id: str,
    out: str = "decayed_sum",
) -> DataFrame:
    """exponentialTimeDecayedSum(L): at each row i (time order),
    Σ_{j≤i} v_j · exp(−(t_i − t_j)/L).

    Production path: O(n) recurrence acc ← acc·exp(−Δt/L) + v folded
    over the collected per-key stream (numerically stable — only decays
    ever multiply). Emits (id, decayed_sum) pairs re-exploded to rows.

    One shuffle (groupBy key); state per key is its event array, same
    memory contract as the funnel operators.
    """
    item = F.struct(
        F.unix_micros(F.col(ts).cast("timestamp")).alias("tu"),
        F.col(ev_id).cast("bigint").alias("id"),
        F.col(value).cast("double").alias("v"),
    )
    stream = F.array_sort(F.collect_list(item))
    init = F.named_struct(
        F.lit("prev_tu"), F.lit(None).cast("bigint"),
        F.lit("acc"), F.lit(0.0),
        F.lit("out"), F.expr("CAST(array() AS array<struct<id: bigint, s: double>>)"),
    )

    def step(acc: Column, ev: Column) -> Column:
        decay = F.when(
            acc["prev_tu"].isNull(), F.lit(1.0)
        ).otherwise(F.exp(-(ev["tu"] - acc["prev_tu"]).cast("double") / F.lit(decay_seconds * 1e6)))
        new_acc = acc["acc"] * decay + ev["v"]
        entry = F.struct(ev["id"].alias("id"), new_acc.alias("s"))
        return F.named_struct(
            F.lit("prev_tu"), ev["tu"],
            F.lit("acc"), new_acc,
            F.lit("out"), F.concat(acc["out"], F.array(entry)),
        )

    per_key = df.groupBy(*partition).agg(
        F.aggregate(stream, init, step)["out"].alias("__pairs")
    )
    exploded = per_key.select(*partition, F.explode("__pairs").alias("p"))
    return exploded.select(
        *partition, F.col("p.id").alias(ev_id), F.col("p.s").alias(out)
    )


def exp_time_decayed_family(
    df: DataFrame,
    value: str,
    ts: str,
    decay_seconds: float,
    partition: list[str],
    ev_id: str,
) -> DataFrame:
    """exponentialTimeDecayed{Sum,Count,Max,Avg} in ONE per-key fold
    (reference WindowTransform.cpp:1617,1714,1789,1874):

        sum_i   = Σ_{j≤i} v_j·exp(−Δ/L)      (acc·decay + v)
        count_i = Σ_{j≤i} exp(−Δ/L)          (acc·decay + 1)
        max_i   = max_{j≤i} v_j·exp(−Δ/L)    (max(acc·decay, v))
        avg_i   = sum_i / count_i

    Same O(n) recurrence / one-shuffle contract as
    :func:`exp_time_decayed_sum`."""
    item = F.struct(
        F.unix_micros(F.col(ts).cast("timestamp")).alias("tu"),
        F.col(ev_id).cast("bigint").alias("id"),
        F.col(value).cast("double").alias("v"),
    )
    stream = F.array_sort(F.collect_list(item))
    empty_out = F.expr(
        "CAST(array() AS array<struct<id: bigint, s: double, c: double, m: double>>)"
    )
    init = F.named_struct(
        F.lit("prev_tu"), F.lit(None).cast("bigint"),
        F.lit("s"), F.lit(0.0),
        F.lit("c"), F.lit(0.0),
        # -inf, not 0: an all-negative stream must not let the empty
        # seed win the max (−inf·decay stays −inf; first step picks v)
        F.lit("m"), F.lit(float("-inf")),
        F.lit("out"), empty_out,
    )

    def step(acc: Column, ev: Column) -> Column:
        decay = F.when(acc["prev_tu"].isNull(), F.lit(1.0)).otherwise(
            F.exp(-(ev["tu"] - acc["prev_tu"]).cast("double") / F.lit(decay_seconds * 1e6))
        )
        s = acc["s"] * decay + ev["v"]
        c = acc["c"] * decay + F.lit(1.0)
        m = F.greatest(acc["m"] * decay, ev["v"])
        entry = F.struct(ev["id"].alias("id"), s.alias("s"), c.alias("c"), m.alias("m"))
        return F.named_struct(
            F.lit("prev_tu"), ev["tu"],
            F.lit("s"), s,
            F.lit("c"), c,
            F.lit("m"), m,
            F.lit("out"), F.concat(acc["out"], F.array(entry)),
        )

    per_key = df.groupBy(*partition).agg(F.aggregate(stream, init, step)["out"].alias("__o"))
    ex = per_key.select(*partition, F.explode("__o").alias("p"))
    return ex.select(
        *partition,
        F.col("p.id").alias(ev_id),
        F.col("p.s").alias("decayed_sum"),
        F.col("p.c").alias("decayed_count"),
        F.col("p.m").alias("decayed_max"),
        (F.col("p.s") / F.col("p.c")).alias("decayed_avg"),
    )
