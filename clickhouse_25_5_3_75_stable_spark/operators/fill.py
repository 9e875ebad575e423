"""ORDER BY ... WITH FILL / INTERPOLATE rewrite (SURVEY §2.5 note).

Reference: FillingStep
(/root/reference/src/Processors/QueryPlan/FillingStep.h:9-10) inserts
missing rows along an ordered axis and optionally interpolates other
columns. Spark rewrite: generate the dense axis with ``sequence()`` +
explode, left-join the real rows, then forward-fill via a window.
The generated axis is tiny relative to the data (one row per step), so
the join broadcasts; the forward-fill is one window pass per partition
key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def with_fill_dates(
    spark: SparkSession,
    df: DataFrame,
    date_col: str,
    start: str,
    stop: str,
    fill_zero: Sequence[str] = (),
    fill_forward: Sequence[str] = (),
) -> DataFrame:
    """Dense daily axis [start, stop]; missing rows get 0 for
    ``fill_zero`` columns and the previous value for ``fill_forward``
    (the INTERPOLATE analogue)."""
    axis = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"), F.lit(stop).cast("date"), F.expr("interval 1 day")
            )
        ).alias(date_col)
    )
    out = axis.join(df, on=date_col, how="left")
    for c in fill_zero:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    if fill_forward:
        w = W.orderBy(date_col).rowsBetween(W.unboundedPreceding, W.currentRow)
        for c in fill_forward:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def fill_linear(
    df: DataFrame,
    axis_col: str,
    cols: Sequence[str],
    partition: Sequence[str] = (),
) -> DataFrame:
    """Linear INTERPOLATE between the surrounding real points
    (reference FillingStep INTERPOLATE with an expression): for a
    filled row at axis x between known points (x0,v0) and (x1,v1),
    v = v0 + (v1−v0)·(x−x0)/(x1−x0); rows past the last known point
    keep the previous value (forward fill), before the first stay
    NULL. One pair of window passes per column — same shuffle contract
    as forward fill."""
    part = [F.col(c) for c in partition]
    wb = W.partitionBy(*part).orderBy(axis_col).rowsBetween(W.unboundedPreceding, W.currentRow)
    wf = W.partitionBy(*part).orderBy(axis_col).rowsBetween(W.currentRow, W.unboundedFollowing)
    out = df
    axis_num = F.col(axis_col).cast("timestamp").cast("double")
    for c in cols:
        known_axis = F.when(F.col(c).isNotNull(), axis_num)
        prev_v = F.last(c, ignorenulls=True).over(wb)
        prev_x = F.last(known_axis, ignorenulls=True).over(wb)
        next_v = F.first(c, ignorenulls=True).over(wf)
        next_x = F.first(known_axis, ignorenulls=True).over(wf)
        frac = (axis_num - prev_x) / (next_x - prev_x)
        interp = F.when(F.col(c).isNotNull(), F.col(c)).otherwise(
            F.when(
                prev_v.isNotNull() & next_v.isNotNull() & (next_x != prev_x),
                prev_v + (next_v - prev_v) * frac,
            ).otherwise(prev_v)
        )
        out = out.withColumn(c, interp)
    return out
