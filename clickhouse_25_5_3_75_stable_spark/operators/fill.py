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
