"""LIMIT BY / DISTINCT ON / LIMIT WITH TIES rewrites (SURVEY §2.6).

Reference plan nodes: LimitByStep
(/root/reference/src/Processors/QueryPlan/LimitByStep.h:8), LimitStep
WITH TIES (src/Processors/QueryPlan/LimitStep.h:9), DISTINCT ON
(src/Parsers/ParserSelectQuery.cpp:135). All are window rewrites:
one shuffle on the partition key, rank predicate, done. Spark pushes
the windowed rank's sort into the shuffle (WindowExec after a single
exchange), so these scale like any keyed aggregation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def limit_by(
    df: DataFrame,
    n: int,
    by: Sequence[str],
    order: Sequence[Column | str],
    offset: int = 0,
) -> DataFrame:
    """``LIMIT [offset,] n BY by_cols``: first n rows per group in
    ``order``. ``order`` must be a total order for determinism."""
    w = W.partitionBy(*by).orderBy(*order)
    rn = F.row_number().over(w)
    return (
        df.withColumn("__rn", rn)
        .filter((F.col("__rn") > offset) & (F.col("__rn") <= offset + n))
        .drop("__rn")
    )


def distinct_on(df: DataFrame, on: Sequence[str], order: Sequence[Column | str]) -> DataFrame:
    """``SELECT DISTINCT ON (on) ...``: one row per key, first in order."""
    return limit_by(df, 1, by=on, order=order)


def limit_with_ties(df: DataFrame, n: int, order: Sequence[Column | str]) -> DataFrame:
    """``ORDER BY ... LIMIT n WITH TIES``: first n rows plus every row
    tied (on the order key) with the n-th. rank() <= n is exactly this
    set. Un-partitioned window = single-task sort; WITH TIES implies a
    global order anyway (same cost as the reference's full sort,
    src/Processors/Transforms/MergeSortingTransform.cpp)."""
    w = W.orderBy(*order)
    return df.withColumn("__rk", F.rank().over(w)).filter(F.col("__rk") <= n).drop("__rk")
