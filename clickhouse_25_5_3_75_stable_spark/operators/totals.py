"""WITH TOTALS rewrite (SURVEY §2.4).

Reference: TotalsHavingStep
(/root/reference/src/Processors/QueryPlan/TotalsHavingStep.h:12)
appends one grand-total row after the grouped aggregation. Spark
rewrite: GROUPING SETS ((keys...), ()) — a single aggregation pass
(Expand + one shuffle), not a union of two scans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_totals(
    df: DataFrame, group_cols: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """GROUP BY ``group_cols`` WITH TOTALS: grouped rows plus one row
    with NULL keys holding the grand total. ``is_total`` flags it
    (distinguishes the totals row from genuine NULL key values, like
    the reference's separate totals block)."""
    # grouping() is only valid inside the aggregate list, so is_total is
    # computed as part of agg(): on the ((keys), ()) grouping sets all
    # keys are rolled up together and grouping(first_key) identifies the
    # totals row.
    return df.groupingSets(
        [[F.col(c) for c in group_cols], []],
        *[F.col(c) for c in group_cols],
    ).agg(*aggs, (F.grouping(group_cols[0]) > 0).alias("is_total"))
