"""Aggregate projections: pre-aggregated routing.

The reference can store per-part pre-aggregations ("projections") and
reroute a matching GROUP BY onto them at plan time
(/root/reference/src/Processors/QueryPlan/Optimizations/
optimizeUseAggregateProjection.cpp; projection parts hold partial
aggregate states merged at read). Catalyst has no equivalent, so we
provide it as an explicit materialized pre-agg + router:

- :func:`build_aggregate_projection` — one pass over the fact table
  producing partial states keyed by a superset of future group keys
  (count / decimal-sum / min / max states — all re-aggregable);
- :func:`route_to_projection` — answer ``GROUP BY subset`` by merging
  the partial states (the reference's state-merge at read).

Scale story: the projection holds |distinct key combos| rows, so a
query that would scan 100 TB re-aggregates a few MB instead — the same
~1e6x read reduction the reference's projections buy. The projection
itself is refreshed by one distributed agg job (map-side combine keeps
the shuffle at |groups| rows per partition).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(25,6)"


def build_aggregate_projection(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    minmax_cols: Sequence[str] = (),
) -> DataFrame:
    """Materialize partial aggregate states grouped by ``keys``.

    States kept per measure: exact decimal sum (order-independent, see
    functions/numeric.py), non-null count, min, max — each of these
    merges associatively, which is what makes rerouting sound.
    """
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in sum_cols:
        aggs.append(F.sum(F.col(c).cast(_DEC)).alias(f"_sum_{c}"))
        aggs.append(F.count(F.col(c)).alias(f"_cnt_{c}"))
    for c in minmax_cols:
        aggs.append(F.min(c).alias(f"_min_{c}"))
        aggs.append(F.max(c).alias(f"_max_{c}"))
    return df.groupBy(*keys).agg(*aggs)


def route_to_projection(
    projection: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    avg_cols: Sequence[str] = (),
    minmax_cols: Sequence[str] = (),
) -> DataFrame:
    """Answer ``GROUP BY keys`` from a projection built on a key
    superset by merging partial states (sum-of-sums, sum-of-counts,
    min-of-mins...). ``keys`` must be a subset of the projection's."""
    aggs = [F.sum("_rows").alias("count_rows")]
    for c in sum_cols:
        aggs.append(F.sum(f"_sum_{c}").cast("double").alias(f"sum_{c}"))
    for c in avg_cols:
        aggs.append(
            (F.sum(f"_sum_{c}").cast("double") / F.sum(f"_cnt_{c}").cast("double")).alias(
                f"avg_{c}"
            )
        )
    for c in minmax_cols:
        aggs.append(F.min(f"_min_{c}").alias(f"min_{c}"))
        aggs.append(F.max(f"_max_{c}").alias(f"max_{c}"))
    return projection.groupBy(*keys).agg(*aggs)
