"""Skew-mitigation helpers: salted aggregation and salted joins.

The reference absorbs skewed GROUP BY keys with two-level hash tables
and per-thread partial states merged at the end
(/root/reference/src/Interpreters/Aggregator.h:118-119 two-level
conversion; ConcurrentHashJoin for parallel builds). Spark's analogue
for a *pathologically* skewed key — one key holding a double-digit
percentage of 100 TB — is salting: split the hot key across S
sub-keys, aggregate partially, then merge. AQE's skew-join handling
(spark.sql.adaptive.skewJoin) covers sort-merge joins automatically;
these helpers cover hash aggregations and broadcast-side-too-big joins
where AQE can't re-split.

All provided aggregates are algebraic (sum/count/min/max/decimal-sum),
so salt→merge is exact, not approximate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(25,6)"


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    count: bool = True,
    minmax_cols: Sequence[str] = (),
    salt: int = 16,
) -> DataFrame:
    """GROUP BY keys with an S-way salt: stage 1 aggregates on
    (keys, salt) — the hot key's rows spread across S reducers — and
    stage 2 merges the S partials per key. Exact for the algebraic
    aggregates offered here; double sums accumulate in decimal so the
    two-stage merge is order-independent (functions/numeric.py).

    Output columns: ``count_rows`` (if count), ``sum_<c>`` (double),
    ``min_<c>``/``max_<c>``.
    """
    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt)))
    stage1_aggs = []
    if count:
        stage1_aggs.append(F.count(F.lit(1)).alias("__cnt"))
    for c in sum_cols:
        stage1_aggs.append(F.sum(F.col(c).cast(_DEC)).alias(f"__sum_{c}"))
    for c in minmax_cols:
        stage1_aggs.append(F.min(c).alias(f"__min_{c}"))
        stage1_aggs.append(F.max(c).alias(f"__max_{c}"))
    stage1 = salted.groupBy(*keys, "__salt").agg(*stage1_aggs)

    stage2_aggs = []
    if count:
        stage2_aggs.append(F.sum("__cnt").alias("count_rows"))
    for c in sum_cols:
        stage2_aggs.append(F.sum(f"__sum_{c}").cast("double").alias(f"sum_{c}"))
    for c in minmax_cols:
        stage2_aggs.append(F.min(f"__min_{c}").alias(f"min_{c}"))
        stage2_aggs.append(F.max(f"__max_{c}").alias(f"max_{c}"))
    return stage1.groupBy(*keys).agg(*stage2_aggs)


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: replicate the dimension S times (one copy per
    salt value) and scatter the fact side uniformly across them, so a
    hot key's rows land on S reducers instead of one. Dimension cost is
    S× its size — use when the dim is small-ish but past the broadcast
    threshold and one fact key dominates.

    Only ``inner`` and ``left`` are sound with this shape: a right or
    full outer join would emit each unmatched dim row once PER SALT
    copy (salt duplicate null-extended rows)."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how in ('inner', 'left'), got {how!r}: "
            "outer joins would duplicate unmatched dimension rows per salt copy"
        )
    dim_rep = dim.crossJoin(
        F.broadcast(
            dim.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    facts_salted = facts.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)).cast("int")
    )
    out = facts_salted.join(dim_rep, [key, "__salt"], how)
    return out.drop("__salt")
