"""Join kinds/strictness Spark lacks natively (SURVEY §2.3).

Reference join taxonomy: kinds Inner/Left/Right/Full/Cross/Paste,
strictness All/Any/Semi/Anti/Asof
(/root/reference/src/Core/Joins.h:12-21,44-53). Inner/outer/cross/
semi/anti map 1:1 onto `DataFrame.join(how=...)`; this module supplies
the remaining three as DataFrame compositions (no RDDs, no Python-row
UDFs — everything stays in Tungsten).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def any_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "left",
    right_order: Sequence[Column | str] = (),
) -> DataFrame:
    """ANY-strictness join: at most one right row per key, no row
    multiplication (/root/reference/src/Core/Joins.h:46-48).

    The reference picks the first build-table match (insertion order —
    nondeterministic under parallel build); we require an explicit
    ``right_order`` so results are deterministic and oracle-checkable.
    Scale: the dedup is one extra shuffle of the right side on the join
    key — strictly cheaper than the join it feeds.
    """
    if not right_order:
        raise ValueError("right_order required for deterministic ANY join")
    w = W.partitionBy(*on).orderBy(*right_order)
    deduped = (
        right.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )
    return left.join(deduped, on=list(on), how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    strict: bool = False,
    how: str = "left",
    direction: str = "backward",
) -> DataFrame:
    """ASOF JOIN: for each left row, the nearest right row per ``by``
    key — backward (default): latest with ``right_ts <= left_ts``;
    forward: earliest with ``right_ts >= left_ts`` (strict drops
    equality). The reference supports all four inequalities
    (/root/reference/src/Core/Joins.h:78).

    Reference: ASOF strictness in HashJoin
    (/root/reference/src/Interpreters/HashJoin/HashJoin.h:53,67) keeps a
    sorted per-key vector and binary-searches. Spark-first design: no
    per-key search structure — union both sides, one window sort per
    ``by`` key, carry the last non-null right payload forward:

        union(left ∪ right) → window(partitionBy=by, orderBy=ts,side)
        → last(payload, ignoreNulls) → keep left rows

    One shuffle on ``by`` (same as any join on that key), no crossjoin,
    no Python. Skew note: a hot ``by`` key serializes within its
    partition — at 100 TB pre-split hot keys by coarse time bucket.

    Ties: right rows at the same timestamp are ordered by their payload
    struct so the winner is deterministic.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if not right_values:
        raise ValueError("asof_join: right_values must name at least one column")
    side = F.lit(0) if strict else F.lit(2)  # non-strict: right sorts before equal-ts left
    payload = F.struct(*[F.col(c) for c in right_values]).alias("__rv")
    r = right.select(
        *[F.col(c) for c in by],
        F.col(right_ts).alias("__ts"),
        payload,
        side.alias("__side"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(r.schema["__rv"].dataType).alias("__rv"),
        F.lit(1).alias("__side"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # Within equal (__ts, __side) right rows, order by payload for
    # determinism. Forward direction = the same sweep over reversed time.
    ts_ord = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    w = (
        W.partitionBy(*by)
        .orderBy(ts_ord, F.col("__side").desc(), F.col("__rv"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = u.withColumn("__match", F.last("__rv", ignorenulls=True).over(w))
    out = matched.filter(F.col("__side") == 1).drop("__ts", "__rv", "__side")
    if how == "inner":
        # match presence = the payload STRUCT itself (a matched row
        # whose first payload FIELD is NULL is still a match —
        # review-found: filtering on right_values[0] dropped it)
        out = out.filter(F.col("__match").isNotNull())
    for c in right_values:
        out = out.withColumn(c, F.col(f"__match.{c}"))
    out = out.drop("__match")
    return out


def _global_positions(df: DataFrame, order: Sequence[Column | str]) -> DataFrame:
    """Deterministic 1-based global rank by `order` WITHOUT a
    single-task global sort: range-partition on the order key, rank
    within each (ordered) partition, then shift each partition by the
    cumulative count of the partitions before it. The per-partition
    counts are one tiny aggregate (|partitions| rows — driver-safe);
    correctness does not depend on where the sampled range boundaries
    land because range partitions are themselves ordered."""
    spark = df.sparkSession
    n_parts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "200")), 1)
    # The counts aggregate below and the final rank evaluation are TWO
    # separate jobs. repartitionByRange's sampled boundaries and AQE's
    # partition coalescing are not guaranteed identical across
    # re-evaluations, so __pid could mean different slices in each job
    # — producing duplicate/skipped global ranks (seen live at sf0.1:
    # the 1000-row zip returned 1002 rows). localCheckpoint(eager)
    # materializes the ranged layout ONCE; both jobs then read the
    # same frozen partitions. Cost = one spill-capable materialization
    # of the relation, the same class as the shuffle it already does.
    ranged = (
        df.repartitionByRange(n_parts, *order)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = sorted(
        (r["__pid"], r["cnt"])
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid, cnt in counts:
        offsets[pid] = acc
        acc += cnt
    off_expr = F.create_map(
        *[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]
    )
    lw = F.row_number().over(W.partitionBy("__pid").orderBy(*order))
    return ranged.withColumn(
        "__pos", (lw + F.coalesce(off_expr[F.col("__pid")], F.lit(0))).cast("bigint")
    ).drop("__pid")


def paste_join(
    left: DataFrame,
    right: DataFrame,
    left_order: Sequence[Column | str],
    right_order: Sequence[Column | str],
) -> DataFrame:
    """PASTE JOIN: positional zip of two relations
    (/root/reference/src/Interpreters/PasteJoin.h:20).

    The reference zips blocks by arrival order (nondeterministic under
    parallelism); we require explicit total orders on both sides.
    Implementation: range-partitioned global rank on each side (see
    :func:`_global_positions` — per-partition windows plus cumulative
    offsets, NO un-partitioned window / single-task sort) and an
    equi-join on position. At 1000 executors both rank computations and
    the zip join stay fully parallel."""
    lnum = _global_positions(left, left_order)
    rnum = _global_positions(right, right_order)
    return lnum.join(rnum, "__pos", "inner").drop("__pos")
