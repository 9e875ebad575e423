"""Table TTL semantics (reference MergeTree TTL:
/root/reference/src/Storages/TTLDescription.h,
src/Processors/TTL/TTLDeleteAlgorithm.h, TTLColumnAlgorithm.h,
TTLAggregationAlgorithm.h — row expiry, per-column expiry, and
TTL ... GROUP BY rollup applied at merge time).

Spark mapping: TTL is a read-view filter plus a compaction rewrite —
exactly the reference's model, where expired rows survive on disk
until a merge applies the TTL. `apply_*` build the folded view (use
for reads or as the SELECT of a compaction job); `compact_with_ttl`
is the OPTIMIZE analogue that rewrites storage with the TTL applied.

All expiry cutoffs take an explicit `now` column/literal: determinism
first (tests/oracles anchor to max(ts)); production passes
F.current_timestamp().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cutoff(now: Column, interval: str) -> Column:
    return now - F.expr(f"INTERVAL {interval}")


def apply_row_ttl(df: DataFrame, ts_col: str, interval: str, now: Column) -> DataFrame:
    """TTL ts + INTERVAL x DELETE: rows older than the interval expire
    (TTLDeleteAlgorithm). A plain sargable filter — parquet min/max
    prunes whole files of expired data before reading them."""
    return df.filter(F.col(ts_col).cast("timestamp") >= _cutoff(now, interval))


def apply_column_ttl(
    df: DataFrame, ts_col: str, rules: dict[str, str], now: Column
) -> DataFrame:
    """Per-column TTL (TTLColumnAlgorithm): expired columns reset to
    NULL (the reference resets to the column default; NULL is the
    Spark default-default). rules = {column: interval}."""
    out = df
    for col, interval in rules.items():
        out = out.withColumn(
            col,
            F.when(
                F.col(ts_col).cast("timestamp") >= _cutoff(now, interval), F.col(col)
            ),
        )
    return out


def apply_ttl_rollup(
    df: DataFrame,
    ts_col: str,
    interval: str,
    now: Column,
    group_by: list[str],
    aggs: list[Column],
    bucket: str = "1 day",
) -> DataFrame:
    """TTL ... GROUP BY (TTLAggregationAlgorithm): rows past the TTL
    collapse into per-(group, time-bucket) aggregates; fresh rows pass
    through untouched. Returns (fresh, expired) — the caller unions or
    stores them separately (the reference's merge writes both back to
    the same part). Expired side is one hash agg; fresh side is a
    filter: both map-side-efficient at any scale."""
    ts = F.col(ts_col).cast("timestamp")
    cut = _cutoff(now, interval)
    fresh = df.filter(ts >= cut)
    unit = bucket.split()[1].rstrip("s")
    expired = (
        df.filter(ts < cut)
        .groupBy(*group_by, F.date_trunc(unit, ts).alias("__bucket"))
        .agg(*aggs)
    )
    return fresh, expired


def compact_with_ttl(
    df: DataFrame, path: str, ts_col: str, interval: str, now: Column
) -> None:
    """OPTIMIZE-with-TTL analogue: rewrite storage with expired rows
    physically removed (the merge that actually applies TTL)."""
    apply_row_ttl(df, ts_col, interval, now).write.mode("overwrite").parquet(path)
