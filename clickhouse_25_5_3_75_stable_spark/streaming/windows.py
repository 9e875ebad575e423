"""Streaming time-window operators (SURVEY §2.9).

Reference: StorageWindowView tumble/hop with watermarks and allowed
lateness (/root/reference/src/Storages/WindowView/StorageWindowView.h:
41-53,74-95), window functions tumble/hop/tumbleStart/hopEnd
(/root/reference/src/Functions/FunctionsTimeWindow.cpp:167,263,317,345).

Spark mapping is direct: `F.window(ts, size[, slide])` +
`withWatermark` + append/update output modes. These helpers exist so
engine users get the reference's vocabulary (tumble/hop/window_view)
while the plan stays pure Structured Streaming — the same builders work
on batch DataFrames too (WindowView's "populate" backfill mode).

Scale notes: windowed aggregation state lives in the state store keyed
by (group, window); the watermark bounds state size — without it a
streaming agg would grow forever. Late rows beyond the watermark drop
(reference ALLOWED_LATENESS ≈ a larger watermark delay; its "fire
updated results" ≈ update output mode).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumble(df: DataFrame, ts: str | Column, size: str) -> DataFrame:
    """Non-overlapping windows of `size` (reference tumble(),
    FunctionsTimeWindow.cpp:167): adds window_start / window_end."""
    w = F.window(ts, size)
    return df.withColumn("__w", w).withColumn(
        "window_start", F.col("__w.start")
    ).withColumn("window_end", F.col("__w.end")).drop("__w")


def hop(df: DataFrame, ts: str | Column, size: str, slide: str) -> DataFrame:
    """Overlapping windows: size `size` sliding by `slide` (reference
    hop(), FunctionsTimeWindow.cpp:345). Rows duplicate into
    size/slide windows — exactly the reference's semantics."""
    w = F.window(ts, size, slide)
    return df.withColumn("__w", w).withColumn(
        "window_start", F.col("__w.start")
    ).withColumn("window_end", F.col("__w.end")).drop("__w")


def session(df: DataFrame, ts: str | Column, gap: str) -> DataFrame:
    """Session windows with inactivity gap — absent in the reference
    (SURVEY §2.9 notes it as a bonus); native in Spark."""
    w = F.session_window(ts, gap)
    return df.withColumn("__w", w).withColumn(
        "window_start", F.col("__w.start")
    ).withColumn("window_end", F.col("__w.end")).drop("__w")


def window_view(
    stream: DataFrame,
    ts: str,
    size: str,
    agg_exprs: list[Column],
    group_cols: list[str] | None = None,
    slide: str | None = None,
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """The StorageWindowView analogue: windowed grouped aggregation with
    a bounded-lateness watermark. Works for both streaming and batch
    inputs (batch ignores the watermark — same as WindowView populate).

    Returns window_start / window_end / group cols / aggregates.
    Output mode guidance: append after watermark expiry (reference
    fire-on-watermark), update for its fire-on-every-insert mode.
    """
    src = stream
    if watermark is not None and src.isStreaming:
        src = src.withWatermark(ts, watermark)
    w = F.window(ts, size, slide) if slide else F.window(ts, size)
    keys = [w] + [F.col(c) for c in (group_cols or [])]
    out = src.groupBy(*keys).agg(*agg_exprs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[F.col(c) for c in (group_cols or [])],
        *[F.col(c) for c in out.columns if c != "window" and c not in (group_cols or [])],
    )


def live_view(agg_stream: DataFrame, name: str, trigger_available_now: bool = True):
    """LIVE VIEW analogue (reference StorageLiveView,
    /root/reference/src/Storages/LiveView/StorageLiveView.h:47): a
    continuously re-evaluated query result. Spark realization: the
    aggregated stream writes to an in-memory sink in ``complete``
    output mode — every trigger replaces the full result, exactly the
    LIVE VIEW refresh contract; readers ``spark.sql(f"SELECT * FROM
    {name}")`` for the current snapshot (the WATCH-query surface).

    Returns the StreamingQuery handle (caller stops it)."""
    writer = agg_stream.writeStream.format("memory").queryName(name).outputMode("complete")
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def watch(spark, name: str, limit: int = 8, poll_s: float = 0.5, timeout_s: float = 60.0):
    """WATCH query (reference src/Interpreters/InterpreterWatchQuery.h:
    block until the live view updates, emit the new result, repeat —
    with LIMIT n update-cycles). Generator over the memory-sink
    snapshots of :func:`live_view`: yields (version, rows) each time
    the snapshot content changes, up to `limit` versions or
    `timeout_s`."""
    import time

    last = None
    version = 0
    deadline = time.time() + timeout_s
    while version < limit and time.time() < deadline:
        rows = tuple(sorted(map(tuple, spark.sql(f"SELECT * FROM {name}").collect()), key=str))
        if rows != last and rows:
            version += 1
            last = rows
            yield version, rows
        else:
            time.sleep(poll_s)


def stream_dedup(
    stream: DataFrame,
    keys: list[str],
    ts: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming insert-dedup: first arrival per key wins, duplicates
    arriving within the watermark horizon are dropped and state ages
    out with the watermark (bounded memory at any throughput).

    This is the streaming analogue of ReplacingMergeTree's collapse +
    the reference's insert-block deduplication
    (/root/reference/src/Storages/MergeTree/
    ReplacingSortedAlgorithm.h:13, insert_deduplicate): ClickHouse
    dedups replayed insert blocks at ingest; Spark's
    dropDuplicatesWithinWatermark is the per-row form with an explicit
    horizon. For exact-forever dedup (unbounded state), batch-side
    OPTIMIZE FINAL (operators/mergetree.py) remains the contract."""
    return stream.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(keys)
