"""Executed-plan profiling — the reference's ProfileEvents /
EXPLAIN-with-metrics surface (src/Interpreters/ProfileEventsExt.h,
query_log.ProfileEvents) mapped onto Spark's SQL metrics.

`explain_analyze(df)` EXECUTES the plan and walks the final adaptive
physical plan,
returning one row per operator with its accumulated metrics
(numOutputRows, spillSize, peakMemory, shuffle bytes, ...). This is
the post-hoc truth the plan-shape tests can't see: how many rows each
operator actually produced and where memory/spill went.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _unwrap(node):
    name = node.nodeName()
    if name == "AdaptiveSparkPlan":
        return _unwrap(node.executedPlan())
    if name.endswith("QueryStage"):
        return _unwrap(node.plan())
    return node


def _walk(node, depth: int, rows: list) -> None:
    node = _unwrap(node)
    mets = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        mets[kv._1()] = int(kv._2().value())
    rows.append((depth, node.nodeName(), mets))
    for i in range(node.children().size()):
        _walk(node.children().apply(i), depth + 1, rows)


def explain_analyze(df: DataFrame, execute: bool = True) -> list[tuple[int, str, dict]]:
    """Run the plan and return [(depth, operator, metrics), ...] in
    tree order. With execute=False, reads whatever metrics the last
    action left behind (zeroes on a never-run plan).

    Execution must drive THIS DataFrame's own QueryExecution —
    df.count()/write would build a fresh plan and leave these metrics
    at zero. The JVM-side executedPlan().execute().count() runs the
    full pipeline with per-partition counting and NO driver row
    transfer (a collect() here OOM'd the driver on large results:
    review finding); collect() remains only as a fallback."""
    if execute:
        import time

        t0 = time.monotonic()
        try:
            n = df._jdf.queryExecution().executedPlan().execute().count()
        except Exception:
            n = len(df.collect())
        from clickhouse_25_5_3_75_stable_spark.sources.system_tables import (
            record_query,
        )

        record_query(
            df._jdf.queryExecution().logical().toString().split("\n")[0],
            kind="QueryFinish",
            duration_ms=(time.monotonic() - t0) * 1000.0,
            result_rows=int(n),
            query_id=getattr(df, "_ch_query_id", None),
        )
    rows: list[tuple[int, str, dict]] = []
    _walk(df._jdf.queryExecution().executedPlan(), 0, rows)
    return rows


def explain_analyze_text(df: DataFrame, execute: bool = True) -> str:
    """Human-readable EXPLAIN ANALYZE: indented operator tree with the
    headline metrics per node."""
    headline = (
        "numOutputRows", "spillSize", "peakMemory", "pipelineTime",
        "shuffleRecordsWritten", "numPartitions", "dataSize",
    )
    lines = []
    for depth, name, mets in explain_analyze(df, execute=execute):
        picked = ", ".join(f"{k}={mets[k]}" for k in headline if k in mets)
        lines.append("  " * depth + name + (f"  [{picked}]" if picked else ""))
    return "\n".join(lines)
