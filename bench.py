#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall seconds across the headline set (lower is better).
Each query is fully materialized via a count() over the result to make
Spark execute the whole plan without driver-side row transfer cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clickhouse_25_5_3_75_stable_spark.queries import REGISTRY  # noqa: E402
from clickhouse_25_5_3_75_stable_spark.session import get_spark  # noqa: E402

# Headline set: the heavy bucket (scans, joins, window, agg breadth)
# is the per-round scorecard; light queries are correctness-only.
HEADLINE = [name for name, spec in REGISTRY.items() if spec.bucket == "heavy"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warm-up on the smallest SF so measured times are the
    # steady-state plan cost, not first-query JIT + classloading; the
    # second warm query spins up the Python/Arrow workers so
    # pandas-UDF operators measure compute, not daemon fork cost.
    REGISTRY[HEADLINE[0]].fn(spark, "/root/testdata/sf0.001").count()
    REGISTRY["embedding_near_dup_lsh"].fn(spark, "/root/testdata/sf0.001").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = REGISTRY[name].fn(spark, sf_dir)
        df.count()
        timings[name] = round(time.perf_counter() - t0, 4)

    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
