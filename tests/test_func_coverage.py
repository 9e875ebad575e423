"""Coverage gate for scalar functions: every name the reference
registers (REGISTER_FUNCTION / registerAlias / FunctionFactory
``registerFunction("name")`` sites plus ``static constexpr auto name``
carriers under src/Functions/) is a direct CH_FUNCTIONS entry, a
documented composition, or an explicit exclusion — mirroring
tests/test_agg_coverage.py. Also executes a sample of the newly added
expressions end-to-end to catch Column-API regressions."""

from __future__ import annotations

import glob
import os
import re

import pytest

from clickhouse_25_5_3_75_stable_spark.functions.dialect import CH_FUNCTIONS, ch
from clickhouse_25_5_3_75_stable_spark.functions.dialect_extras import (
    CH_FUNCTION_COMPOSITIONS,
    CH_FUNCTIONS_EXCLUDED,
)

REF = "/root/reference/src/Functions"


def reference_names() -> set[str]:
    names: set[str] = set()
    pat_quoted = re.compile(r'registerFunction[^;()]*\(\s*"([A-Za-z0-9_]+)"')
    pat_alias = re.compile(r'registerAlias\(\s*"([A-Za-z0-9_]+)"')
    pat_name = re.compile(r'static constexpr auto name = "([A-Za-z0-9_]+)"')
    for ext in ("cpp", "h"):
        for path in glob.glob(os.path.join(REF, "**", f"*.{ext}"), recursive=True):
            with open(path, errors="replace") as f:
                s = f.read()
            if ext == "cpp":
                names.update(pat_quoted.findall(s))
                names.update(pat_alias.findall(s))
            names.update(pat_name.findall(s))
    return names


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference snapshot absent")
def test_every_reference_function_is_covered():
    covered = (
        {n.lower() for n in CH_FUNCTIONS}
        | {n.lower() for n in CH_FUNCTION_COMPOSITIONS}
        | {n.lower() for n in CH_FUNCTIONS_EXCLUDED}
    )
    missing = sorted(n for n in reference_names() if n.lower() not in covered)
    assert not missing, f"{len(missing)} uncovered reference functions: {missing[:40]}"


def test_extras_execute(spark):
    """Evaluate a sample of extras on real rows — the Column builders
    must resolve and produce the expected values."""
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        F.lit("hello world").alias("s"),
        F.lit("2024-03-15 10:30:45").cast("timestamp").alias("ts"),
        F.array(F.lit(3.0), F.lit(1.0), F.lit(2.0)).alias("arr"),
        F.lit(48).alias("a"),
        F.lit(18).alias("b"),
    )
    row = df.select(
        ch("gcd", F.col("a"), F.col("b")).alias("gcd"),
        ch("lcm", F.col("a"), F.col("b")).alias("lcm"),
        ch("clamp", F.col("a"), F.lit(0), F.lit(10)).alias("clamp"),
        ch("hasSubsequence", F.col("s"), "hwd").alias("subseq_y"),
        ch("hasSubsequence", F.col("s"), "dx").alias("subseq_n"),
        ch("arrayProduct", F.col("arr")).alias("prod"),
        ch("arrayRotateLeft", F.col("arr"), F.lit(1)).alias("rot"),
        ch("arrayCumSumNonNegative", F.col("arr")).alias("cumsum"),
        ch("monthName", F.col("ts")).alias("mn"),
        ch("toYYYYMMDDhhmmss", F.col("ts")).alias("ymd"),
        ch("toLastDayOfMonth", F.col("ts")).alias("ldm"),
        ch("changeYear", F.col("ts"), F.lit(2001)).alias("cy"),
        ch("INET_ATON", F.lit("1.2.3.4")).alias("ipnum"),
        ch("INET_NTOA", F.lit(16909060)).alias("ipstr"),
        ch("firstSignificantSubdomain", F.lit("https://news.example.co.uk/p")).alias("fss"),
        ch("multiSearchFirstPosition", F.col("s"), F.array(F.lit("wor"), F.lit("he"))).alias("msfp"),
        ch("multiMatchAnyIndex", F.col("s"), F.array(F.lit("^x"), F.lit("wor.d$"))).alias("mmai"),
        ch("erf", F.lit(1.0)).alias("erf1"),
        ch("sigmoid", F.lit(0.0)).alias("sig0"),
        ch("UUIDStringToNum", F.lit("01234567-89ab-cdef-0123-456789abcdef")).alias("uuidb"),
        ch("bitRotateLeft", F.lit(1).cast("bigint"), F.lit(2)).alias("brl"),
        ch("mapPopulateSeries", F.create_map(F.lit(1), F.lit(10), F.lit(4), F.lit(40))).alias("mps"),
        ch("parseTimeDelta", F.lit("1h 30m")).alias("ptd"),
    ).first()

    assert row["gcd"] == 6 and row["lcm"] == 144
    assert row["clamp"] == 10
    assert row["subseq_y"] == 1 and row["subseq_n"] == 0
    assert row["prod"] == 6.0
    assert row["rot"] == [1.0, 2.0, 3.0]
    assert row["cumsum"] == [3.0, 4.0, 6.0]
    assert row["mn"] == "March"
    assert row["ymd"] == 20240315103045
    assert str(row["ldm"].date() if hasattr(row["ldm"], "date") else row["ldm"]) == "2024-03-31"
    assert row["cy"].year == 2001 and row["cy"].month == 3
    assert row["ipnum"] == 16909060
    assert row["ipstr"] == "1.2.3.4"
    assert row["fss"] == "example"
    assert row["msfp"] == 1  # "he" at 1 beats "wor" at 7
    assert row["mmai"] == 2
    assert abs(row["erf1"] - 0.8427) < 1e-3
    assert row["sig0"] == 0.5
    assert row["uuidb"].hex() == "0123456789abcdef0123456789abcdef"
    assert row["brl"] == 4
    assert dict(row["mps"]) == {1: 10, 2: 0, 3: 0, 4: 40}
    assert row["ptd"] == 5400.0


def test_array_auc_and_fill(spark):
    from pyspark.sql import functions as F

    row = spark.range(1).select(
        ch("arrayAUC",
           F.array(F.lit(0.1), F.lit(0.4), F.lit(0.35), F.lit(0.8)),
           F.array(F.lit(0), F.lit(0), F.lit(1), F.lit(1))).alias("auc"),
        ch("arrayNormalizedGini",
           F.array(F.lit(0.1), F.lit(0.4), F.lit(0.35), F.lit(0.8)),
           F.array(F.lit(0), F.lit(0), F.lit(1), F.lit(1))).alias("gini"),
        ch("arrayFill", lambda x: x > 0,
           F.array(F.lit(1), F.lit(0), F.lit(0), F.lit(5), F.lit(0))).alias("ff"),
        ch("arrayReverseFill", lambda x: x > 0,
           F.array(F.lit(0), F.lit(3), F.lit(0), F.lit(5), F.lit(0))).alias("rf"),
    ).first()
    assert row.auc == 0.75  # canonical sklearn example
    assert abs(row.gini - 0.5) < 1e-12
    assert row.ff == [1, 1, 1, 5, 5]
    assert row.rf == [3, 3, 5, 5, 0]
