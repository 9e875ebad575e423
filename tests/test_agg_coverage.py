"""Coverage gate: every aggregate name registered by the reference
(src/AggregateFunctions/*.cpp factory.registerFunction sites) is either
a direct Spark expression (CH_AGGREGATES), a documented composition
(CH_AGGREGATE_COMPOSITIONS), or explicitly excluded."""

from __future__ import annotations

import glob
import os
import re

import pytest

from clickhouse_25_5_3_75_stable_spark.functions.aggregates import (
    CH_AGGREGATE_COMPOSITIONS,
    CH_AGGREGATES,
    CH_AGGREGATES_EXCLUDED,
)

REF = "/root/reference/src/AggregateFunctions"


def reference_names() -> set[str]:
    names: set[str] = set()
    pat = re.compile(r'registerFunction[^;]*?"([A-Za-z0-9_]+)"', re.S)
    for path in glob.glob(os.path.join(REF, "*.cpp")):
        with open(path, errors="replace") as f:
            names.update(pat.findall(f.read()))
    return names


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference snapshot absent")
def test_every_reference_aggregate_is_covered():
    covered = (
        {n.lower() for n in CH_AGGREGATES}
        | {n.lower() for n in CH_AGGREGATE_COMPOSITIONS}
        | {n.lower() for n in CH_AGGREGATES_EXCLUDED}
    )
    missing = sorted(n for n in reference_names() if n.lower() not in covered)
    assert not missing, f"uncovered reference aggregates: {missing}"


def test_no_overlap_between_direct_and_excluded():
    direct = {n.lower() for n in CH_AGGREGATES}
    excluded = {n.lower() for n in CH_AGGREGATES_EXCLUDED}
    assert not direct & excluded
