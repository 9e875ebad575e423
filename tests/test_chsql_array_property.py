"""Property-based differential test of the array higher-order-function
surface (reference src/Functions/array/*): random COMPOSITIONS of
arrayMap/arrayFilter/arraySort/arraySlice/arrayConcat feeding
arraySum/arrayCount/arrayUniq/indexOf/has/length, rendered as CH SQL
through the shim onto Spark and as list_* SQL onto DuckDB, compared
value-exact. Integer domain, so no float noise; lambdas are single-var
arithmetic/predicates (the HOF depth-0 `->` detection hazard class).

Dtype stances under test (documented engine model): arrays are
Nullable-element, so out-of-range access and arrayFirst-no-match are
NULL (the reference's Nullable branch), and arraySum rides DOUBLE on
both engines."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhouse_25_5_3_75_stable_spark.chsql import ch_sql_to_spark


def lit_arr():
    return st.lists(st.integers(-5, 9), min_size=0, max_size=6).map(
        lambda xs: (
            "[" + ", ".join(str(x) for x in xs) + "]",
            "[" + ", ".join(str(x) for x in xs) + "]",
        )
    )


def lam():
    """(ch_lambda_body, duck_lambda_body) over variable x — arithmetic."""
    return st.sampled_from([
        ("x + 1", "x + 1"),
        ("x * 2", "x * 2"),
        ("x - 3", "x - 3"),
        ("-x", "-x"),
        ("abs(x)", "abs(x)"),
        ("x * x", "x * x"),
    ])


def pred():
    return st.sampled_from([
        ("x > 1", "x > 1"),
        ("x % 2 == 0", "x % 2 = 0"),
        ("x < 0", "x < 0"),
        ("x != 2", "x <> 2"),
    ])


def arr_expr(depth=2):
    if depth == 0:
        return lit_arr()
    child = arr_expr(depth - 1)
    amap = st.tuples(lam(), child).map(
        lambda t: (
            f"arrayMap(x -> {t[0][0]}, {t[1][0]})",
            f"list_transform({t[1][1]}, x -> {t[0][1]})",
        )
    )
    afil = st.tuples(pred(), child).map(
        lambda t: (
            f"arrayFilter(x -> {t[0][0]}, {t[1][0]})",
            f"list_filter({t[1][1]}, x -> {t[0][1]})",
        )
    )
    asort = child.map(
        lambda a: (f"arraySort({a[0]})", f"list_sort({a[1]})")
    )
    aconc = st.tuples(lit_arr(), child).map(
        lambda t: (
            f"arrayConcat({t[0][0]}, {t[1][0]})",
            f"list_concat({t[0][1]}, {t[1][1]})",
        )
    )
    aslice = st.tuples(child, st.integers(1, 4), st.integers(0, 4)).map(
        lambda t: (
            f"arraySlice({t[0][0]}, {t[1]}, {t[2]})",
            f"({t[0][1]})[{t[1]}:{t[1] + t[2] - 1}]",
        )
    )
    return st.one_of(child, amap, afil, asort, aconc, aslice)


def scalar_expr():
    a = arr_expr()
    asum = a.map(
        lambda t: (
            f"arraySum({t[0]})",
            f"CAST(COALESCE(list_aggregate({t[1]}, 'sum'), 0) AS DOUBLE)",
        )
    )
    acnt = st.tuples(pred(), a).map(
        lambda t: (
            f"arrayCount(x -> {t[0][0]}, {t[1][0]})",
            f"len(list_filter({t[1][1]}, x -> {t[0][1]}))",
        )
    )
    auniq = a.map(
        lambda t: (f"arrayUniq({t[0]})", f"len(list_distinct({t[1]}))")
    )
    aidx = st.tuples(a, st.integers(-2, 4)).map(
        lambda t: (
            f"indexOf({t[0][0]}, {t[1]})",
            f"COALESCE(list_position({t[0][1]}, {t[1]}), 0)",
        )
    )
    ahas = st.tuples(a, st.integers(-2, 4)).map(
        lambda t: (
            f"has({t[0][0]}, {t[1]})",
            f"list_contains({t[0][1]}, {t[1]})",
        )
    )
    alen = a.map(lambda t: (f"length({t[0]})", f"len({t[1]})"))
    aexists = st.tuples(pred(), a).map(
        lambda t: (
            f"arrayExists(x -> {t[0][0]}, {t[1][0]})",
            f"len(list_filter({t[1][1]}, x -> {t[0][1]})) > 0",
        )
    )
    aall = st.tuples(pred(), a).map(
        lambda t: (
            f"arrayAll(x -> {t[0][0]}, {t[1][0]})",
            f"len(list_filter({t[1][1]}, x -> {t[0][1]})) = len({t[1][1]})",
        )
    )
    return st.one_of(asum, acnt, auniq, aidx, ahas, alen, aexists, aall)


@pytest.fixture(scope="module")
def ctx(spark):
    con = duckdb.connect()
    yield spark, con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return int(v)


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(e=scalar_expr(), a=arr_expr())
def test_array_hof_matches_duckdb(ctx, e, a):
    spark, con = ctx
    ch = f"SELECT {e[0]} AS r1, arraySort({a[0]}) AS r2"
    duck = f"SELECT {e[1]} AS r1, list_sort({a[1]}) AS r2"
    got = [tuple(_canon(c) for c in r) for r in spark.sql(ch_sql_to_spark(ch)).collect()]
    want = [tuple(_canon(c) for c in r) for r in con.execute(duck).fetchall()]
    assert got == want, f"\n CH:   {ch}\n DUCK: {duck}\n spark={got}\n duck={want}"
