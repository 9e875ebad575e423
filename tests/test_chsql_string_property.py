"""Property-based differential test of the string-function surface
(reference src/Functions/{position,replace*,substring,...}.cpp):
random compositions over unicode-bearing literals, CH SQL through the
shim onto Spark vs hand-built DuckDB SQL, value-exact.

Byte-vs-character semantics under test: CH length(String) counts
BYTES (DuckDB strlen), lengthUTF8 counts characters (DuckDB length);
replaceOne/replaceRegexpOne replace the FIRST occurrence only (DuckDB
regexp_replace without 'g')."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhouse_25_5_3_75_stable_spark.chsql import ch_sql_to_spark

# unicode + empties + repeats; single quotes excluded (escape
# conventions already covered by the KQL/PRQL fuzzes)
POOL = ["héllo wörld", "abcabc", "née", "", "  pad  ", "Ωmega", "aaa",
        "data model data", "x,y;z", "ABCdef"]
NEEDLES = ["a", "bc", "é", "data", "zz", " ", ""]
REGEXES = ["[0-9]+", "[aeé]", "a+", "d.t", "$^"]


def _sq(v: str) -> str:
    return "'" + v.replace("'", "''") + "'"


def base_str():
    return st.sampled_from(POOL).map(lambda v: (_sq(v), _sq(v)))


def str_expr(depth=1):
    if depth == 0:
        return base_str()
    child = str_expr(depth - 1)
    unary = st.tuples(
        st.sampled_from([
            ("lower({})", "lower({})"),
            ("upper({})", "upper({})"),
            ("reverseUTF8({})", "reverse({})"),
            ("trimBoth({})", "trim({})"),
            ("trimLeft({})", "ltrim({})"),
            ("trimRight({})", "rtrim({})"),
        ]),
        child,
    ).map(lambda t: (t[0][0].format(t[1][0]), t[0][1].format(t[1][1])))
    sub = st.tuples(child, st.integers(1, 6), st.integers(0, 5)).map(
        lambda t: (
            f"substringUTF8({t[0][0]}, {t[1]}, {t[2]})",
            f"substring({t[0][1]}, {t[1]}, {t[2]})",
        )
    )
    conc = st.tuples(child, base_str()).map(
        lambda t: (
            f"concat({t[0][0]}, {t[1][0]})",
            f"({t[0][1]} || {t[1][1]})",
        )
    )
    repl = st.tuples(child, st.sampled_from(NEEDLES[:5]),
                     st.sampled_from(["X", "", "_y_"])).map(
        lambda t: (
            f"replaceAll({t[0][0]}, {_sq(t[1])}, {_sq(t[2])})",
            f"replace({t[0][1]}, {_sq(t[1])}, {_sq(t[2])})",
        )
    )
    rep = st.tuples(child, st.integers(0, 3)).map(
        lambda t: (f"repeat({t[0][0]}, {t[1]})", f"repeat({t[0][1]}, {t[1]})")
    )
    return st.one_of(child, unary, sub, conc, repl, rep)


def scalar_expr():
    s = str_expr()
    length_b = s.map(lambda t: (f"length({t[0]})", f"strlen({t[1]})"))
    length_c = s.map(lambda t: (f"lengthUTF8({t[0]})", f"length({t[1]})"))
    pos = st.tuples(s, st.sampled_from(NEEDLES)).map(
        lambda t: (
            f"position({t[0][0]}, {_sq(t[1])})",
            # CH position('', needle)/(h, '') edges match instr; DuckDB
            # strpos(h, '') is 1 like CH position
            f"strpos({t[0][1]}, {_sq(t[1])})",
        )
    )
    pos_ci = st.tuples(s, st.sampled_from(NEEDLES)).map(
        lambda t: (
            f"positionCaseInsensitive({t[0][0]}, {_sq(t[1])})",
            f"strpos(lower({t[0][1]}), lower({_sq(t[1])}))",
        )
    )
    starts = st.tuples(s, st.sampled_from(NEEDLES)).map(
        lambda t: (
            f"startsWith({t[0][0]}, {_sq(t[1])})",
            f"starts_with({t[0][1]}, {_sq(t[1])})",
        )
    )
    ends = st.tuples(s, st.sampled_from(NEEDLES)).map(
        lambda t: (
            f"endsWith({t[0][0]}, {_sq(t[1])})",
            f"ends_with({t[0][1]}, {_sq(t[1])})",
        )
    )
    r1 = st.tuples(s, st.sampled_from([n for n in NEEDLES if n]),
                   st.sampled_from(["X", "_"])).map(
        lambda t: (
            f"replaceOne({t[0][0]}, {_sq(t[1])}, {_sq(t[2])})",
            # DuckDB regexp_replace without 'g' replaces the FIRST
            # match — needles here carry no regex metacharacters
            f"regexp_replace({t[0][1]}, {_sq(t[1])}, {_sq(t[2])})",
        )
    )
    rx1 = st.tuples(s, st.sampled_from(REGEXES),
                    st.sampled_from(["X", ""])).map(
        lambda t: (
            f"replaceRegexpOne({t[0][0]}, {_sq(t[1])}, {_sq(t[2])})",
            f"regexp_replace({t[0][1]}, {_sq(t[1])}, {_sq(t[2])})",
        )
    )
    rxa = st.tuples(s, st.sampled_from(REGEXES),
                    st.sampled_from(["X", ""])).map(
        lambda t: (
            f"replaceRegexpAll({t[0][0]}, {_sq(t[1])}, {_sq(t[2])})",
            f"regexp_replace({t[0][1]}, {_sq(t[1])}, {_sq(t[2])}, 'g')",
        )
    )
    ident = s
    return st.one_of(length_b, length_c, pos, pos_ci, starts, ends,
                     r1, rx1, rxa, ident)


@pytest.fixture(scope="module")
def ctx(spark):
    con = duckdb.connect()
    yield spark, con


def _canon(v):
    if isinstance(v, bool):
        return int(v)
    return v


@settings(
    max_examples=80,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(e1=scalar_expr(), e2=scalar_expr())
def test_string_fns_match_duckdb(ctx, e1, e2):
    spark, con = ctx
    ch = f"SELECT {e1[0]} AS r1, {e2[0]} AS r2"
    duck = f"SELECT {e1[1]} AS r1, {e2[1]} AS r2"
    got = [tuple(_canon(c) for c in r)
           for r in spark.sql(ch_sql_to_spark(ch)).collect()]
    want = [tuple(_canon(c) for c in r) for r in con.execute(duck).fetchall()]
    assert got == want, f"\n CH:   {ch}\n DUCK: {duck}\n spark={got}\n duck={want}"
