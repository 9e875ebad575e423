"""Property-based differential test of the CH-SQL shim.

Hypothesis generates random expression ASTs; each is rendered twice —
ClickHouse dialect (ternary, [...] literals, CH function names, 1-based
subscripts) through the shim onto Spark, and plain ANSI onto DuckDB —
and the per-row results must agree exactly. Integer-only arithmetic, so
no float/ulp noise; NULLs enter via try_element_at out-of-bounds.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhouse_25_5_3_75_stable_spark.chsql import ch_sql_to_spark

# ---------------------------------------------------------------------------
# AST: each node renders to (ch_text, ansi_text); value domain is BIGINT
# (booleans only as comparison results fed straight into conditionals)
# ---------------------------------------------------------------------------

COLS = ("x", "y")


def lit():
    return st.integers(min_value=-9, max_value=9).map(
        lambda n: (str(n) if n >= 0 else f"({n})",) * 2
    )


def col():
    return st.sampled_from(COLS).map(lambda c: (c, c))


def leaf():
    return st.one_of(lit(), col())


def binop(children):
    return st.tuples(st.sampled_from("+-*"), children, children).map(
        lambda t: (
            f"({t[1][0]} {t[0]} {t[2][0]})",
            f"({t[1][1]} {t[0]} {t[2][1]})",
        )
    )


def cmp(children):
    return st.tuples(st.sampled_from(["<", "<=", "=", "!=", ">", ">="]), children, children).map(
        lambda t: (
            f"({t[1][0]} {t[0]} {t[2][0]})",
            f"({t[1][1]} {t[0]} {t[2][1]})",
        )
    )


def ternary(children):
    # CH C-style ternary vs ANSI CASE
    return st.tuples(cmp(children), children, children).map(
        lambda t: (
            f"({t[0][0]} ? {t[1][0]} : {t[2][0]})",
            f"(CASE WHEN {t[0][1]} THEN {t[1][1]} ELSE {t[2][1]} END)",
        )
    )


def multi_if(children):
    return st.tuples(cmp(children), children, cmp(children), children, children).map(
        lambda t: (
            f"multiIf({t[0][0]}, {t[1][0]}, {t[2][0]}, {t[3][0]}, {t[4][0]})",
            f"(CASE WHEN {t[0][1]} THEN {t[1][1]} WHEN {t[2][1]} "
            f"THEN {t[3][1]} ELSE {t[4][1]} END)",
        )
    )


def fn1(children):
    return st.tuples(st.sampled_from(["abs", "negate"]), children).map(
        lambda t: (
            f"abs({t[1][0]})" if t[0] == "abs" else f"(-({t[1][0]}))",
            f"abs({t[1][1]})" if t[0] == "abs" else f"(-({t[1][1]}))",
        )
    )


def fn2(children):
    return st.tuples(st.sampled_from(["greatest", "least"]), children, children).map(
        lambda t: (
            f"{t[0]}({t[1][0]}, {t[2][0]})",
            f"{t[0]}({t[1][1]}, {t[2][1]})",
        )
    )


def intdiv(children):
    # CH intDiv truncates toward zero (DivisionUtils.h C++ a/b; fixed
    # round 3 — it FLOORED before, advisor finding). DuckDB spelling:
    # trunc() of the float quotient. Divisor forced nonzero: both
    # engines raise on /0 (ANSI / ILLEGAL_DIVISION).
    return st.tuples(children, children).map(
        lambda t: (
            f"intDiv({t[0][0]}, (abs({t[1][0]}) + 1))",
            f"CAST(trunc(({t[0][1]}) / (abs({t[1][1]}) + 1.0)) AS BIGINT)",
        )
    )


def array_ops(children):
    # [a, b, c][i] (1-based, NULL out of range on both engines),
    # has(), arraySum (DOUBLE on both sides, integer-valued)
    arr3 = st.tuples(children, children, children)

    def render_arr(a):
        return (
            "[" + ", ".join(x[0] for x in a) + "]",
            "[" + ", ".join(x[1] for x in a) + "]",
        )

    subscript = st.tuples(arr3, st.integers(min_value=1, max_value=4)).map(
        lambda t: (
            f"({render_arr(t[0])[0]})[{t[1]}]",
            f"({render_arr(t[0])[1]})[{t[1]}]",  # DuckDB lists are 1-based too
        )
    )
    has = st.tuples(arr3, children).map(
        lambda t: (
            f"(has({render_arr(t[0])[0]}, {t[1][0]}) ? 1 : 0)",
            f"(CASE WHEN list_contains({render_arr(t[0])[1]}, {t[1][1]}) "
            "THEN 1 ELSE 0 END)",
        )
    )
    # COALESCE on the duck side only: CH arraySum SKIPS NULL elements
    # (an all-NULL array sums to 0 — FunctionArrayAggregation), while
    # duckdb list_sum returns NULL. The literal arrays here are never
    # NULL themselves, so the 0-default matches exactly. (Found by this
    # fuzz in round 9 — all-NULL arrays arise from out-of-range
    # subscripts composed into arraySum.)
    asum = arr3.map(
        lambda a: (
            f"CAST(arraySum({render_arr(a)[0]}) AS BIGINT)",
            f"CAST(COALESCE(list_sum({render_arr(a)[1]}), 0) AS BIGINT)",
        )
    )
    return st.one_of(subscript, has, asum)


def expr():
    return st.recursive(
        leaf(),
        lambda ch: st.one_of(
            binop(ch), ternary(ch), multi_if(ch), fn1(ch), fn2(ch),
            array_ops(ch), intdiv(ch)
        ),
        max_leaves=12,
    )


@pytest.fixture(scope="module")
def ctx(spark):
    strs = ["", "a", "Hello,World", "a b c", "AAab", "comma,sep,str"]
    rows = [
        (x, y, strs[(x + 3) % len(strs)], strs[(y + 2) % len(strs)])
        for x in range(-3, 4)
        for y in (-2, 0, 3)
    ]
    spark.createDataFrame(rows, "x bigint, y bigint, s string, u string") \
        .createOrReplaceTempView("prop_t")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE prop_t AS SELECT * FROM (VALUES "
        + ", ".join(f"({x}, {y}, '{s}', '{u}')" for x, y, s, u in rows)
        + ") AS v(x, y, s, u)"
    )
    return spark, con


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(e=expr())
def test_shim_matches_duckdb(ctx, e):
    spark, con = ctx
    ch_text, ansi_text = e
    q = f"SELECT x, y, {ch_text} AS v FROM prop_t ORDER BY x, y"
    spark_rows = spark.sql(ch_sql_to_spark(q)).collect()
    duck_rows = con.execute(
        f"SELECT x, y, {ansi_text} AS v FROM prop_t ORDER BY x, y"
    ).fetchall()
    got = [(r.x, r.y, None if r.v is None else int(r.v)) for r in spark_rows]
    want = [(x, y, None if v is None else int(v)) for x, y, v in duck_rows]
    assert got == want, f"CH: {ch_text}\nANSI: {ansi_text}"


# ---------------------------------------------------------------------------
# String-expression differential fuzz (ASCII-only: CH length() counts
# bytes, Spark counts chars — identical on ASCII, which is what these
# columns hold)
# ---------------------------------------------------------------------------

SCOLS = ("s", "u")


def sleaf():
    lits = st.sampled_from(["'ab'", "'Hello World'", "''", "'x,y,z'", "'aaa'"]).map(
        lambda v: (v, v)
    )
    cols = st.sampled_from(SCOLS).map(lambda c: (c, c))
    return st.one_of(lits, cols)


def sop(children):
    concat = st.tuples(children, children).map(
        lambda t: (f"concat({t[0][0]}, {t[1][0]})", f"({t[0][1]} || {t[1][1]})")
    )
    lower = children.map(lambda a: (f"lower({a[0]})", f"lower({a[1]})"))
    upper = children.map(lambda a: (f"upper({a[0]})", f"upper({a[1]})"))
    substr = st.tuples(children, st.integers(1, 4), st.integers(1, 4)).map(
        lambda t: (
            f"substring({t[0][0]}, {t[1]}, {t[2]})",
            f"substring({t[0][1]}, {t[1]}, {t[2]})",
        )
    )
    replace_all = children.map(
        lambda a: (f"replaceAll({a[0]}, 'a', 'z')", f"replace({a[1]}, 'a', 'z')")
    )
    trimboth = children.map(lambda a: (f"trimBoth({a[0]})", f"trim({a[1]})"))
    return st.one_of(concat, lower, upper, substr, replace_all, trimboth)


def sexpr():
    return st.recursive(sleaf(), sop, max_leaves=6)


def snum(children):
    # string -> integer bridges: length, position, countEqual on split
    length = children.map(lambda a: (f"length({a[0]})", f"length({a[1]})"))
    pos = st.tuples(children, st.sampled_from(["'a'", "'l'", "'zz'"])).map(
        lambda t: (
            f"position({t[0][0]}, {t[1]})",
            f"CAST(COALESCE(NULLIF(instr({t[0][1]}, {t[1]}), 0), 0) AS BIGINT)",
        )
    )
    nsplit = children.map(
        lambda a: (
            f"length(splitByChar(',', {a[0]}))",
            f"len(string_split({a[1]}, ','))",
        )
    )
    return st.one_of(length, pos, nsplit)


@settings(
    max_examples=50,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(e=st.one_of(sexpr(), snum(sexpr())))
def test_string_shim_matches_duckdb(ctx, e):
    spark, con = ctx
    ch_text, ansi_text = e
    q = f"SELECT x, y, {ch_text} AS v FROM prop_t ORDER BY x, y"
    got = [(r.x, r.y, str(r.v)) for r in spark.sql(ch_sql_to_spark(q)).collect()]
    want = [
        (x, y, str(v))
        for x, y, v in con.execute(
            f"SELECT x, y, {ansi_text} AS v FROM prop_t ORDER BY x, y"
        ).fetchall()
    ]
    assert got == want, f"CH: {ch_text}\nANSI: {ansi_text}"


# ---------------------------------------------------------------------------
# Date/time differential fuzz — timestamps only (CH add* preserves
# time-of-day; the shim uses timestampadd for exactly that reason)
# ---------------------------------------------------------------------------


def tleaf():
    lits = st.sampled_from([
        "TIMESTAMP '2024-03-05 10:11:12'",
        "TIMESTAMP '1999-12-31 23:59:59'",
        "TIMESTAMP '2020-02-29 00:00:00'",
    ]).map(lambda v: (v, v))
    return st.one_of(lits, st.just(("ts", "ts")))


def top(children):
    units = {
        "addDays": "DAY", "addHours": "HOUR", "addMinutes": "MINUTE",
        "addMonths": "MONTH", "addYears": "YEAR", "subtractDays": "DAY",
        "subtractHours": "HOUR",
    }

    def render(t):
        name, n, (ch_a, an_a) = t
        u = units[name]
        sign = "-" if name.startswith("subtract") else "+"
        return (
            f"{name}({ch_a}, {n})",
            f"({an_a} {sign} INTERVAL {n} {u})",
        )

    shift = st.tuples(
        st.sampled_from(sorted(units)), st.integers(0, 40), children
    ).map(render)
    trunc = st.tuples(st.sampled_from(["toStartOfDay", "toStartOfHour",
                                       "toStartOfMonth", "toStartOfYear"]), children).map(
        lambda t: (
            f"{t[0]}({t[1][0]})",
            {
                # CAST: DuckDB date_trunc('day'/'month'/'year') yields
                # DATE; Spark (like CH toStartOfDay) yields TIMESTAMP
                "toStartOfDay": f"CAST(date_trunc('day', {t[1][1]}) AS TIMESTAMP)",
                "toStartOfHour": f"date_trunc('hour', {t[1][1]})",
                "toStartOfMonth": f"CAST(date_trunc('month', {t[1][1]}) AS TIMESTAMP)",
                "toStartOfYear": f"CAST(date_trunc('year', {t[1][1]}) AS TIMESTAMP)",
            }[t[0]],
        )
    )
    return st.one_of(shift, trunc)


def tnum(children):
    parts = st.tuples(
        st.sampled_from(["toYear", "toMonth", "toDayOfMonth", "toHour",
                         "toMinute", "toSecond", "toQuarter"]),
        children,
    ).map(
        lambda t: (
            f"{t[0]}({t[1][0]})",
            {
                "toYear": "year", "toMonth": "month", "toDayOfMonth": "day",
                "toHour": "hour", "toMinute": "minute", "toSecond": "second",
                "toQuarter": "quarter",
            }[t[0]]
            + f"({t[1][1]})",
        )
    )
    return parts


@settings(
    max_examples=50,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(e=st.one_of(st.recursive(tleaf(), top, max_leaves=5),
                   tnum(st.recursive(tleaf(), top, max_leaves=4))))
def test_datetime_shim_matches_duckdb(ctx2, e):
    spark, con = ctx2
    ch_text, ansi_text = e
    q = f"SELECT k, {ch_text} AS v FROM prop_ts ORDER BY k"
    got = [(r.k, str(r.v)) for r in spark.sql(ch_sql_to_spark(q)).collect()]
    want = [
        (k, str(v))
        for k, v in con.execute(
            f"SELECT k, {ansi_text} AS v FROM prop_ts ORDER BY k"
        ).fetchall()
    ]
    assert got == want, f"CH: {ch_text}\nANSI: {ansi_text}"


@pytest.fixture(scope="module")
def ctx2(spark):
    stamps = [
        "2024-03-05 10:11:12", "1999-12-31 23:59:59", "2020-02-29 13:00:01",
        "2024-01-01 00:00:00", "1970-01-01 00:00:01",
    ]
    rows = [(i, s) for i, s in enumerate(stamps)]
    spark.createDataFrame(rows, "k int, raw string").selectExpr(
        "k", "CAST(raw AS TIMESTAMP) AS ts"
    ).createOrReplaceTempView("prop_ts")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE prop_ts AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, TIMESTAMP '{s}')" for i, s in rows)
        + ") AS v(k, ts)"
    )
    return spark, con


# ---------------------------------------------------------------------------
# Aggregate/combinator differential fuzz: GROUP BY with -If combinators
# and uniqExact (integer domain — exact in both engines)
# ---------------------------------------------------------------------------


def agg_node(children):
    cond = cmp(children)
    count_if = cond.map(
        lambda c: (
            f"countIf({c[0]})",
            f"COUNT(CASE WHEN {c[1]} THEN 1 END)",
        )
    )
    sum_if = st.tuples(children, cond).map(
        lambda t: (
            f"sumIf({t[0][0]}, {t[1][0]})",
            f"SUM(CASE WHEN {t[1][1]} THEN {t[0][1]} END)",
        )
    )
    min_if = st.tuples(children, cond).map(
        lambda t: (
            f"minIf({t[0][0]}, {t[1][0]})",
            f"MIN(CASE WHEN {t[1][1]} THEN {t[0][1]} END)",
        )
    )
    max_if = st.tuples(children, cond).map(
        lambda t: (
            f"maxIf({t[0][0]}, {t[1][0]})",
            f"MAX(CASE WHEN {t[1][1]} THEN {t[0][1]} END)",
        )
    )
    uniq_exact = children.map(
        lambda a: (f"uniqExact({a[0]})", f"COUNT(DISTINCT {a[1]})")
    )
    plain = st.tuples(st.sampled_from(["sum", "min", "max", "count"]), children).map(
        lambda t: (f"{t[0]}({t[1][0]})", f"{t[0].upper()}({t[1][1]})")
    )
    return st.one_of(count_if, sum_if, min_if, max_if, uniq_exact, plain)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(e=agg_node(expr()))
def test_agg_shim_matches_duckdb(ctx, e):
    spark, con = ctx
    ch_text, ansi_text = e
    q = (
        f"SELECT x % 3 AS g, {ch_text} AS v FROM prop_t "
        "GROUP BY x % 3 ORDER BY g"
    )
    aq = (
        f"SELECT x % 3 AS g, {ansi_text} AS v FROM prop_t "
        "GROUP BY x % 3 ORDER BY g"
    )
    got = [(r.g, None if r.v is None else int(r.v))
           for r in spark.sql(ch_sql_to_spark(q)).collect()]
    want = [(g, None if v is None else int(v))
            for g, v in con.execute(aq).fetchall()]
    assert got == want, f"CH: {ch_text}\nANSI: {ansi_text}"


# ---------------------------------------------------------------------------
# Parser robustness fuzz (reference src/Parsers/fuzzers/
# select_parser_fuzzer.cpp analogue): arbitrary input must either
# translate or raise ChSqlError/ValueError — never crash with an
# internal error (IndexError, RecursionError, ...)
# ---------------------------------------------------------------------------

from clickhouse_25_5_3_75_stable_spark.chsql import ChSqlError  # noqa: E402


@settings(max_examples=300, deadline=None)
@given(
    s=st.text(
        alphabet="SELECTFROMWHER()[]{}?:,.*+-<>=' abcxyz0123456789\n\t`\"\\",
        min_size=0,
        max_size=120,
    )
)
def test_transpiler_never_crashes(s):
    try:
        ch_sql_to_spark(s)
    except (ChSqlError, ValueError):
        pass  # refusals are the contract


@settings(max_examples=200, deadline=None)
@given(
    s=st.text(
        alphabet="SELECT arayMpFilthsum(),.*[]123 ?:xy'-><=",
        min_size=5,
        max_size=80,
    ).map(lambda t: "SELECT " + t)
)
def test_transpiler_never_crashes_selectish(s):
    try:
        ch_sql_to_spark(s)
    except (ChSqlError, ValueError):
        pass


# ---------------------------------------------------------------------------
# formatDateTime fuzz: random %-patterns through the shim's
# MySQL->Java conversion vs DuckDB strftime (same specifier language
# on the common subset; minute is CH %i / DuckDB %M)
# ---------------------------------------------------------------------------


def fmt_pattern():
    # (ch_spec, duck_spec) pairs with identical semantics
    specs = st.sampled_from([
        ("%Y", "%Y"), ("%m", "%m"), ("%d", "%d"), ("%H", "%H"),
        ("%S", "%S"), ("%j", "%j"), ("%i", "%M"),
    ])
    lits = st.sampled_from(["-", "/", " ", ":", "T", "."]).map(lambda c: (c, c))
    return st.lists(st.one_of(specs, lits), min_size=1, max_size=8).map(
        lambda parts: (
            "".join(p[0] for p in parts),
            "".join(p[1] for p in parts),
        )
    )


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(p=fmt_pattern())
def test_format_datetime_fuzz(ctx2, p):
    ch_fmt, duck_fmt = p
    q = (
        f"SELECT k, formatDateTime(ts, '{ch_fmt}') AS v "
        "FROM prop_ts ORDER BY k"
    )
    spark, con = ctx2
    got = [(r.k, r.v) for r in spark.sql(ch_sql_to_spark(q)).collect()]
    want = con.execute(
        f"SELECT k, strftime(ts, '{duck_fmt}') AS v FROM prop_ts ORDER BY k"
    ).fetchall()
    assert got == [tuple(w) for w in want], f"CH: {ch_fmt} DUCK: {duck_fmt}"


@settings(max_examples=200, deadline=None)
@given(
    fn=st.sampled_from(["mortonEncode", "mortonDecode", "hilbertEncode",
                        "hilbertDecode", "bitSlice", "encrypt", "decrypt",
                        "tryDecrypt", "aes_encrypt_mysql", "aes_decrypt_mysql"]),
    args=st.lists(
        st.sampled_from(["1", "(1,2)", "(1, 'a')", "x", "''", "'abc'",
                         "(x)", "NULL", "-3", "(1,2,3)", "()", ".5"]),
        min_size=0, max_size=6,
    ),
)
def test_round5_rewrites_never_crash(fn, args):
    """The round-5 structural handlers (curve/bitSlice/AES arg
    padding, _literal_int_tuple) must refuse cleanly on any arg shape,
    never die with an internal error."""
    try:
        ch_sql_to_spark(f"SELECT {fn}({', '.join(args)}) AS r")
    except (ChSqlError, ValueError):
        pass
