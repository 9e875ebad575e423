"""Property-based DIFFERENTIAL test of the PRQL transpiler.

Same harness shape as test_kql_property: Hypothesis composes random
multi-transform PRQL pipelines, renders each twice — PRQL through
prql_sql onto Spark, and hand-built ANSI SQL onto DuckDB — over the
same table; results must agree exactly (columns compared by name, rows
sorted; take is always preceded by a total-order sort).

Reference surface: src/Interpreters/executeQuery.cpp:1051 (the
prql-compiler bridge — transpile to SQL, re-parse)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhouse_25_5_3_75_stable_spark.prql import prql_sql

# literal pool: embedded quotes, ==/&&/|| inside literals (the _expr
# stash hazard), commas, keywords, unicode
TRICKY = [
    ('"a,b"', "a,b"),
    ('"c"', "c"),
    ('"a == b"', "a == b"),
    ('"x && y"', "x && y"),
    ('"it\'s"', "it's"),
    ("'dq\"lit'", 'dq"lit'),
    ('"CASE WHEN"', "CASE WHEN"),
    ('"née,Ω"', "née,Ω"),
]


def _sq(value: str) -> str:
    return "'" + value.replace("'", "''") + "'"


@st.composite
def filter_stage(draw):
    kind = draw(st.sampled_from(["num", "str", "and"]))
    if kind == "num":
        c = draw(st.sampled_from(["k", "v"]))
        op = draw(st.sampled_from(["<", "<=", "==", "!=", ">", ">="]))
        n = draw(st.integers(-3, 6))
        sql_op = "=" if op == "==" else op
        return (
            f"filter {c} {op} {n}",
            lambda sql, cols, c=c, o=sql_op, n=n: (
                f"SELECT * FROM ({sql}) WHERE {c} {o} {n}", cols),
        )
    if kind == "str":
        lit, py = draw(lit_pair())
        neg = draw(st.booleans())
        op = "!=" if neg else "=="
        sql_op = "<>" if neg else "="
        return (
            f"filter s {op} {lit}",
            lambda sql, cols, sq=_sq(py), o=sql_op: (
                f"SELECT * FROM ({sql}) WHERE s {o} {sq}", cols),
        )
    n1 = draw(st.integers(-3, 6))
    n2 = draw(st.integers(-3, 6))
    use_or = draw(st.booleans())
    j_prql = "||" if use_or else "&&"
    j_sql = "OR" if use_or else "AND"
    return (
        f"filter (k > {n1} {j_prql} v < {n2})",
        lambda sql, cols, n1=n1, n2=n2, j=j_sql: (
            f"SELECT * FROM ({sql}) WHERE (k > {n1} {j} v < {n2})", cols),
    )


def lit_pair():
    return st.sampled_from(TRICKY)


@st.composite
def derive_stage(draw):
    name = draw(st.sampled_from(["w", "x2"]))
    a = draw(st.sampled_from(["k", "v"]))
    b = draw(st.sampled_from(["k", "v"]))
    op = draw(st.sampled_from(["+", "-", "*"]))
    n = draw(st.integers(-3, 3))
    expr = f"{a} {op} {b} + {n}" if n >= 0 else f"{a} {op} {b} - {abs(n)}"
    return (
        f"derive {{{name} = {expr}}}",
        lambda sql, cols, name=name, expr=expr: (
            f"SELECT *, {expr} AS {name} FROM ({sql})", cols + [name]),
        name,
    )


@st.composite
def select_stage(draw):
    exclude = draw(st.booleans())
    keep_n = draw(st.integers(1, 3))
    return (exclude, keep_n)


@st.composite
def group_agg_stage(draw):
    avg = draw(st.booleans())
    if avg:
        # average -> DOUBLE both sides; keep int-valued by summing then
        # NOT dividing — instead use min/max which stay integral
        kql = "group {k} (aggregate {c = count this, mv = max v})"
        agg = "count(*) AS c, max(v) AS mv"
        out = ["k", "c", "mv"]
    else:
        kql = "group {k} (aggregate {c = count this, sv = sum v})"
        agg = "count(*) AS c, sum(v) AS sv"
        out = ["k", "c", "sv"]
    return (
        kql,
        lambda sql, cols, agg=agg, out=out: (
            f"SELECT k, {agg} FROM ({sql}) GROUP BY k", out),
    )


@st.composite
def sstring_derive_stage(draw):
    """Round-7 s-string escape hatch: raw SQL with {prql} holes."""
    name = draw(st.sampled_from(["sw", "sx"]))
    a = draw(st.sampled_from(["k", "v"]))
    n = draw(st.integers(-3, 3))
    prql = f'derive {{{name} = s"CAST({{{a}}} + {{{n}}} AS BIGINT)"}}'
    expr = f"CAST({a} + {n} AS BIGINT)"
    return (
        prql,
        lambda sql, cols, expr=expr, name=name: (
            f"SELECT *, {expr} AS {name} FROM ({sql})", cols + [name]),
        name,
    )


@st.composite
def group_window_stage(draw):
    """Round-7 group-window nesting: framed running agg partitioned by
    the group keys ((k, v) pairs in ROWS are unique, so the v order is
    total and the running sum deterministic)."""
    name = "rw"
    if draw(st.booleans()):
        spec = "expanding:true"
        frame = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    else:
        m = draw(st.integers(1, 3))
        spec = f"rolling:{m}"
        frame = f"ROWS BETWEEN {m - 1} PRECEDING AND CURRENT ROW"
    prql = (
        "group {k} (\n  sort {v}\n  window "
        + spec + " (derive {" + name + " = sum v}))"
    )
    return (
        prql,
        lambda sql, cols, frame=frame, name=name: (
            f"SELECT *, sum(v) OVER (PARTITION BY k ORDER BY v ASC "
            f"{frame}) AS {name} FROM ({sql})", cols + [name]),
        name,
    )


@st.composite
def case_derive_stage(draw):
    """Round-7 case expression: arms lower to CASE WHEN."""
    name = draw(st.sampled_from(["cw", "cx"]))
    n1 = draw(st.integers(-2, 5))
    with_else = draw(st.booleans())
    arms = f'v > {n1} => "hi", k == 0 => "zero"'
    sql_arms = f"WHEN v > {n1} THEN 'hi' WHEN k = 0 THEN 'zero'"
    if with_else:
        arms += ', true => "rest"'
        sql_arms += " ELSE 'rest'"
    prql = f"derive {{{name} = case [{arms}]}}"
    expr = f"(CASE {sql_arms} END)"
    return (
        prql,
        lambda sql, cols, expr=expr, name=name: (
            f"SELECT *, {expr} AS {name} FROM ({sql})", cols + [name]),
        name,
    )


@st.composite
def pipeline(draw):
    cols = ["k", "v", "s"]
    prql_stages = ["from T"]
    sql = "SELECT * FROM T"
    # round-8 let dimension: a constant, a function applied at a
    # parenthesized call site (with/without its default), or a
    # relation variable heading the pipeline
    let_kind = draw(st.sampled_from(["none", "const", "fn", "rel"]))
    if let_kind == "const":
        cut = draw(st.integers(-2, 2))
        prql_stages = [f"let cut = {cut}", "from T", "filter k >= cut"]
        sql = f"SELECT * FROM (SELECT * FROM T) WHERE k >= ({cut})"
    elif let_kind == "fn":
        m = draw(st.integers(-2, 3))
        use_default = draw(st.booleans())
        call = "(fmul v)" if use_default else f"(fmul v {m})"
        mult = 2 if use_default else m
        prql_stages = ["let fmul = x n:2 -> x * n", "from T",
                       f"derive fv = {call}"]
        sql = f"SELECT *, (v) * ({mult}) AS fv FROM (SELECT * FROM T)"
        cols = cols + ["fv"]
    elif let_kind == "rel":
        klo = draw(st.integers(-1, 2))
        prql_stages = [f"let src = (from T | filter k >= {klo})",
                       "from src"]
        sql = (f"WITH src AS (SELECT * FROM (SELECT * FROM T) "
               f"WHERE k >= {klo}) SELECT * FROM src")
    n = draw(st.integers(1, 4))
    for _ in range(n):
        kind = draw(st.sampled_from(
            ["filter", "derive", "select", "group", "sstring", "gwindow",
             "case"]))
        if kind == "filter":
            if not {"k", "v", "s"}.issubset(set(cols)):
                continue
            frag, wrap = draw(filter_stage())
            prql_stages.append(frag)
            sql, cols = wrap(sql, cols)
        elif kind == "derive":
            frag, wrap, name = draw(derive_stage())
            if name in cols or not {"k", "v"}.issubset(set(cols)):
                continue
            prql_stages.append(frag)
            sql, cols = wrap(sql, cols)
        elif kind == "select":
            exclude, keep_n = draw(select_stage())
            if exclude:
                if len(cols) <= 1:
                    continue
                drop = cols[-1]
                prql_stages.append(f"select !{{{drop}}}")
                cols = [c for c in cols if c != drop]
                sql = f"SELECT {', '.join(cols)} FROM ({sql})"
            else:
                kept = cols[:keep_n] if keep_n <= len(cols) else cols
                prql_stages.append(f"select {{{', '.join(kept)}}}")
                cols = kept
                sql = f"SELECT {', '.join(kept)} FROM ({sql})"
        elif kind == "sstring":
            frag, wrap, name = draw(sstring_derive_stage())
            if name in cols or not {"k", "v"}.issubset(set(cols)):
                continue
            prql_stages.append(frag)
            sql, cols = wrap(sql, cols)
        elif kind == "gwindow":
            frag, wrap, name = draw(group_window_stage())
            if name in cols or not {"k", "v"}.issubset(set(cols)):
                continue
            prql_stages.append(frag)
            sql, cols = wrap(sql, cols)
        elif kind == "case":
            frag, wrap, name = draw(case_derive_stage())
            if name in cols or not {"k", "v"}.issubset(set(cols)):
                continue
            prql_stages.append(frag)
            sql, cols = wrap(sql, cols)
        else:
            if not {"k", "v"}.issubset(set(cols)):
                continue
            frag, wrap = draw(group_agg_stage())
            prql_stages.append(frag)
            sql, cols = wrap(sql, cols)
    if draw(st.booleans()):
        nn = draw(st.integers(1, 7))
        desc = draw(st.booleans())
        sign = "-" if desc else ""
        d = "DESC" if desc else "ASC"
        prql_stages.append(
            "sort {" + ", ".join(f"{sign}{c}" for c in cols) + "}")
        prql_stages.append(f"take {nn}")
        order = ", ".join(f"{c} {d}" for c in cols)
        sql = f"SELECT * FROM ({sql}) ORDER BY {order} LIMIT {nn}"
    if len(prql_stages) == 1:
        prql_stages.append("filter k >= 0")
        sql = f"SELECT * FROM ({sql}) WHERE k >= 0"
    return "\n".join(prql_stages), sql, cols


ROWS = [
    (0, 11, "a,b"),
    (1, -7, "c"),
    (2, 42, "a == b"),
    (3, 5, "x && y"),
    (4, -1, "it's"),
    (0, 8, 'dq"lit'),
    (1, 19, "CASE WHEN"),
    (2, -30, "née,Ω"),
    (3, 23, "a,b"),
    (4, 77, ""),
]


@pytest.fixture(scope="module")
def ctx(spark):
    pdf = pd.DataFrame(ROWS, columns=["k", "v", "s"])
    spark.createDataFrame(pdf).createOrReplaceTempView("T")
    con = duckdb.connect()
    con.register("prql_fuzz_base", pdf)
    con.execute("CREATE VIEW T AS SELECT * FROM prql_fuzz_base")
    yield spark, con
    spark.catalog.dropTempView("T")


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(str(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


@settings(
    max_examples=50,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(p=pipeline())
def test_prql_pipeline_matches_duckdb(ctx, p):
    spark, con = ctx
    prql, duck_sql, _cols = p
    got_df = prql_sql(spark, prql)
    got_cols = got_df.columns
    got_rows = [tuple(r) for r in got_df.collect()]
    res = con.execute(duck_sql)
    want_cols = [d[0] for d in res.description]
    want_rows = res.fetchall()
    gc, gr = _norm(got_cols, got_rows)
    wc, wr = _norm(want_cols, want_rows)
    assert gc == wc, f"columns diverge for {prql!r}:\n spark={gc}\n duck={wc}"
    assert gr == wr, (
        f"values diverge for {prql!r}\n sql={duck_sql}\n spark={gr[:6]}\n duck={wr[:6]}"
    )
