"""Property-based DIFFERENTIAL test of the KQL transpiler.

The crash-fuzz in test_kql.py proves arbitrary input never raises an
internal error; this file proves the transpiled SEMANTICS: Hypothesis
composes random multi-stage pipelines, renders each stage twice — KQL
through kql_sql onto Spark, and hand-built ANSI SQL onto DuckDB — over
the same table, and the results must agree exactly (columns compared
by name, rows sorted; ORDER-sensitive stages pin a total order first).

Both round-6 advisor findings (extend rewriting its alias inside a
string literal, in~ splitting on a comma inside a literal) were in
exactly this composition space — the generators below keep literals
containing commas, quotes, alias names, and SQL keywords in rotation.
Reference surface: src/Parsers/Kusto/ParserKQL* (dialect='kusto').
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhouse_25_5_3_75_stable_spark.kql import kql_sql

# literals chosen to attack the transpiler: top-level-looking commas,
# embedded quotes (KQL double-quoted form), column/alias names, SQL
# keywords, LIKE metacharacters, unicode
TRICKY = [
    ("'a,b'", "a,b"),
    ("'c'", "c"),
    ("'v + k'", "v + k"),          # alias names inside a literal
    ("'x y'", "x y"),
    ("'Abc'", "Abc"),
    ("'CASE WHEN s THEN'", "CASE WHEN s THEN"),
    ("'%_'", "%_"),
    ('"it\'s"', "it's"),           # double-quoted KQL -> embedded '
    ("'  '", "  "),
    ("'née,Ω'", "née,Ω"),
]


def _sq(value: str) -> str:
    """ANSI single-quote a python string for the DuckDB side."""
    return "'" + value.replace("'", "''") + "'"


# ---------------------------------------------------------------------------
# stage generators: each strategy yields (kql_fragment, wrap) where
# wrap(sql, cols) -> (new_sql, new_cols) builds the equivalent DuckDB
# subquery on top of the accumulated query
# ---------------------------------------------------------------------------


def lit_pair():
    return st.sampled_from(TRICKY)


def num_cmp():
    return st.tuples(
        st.sampled_from(["k", "v"]),
        st.sampled_from(["<", "<=", "==", "!=", ">", ">="]),
        st.integers(min_value=-3, max_value=6),
    )


@st.composite
def where_stage(draw):
    kind = draw(st.sampled_from(["num", "in", "contains", "cieq", "startswith"]))
    if kind == "num":
        c, op, n = draw(num_cmp())
        sql_op = "=" if op == "==" else op
        return (
            f"where {c} {op} {n}",
            lambda sql, cols, c=c, o=sql_op, n=n: (
                f"SELECT * FROM ({sql}) WHERE {c} {o} {n}", cols),
        )
    if kind == "in":
        vals = draw(st.lists(st.integers(0, 4), min_size=1, max_size=3))
        neg = draw(st.booleans())
        items = ", ".join(str(x) for x in vals)
        op = "!in" if neg else "in"
        sql_not = "NOT " if neg else ""
        return (
            f"where k {op} ({items})",
            lambda sql, cols, items=items, sn=sql_not: (
                f"SELECT * FROM ({sql}) WHERE k {sn}IN ({items})", cols),
        )
    kql_lit, py = draw(lit_pair())
    dl = _sq(py.lower())
    if kind == "contains":
        return (
            f"where s contains {kql_lit}",
            lambda sql, cols, dl=dl: (
                f"SELECT * FROM ({sql}) WHERE instr(lower(s), {dl}) > 0",
                cols),
        )
    if kind == "cieq":
        return (
            f"where s =~ {kql_lit}",
            lambda sql, cols, dl=dl: (
                f"SELECT * FROM ({sql}) WHERE lower(s) = {dl}", cols),
        )
    return (
        f"where s startswith {kql_lit}",
        lambda sql, cols, dl=dl: (
            f"SELECT * FROM ({sql}) WHERE starts_with(lower(s), {dl})",
            cols),
    )


@st.composite
def extend_stage(draw):
    # numeric expression or strcat; the target name sometimes collides
    # with an existing column (extend REPLACES in KQL)
    name = draw(st.sampled_from(["w", "v", "s2", "k"]))
    use_strcat = draw(st.booleans())
    if use_strcat and name in ("s2", "w"):
        kql_lit, py = draw(lit_pair())
        kexpr = f"strcat(s, {kql_lit})"
        dexpr = f"s || {_sq(py)}"
    else:
        a = draw(st.sampled_from(["k", "v"]))
        b = draw(st.sampled_from(["k", "v"]))
        op = draw(st.sampled_from(["+", "-", "*"]))
        n = draw(st.integers(-3, 3))
        kexpr = f"{a} {op} {b} + {n}" if n >= 0 else f"{a} {op} {b} - {abs(n)}"
        dexpr = kexpr

    def wrap(sql, cols, name=name, dexpr=dexpr):
        if name in cols:
            return (
                f"SELECT * EXCLUDE ({name}), {dexpr} AS {name} FROM ({sql})",
                cols,
            )
        return (f"SELECT *, {dexpr} AS {name} FROM ({sql})", cols + [name])

    def guard(cols, kexpr=kexpr):
        # every referenced column must still exist
        import re as _re
        refs = set(_re.findall(r"\b[a-z]\w*\b", kexpr)) & {"k", "v", "s", "w", "s2"}
        return refs.issubset(set(cols))

    return (f"extend {name} = {kexpr}", wrap, guard)


@st.composite
def project_stage(draw):
    away = draw(st.booleans())

    def wrap_factory(away, keep_n):
        def wrap(sql, cols):
            if away:
                drop = cols[-1]
                kept = [c for c in cols if c != drop]
                return (f"SELECT {', '.join(kept)} FROM ({sql})", kept)
            kept = cols[:keep_n] if keep_n <= len(cols) else cols
            return (f"SELECT {', '.join(kept)} FROM ({sql})", kept)
        return wrap

    keep_n = draw(st.integers(1, 3))
    return ("PROJECT_PLACEHOLDER", wrap_factory(away, keep_n), away, keep_n)


@st.composite
def summarize_stage(draw):
    named = draw(st.booleans())
    dcount = draw(st.booleans())
    if named:
        kql = "summarize c = count(), sv = sum(v) by k"
        if dcount:
            kql = "summarize c = count(), ds = dcount(s) by k"

        def wrap(sql, cols, dcount=dcount):
            agg = ("count(*) AS c, count(DISTINCT s) AS ds"
                   if dcount else "count(*) AS c, sum(v) AS sv")
            new = ["k", "c", "ds" if dcount else "sv"]
            return (f"SELECT k, {agg} FROM ({sql}) GROUP BY k", new)

        return (kql, wrap, lambda cols: {"k", "v", "s"}.issubset(set(cols))
                if not dcount else {"k", "s"}.issubset(set(cols)))
    # generated aliases: count() -> count_, sum(v) -> sum_v
    kql = "summarize count(), sum(v) by k"

    def wrap(sql, cols):
        return (
            f"SELECT k, count(*) AS count_, sum(v) AS sum_v "
            f"FROM ({sql}) GROUP BY k",
            ["k", "count_", "sum_v"],
        )

    return (kql, wrap, lambda cols: {"k", "v"}.issubset(set(cols)))


def _distinct_wrap(sql, cols):
    kept = [c for c in ("k", "s") if c in cols] or cols[:1]
    return (f"SELECT DISTINCT {', '.join(kept)} FROM ({sql})", kept)


@st.composite
def sort_take_stage(draw):
    # total order over ALL current columns makes take deterministic
    n = draw(st.integers(1, 7))
    desc = draw(st.booleans())

    def wrap(sql, cols, n=n, desc=desc):
        d = "DESC" if desc else "ASC"
        order = ", ".join(f"{c} {d}" for c in cols)
        return (f"SELECT * FROM ({sql}) ORDER BY {order} LIMIT {n}", cols)

    return (("SORTTAKE_PLACEHOLDER", wrap, n, desc))


@st.composite
def join_stage(draw):
    # T2 is UNIQUE on k, so inner/leftouter joins are deterministic
    # (innerunique's arbitrary left-row pick is contractually
    # unspecified — excluded from a differential test)
    kql_kind = draw(st.sampled_from(["inner", "leftouter"]))
    sql_kind = {"inner": "INNER JOIN", "leftouter": "LEFT JOIN"}[kql_kind]

    def wrap(sql, cols, sk=sql_kind):
        return (
            f"SELECT * FROM ({sql}) AS l {sk} "
            f"(SELECT * FROM T2) AS r USING (k)",
            cols + ["name"],
        )

    return (f"join kind={kql_kind} (T2) on k", wrap)


@st.composite
def pipeline(draw):
    cols = ["k", "v", "s"]
    kql_stages = []
    # round-7 let dimension: a scalar binding substituted inside a
    # tabular binding that then heads the pipeline (CTE route);
    # round-8 adds let-FUNCTION dimensions: a scalar macro expansion
    # (with and without the declared default) and a tabular invoke
    use_let = draw(st.sampled_from(["none", "scalar", "fn", "invoke"]))
    if use_let == "scalar":
        klo = draw(st.integers(-1, 2))
        head = (f"let klo = {klo};\n"
                "let src = T | where k >= klo;\nsrc")
        sql = f"SELECT * FROM T WHERE k >= {klo}"
    elif use_let == "fn":
        head = "let fmul = (x: long, m: long = 2) { x * m };\nT"
        sql = "SELECT * FROM T"
        if draw(st.booleans()):
            m = draw(st.integers(-2, 3))
            kql_stages.append(f"extend fv = fmul(v, {m})")
            sql = f"SELECT *, (v) * ({m}) AS fv FROM ({sql})"
        else:  # default fills the missing trailing argument
            kql_stages.append("extend fv = fmul(v)")
            sql = f"SELECT *, (v) * (2) AS fv FROM ({sql})"
        cols = cols + ["fv"]
    elif use_let == "invoke":
        klo = draw(st.integers(-1, 2))
        head = "let flt = (Tin: (*), lo: long) { Tin | where k >= lo };\nT"
        kql_stages.append(f"invoke flt({klo})")
        sql = f"SELECT * FROM T WHERE k >= {klo}"
    else:
        head = "T"
        sql = "SELECT * FROM T"
    n = draw(st.integers(1, 4))
    for _ in range(n):
        kind = draw(st.sampled_from(
            ["where", "extend", "project", "summarize", "distinct", "join"]))
        if kind == "where":
            if "s" not in cols or "k" not in cols or "v" not in cols:
                continue
            frag, wrap = draw(where_stage())
            kql_stages.append(frag)
            sql, cols = wrap(sql, cols)
        elif kind == "extend":
            frag, wrap, guard = draw(extend_stage())
            if not guard(cols):
                continue
            kql_stages.append(frag)
            sql, cols = wrap(sql, cols)
        elif kind == "project":
            _frag, wrap, away, keep_n = draw(project_stage())
            if away and len(cols) <= 1:
                continue
            if away:
                drop = cols[-1]
                kept = [c for c in cols if c != drop]
                kql_stages.append(f"project-away {drop}")
            else:
                kept = cols[:keep_n] if keep_n <= len(cols) else cols
                kql_stages.append(f"project {', '.join(kept)}")
            sql, cols = wrap(sql, cols)
        elif kind == "summarize":
            frag, wrap, guard = draw(summarize_stage())
            if not guard(cols):
                continue
            kql_stages.append(frag)
            sql, cols = wrap(sql, cols)
        elif kind == "join":
            if "k" not in cols or "name" in cols:
                continue
            frag, wrap = draw(join_stage())
            kql_stages.append(frag)
            sql, cols = wrap(sql, cols)
        else:
            kept = [c for c in ("k", "s") if c in cols] or cols[:1]
            kql_stages.append(f"distinct {', '.join(kept)}")
            sql, cols = _distinct_wrap(sql, cols)
    if draw(st.booleans()):
        _frag, wrap, nn, desc = draw(sort_take_stage())
        d = "desc" if desc else "asc"
        order = ", ".join(f"{c} {d}" for c in cols)
        kql_stages.append(f"sort by {order}")
        kql_stages.append(f"take {nn}")
        sql, cols = wrap(sql, cols)
    if not kql_stages:
        kql_stages.append("where k >= 0")
        sql = f"SELECT * FROM ({sql}) WHERE k >= 0"
    return head + " | " + " | ".join(kql_stages), sql, cols


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------

ROWS = [
    # k, v (unique), s — strings overlap TRICKY values
    (0, 11, "a,b"),
    (1, -7, "c"),
    (2, 42, "v + k"),
    (3, 5, "x y"),
    (4, -1, "Abc"),
    (0, 8, "abc"),
    (1, 19, "it's"),
    (2, -30, "CASE WHEN s THEN"),
    (3, 23, "%_"),
    (4, 2, "née,Ω"),
    (0, 100, ""),
    (1, 55, "  "),
    (2, 13, "A,B"),
    (3, -99, "a,b"),
    (4, 77, "c"),
]


DIM_ROWS = [
    (0, "zero,0"),
    (1, "one's"),
    (2, "CASE"),
    (3, "x y"),
    (4, "Ω"),
]


@pytest.fixture(scope="module")
def ctx(spark):
    pdf = pd.DataFrame(ROWS, columns=["k", "v", "s"])
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("T")
    dim = pd.DataFrame(DIM_ROWS, columns=["k", "name"])
    spark.createDataFrame(dim).createOrReplaceTempView("T2")
    con = duckdb.connect()
    con.register("kql_fuzz_base", pdf)
    con.register("kql_fuzz_dim", dim)
    con.execute("CREATE VIEW T AS SELECT * FROM kql_fuzz_base")
    con.execute("CREATE VIEW T2 AS SELECT * FROM kql_fuzz_dim")
    yield spark, con
    spark.catalog.dropTempView("T")
    spark.catalog.dropTempView("T2")


def test_join_clashing_right_column_gets_adx_suffix(ctx):
    # both sides carry a non-key `v`; ADX surfaces the right one as v1
    spark, con = ctx
    got = kql_sql(
        spark,
        "T | project k, v | join kind=inner (T | summarize v = max(v) by k) on k"
        " | where v != v1 | summarize n = count() by k | sort by k asc",
    )
    assert got.columns == ["k", "n"]
    rows = {tuple(r) for r in got.collect()}
    want = {
        tuple(r)
        for r in con.execute(
            """
            SELECT k, count(*) AS n
            FROM (SELECT l.k, l.v, r.v AS v1
                  FROM (SELECT k, v FROM T) l
                  JOIN (SELECT k, max(v) AS v FROM T GROUP BY k) r USING (k))
            WHERE v <> v1 GROUP BY k ORDER BY k
            """
        ).fetchall()
    }
    assert rows == want


def test_mv_expand_matches_duckdb(ctx):
    spark, con = ctx
    pdf = pd.DataFrame(
        {"k": [1, 2, 3], "arr": [[1, 2], [], [5]]})
    spark.createDataFrame(pdf).createOrReplaceTempView("T3")
    con.register("kql_fuzz_arr", pdf)
    con.execute("CREATE OR REPLACE VIEW T3 AS SELECT * FROM kql_fuzz_arr")
    got = kql_sql(spark, "T3 | mv-expand arr | where arr > 1").collect()
    want = con.execute(
        "SELECT * FROM (SELECT * EXCLUDE (arr), unnest(arr) AS arr FROM T3) "
        "WHERE arr > 1"
    ).fetchall()
    assert sorted(tuple(r) for r in got) == sorted(want)
    spark.catalog.dropTempView("T3")


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
def test_kql_pipeline_matches_duckdb(ctx, p):
    spark, con = ctx
    kql, duck_sql, _cols = p
    got_df = kql_sql(spark, kql)
    got_cols = got_df.columns
    got_rows = [tuple(r) for r in got_df.collect()]
    res = con.execute(duck_sql)
    want_cols = [d[0] for d in res.description]
    want_rows = res.fetchall()
    gc, gr = _norm(got_cols, got_rows)
    wc, wr = _norm(want_cols, want_rows)
    assert gc == wc, f"columns diverge for {kql!r}:\n spark={gc}\n duck={wc}"
    assert gr == wr, (
        f"values diverge for {kql!r}\n sql={duck_sql}\n spark={gr[:6]}\n duck={wr[:6]}"
    )
