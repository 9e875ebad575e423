"""Property-based differential test of CH-SQL STATEMENT composition.

test_chsql_property fuzzes expressions and aggregate combinators at a
fixed statement shape; this file fuzzes the CLAUSE layer — PREWHERE,
HAVING, QUALIFY, LIMIT BY, DISTINCT ON, IN-subquery, WITH-CTE — the
chsql.py paths that stitch clauses together. Each generated statement
is rendered twice (CH dialect through ch_sql onto Spark, ANSI onto
DuckDB) and compared value-exact, rows and columns sorted.

Reference clause surface: src/Parsers/ParserSelectQuery.cpp (PREWHERE,
LIMIT BY, QUALIFY, WITH TOTALS live there)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhouse_25_5_3_75_stable_spark.chsql import ch_sql

ROWS = [
    (0, 11, "alpha"),
    (1, -7, "beta"),
    (2, 42, "gamma"),
    (3, 5, "delta"),
    (4, -1, "epsilon"),
    (0, 8, "zeta"),
    (1, 19, "eta"),
    (2, -30, "theta"),
    (3, 23, "iota"),
    (4, 2, "kappa"),
    (0, 100, "lambda"),
    (1, 55, "mu"),
    (2, 13, "nu"),
    (3, -99, "xi"),
    (4, 77, "omicron"),
]


def num_cond():
    return st.tuples(
        st.sampled_from(["k", "v"]),
        st.sampled_from(["<", "<=", "=", "!=", ">", ">="]),
        st.integers(-5, 8),
    ).map(lambda t: (f"{t[0]} {t[1]} {t[2]}",) * 2)


def ch_item():
    """(ch_expr, ansi_expr, alias) computed item pool — CH-isms on the
    left, hand-built ANSI on the right."""
    tern = st.tuples(num_cond(), st.integers(-3, 3), st.integers(-3, 3)).map(
        lambda t: (
            f"{t[0][0]} ? k + {t[1]} : v + {t[2]}",
            f"CASE WHEN {t[0][1]} THEN k + {t[1]} ELSE v + {t[2]} END",
        )
    )
    mif = st.tuples(num_cond(), num_cond(), st.integers(-3, 3)).map(
        lambda t: (
            f"multiIf({t[0][0]}, k, {t[1][0]}, v, {t[2]})",
            f"CASE WHEN {t[0][1]} THEN k WHEN {t[1][1]} THEN v ELSE {t[2]} END",
        )
    )
    iff = num_cond().map(
        lambda c: (f"if({c[0]}, k, v)", f"CASE WHEN {c[1]} THEN k ELSE v END")
    )
    ifnull = st.integers(0, 4).map(
        lambda n: (
            f"ifNull(nullIf(k, {n}), -1)",
            f"COALESCE(NULLIF(k, {n}), -1)",
        )
    )
    idiv = st.integers(1, 4).map(
        lambda n: (
            f"intDiv(v, {n})",
            f"CAST(trunc(v / {n}.0) AS BIGINT)",
        )
    )
    pos = st.sampled_from(["a", "e", "ta", "zz"]).map(
        lambda lit: (f"position(s, '{lit}')", f"instr(s, '{lit}')")
    )
    return st.one_of(tern, mif, iff, ifnull, idiv, pos)


def agg_item():
    plain = st.tuples(
        st.sampled_from(["sum", "min", "max"]), st.sampled_from(["v", "k"])
    ).map(lambda t: (f"{t[0]}({t[1]})", f"{t[0].upper()}({t[1]})"))
    cnt = st.just(("count()", "COUNT(*)"))
    cif = num_cond().map(
        lambda c: (f"countIf({c[0]})", f"COUNT(CASE WHEN {c[1]} THEN 1 END)")
    )
    sif = num_cond().map(
        lambda c: (f"sumIf(v, {c[0]})", f"SUM(CASE WHEN {c[1]} THEN v END)")
    )
    uniq = st.just(("uniqExact(s)", "COUNT(DISTINCT s)"))
    return st.one_of(plain, cnt, cif, sif, uniq)


@st.composite
def scalar_stmt(draw):
    """[PREWHERE] [WHERE] + computed items + total-order LIMIT/OFFSET."""
    it1 = draw(ch_item())
    it2 = draw(ch_item())
    ch_sel = f"k, v, s, {it1[0]} AS c1, {it2[0]} AS c2"
    an_sel = f"k, v, s, {it1[1]} AS c1, {it2[1]} AS c2"
    ch_t, an_t = "FROM stmt_t", "FROM stmt_t"
    conds = []
    if draw(st.booleans()):
        c = draw(num_cond())
        ch_t += f" PREWHERE {c[0]}"
        conds.append(c[1])
    if draw(st.booleans()):
        c = draw(num_cond())
        ch_t += f" WHERE {c[0]}"
        conds.append(c[1])
    if conds:
        an_t += " WHERE " + " AND ".join(conds)
    tail_ch = " ORDER BY k, v, s"
    tail_an = " ORDER BY k, v, s"
    if draw(st.booleans()):
        n = draw(st.integers(1, 9))
        off = draw(st.integers(0, 3))
        tail_ch += f" LIMIT {n} OFFSET {off}"
        tail_an += f" LIMIT {n} OFFSET {off}"
    return (
        f"SELECT {ch_sel} {ch_t}{tail_ch}",
        f"SELECT {an_sel} {an_t}{tail_an}",
    )


@st.composite
def agg_stmt(draw):
    a1 = draw(agg_item())
    a2 = draw(agg_item())
    ch = f"SELECT k, {a1[0]} AS a1, {a2[0]} AS a2 FROM stmt_t"
    an = f"SELECT k, {a1[1]} AS a1, {a2[1]} AS a2 FROM stmt_t"
    if draw(st.booleans()):
        c = draw(num_cond())
        ch += f" WHERE {c[0]}"
        an += f" WHERE {c[1]}"
    ch += " GROUP BY k"
    an += " GROUP BY k"
    if draw(st.booleans()):
        n = draw(st.integers(-50, 100))
        ch += f" HAVING a1 > {n}"
        an += f" HAVING a1 > {n}"
    ch += " ORDER BY k"
    an += " ORDER BY k"
    return ch, an


@st.composite
def limit_by_stmt(draw):
    n = draw(st.integers(1, 3))
    return (
        f"SELECT k, v, s FROM stmt_t ORDER BY k, v, s LIMIT {n} BY k",
        f"SELECT k, v, s FROM (SELECT *, row_number() OVER "
        f"(PARTITION BY k ORDER BY v, s) AS rn FROM stmt_t) WHERE rn <= {n}",
    )


@st.composite
def qualify_stmt(draw):
    n = draw(st.integers(1, 3))
    desc = draw(st.booleans())
    d = "DESC" if desc else "ASC"
    return (
        f"SELECT k, v, row_number() OVER (PARTITION BY k ORDER BY v {d}) AS rn "
        f"FROM stmt_t QUALIFY rn <= {n} ORDER BY k, v",
        f"SELECT k, v, row_number() OVER (PARTITION BY k ORDER BY v {d}) AS rn "
        f"FROM stmt_t QUALIFY rn <= {n} ORDER BY k, v",
    )


@st.composite
def distinct_on_stmt(draw):
    desc = draw(st.booleans())
    d = "DESC" if desc else "ASC"
    return (
        f"SELECT DISTINCT ON (k) k, v, s FROM stmt_t ORDER BY k, v {d}, s",
        f"SELECT DISTINCT ON (k) k, v, s FROM stmt_t ORDER BY k, v {d}, s",
    )


@st.composite
def in_subquery_stmt(draw):
    n = draw(st.integers(-10, 50))
    neg = draw(st.booleans())
    op = "NOT IN" if neg else "IN"
    return (
        f"SELECT k, v FROM stmt_t WHERE k {op} "
        f"(SELECT k FROM stmt_t WHERE v > {n}) ORDER BY k, v",
    ) * 2


@st.composite
def cte_stmt(draw):
    n = draw(st.integers(-50, 100))
    a = draw(agg_item())
    return (
        f"WITH c AS (SELECT k, {a[0]} AS a1 FROM stmt_t GROUP BY k) "
        f"SELECT * FROM c WHERE a1 > {n} ORDER BY k",
        f"WITH c AS (SELECT k, {a[1]} AS a1 FROM stmt_t GROUP BY k) "
        f"SELECT * FROM c WHERE a1 > {n} ORDER BY k",
    )


def _grouped(form, agg_ch, agg_an):
    """ROLLUP / CUBE / GROUPING SETS — NULL-keyed super-aggregate rows
    on both engines."""
    if form == "GROUPING SETS":
        grp = "GROUPING SETS ((k, g), (k), ())"
    else:
        grp = f"{form} (k, g)"
    ch = (f"SELECT k, v % 2 AS g, {agg_ch} AS a1 FROM stmt_t "
          f"GROUP BY {grp} ORDER BY k, g, a1")
    an = (f"SELECT k, v % 2 AS g, {agg_an} AS a1 FROM stmt_t "
          f"GROUP BY {grp} ORDER BY k, g, a1")
    return ch, an


def grouping_stmt():
    return st.tuples(
        st.sampled_from(["ROLLUP", "CUBE", "GROUPING SETS"]), agg_item()
    ).map(lambda t: _grouped(t[0], t[1][0], t[1][1]))


@st.composite
def window_stmt(draw):
    """Window frames: running/rolling aggregates plus the reference's
    frame-aware lagInFrame/leadInFrame (WindowTransform.cpp:2698). The
    DuckDB side hand-models the exact semantics: plain lag for an
    unbounded-start frame, plain lead for an unbounded-following end,
    compile-time default for a too-narrow ROWS frame, and the PEER
    guard for leadInFrame under the reference's default RANGE ...
    CURRENT ROW frame (an offset row is in frame iff it has the same
    ORDER BY values)."""
    fn = draw(st.sampled_from(["sum", "min", "max", "count"]))
    frame = draw(st.sampled_from([
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW",
        "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
    ]))
    part = draw(st.booleans())
    over = ("PARTITION BY k ORDER BY v, s" if part else "ORDER BY v, s")
    variant = draw(st.sampled_from(
        ["lag_nf", "lead_unb", "lead_default", "lag_narrow", "lead_narrow",
         None]))
    n_off = draw(st.integers(1, 3))
    items = [f"{fn}(v) OVER ({over} {frame}) AS w1"]
    an_items = [f"{fn}(v) OVER ({over} {frame}) AS w1"]
    if variant == "lag_nf":
        # default frame starts UNBOUNDED PRECEDING -> plain lag
        items.append(f"lagInFrame(v, {n_off}, 0) OVER ({over}) AS w2")
        an_items.append(f"lag(v, {n_off}, 0) OVER ({over}) AS w2")
    elif variant == "lead_unb":
        items.append(
            f"leadInFrame(v, {n_off}, 0) OVER ({over} ROWS BETWEEN "
            f"UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS w2")
        an_items.append(f"lead(v, {n_off}, 0) OVER ({over}) AS w2")
    elif variant == "lead_default":
        # peer-bounded: (v, s) is unique here, so only offset rows with
        # IDENTICAL order values survive — the guard must fire
        items.append(f"leadInFrame(v, {n_off}, -1) OVER ({over}) AS w2")
        an_items.append(
            f"CASE WHEN lead(ROW(v, s), {n_off}) OVER ({over}) "
            f"IS NOT DISTINCT FROM ROW(v, s) "
            f"THEN lead(v, {n_off}, -1) OVER ({over}) ELSE -1 END AS w2")
    elif variant == "lag_narrow":
        # frame starts 1 PRECEDING: offset > 1 is compile-time default
        items.append(
            f"lagInFrame(v, {n_off}, -1) OVER ({over} ROWS BETWEEN "
            f"1 PRECEDING AND CURRENT ROW) AS w2")
        an_items.append(
            (f"lag(v, {n_off}, -1) OVER ({over}) AS w2")
            if n_off <= 1 else "-1 AS w2")
    elif variant == "lead_narrow":
        items.append(
            f"leadInFrame(v, {n_off}, -1) OVER ({over} ROWS BETWEEN "
            f"CURRENT ROW AND 2 FOLLOWING) AS w2")
        an_items.append(
            (f"lead(v, {n_off}, -1) OVER ({over}) AS w2")
            if n_off <= 2 else "-1 AS w2")
    ch = (f"SELECT k, v, {', '.join(items)} FROM stmt_t "
          f"ORDER BY k, v, s")
    an = (f"SELECT k, v, {', '.join(an_items)} FROM stmt_t "
          f"ORDER BY k, v, s")
    return ch, an


@st.composite
def setop_stmt(draw):
    op = draw(st.sampled_from(
        ["UNION ALL", "UNION DISTINCT", "INTERSECT", "EXCEPT"]))
    c1 = draw(num_cond())
    c2 = draw(num_cond())
    q = (f"SELECT k, v FROM stmt_t WHERE {{}} {op} "
         f"SELECT k, v FROM stmt_t WHERE {{}}")
    return q.format(c1[0], c2[0]), q.format(c1[1], c2[1])


def stmt():
    return st.one_of(
        scalar_stmt(), agg_stmt(), limit_by_stmt(), qualify_stmt(),
        distinct_on_stmt(), in_subquery_stmt(), cte_stmt(),
        grouping_stmt(), window_stmt(), setop_stmt(),
    )


@pytest.fixture(scope="module")
def ctx(spark):
    pdf = pd.DataFrame(ROWS, columns=["k", "v", "s"])
    spark.createDataFrame(pdf).createOrReplaceTempView("stmt_t")
    con = duckdb.connect()
    con.register("stmt_fuzz_base", pdf)
    con.execute("CREATE VIEW stmt_t AS SELECT * FROM stmt_fuzz_base")
    yield spark, con
    spark.catalog.dropTempView("stmt_t")


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(str(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(p=stmt())
def test_chsql_statement_matches_duckdb(ctx, p):
    spark, con = ctx
    ch_text, duck_text = p
    got_df = ch_sql(spark, ch_text)
    got_cols = got_df.columns
    got_rows = [tuple(r) for r in got_df.collect()]
    res = con.execute(duck_text)
    want_cols = [d[0] for d in res.description]
    want_rows = res.fetchall()
    gc, gr = _norm(got_cols, got_rows)
    wc, wr = _norm(want_cols, want_rows)
    assert gc == wc, f"columns diverge for {ch_text!r}:\n spark={gc}\n duck={wc}"
    assert gr == wr, (
        f"values diverge for\n CH:   {ch_text}\n DUCK: {duck_text}"
        f"\n spark={gr[:8]}\n duck={wr[:8]}"
    )
