"""ClickHouse-SQL → Spark-SQL translation shim (SURVEY §3).

The reference's query lifecycle (parse → analyze → plan → execute,
/root/reference/src/Interpreters/executeQuery.cpp:963) is Catalyst's
job in Spark; the piece a migrating user actually needs is the DIALECT:
ClickHouse SQL text with its non-standard clauses and function names
(/root/reference/src/Parsers/ParserSelectQuery.cpp keywords: PREWHERE,
QUALIFY, LIMIT..BY, WITH TOTALS, FORMAT, SETTINGS) run unchanged.

This module is a token-level transpiler for the pragmatic subset:

  clauses   PREWHERE → WHERE conjunct; QUALIFY → wrapping subquery
            filter; LIMIT n BY cols → row_number window wrap;
            FORMAT/SETTINGS suffixes stripped
  casts     toInt*/toFloat*/toString/toDate/toDateTime[OrNull/OrZero]
            → CAST / try_cast / coalesce(try_cast, 0)
  renames   1:1 function renames (toYear→year, uniq→
            approx_count_distinct, arrayJoin→explode, ...)
  parametric  quantile(p)(x) → percentile_approx(x, p),
            quantiles(..)(x) → percentile_approx(x, array(..))
  combinators sumIf/countIf/avgIf/minIf/maxIf → agg(CASE WHEN)

Unsupported constructs raise ``ChSqlError`` with the construct name —
never silently mistranslate. Full coverage of exotic clauses lives in
the DataFrame builders (operators/); this shim is the SQL front door.
"""

from __future__ import annotations

import re

__all__ = ["ch_sql_to_spark", "ch_sql", "ChSqlError"]


class ChSqlError(ValueError):
    """A ClickHouse construct this shim refuses to guess about."""


# ---------------------------------------------------------------------------
# Tokenizer: comments dropped; strings/backtick-idents kept opaque.
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<lcomment>--[^\n]*)
  | (?P<bcomment>/\*.*?\*/)
  | (?P<string>'(?:[^'\\]|\\.|'')*')
  | (?P<bident>`(?:[^`]|``)*`)
  | (?P<number>\d+(?:\.\d*)?(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>==|!=|<>|<=|>=|\|\||->|::|[-+*/%(),.<>=\[\]?:])
    """,
    re.VERBOSE | re.DOTALL,
)


def _tokenize(sql: str) -> list[str]:
    out: list[str] = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            raise ChSqlError(f"cannot tokenize at: {sql[pos:pos + 30]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "lcomment", "bcomment"):
            continue
        out.append(m.group())
    return out


def _is_name(tok: str, *names: str) -> bool:
    return tok.upper() in names


# ---------------------------------------------------------------------------
# Rewrite tables
# ---------------------------------------------------------------------------

# 1:1 renames (same arity & argument semantics).
_RENAMES = {
    "toyear": "year",
    "tomonth": "month",
    "todayofmonth": "day",
    "todayofyear": "dayofyear",
    "tohour": "hour",
    "tominute": "minute",
    "tosecond": "second",
    "toquarter": "quarter",
    "tounixtimestamp": "unix_timestamp",
    "touuid": "string",
    "uniq": "approx_count_distinct",
    "uniqhll12": "approx_count_distinct",
    "uniqcombined": "approx_count_distinct",
    "uniqcombined64": "approx_count_distinct",
    "any": "any_value",
    "anylast": "last_value",
    "argmin": "min_by",
    "argmax": "max_by",
    "grouparray": "collect_list",
    "groupuniqarray": "collect_set",
    "arrayjoin": "explode",
    "lcase": "lower",
    "ucase": "upper",
    "mid": "substring",
    "substr": "substring",
    "position": "locate",
    "lengthutf8": "char_length",
    "match": "rlike",
    "multiif": "case_when__",  # handled structurally below
    "empty": "empty__",
    "notempty": "notempty__",
    "ifnull": "ifnull",
    "assumenotnull": "assert_true__nocover",  # refuse below
    "intdiv": "div__",
    "modulo": "pmod__nocover",
    "plus": "plus__nocover",
    "today": "current_date",
    "yesterday": "yesterday__",
    "now": "current_timestamp",
    "rand": "rand",
    "cityhash64": "xxhash64",
    "siphash64": "xxhash64",
    "farmhash64": "xxhash64",
    "halfmd5": "xxhash64",
    "tostartofday": "tostartofday__",
    "tostartofmonth": "tostartofmonth__",
    "tostartofweek": "tostartofweek__",
    "tostartofquarter": "tostartofquarter__",
    "tostartofyear": "tostartofyear__",
    "tostartofhour": "tostartofhour__",
    "tostartofminute": "tostartofminute__",
    "datediff": "datediff",
    "concatwithseparator": "concat_ws",
    "splitbychar": "splitbychar__",
    "splitbystring": "splitbystring__",
    "range": "range__",
    "arrayenumerate": "arrayenumerate__",
}

# CAST targets for the to<Type>[OrNull|OrZero] conversion family
# (reference src/Functions/FunctionsConversion.cpp).
_CAST_TYPES = {
    "toint8": ("TINYINT", "0"),
    "toint16": ("SMALLINT", "0"),
    "toint32": ("INT", "0"),
    "toint64": ("BIGINT", "0"),
    "touint8": ("SMALLINT", "0"),
    "touint16": ("INT", "0"),
    "touint32": ("BIGINT", "0"),
    "touint64": ("BIGINT", "0"),
    "tofloat32": ("FLOAT", "0.0"),
    "tofloat64": ("DOUBLE", "0.0"),
    "tostring": ("STRING", "''"),
    "todate": ("DATE", "DATE'1970-01-01'"),
    "todate32": ("DATE", "DATE'1970-01-01'"),
    "todatetime": ("TIMESTAMP", "TIMESTAMP'1970-01-01 00:00:00'"),
    "todatetime64": ("TIMESTAMP", "TIMESTAMP'1970-01-01 00:00:00'"),
    "todecimal64": ("DECIMAL(18,6)", "0"),
    "todecimal128": ("DECIMAL(38,10)", "0"),
}

# date_trunc spellings for toStartOf* rewrites
_TRUNC_UNit = {
    "tostartofday__": "day",
    "tostartofmonth__": "month",
    "tostartofweek__": "week",
    "tostartofquarter__": "quarter",
    "tostartofyear__": "year",
    "tostartofhour__": "hour",
    "tostartofminute__": "minute",
}

# -If combinator bases (single value arg + condition)
_IF_COMBINATORS = {
    "sumif": "sum",
    "avgif": "avg",
    "minif": "min",
    "maxif": "max",
    "countif": "count",
}

# parametric aggregates f(params)(args)
_PARAMETRIC = {"quantile", "quantiles", "median"}

_REFUSED = {
    "topk",
    "sequencematch",
    "sequencecount",
    "windowfunnel",
    "retention",
    "assumenotnull",
    "dictget",
}


# ---------------------------------------------------------------------------
# Clause-level pass (paren-depth-aware keyword scan)
# ---------------------------------------------------------------------------


def _find_clauses(toks: list[str]) -> dict[str, int]:
    """Top-level positions of clause starters (depth 0 only)."""
    pos: dict[str, int] = {}
    depth = 0
    i = 0
    while i < len(toks):
        tk = toks[i]
        if tk == "(":
            depth += 1
        elif tk == ")":
            depth -= 1
        elif depth == 0:
            up = tk.upper()
            if up in ("PREWHERE", "WHERE", "QUALIFY", "FORMAT", "SETTINGS", "LIMIT"):
                pos.setdefault(up + f"@{i}", i)
            elif up == "GROUP" or up == "ORDER":
                pos.setdefault(up + f"@{i}", i)
        i += 1
    return pos


def _clause_bounds(toks: list[str], start: int) -> int:
    """End index (exclusive) of a clause starting at `start`."""
    stoppers = {
        "WHERE",
        "PREWHERE",
        "GROUP",
        "HAVING",
        "QUALIFY",
        "WINDOW",
        "ORDER",
        "LIMIT",
        "OFFSET",
        "FORMAT",
        "SETTINGS",
        "UNION",
        "INTERSECT",
        "EXCEPT",
    }
    depth = 0
    i = start + 1
    while i < len(toks):
        tk = toks[i]
        if tk == "(":
            depth += 1
        elif tk == ")":
            if depth == 0:
                return i
            depth -= 1
        elif depth == 0 and tk.upper() in stoppers:
            return i
        i += 1
    return len(toks)


def _strip_suffix_clauses(toks: list[str]) -> list[str]:
    """Drop top-level FORMAT <name> and SETTINGS k=v[, ...] suffixes."""
    out = list(toks)
    for kw in ("FORMAT", "SETTINGS"):
        depth = 0
        for i, tk in enumerate(out):
            if tk == "(":
                depth += 1
            elif tk == ")":
                depth -= 1
            elif depth == 0 and tk.upper() == kw:
                out = out[:i]
                break
    return out


def _rewrite_prewhere(toks: list[str]) -> list[str]:
    """PREWHERE p [WHERE w] → WHERE (p) AND (w) — the reference runs
    PREWHERE as an early filter (MergeTreeWhereOptimizer.h:26); Spark's
    parquet pushdown does that automatically once it's a WHERE."""
    depth = 0
    pre_i = -1
    for i, tk in enumerate(toks):
        if tk == "(":
            depth += 1
        elif tk == ")":
            depth -= 1
        elif depth == 0 and tk.upper() == "PREWHERE":
            pre_i = i
            break
    if pre_i < 0:
        return toks
    pre_end = _clause_bounds(toks, pre_i)
    pred = toks[pre_i + 1 : pre_end]
    rest = toks[:pre_i] + toks[pre_end:]
    # find a top-level WHERE in the remainder
    depth = 0
    for i, tk in enumerate(rest):
        if tk == "(":
            depth += 1
        elif tk == ")":
            depth -= 1
        elif depth == 0 and tk.upper() == "WHERE":
            w_end = _clause_bounds(rest, i)
            wpred = rest[i + 1 : w_end]
            return (
                rest[:i]
                + ["WHERE", "("]
                + pred
                + [")", "AND", "("]
                + wpred
                + [")"]
                + rest[w_end:]
            )
    return toks[:pre_i] + ["WHERE"] + pred + toks[pre_end:]


def _rewrite_qualify(toks: list[str]) -> list[str]:
    """... QUALIFY pred [ORDER BY ...] [LIMIT ...] →
    SELECT * FROM ( ...select-without-qualify... ) WHERE pred [...]
    (reference parses QUALIFY at ParserSelectQuery.cpp:298; Spark has
    no QUALIFY — the window alias must appear in the SELECT list)."""
    depth = 0
    q_i = -1
    for i, tk in enumerate(toks):
        if tk == "(":
            depth += 1
        elif tk == ")":
            depth -= 1
        elif depth == 0 and tk.upper() == "QUALIFY":
            q_i = i
            break
    if q_i < 0:
        return toks
    q_end = _clause_bounds(toks, q_i)
    pred = toks[q_i + 1 : q_end]
    inner = toks[:q_i]
    tail = toks[q_end:]
    return (
        ["SELECT", "*", "FROM", "("]
        + inner
        + [")", "__q", "WHERE"]
        + pred
        + tail
    )


def _rewrite_with_totals(toks: list[str]) -> list[str]:
    """``GROUP BY k1, k2 WITH TOTALS`` → ``GROUP BY GROUPING SETS
    ((k1, k2), ())`` (reference TotalsHavingStep.h:12: the totals row
    is the grand aggregate over all rows — exactly the empty grouping
    set; its key columns come back NULL, matching the reference's
    totals row representation here)."""
    out: list[str] = []
    i = 0
    while i < len(toks):
        if (
            toks[i].upper() == "GROUP"
            and i + 1 < len(toks)
            and toks[i + 1].upper() == "BY"
        ):
            # collect the key list up to WITH TOTALS / next clause
            j = i + 2
            depth = 0
            keys: list[str] = []
            stops = {"HAVING", "ORDER", "LIMIT", "OFFSET", "FORMAT",
                     "SETTINGS", "UNION", "QUALIFY", "WINDOW", "INTERSECT", "EXCEPT"}
            totals_at = -1
            while j < len(toks):
                tk = toks[j]
                if tk == "(":
                    depth += 1
                elif tk == ")":
                    if depth == 0:
                        break
                    depth -= 1
                if depth == 0 and tk.upper() == "WITH" and j + 1 < len(toks) and toks[j + 1].upper() == "TOTALS":
                    totals_at = j
                    break
                if depth == 0 and tk.upper() in stops:
                    break
                keys.append(tk)
                j += 1
            if totals_at >= 0:
                out += ["GROUP", "BY", "GROUPING", "SETS", "(", "("] + keys + [")", ",", "(", ")", ")"]
                i = totals_at + 2
                continue
        out.append(toks[i])
        i += 1
    return out


def _rewrite_collate(toks: list[str]) -> list[str]:
    """``expr COLLATE 'locale'`` (reference ParserSelectQuery ORDER BY
    collation, src/Columns/Collator.h) → ``collate(expr, 'UNICODE_CI')``
    — Spark 4's native collation. Any locale maps to case-insensitive
    root-ICU order, the dominant use of the clause; the expr is the
    single token (or parenthesized group) before COLLATE."""
    out: list[str] = []
    i = 0
    while i < len(toks):
        if toks[i].upper() == "COLLATE" and out and i + 1 < len(toks):
            # pull back the preceding expr: a ")"-terminated group or one token
            if out[-1] == ")":
                depth = 0
                j = len(out) - 1
                while j >= 0:
                    if out[j] == ")":
                        depth += 1
                    elif out[j] == "(":
                        depth -= 1
                        if depth == 0:
                            break
                    j -= 1
                expr = out[j:]
                del out[j:]
            else:
                expr = [out.pop()]
            out += ["collate", "("] + expr + [",", "'UNICODE_CI'", ")"]
            i += 2  # skip COLLATE and its locale literal
            continue
        out.append(toks[i])
        i += 1
    return out


def _rewrite_limit_by(toks: list[str]) -> list[str]:
    """LIMIT n BY c1, c2 → row_number() wrap (reference
    src/Processors/QueryPlan/LimitByStep.h:8). Requires a top-level
    ORDER BY after the clause for determinism; uses it as the window
    order."""
    depth = 0
    l_i = -1
    for i, tk in enumerate(toks):
        if tk == "(":
            depth += 1
        elif tk == ")":
            depth -= 1
        elif depth == 0 and tk.upper() == "LIMIT":
            # LIMIT n BY?
            if i + 2 < len(toks) and toks[i + 2].upper() == "BY":
                l_i = i
                break
    if l_i < 0:
        return toks
    n = toks[l_i + 1]
    by_end = _clause_bounds(toks, l_i + 2)
    by_cols = toks[l_i + 3 : by_end]
    inner = toks[:l_i]
    tail = toks[by_end:]
    # window order: reuse the query's top-level ORDER BY if present
    order = ["(", "SELECT", "NULL", ")"]
    depth = 0
    for i, tk in enumerate(inner):
        if tk == "(":
            depth += 1
        elif tk == ")":
            depth -= 1
        elif depth == 0 and tk.upper() == "ORDER":
            o_end = _clause_bounds(inner, i)
            order = inner[i + 2 : o_end]
            break
    return (
        ["SELECT", "*", "EXCEPT", "(", "__rn", ")", "FROM", "(", "SELECT", "*", ",",
         "row_number", "(", ")", "OVER", "(", "PARTITION", "BY"]
        + by_cols
        + ["ORDER", "BY"]
        + order
        + [")", "AS", "__rn", "FROM", "("]
        + inner
        + [")", "__lb", ")", "__lbo", "WHERE", "__rn", "<=", n]
        + tail
    )


# ---------------------------------------------------------------------------
# Function-level pass
# ---------------------------------------------------------------------------


def _match_call(toks: list[str], i: int) -> bool:
    return (
        i + 1 < len(toks)
        and toks[i + 1] == "("
        and re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", toks[i] or "") is not None
    )


def _call_end(toks: list[str], open_i: int) -> int:
    """Index of the ')' matching toks[open_i] == '('."""
    depth = 0
    for j in range(open_i, len(toks)):
        if toks[j] == "(":
            depth += 1
        elif toks[j] == ")":
            depth -= 1
            if depth == 0:
                return j
    raise ChSqlError("unbalanced parentheses")


def _split_args(toks: list[str], open_i: int, close_i: int) -> list[list[str]]:
    args: list[list[str]] = []
    cur: list[str] = []
    depth = 0
    for j in range(open_i + 1, close_i):
        tk = toks[j]
        if tk == "(":
            depth += 1
        elif tk == ")":
            depth -= 1
        if tk == "," and depth == 0:
            args.append(cur)
            cur = []
        else:
            cur.append(tk)
    if cur or args:
        args.append(cur)
    return args


def _rewrite_functions(toks: list[str]) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(toks):
        tk = toks[i]
        low = tk.lower()
        if not _match_call(toks, i):
            out.append(tk)
            i += 1
            continue
        open_i = i + 1
        close_i = _call_end(toks, open_i)
        args = [_rewrite_functions(a) for a in _split_args(toks, open_i, close_i)]

        if low == "count" and args == [[]] or low == "count" and not args:
            out += ["count", "(", "*", ")"]
            i = close_i + 1
            continue

        if low in _REFUSED:
            raise ChSqlError(
                f"{tk}: no SQL-shim translation — use the DataFrame builder "
                f"(operators/) for this operator"
            )

        # parametric: f(params)(real args)
        if low in _PARAMETRIC and close_i + 1 < len(toks) and toks[close_i + 1] == "(":
            close2 = _call_end(toks, close_i + 1)
            real = [_rewrite_functions(a) for a in _split_args(toks, close_i + 1, close2)]
            x = real[0]
            if low in ("quantile", "median"):
                p = args[0] if low == "quantile" else [["0.5"]][0]
                out += ["percentile_approx", "("] + x + [","] + p + [")"]
            else:  # quantiles(p1, p2, ...)(x)
                out += ["percentile_approx", "(", *x, ",", "array", "("]
                for k, p in enumerate(args):
                    if k:
                        out.append(",")
                    out += p
                out += [")", ")"]
            i = close2 + 1
            continue

        if low == "median":
            out += ["percentile_approx", "(", *args[0], ",", "0.5", ")"]
            i = close_i + 1
            continue

        if low in _IF_COMBINATORS:
            base = _IF_COMBINATORS[low]
            if base == "count":
                val, cond = ["1"], args[0]
            else:
                val, cond = args[0], args[1]
            out += [base, "(", "CASE", "WHEN", *cond, "THEN", *val, "END", ")"]
            i = close_i + 1
            continue

        if low in _CAST_TYPES:
            sqlt, _zero = _CAST_TYPES[low]
            out += ["CAST", "(", *args[0], "AS", sqlt, ")"]
            i = close_i + 1
            continue
        if low.endswith("ornull") and low[:-6] in _CAST_TYPES:
            sqlt, _zero = _CAST_TYPES[low[:-6]]
            out += ["try_cast", "(", *args[0], "AS", sqlt, ")"]
            i = close_i + 1
            continue
        if low.endswith("orzero") and low[:-6] in _CAST_TYPES:
            sqlt, zero = _CAST_TYPES[low[:-6]]
            out += ["coalesce", "(", "try_cast", "(", *args[0], "AS", sqlt, ")", ",",
                    zero, ")"]
            i = close_i + 1
            continue

        new = _RENAMES.get(low)
        if new is None:
            out += [tk, "("]
            for k, a in enumerate(args):
                if k:
                    out.append(",")
                out += a
            out.append(")")
            i = close_i + 1
            continue

        # structural rewrites flagged with trailing __
        if new == "case_when__":  # multiIf(c1, v1, c2, v2, ..., else)
            out.append("CASE")
            k = 0
            while k + 1 < len(args):
                out += ["WHEN", *args[k], "THEN", *args[k + 1]]
                k += 2
            out += ["ELSE", *args[-1], "END"]
        elif new == "empty__":
            out += ["(", "length", "(", *args[0], ")", "=", "0", ")"]
        elif new == "notempty__":
            out += ["(", "length", "(", *args[0], ")", ">", "0", ")"]
        elif new == "div__":
            out += ["(", *args[0], "DIV", *args[1], ")"]
        elif new == "yesterday__":
            out += ["date_sub", "(", "current_date", "(", ")", ",", "1", ")"]
        elif new in _TRUNC_UNit:
            out += ["date_trunc", "(", f"'{_TRUNC_UNit[new]}'", ",", *args[0], ")"]
        elif new == "splitbychar__" or new == "splitbystring__":
            # CH arg order is (sep, s); Spark split(s, regex) — escape sep
            sep = args[0]
            out += ["split", "(", *args[1], ",", *_regex_quote(sep), ")"]
        elif new == "range__":
            # CH range(n) = [0..n-1]; range(a, b[, step]) end-exclusive
            # → Spark sequence() is end-INCLUSIVE, so subtract one step
            if len(args) == 1:
                out += ["sequence", "(", "0", ",", "(", *args[0], ")", "-", "1", ")"]
            elif len(args) == 2:
                out += ["sequence", "(", *args[0], ",", "(", *args[1], ")", "-", "1", ")"]
            else:
                out += [
                    "sequence", "(", *args[0], ",",
                    "(", *args[1], ")", "-", "(", *args[2], ")", ",", *args[2], ")",
                ]
        elif new == "arrayenumerate__":
            # arrayEnumerate(arr) = [1..len(arr)]
            out += ["sequence", "(", "1", ",", "size", "(", *args[0], ")", ")"]
        elif new.endswith("__nocover"):
            raise ChSqlError(f"{tk}: not translatable 1:1")
        else:
            out += [new, "("]
            for k, a in enumerate(args):
                if k:
                    out.append(",")
                out += a
            out.append(")")
        i = close_i + 1
    return out


def _regex_quote(sep_toks: list[str]) -> list[str]:
    if len(sep_toks) == 1 and sep_toks[0].startswith("'"):
        lit = sep_toks[0][1:-1]
        return ["'" + re.escape(lit).replace("\\", "\\\\") + "'"]
    return sep_toks


# ---------------------------------------------------------------------------
# SQL-lambda user functions (reference
# src/Functions/UserDefined/UserDefinedSQLFunctionFactory.h:18 —
# `CREATE FUNCTION name AS (args) -> expr`). The reference stores the
# lambda and inlines it during analysis; this shim does the same as a
# translation-time macro registry — calls expand to the parenthesized
# body with arguments substituted, BEFORE the dialect passes run, so
# the body may itself use ClickHouse functions.
# ---------------------------------------------------------------------------

_SQL_FUNCTIONS: dict[str, tuple[list[str], list[str]]] = {}


def _parse_create_function(toks: list[str]) -> bool:
    """CREATE FUNCTION name AS (p1, p2) -> body — register and return
    True; False when the statement is not a CREATE FUNCTION."""
    if len(toks) < 6 or toks[0].upper() != "CREATE" or toks[1].upper() != "FUNCTION":
        return False
    name = toks[2].lower()
    if toks[3].upper() != "AS":
        raise ChSqlError("CREATE FUNCTION: expected AS")
    i = 4
    params: list[str] = []
    if toks[i] == "(":
        close = _call_end(toks, i)
        params = [a[0] for a in _split_args(toks, i, close) if a]
        i = close + 1
    else:  # single bare parameter
        params = [toks[i]]
        i += 1
    if toks[i] != "->":
        raise ChSqlError("CREATE FUNCTION: expected ->")
    body = toks[i + 1 :]
    _SQL_FUNCTIONS[name] = (params, body)
    return True


def _expand_sql_functions(toks: list[str], depth: int = 0) -> list[str]:
    if depth > 16:
        raise ChSqlError("SQL function expansion too deep (recursive macro?)")
    out: list[str] = []
    i = 0
    changed = False
    while i < len(toks):
        tk = toks[i]
        if _match_call(toks, i) and tk.lower() in _SQL_FUNCTIONS:
            params, body = _SQL_FUNCTIONS[tk.lower()]
            close_i = _call_end(toks, i + 1)
            args = _split_args(toks, i + 1, close_i)
            if len(args) != len(params):
                raise ChSqlError(
                    f"{tk}: expects {len(params)} argument(s), got {len(args)}"
                )
            sub = {p.lower(): ["("] + a + [")"] for p, a in zip(params, args)}
            out.append("(")
            for b in body:
                out += sub.get(b.lower(), [b])
            out.append(")")
            i = close_i + 1
            changed = True
            continue
        out.append(tk)
        i += 1
    return _expand_sql_functions(out, depth + 1) if changed else out


# ---------------------------------------------------------------------------
# Entry points
# ---------------------------------------------------------------------------


def _rewrite_array_join(toks: list[str]) -> list[str]:
    """``[LEFT] ARRAY JOIN e1 [AS a1], e2 [AS a2], ...`` → LATERAL
    VIEWs (reference ArrayJoinStep.h:11; LEFT keeps rows with empty
    arrays — explode_outer semantics).

    Multi-array form iterates the arrays IN LOCKSTEP (ClickHouse zips,
    it does not cross-product), so the first array posexplodes and
    every further array is indexed by the shared position:

        LATERAL VIEW [OUTER] posexplode(e1) _aj0 AS __aj_pos, a1
        LATERAL VIEW [OUTER] explode(array(e2[__aj_pos])) _aj1 AS a2

    A bare single-token item re-binds its own column name; an
    expression-valued item without AS is an error (the old code
    derived the alias from the last token, yielding ``)``)."""
    out: list[str] = []
    i = 0
    while i < len(toks):
        is_left = (
            toks[i].upper() == "LEFT"
            and i + 2 < len(toks)
            and toks[i + 1].upper() == "ARRAY"
            and toks[i + 2].upper() == "JOIN"
        )
        is_plain = (
            toks[i].upper() == "ARRAY" and i + 1 < len(toks) and toks[i + 1].upper() == "JOIN"
        )
        if not (is_left or is_plain):
            out.append(toks[i])
            i += 1
            continue
        i += 3 if is_left else 2
        # collect items: comma-separated [expr, alias] pairs at depth 0
        stops = {"WHERE", "PREWHERE", "GROUP", "ORDER", "LIMIT", "QUALIFY",
                 "HAVING", "SETTINGS", "FORMAT", "LEFT", "INNER", "JOIN", "ARRAY"}
        items: list[tuple[list[str], str | None]] = []
        expr: list[str] = []
        alias: str | None = None
        depth = 0
        while i < len(toks):
            tk = toks[i]
            if tk == "(":
                depth += 1
            elif tk == ")":
                depth -= 1
            if depth == 0 and tk.upper() in stops:
                break
            if depth == 0 and tk == ",":
                items.append((expr, alias))
                expr, alias = [], None
                i += 1
                continue
            if depth == 0 and tk.upper() == "AS":
                alias = toks[i + 1]
                i += 2
                continue
            expr.append(tk)
            i += 1
        items.append((expr, alias))
        resolved: list[tuple[list[str], str]] = []
        for expr, alias in items:
            if alias is None:
                if len(expr) == 1 and (expr[0][:1].isalpha() or expr[0][:1] == "_"):
                    alias = expr[0]  # bare column re-binds its own name
                else:
                    raise ChSqlError(
                        "ARRAY JOIN with an expression requires an explicit "
                        f"AS alias: {' '.join(expr)}"
                    )
            resolved.append((expr, alias))
        outer = ["OUTER"] if is_left else []
        if len(resolved) == 1:
            fn = "explode_outer" if is_left else "explode"
            e, a = resolved[0]
            out += ["LATERAL", "VIEW", *outer, fn, "("] + e + [")", "_aj", "AS", a]
        else:
            e0, a0 = resolved[0]
            out += (
                ["LATERAL", "VIEW", *outer, "posexplode", "("]
                + e0
                + [")", "_aj0", "AS", "__aj_pos", ",", a0]
            )
            for k, (e, a) in enumerate(resolved[1:], start=1):
                out += (
                    ["LATERAL", "VIEW", *outer, "explode", "(", "array", "(", "("]
                    + e
                    + [")", "[", "__aj_pos", "]", ")", ")", f"_aj{k}", "AS", a]
                )
    return out


def _rewrite_date_preimage(toks: list[str]) -> list[str]:
    """``toYear(col) = 1996`` → ``col >= '1996-01-01' AND col <
    '1997-01-01'`` (reference OptimizeDateOrDateTimeConverterWithPreimage
    pass, src/Analyzer/Passes/OptimizeDateOrDateTimeConverterWithPreimagePass.cpp).
    Catalyst has no such rule, and the function form defeats parquet
    min/max pruning and partition pruning; the range form pushes down.
    Handles =, <, <=, >, >= against integer literals for toYear and
    toYYYYMM."""
    out: list[str] = []
    i = 0
    while i < len(toks):
        fn = toks[i].lower() if i < len(toks) else ""
        if fn in ("toyear", "toyyyymm") and i + 1 < len(toks) and toks[i + 1] == "(":
            close = _call_end(toks, i + 1)
            # only simple single-token column args; anything else passes through
            args = toks[i + 2 : close]
            op = toks[close + 1] if close + 1 < len(toks) else ""
            lit = toks[close + 2] if close + 2 < len(toks) else ""
            if len(args) == 1 and op in ("=", "<", "<=", ">", ">=") and lit.isdigit():
                col = args[0]
                v = int(lit)
                if fn == "toyear":
                    lo, hi = f"'{v:04d}-01-01'", f"'{v + 1:04d}-01-01'"
                else:  # toYYYYMM: v = yyyymm
                    y, m = divmod(v, 100)
                    ny, nm = (y + 1, 1) if m == 12 else (y, m + 1)
                    lo, hi = f"'{y:04d}-{m:02d}-01'", f"'{ny:04d}-{nm:02d}-01'"
                if op == "=":
                    repl = ["(", col, ">=", lo, "AND", col, "<", hi, ")"]
                elif op == "<":
                    repl = [col, "<", lo]
                elif op == "<=":
                    repl = [col, "<", hi]
                elif op == ">":
                    repl = [col, ">=", hi]
                else:  # >=
                    repl = [col, ">=", lo]
                out += repl
                i = close + 3
                continue
        out.append(toks[i])
        i += 1
    return out


_GLOBAL_FOLLOWERS = {
    "IN", "NOT", "JOIN", "LEFT", "RIGHT", "INNER", "FULL", "CROSS",
    "ANY", "ALL", "SEMI", "ANTI", "ASOF",
}

_KEYWORDISH = {
    "SELECT", "FROM", "WHERE", "PREWHERE", "GROUP", "BY", "ORDER", "HAVING",
    "QUALIFY", "LIMIT", "OFFSET", "AS", "ON", "USING", "AND", "OR", "NOT",
    "JOIN", "LEFT", "RIGHT", "INNER", "FULL", "CROSS", "UNION", "ALL",
    "DISTINCT", "WITH", ",", "(", ")", "=", "<", ">", "<=", ">=", "<>", "!=",
    "+", "-", "*", "/", ".",
}


def _strip_modifiers(toks: list[str]) -> list[str]:
    """Drop GLOBAL (shuffle/broadcast is Catalyst's call) and FINAL
    (merge-time folding is exposed via operators/mergetree.py views;
    on plain parquet views the un-folded read is the table itself).

    Context-sensitive: a bare token spelled ``final`` or ``global``
    can be a column name or alias — FINAL is stripped only when it
    directly follows a table reference (identifier or closing paren),
    GLOBAL only when immediately followed by IN / NOT / a join
    keyword."""
    out: list[str] = []
    i = 0
    while i < len(toks):
        tk = toks[i]
        up = tk.upper()
        if up == "GLOBAL":
            nxt = toks[i + 1].upper() if i + 1 < len(toks) else ""
            if nxt in _GLOBAL_FOLLOWERS:
                i += 1
                continue
        elif up == "FINAL":
            prev = out[-1] if out else ""
            prev_is_ref = prev == ")" or (
                prev not in _KEYWORDISH
                and prev.upper() not in _KEYWORDISH
                and (prev[:1].isalpha() or prev[:1] == "_")
            )
            if prev_is_ref:
                i += 1
                continue
        out.append(tk)
        i += 1
    return out


def ch_sql_to_spark(sql: str) -> str:
    """Translate a ClickHouse-dialect SELECT into Spark SQL text."""
    toks = _tokenize(sql)
    if _parse_create_function(toks):
        return "SELECT 'OK' AS created"
    toks = _expand_sql_functions(toks)
    toks = _strip_suffix_clauses(toks)
    toks = _strip_modifiers(toks)
    toks = _rewrite_prewhere(toks)
    toks = _rewrite_limit_by(toks)
    toks = _rewrite_with_totals(toks)
    toks = _rewrite_collate(toks)
    toks = _rewrite_qualify(toks)
    toks = _rewrite_array_join(toks)
    toks = _rewrite_date_preimage(toks)
    toks = _rewrite_functions(toks)
    # cosmetic join
    out = []
    for k, tk in enumerate(toks):
        if k and tk not in (",", ")", ".") and toks[k - 1] not in ("(", "."):
            out.append(" ")
        out.append(tk)
    return "".join(out)


def ch_sql(spark, sql: str, sf_dir: str | None = None):
    """Run ClickHouse-dialect SQL on Spark. If sf_dir is given, the
    testdata tables are registered as temp views first."""
    if sf_dir is not None:
        from clickhouse_25_5_3_75_stable_spark.sources.catalog import register_views

        register_views(spark, sf_dir)
    return spark.sql(ch_sql_to_spark(sql))


def ch_explain(spark, sql: str, mode: str = "PLAN") -> str:
    """EXPLAIN surface (reference src/Interpreters/
    InterpreterExplainQuery.h: EXPLAIN AST/SYNTAX/PLAN/PIPELINE/
    ESTIMATE): translate the ClickHouse SELECT and return Spark's
    corresponding explanation text.

    Mapping: AST/SYNTAX → the transpiled SQL + parsed logical plan;
    PLAN → optimized logical plan; PIPELINE → physical plan
    (formatted, the executor pipeline); ESTIMATE → plan with stats
    (cost mode)."""
    spark_sql = ch_sql_to_spark(sql)
    df = spark.sql(spark_sql)
    qe = df._jdf.queryExecution()
    m = mode.strip().upper()
    if m in ("AST", "SYNTAX"):
        return spark_sql + "\n" + qe.logical().toString()
    if m == "PLAN":
        return qe.optimizedPlan().toString()
    if m == "PIPELINE":
        return qe.explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    if m == "ESTIMATE":
        return qe.explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("cost")
        )
    raise ChSqlError(f"EXPLAIN mode {mode!r} not supported")
