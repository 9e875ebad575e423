"""PRQL dialect subset — the reference's ``dialect = 'prql'`` surface
(src/Parsers/PRQL/ParserPRQLQuery.cpp calls the prql-compiler's
``prql_to_sql`` and re-parses the emitted SQL; this module is the
in-repo analogue: PRQL text -> SQL text -> the chsql shim).

Supported transforms (the prql-book core set):
  from <table>
  derive {x = expr, ...}            (also the single-item no-brace form)
  select {a, b = expr, ...} / select !{a, b}   (exclusion form)
  filter <expr>                     (positional: before an aggregate it
                                     is WHERE, after it filters the
                                     aggregated derived table — the
                                     staged-subquery composition gives
                                     prql's sequential semantics)
  group {k, ...} (aggregate {...})  -> GROUP BY
  group {k, ...} (sort ...; take n) -> per-group top-n via row_number
  aggregate {...}                   -> global aggregation
  sort {-a, +b} / sort a            (- prefix = DESC)
  take n / take a..b                (inclusive range -> OFFSET/LIMIT)
  join side:left <table> (==col)    (also (a == b) -> left.a = right.b)

Expression conventions: == -> =, && -> AND, || -> OR, ! -> NOT,
`a ?? b` -> coalesce, double-quoted strings -> SQL singles, aggregate
functions by space application (``sum x``, ``average y``, ``count
this``), average -> avg, stddev -> stddevSamp.

Window functions (round 6): ``group {k} (sort {...}\\n derive {...})``
lowers rank/row_number/dense_rank, lag/lead, and running
sum/min/max/average/count to SQL window functions over the group
partition in the sorted order — the prql-compiler's own lowering
shape. ``append`` lowers to UNION ALL.

``loop (pipeline)`` runs through prql_sql (runtime iteration:
base UNION ALL per-iteration results until an empty iteration — the
recursive-CTE semantics the prql-compiler emits — with checkpointed
bounded rounds).

s-strings (round 7): ``s"RAW SQL with {prql_expr} holes"`` — the
prql-book escape hatch; braces take full PRQL sub-expressions, the
rest passes through verbatim. ``group {k} (sort {o}\\n window ...
(derive {...}))`` (round 7) lowers to the same framed window with
PARTITION BY the group keys.

``case [cond => val, ...]`` (round 7) lowers to CASE WHEN (a final
``true =>`` arm becomes ELSE; unmatched rows are NULL in both).

``let`` bindings (round 8; the prql-book Variables chapter):
``let rel = (from ...)`` relation variables lower to CTEs,
``let f = p1 p2:default -> expr`` functions expand as hygienic
textual macros at ``(f a b)`` call sites (parenthesized
space-application), and ``let x = <expr>`` constants substitute at
bare uses.

Out of scope (refusals name the feature): f-strings, modules,
remove/intersect (the compiler's set-op lowering mixes
DISTINCT/anti-join semantics), recursive or multi-statement
let-functions, bare (unparenthesized) user-function application.
"""

from __future__ import annotations

import re

from clickhouse_25_5_3_75_stable_spark.chsql import ChSqlError, records_errors

_AGG_FNS = {
    "sum": "sum", "min": "min", "max": "max", "average": "avg",
    "avg": "avg", "stddev": "stddevSamp", "count_distinct": "uniqExact",
}


def _split_statements(text: str) -> list[str]:
    """Split a PRQL pipeline on newlines / `|` at paren depth 0."""
    out, cur, depth, quote, esc = [], [], 0, None, False
    for ch_ in text:
        if quote:
            cur.append(ch_)
            if esc:
                esc = False
            elif ch_ == "\\":
                esc = True
            elif ch_ == quote:
                quote = None
            continue
        if ch_ in "'\"":
            quote = ch_
            cur.append(ch_)
        elif ch_ in "([{":
            depth += 1
            cur.append(ch_)
        elif ch_ in ")]}":
            depth -= 1
            cur.append(ch_)
        elif ch_ in "\n|" and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch_)
    out.append("".join(cur).strip())
    return [s for s in out if s]


def _find_case_head(e: str) -> tuple[int, int] | None:
    """First `case [` occurring OUTSIDE string literals (round-8
    advisor: the bare re.search rewrote `case [` text INSIDE a string
    literal because _expr stashes literals after the case pass; the
    search must skip quoted regions like the bracket scanner does).
    Returns (start_of_case, index_of_bracket) or None."""
    quote, esc = None, False
    i = 0
    while i < len(e):
        c = e[i]
        if quote:
            if esc:
                esc = False
            elif c == "\\":
                esc = True
            elif c == quote:
                quote = None
            i += 1
            continue
        if c in "'\"":
            quote = c
            i += 1
            continue
        if c == "c" and (i == 0 or not (e[i - 1].isalnum() or e[i - 1] == "_")):
            m = re.match(r"case\s*\[", e[i:])
            if m:
                return i, i + m.end() - 1
        i += 1
    return None


def _case_rewrite(e: str) -> str:
    """`case [c1 => v1, c2 => v2, ...]` -> CASE WHEN (round-7; the
    prql-book case expression). A final `true => v` arm becomes ELSE;
    without one PRQL yields NULL for unmatched rows, which CASE
    already does. Arms recurse through :func:`_expr`."""
    while True:
        found = _find_case_head(e)
        if not found:
            return e
        case_start, start = found
        depth, quote, esc = 0, None, False
        end = None
        for i in range(start, len(e)):
            c = e[i]
            if quote:
                if esc:
                    esc = False
                elif c == "\\":
                    esc = True
                elif c == quote:
                    quote = None
                continue
            if c in "'\"":
                quote = c
            elif c in "([{":
                depth += 1
            elif c in ")]}":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        if end is None:
            raise ChSqlError("PRQL case: unbalanced brackets")
        arms = _tuple_items(e[start:end + 1])
        whens, else_sql = [], None
        for arm in arms:
            am = re.split(r"=>", arm, maxsplit=1)
            if len(am) != 2:
                raise ChSqlError(
                    f"PRQL case arm {arm!r}: expected `condition => value`")
            cond, val = am[0].strip(), am[1].strip()
            if cond == "true":
                else_sql = _expr(val)
            else:
                whens.append(f"WHEN {_expr(cond)} THEN {_expr(val)}")
        if not whens and else_sql is None:
            raise ChSqlError("PRQL case: no arms")
        sql = "(CASE " + " ".join(whens)
        if else_sql is not None:
            sql += f" ELSE {else_sql}"
        sql += " END)"
        e = e[:case_start] + sql + e[end + 1:]


def _expr(e: str) -> str:
    """PRQL scalar expression -> SQL text. String literals are
    extracted to placeholders FIRST so the ==/&&/||/!/?? rewrites can
    never corrupt them (review-found: `s == "a==b"` lost a '=')."""
    e = _case_rewrite(e)
    lits: list[str] = []

    def stash(m):
        body = m.group(0)
        if body.startswith('"'):
            body = "'" + body[1:-1].replace('\\"', '"').replace("'", "''") + "'"
        lits.append(body)
        return f"\x00{len(lits) - 1}\x00"

    def stash_raw(sql: str) -> str:
        lits.append(sql)
        return f"\x00{len(lits) - 1}\x00"

    # s-strings and plain literals stash in ONE left-to-right pass
    # (round-8 advisor: two passes let the s-string regex match `s"..."`
    # text INSIDE an earlier plain literal). s-string: s"RAW SQL with
    # {prql_expr} interpolations" — the prql-book escape hatch; braces
    # take a full PRQL sub-expression (recursively translated); the
    # rest passes through verbatim and is placeholder-protected so the
    # ==/&&/?? rewrites below can never touch it.
    def one_literal(m):
        if m.group(1) is not None:
            content = m.group(1).replace('\\"', '"')
            sql = re.sub(
                r"\{([^{}]+)\}", lambda im: _expr(im.group(1)), content
            )
            return stash_raw(sql)
        return stash(m)

    e = re.sub(
        r'\bs"((?:[^"\\]|\\.)*)"|"(?:[^"\\]|\\.)*"|\'(?:[^\'\\]|\\.)*\'',
        one_literal, e,
    )
    # PRQL date/time literals (prql-book: @2024-01-01, @14:30:00,
    # @2024-01-01T14:30:00) — after the literal stash so @ inside
    # strings is untouched; rendered as the engine's to* constructors
    e = re.sub(
        r"@(\d{4}-\d{2}-\d{2})T(\d{2}:\d{2}(?::\d{2})?)",
        lambda m: stash_raw(
            f"toDateTime('{m.group(1)} "
            f"{m.group(2) if m.group(2).count(':') == 2 else m.group(2) + ':00'}')"
        ),
        e,
    )
    e = re.sub(
        r"@(\d{4}-\d{2}-\d{2})",
        lambda m: stash_raw(f"toDate('{m.group(1)}')"), e,
    )
    e = re.sub(
        r"@(\d{2}:\d{2}(?::\d{2})?)",
        lambda m: stash_raw(
            "'" + (m.group(1) if m.group(1).count(":") == 2
                   else m.group(1) + ":00") + "'"
        ),
        e,
    )
    if re.search(r"\bf\s*\x00", e):
        raise ChSqlError("PRQL f-strings are out of the subset "
                         "(s-strings are supported)")
    # `a ?? b` binds tighter than comparisons: rewrite only operand
    # pairs (identifier/number/call/paren/placeholder), innermost first
    operand = r"(?:[A-Za-z_][\w.]*\([^()]*\)|[A-Za-z_][\w.]*|\d+(?:\.\d+)?|\([^()]*\)|\x00\d+\x00)"
    pat = re.compile(rf"({operand})\s*\?\?\s*({operand})")
    while True:
        e2 = pat.sub(r"coalesce(\1, \2)", e)
        if e2 == e:
            break
        e = e2
    if "??" in e:
        raise ChSqlError("PRQL ?? operands out of the subset (use parens)")
    e = e.replace("==", "=").replace("&&", " AND ").replace("||", " OR ")
    e = re.sub(r"!(?![=])", " NOT ", e)
    e = re.sub(r"\s+", " ", e).strip()
    return re.sub(r"\x00(\d+)\x00", lambda m: lits[int(m.group(1))], e)


def _tuple_items(body: str) -> list[str]:
    """Items of a {a, b = x} tuple (or the single bare item)."""
    body = body.strip()
    if body.startswith("{") and body.endswith("}"):
        body = body[1:-1]
    elif body.startswith("[") and body.endswith("]"):  # pre-0.11 form
        body = body[1:-1]
    items, cur, depth, quote, esc = [], [], 0, None, False
    for ch_ in body:
        if quote:
            cur.append(ch_)
            if esc:
                esc = False
            elif ch_ == "\\":
                esc = True
            elif ch_ == quote:
                quote = None
            continue
        if ch_ in "'\"":
            quote = ch_
            cur.append(ch_)
        elif ch_ in "([{":
            depth += 1
            cur.append(ch_)
        elif ch_ in ")]}":
            depth -= 1
            cur.append(ch_)
        elif ch_ == "," and depth == 0:
            items.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch_)
    if cur and "".join(cur).strip():
        items.append("".join(cur).strip())
    return items


def _named(item: str) -> tuple[str | None, str]:
    m = re.match(r"^([A-Za-z_]\w*)\s*=\s*(?!=)(.*)$", item, re.DOTALL)
    if m:
        return m.group(1), m.group(2).strip()
    return None, item


def _agg_expr(e: str) -> str:
    """Space-application aggregate: `sum x`, `average y`, `count this`,
    `sum (a + b)`; the parenthesized-application form `(sum x)` is the
    same call (PRQL parenthesizes applications inside tuples)."""
    e = e.strip()
    if e.startswith("(") and e.endswith(")"):
        inner = e[1:-1].strip()
        m0 = re.match(r"^([A-Za-z_]\w*)\s+", inner)
        if m0 and m0.group(1) in _AGG_FNS:
            e = inner
    m = re.match(r"^([A-Za-z_]\w*)\s+(.+)$", e.strip(), re.DOTALL)
    if m and m.group(1) in _AGG_FNS:
        arg = m.group(2).strip()
        if arg == "this":
            arg = "*"
        if arg.startswith("(") and arg.endswith(")"):
            arg = arg[1:-1]
        return f"{_AGG_FNS[m.group(1)]}({_expr(arg)})"
    if re.match(r"^count\s+this$", e.strip()):
        return "count(*)"
    if e.strip() == "count":
        return "count(*)"
    return _expr(e)


def _aggregate_items(body: str) -> list[str]:
    sel = []
    for item in _tuple_items(body):
        alias, raw = _named(item)
        expr = _agg_expr(raw)
        if alias is None:
            m = re.match(r"^([A-Za-z_]\w*)", raw)
            alias = m.group(1) if m else "agg"
        sel.append(f"{expr} AS {alias}")
    return sel


def _sort_items(body: str) -> str:
    parts = _tuple_items(body) if body.strip().startswith(("{", "[")) else [body.strip()]
    rendered = []
    for p in parts:
        direction = "ASC"
        if p.startswith("-"):
            direction, p = "DESC", p[1:]
        elif p.startswith("+"):
            p = p[1:]
        rendered.append(f"{_expr(p)} {direction}")
    return ", ".join(rendered)


def _split_top_spaces(s: str) -> list[str]:
    """Split on whitespace at depth 0 outside string literals — the
    operand splitter for PRQL space-application."""
    out, cur, depth, quote, esc = [], [], 0, None, False
    for c in s:
        if quote:
            cur.append(c)
            if esc:
                esc = False
            elif c == "\\":
                esc = True
            elif c == quote:
                quote = None
            continue
        if c in "'\"":
            quote = c
            cur.append(c)
        elif c in "([{":
            depth += 1
            cur.append(c)
        elif c in ")]}":
            depth -= 1
            cur.append(c)
        elif c.isspace() and depth == 0:
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(c)
    if cur:
        out.append("".join(cur))
    return out


def _subst_idents(s: str, mapping: dict[str, str]) -> str:
    """Replace bare identifiers (outside string literals) per mapping."""
    parts = re.split(r"('(?:[^'\\]|\\.)*'|\"(?:[^\"\\]|\\.)*\")", s)
    for i in range(0, len(parts), 2):
        for nm, repl in mapping.items():
            parts[i] = re.sub(
                rf"(?<![\w.]){re.escape(nm)}(?!\w)",
                lambda _m, _r=repl: _r, parts[i],
            )
    return "".join(parts)


def _extract_lets(stmts: list[str]):
    """Leading `let` statements (round-8; the prql-book Variables
    chapter): `let rel = (from ...)` relation variables become CTEs,
    `let f = p1 p2:default -> expr` functions become textual macros,
    `let x = <literal/expr>` constants substitute like 0-param macros.
    Returns (functions, consts, ctes, remaining_stmts)."""
    fns: dict[str, tuple[list[str], list[str | None], str]] = {}
    consts: dict[str, str] = {}
    ctes: list[tuple[str, str]] = []
    i = 0
    for i, st in enumerate(stmts):
        lm = re.match(r"^let\s+([A-Za-z_]\w*)\s*=\s*(.+)$", st, re.DOTALL)
        if not lm:
            break
        name, body = lm.group(1), lm.group(2).strip()
        if body.startswith("(") and re.match(r"^\(\s*from\b", body):
            inner = body[1:-1].strip() if body.endswith(")") else None
            if inner is None:
                raise ChSqlError(f"PRQL let {name}: unbalanced relation binding")
            # earlier constants/functions are in scope inside the binding
            ctes.append((name, prql_to_sql(
                _expand_prql_fns(inner, dict(fns), dict(consts)))))
        elif "->" in body:
            head, _, fexpr = body.partition("->")
            params, defaults = [], []
            for tok in _split_top_spaces(head):
                pname, _, dflt = tok.partition(":")
                if not re.match(r"^[A-Za-z_]\w*$", pname):
                    raise ChSqlError(
                        f"PRQL let-function {name}: parameter {tok!r} "
                        "out of the subset (bare or name:default)")
                params.append(pname)
                defaults.append(dflt or None)
            fns[name] = (params, defaults, fexpr.strip())
        else:
            consts[name] = body
    else:
        i += 1
    rest = stmts[i:]
    if not rest:
        raise ChSqlError("PRQL: a query must follow the let binding(s)")
    return fns, consts, ctes, rest


# prql-book standard library (round-8): module-qualified space
# application lowered to SQL templates. Argument order follows the
# prql convention (the piped/main operand LAST).
_PRQL_BUILTINS: dict[str, tuple[str, int]] = {
    "math.abs": ("abs({0})", 1),
    "math.floor": ("floor({0})", 1),
    "math.ceil": ("ceil({0})", 1),
    "math.sqrt": ("sqrt({0})", 1),
    "math.exp": ("exp({0})", 1),
    "math.ln": ("ln({0})", 1),
    "math.log10": ("log10({0})", 1),
    "math.round": ("round({1}, {0})", 2),   # round n_digits x
    "math.pow": ("power({0}, {1})", 2),
    "text.lower": ("lower({0})", 1),
    "text.upper": ("upper({0})", 1),
    "text.ltrim": ("ltrim({0})", 1),
    "text.rtrim": ("rtrim({0})", 1),
    "text.trim": ("trim({0})", 1),
    "text.length": ("length({0})", 1),       # chars; Spark length = chars
    "text.starts_with": ("startswith({1}, {0})", 2),
    "text.ends_with": ("endswith({1}, {0})", 2),
    "text.contains": ("contains({1}, {0})", 2),
    "text.replace": ("replace({2}, {0}, {1})", 3),
    "text.extract": ("substring({2}, {0}, {1})", 3),  # offset length s
}


def _expand_prql_fns(s: str, fns: dict, consts: dict) -> str:
    """Expand function APPLICATIONS `(f a b)` (parenthesized
    space-application, the prql-book call form) — user let-functions
    and the `math.*`/`text.*` stdlib — and bare constant uses.
    Textual macro expansion, literal-safe, depth-capped."""
    if consts:
        s = _subst_idents(s, {n: f"({v})" for n, v in consts.items()})
    if not fns and "." not in s:
        return s
    for _ in range(25):
        spans = [m.span() for m in re.finditer(
            r"'(?:[^'\\]|\\.)*'|\"(?:[^\"\\]|\\.)*\"", s)]
        changed = False
        for m in re.finditer(r"\(\s*([A-Za-z_][\w.]*)", s):
            nm = m.group(1)
            if (nm not in fns and nm not in _PRQL_BUILTINS) \
                    or any(a <= m.start() < b for a, b in spans):
                continue
            # find the matching close paren
            depth, quote, esc, close = 0, None, False, None
            for j in range(m.start(), len(s)):
                c = s[j]
                if quote:
                    if esc:
                        esc = False
                    elif c == "\\":
                        esc = True
                    elif c == quote:
                        quote = None
                    continue
                if c in "'\"":
                    quote = c
                elif c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                    if depth == 0:
                        close = j
                        break
            if close is None:
                raise ChSqlError(f"PRQL: unbalanced parens at {s[m.start():m.start() + 30]!r}")
            toks = _split_top_spaces(s[m.start() + 1:close])
            args = toks[1:]
            # `(f + 2)` is an EXPRESSION over a column f, not a call
            if args and re.match(r"^[-+*/%<>=!&|,.]", args[0]):
                continue
            if nm not in fns:  # stdlib builtin
                tmpl, arity = _PRQL_BUILTINS[nm]
                if len(args) != arity:
                    raise ChSqlError(
                        f"PRQL {nm}: takes {arity} argument(s), "
                        f"got {len(args)}")
                s = (s[:m.start()]
                     + tmpl.format(*[f"({a})" for a in args])
                     + s[close + 1:])
                changed = True
                break
            params, defaults, fexpr = fns[nm]
            if len(args) > len(params) or any(
                    d is None for d in defaults[len(args):]):
                raise ChSqlError(
                    f"PRQL function {nm}: takes {len(params)} "
                    f"argument(s), got {len(args)}")
            binding = {p: f"({a})" for p, a in zip(params, args)}
            for p, d in zip(params[len(args):], defaults[len(args):]):
                binding[p] = f"({d})"
            s = s[:m.start()] + "(" + _subst_idents(fexpr, binding) + ")" + s[close + 1:]
            changed = True
            break
        if not changed:
            return s
    raise ChSqlError("PRQL let-functions: expansion depth exceeded "
                     "(recursive functions are out of the subset)")


def prql_to_sql(text: str) -> str:
    """Transpile a PRQL pipeline into SQL text for the chsql shim."""
    stmts = _split_statements(text.strip().rstrip(";"))
    fns, consts, let_ctes, stmts = _extract_lets(stmts)
    # always run: stdlib builtins (math.*/text.*) expand with or
    # without user lets
    stmts = [_expand_prql_fns(st, fns, consts) for st in stmts]
    if stmts and re.match(r"^from_text\b", stmts[0]):
        # PRQL std `from_text` (round-9): inline csv (default) / json
        # relation literal — headers from the first line, column types
        # inferred int < float < string like the prql-compiler
        ftm = re.match(
            r'^from_text\s+(?:format:(\w+)\s+)?"""(.*?)"""\s*$',
            stmts[0], re.DOTALL,
        )
        if not ftm:
            raise ChSqlError(
                'PRQL from_text: expected `from_text [format:csv|json] '
                '""" ... """`')
        fmt = (ftm.group(1) or "csv").lower()
        body = ftm.group(2).strip("\n")
        if fmt == "csv":
            lines = [ln for ln in body.splitlines() if ln.strip()]
            if len(lines) < 2:
                raise ChSqlError("PRQL from_text csv: header + rows")
            headers = [h.strip() for h in lines[0].split(",")]
            data = [[c.strip() for c in ln.split(",")] for ln in lines[1:]]
        elif fmt == "json":
            import json as _json

            recs = [_json.loads(ln) for ln in body.splitlines()
                    if ln.strip()]
            if not recs:
                raise ChSqlError("PRQL from_text json: no rows")
            headers = list(recs[0])
            data = [[r.get(h) for h in headers] for r in recs]
        else:
            raise ChSqlError(
                f"PRQL from_text format {fmt!r}: csv/json are served")
        if any(len(r) != len(headers) for r in data):
            raise ChSqlError("PRQL from_text: ragged rows")

        def _infer(col_vals):
            if all(v is not None and re.match(r"^-?\d+$", str(v))
                   for v in col_vals):
                return "BIGINT"
            if all(v is not None
                   and re.match(r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$", str(v))
                   for v in col_vals):
                return "DOUBLE"
            return "STRING"

        col_types = [_infer([r[i] for r in data])
                     for i in range(len(headers))]

        def _cell(v, ty):
            if v is None:
                return f"CAST(NULL AS {ty})"
            if ty in ("BIGINT", "DOUBLE"):
                return f"CAST({v} AS {ty})"
            return "'" + str(v).replace("'", "''") + "'"

        rows_sql = ", ".join(
            "(" + ", ".join(_cell(v, t) for v, t in zip(r, col_types)) + ")"
            for r in data)
        acc = (f"SELECT * FROM (VALUES {rows_sql}) "
               f"AS __prql_text({', '.join(headers)})")
    elif not stmts or not re.match(r"^from\b", stmts[0]):
        raise ChSqlError("PRQL: the pipeline must start with `from <table>`")
    else:
        table = stmts[0][4:].strip()
        am = re.match(r"^([A-Za-z_]\w*)\s*=\s*([A-Za-z_]\w*)$", table)
        if am:  # from e = employees
            acc = f"SELECT * FROM {am.group(2)} AS {am.group(1)}"
        elif re.match(r"^[A-Za-z_][\w.]*$", table):
            acc = f"SELECT * FROM {table}"
        else:
            raise ChSqlError(
                f"PRQL from: expected a table name, got {table!r}")

    last_sort = None  # the established row order, consumed by `window`
    for stmt in stmts[1:]:
        sm = re.match(r"^([a-z_]+)\s*(.*)$", stmt, re.DOTALL)
        if not sm:
            raise ChSqlError(f"PRQL: cannot parse transform {stmt!r}")
        op, body = sm.group(1), sm.group(2).strip()

        if op == "filter":
            acc = f"SELECT * FROM ({acc}) WHERE {_expr(body)}"
        elif op == "derive":
            items = _tuple_items(body)
            sel = []
            for item in items:
                alias, raw = _named(item)
                if alias is None:
                    raise ChSqlError("PRQL derive items need names (x = expr)")
                sel.append(f"{_expr(raw)} AS {alias}")
            acc = f"SELECT *, {', '.join(sel)} FROM ({acc})"
        elif op == "select":
            if body.startswith("!"):
                cols = ", ".join(_tuple_items(body[1:]))
                acc = f"SELECT * EXCEPT ({cols}) FROM ({acc})"
            else:
                sel = []
                for item in _tuple_items(body):
                    alias, raw = _named(item)
                    sel.append(_expr(raw) if alias is None
                               else f"{_expr(raw)} AS {alias}")
                acc = f"SELECT {', '.join(sel)} FROM ({acc})"
        elif op == "aggregate":
            acc = f"SELECT {', '.join(_aggregate_items(body))} FROM ({acc})"
        elif op == "group":
            gm = re.match(r"^(\{[^}]*\}|\[[^\]]*\]|[A-Za-z_]\w*)\s*\((.*)\)\s*$",
                          body, re.DOTALL)
            if not gm:
                raise ChSqlError("PRQL group needs: group {keys} (body)")
            keys = [_expr(k) for k in _tuple_items(gm.group(1))]
            inner = gm.group(2).strip()
            aggm = re.match(r"^aggregate\s+(.*)$", inner, re.DOTALL)
            if aggm:
                sel = keys + _aggregate_items(aggm.group(1))
                acc = (f"SELECT {', '.join(sel)} FROM ({acc}) "
                       f"GROUP BY {', '.join(keys)}")
                continue
            # group {k} (sort {-x}\n take n)        -> per-group top-n
            # group {k} (sort {-x}\n derive {...})  -> per-group window
            parts = _split_statements(inner)
            order, take_n, derive_body, window_body = None, None, None, None
            for p in parts:
                pm = re.match(r"^(sort|take|derive|window)\s+(.*)$", p,
                              re.DOTALL)
                if not pm:
                    raise ChSqlError(
                        f"PRQL group body {p!r}: subset takes aggregate, "
                        "sort+take, sort+derive (window functions), or "
                        "sort+window (framed running aggregates)")
                if pm.group(1) == "sort":
                    order = _sort_items(pm.group(2))
                elif pm.group(1) == "derive":
                    derive_body = pm.group(2)
                elif pm.group(1) == "window":
                    window_body = pm.group(2)
                else:
                    try:
                        take_n = int(pm.group(2))
                    except ValueError:
                        raise ChSqlError(
                            "PRQL group-take subset needs an integer "
                            f"(got {pm.group(2)!r})") from None
            if window_body is not None:
                # group {k} (sort {o}\n window ... (derive {...})) —
                # round-7 (previously refused): the prql-compiler
                # lowers nested group-window to the same SQL window
                # with PARTITION BY the group keys; frame spec and
                # derive subset shared with the top-level `window`
                if order is None:
                    raise ChSqlError(
                        "PRQL group window needs a preceding sort "
                        "inside the group body")
                if take_n is not None or derive_body is not None:
                    raise ChSqlError(
                        "PRQL group window composes alone (separate "
                        "group calls for take/derive)")
                frame, items = _window_spec(window_body)
                sel = [
                    f"{fn_sql} OVER (PARTITION BY {', '.join(keys)} "
                    f"ORDER BY {order} {frame}) AS {alias}"
                    for alias, fn_sql in items
                ]
                acc = f"SELECT *, {', '.join(sel)} FROM ({acc})"
                continue
            if take_n is None and derive_body is None:
                raise ChSqlError("PRQL group body needs a take or a derive")
            order = order or ", ".join(keys)
            if derive_body is not None:
                # PRQL window functions (round 6; previously refused):
                # rank/row_number/dense_rank `this`, lag/lead col [n],
                # and running aggregates over the group partition
                sel = []
                for item in _tuple_items(derive_body):
                    alias, raw = _named(item)
                    if alias is None:
                        raise ChSqlError("PRQL derive items need names (x = expr)")
                    sel.append(
                        f"{_window_fn(raw, ', '.join(keys), order)} AS {alias}"
                    )
                acc = f"SELECT *, {', '.join(sel)} FROM ({acc})"
                if take_n is not None:
                    raise ChSqlError(
                        "PRQL group subset: derive and take compose as "
                        "separate group calls")
            else:
                acc = (f"SELECT * EXCEPT (__prql_rn) FROM (SELECT *, row_number() "
                       f"OVER (PARTITION BY {', '.join(keys)} ORDER BY {order}) "
                       f"AS __prql_rn FROM ({acc})) WHERE __prql_rn <= {take_n}")
        elif op == "sort":
            last_sort = _sort_items(body)
            acc = f"SELECT * FROM ({acc}) ORDER BY {last_sort}"
        elif op == "window":
            # window rows:a..b / expanding:true / rolling:n (derive {...})
            # over the pipeline's current sort (PRQL windows follow the
            # established row order; a preceding `sort` is required)
            if last_sort is None:
                raise ChSqlError(
                    "PRQL window needs a preceding sort to define row order")
            frame, items = _window_spec(body)
            sel = [
                f"{fn_sql} OVER (ORDER BY {last_sort} {frame}) AS {alias}"
                for alias, fn_sql in items
            ]
            acc = f"SELECT *, {', '.join(sel)} FROM ({acc})"
        elif op == "take":
            rm = re.match(r"^(\d+)\.\.(\d+)$", body)
            if rm:  # inclusive range
                lo, hi = int(rm.group(1)), int(rm.group(2))
                acc = (f"SELECT * FROM ({acc}) LIMIT {hi - lo + 1} "
                       f"OFFSET {lo - 1}")
            else:
                try:
                    n = int(body)
                except ValueError:
                    raise ChSqlError(
                        f"PRQL take: expected n or a..b, got {body!r}") from None
                acc = f"SELECT * FROM ({acc}) LIMIT {n}"
        elif op == "join":
            jm = re.match(r"^(?:side\s*:\s*(\w+)\s+)?([A-Za-z_]\w*)\s*\((.*)\)\s*$",
                          body, re.DOTALL)
            if not jm:
                raise ChSqlError("PRQL join needs: join [side:left] table (cond)")
            side = (jm.group(1) or "inner").lower()
            kinds = {"inner": "INNER JOIN", "left": "LEFT JOIN",
                     "right": "RIGHT JOIN", "full": "FULL JOIN"}
            if side not in kinds:
                raise ChSqlError(f"PRQL join side {side!r} not supported")
            rtable, cond = jm.group(2), jm.group(3).strip()
            em = re.match(r"^==\s*([A-Za-z_]\w*)$", cond)
            pm = re.match(r"^([A-Za-z_][\w.]*)\s*==\s*([A-Za-z_][\w.]*)$", cond)
            if em:
                acc = (f"SELECT * FROM ({acc}) AS __prql_l {kinds[side]} "
                       f"{rtable} AS __prql_r USING ({em.group(1)})")
            elif pm:
                # whole-qualifier match only (review-found: a bare
                # substring replace mangled identifiers like myleft.a)
                # accepted qualifiers: left/this (piped input), right /
                # the joined table's own name (prql-book spells
                # `(employees.id == managers.id)` with table names)
                l = re.sub(r"^(left|this)\.", "__prql_l.", pm.group(1))
                r = re.sub(rf"^(right|that|{rtable})\.", "__prql_r.",
                           pm.group(2))
                if "." not in l:
                    l = f"__prql_l.{l}"
                if "." not in r:
                    r = f"__prql_r.{r}"
                acc = (f"SELECT * FROM ({acc}) AS __prql_l {kinds[side]} "
                       f"{rtable} AS __prql_r ON {l} = {r}")
            else:
                raise ChSqlError(
                    f"PRQL join condition {cond!r}: subset takes (==col) "
                    "or (a == b)")
        elif op == "append":
            # PRQL append = UNION ALL with the other relation
            # (prql-compiler lowers append exactly to UNION ALL)
            if not re.match(r"^[A-Za-z_][\w.]*$", body):
                raise ChSqlError(
                    "PRQL append subset takes a table name")
            acc = f"SELECT * FROM ({acc}) UNION ALL SELECT * FROM {body}"
        elif op in ("remove", "intersect"):
            raise ChSqlError(
                f"PRQL {op}: out of the subset (the compiler's lowering "
                "mixes DISTINCT/anti-join semantics; use SQL EXCEPT/"
                "INTERSECT through chsql directly)")
        else:
            hint = (" (loop executes through prql_sql, which iterates at "
                    "runtime)" if op == "loop" else "")
            raise ChSqlError(
                f"PRQL transform {op!r}: not in the implemented subset "
                "(from/derive/select/filter/group/aggregate/sort/take/join/"
                "append; window functions via group (sort + derive); "
                f"loop via prql_sql){hint}")
    if let_ctes:
        with_sql = ", ".join(f"{n} AS ({sql})" for n, sql in let_ctes)
        acc = f"WITH {with_sql} {acc}"
    return acc


def _window_spec(body: str) -> tuple[str, list[tuple[str, str]]]:
    """Parse `rows:a..b | expanding:true | rolling:n (derive {...})`
    into (ROWS frame SQL, [(alias, agg-call SQL)]) — shared by the
    top-level `window` transform and the round-7 group-window nesting."""
    wm = re.match(
        r"^(?:rows\s*:\s*(-?\d*)\.\.(-?\d*)"
        r"|expanding\s*:\s*true|rolling\s*:\s*(\d+))"
        r"\s*\(\s*derive\s+(.*)\)\s*$",
        body, re.DOTALL,
    )
    if not wm:
        raise ChSqlError(
            "PRQL window subset: window rows:a..b | expanding:true "
            "| rolling:n (derive {...})")
    if wm.group(3) is not None:  # rolling:n
        lo_b = f"{int(wm.group(3)) - 1} PRECEDING"
        hi_b = "CURRENT ROW"
    elif wm.group(1) is None and wm.group(2) is None:  # expanding
        lo_b, hi_b = "UNBOUNDED PRECEDING", "CURRENT ROW"
    else:
        def bound(tok, default):
            if tok in ("", None):
                return default
            n = int(tok)
            if n == 0:
                return "CURRENT ROW"
            return (f"{-n} PRECEDING" if n < 0 else f"{n} FOLLOWING")
        lo_b = bound(wm.group(1), "UNBOUNDED PRECEDING")
        hi_b = bound(wm.group(2), "UNBOUNDED FOLLOWING")
    frame = f"ROWS BETWEEN {lo_b} AND {hi_b}"
    items: list[tuple[str, str]] = []
    for item in _tuple_items(wm.group(4)):
        alias, raw = _named(item)
        if alias is None:
            raise ChSqlError("PRQL derive items need names (x = expr)")
        am = re.match(r"^(sum|min|max|average|count)\s+([A-Za-z_]\w*)$",
                      raw.strip())
        if not am:
            raise ChSqlError(
                f"PRQL window derive {raw!r}: subset takes "
                "sum/min/max/average/count col")
        fn = {"average": "avg"}.get(am.group(1), am.group(1))
        items.append((alias, f"{fn}({am.group(2)})"))
    return frame, items


_WINDOW_FNS = {"rank": "rank()", "row_number": "row_number()",
               "dense_rank": "dense_rank()"}


def _window_fn(raw: str, partition: str, order: str) -> str:
    """A group-body derive item -> SQL window expression. Subset:
    rank/row_number/dense_rank over `this`, lag/lead col [n], and
    sum/min/max/average running aggregates (PRQL's default frame for
    aggregates in a sorted group is RANGE unbounded-to-current; ranks
    use the rank frame natively)."""
    raw = raw.strip()
    over = f"PARTITION BY {partition} ORDER BY {order}"
    m = re.match(r"^(rank|row_number|dense_rank)(?:\s+this)?$", raw)
    if m:
        return f"{_WINDOW_FNS[m.group(1)]} OVER ({over})"
    m = re.match(r"^(lag|lead)\s+([A-Za-z_]\w*)(?:\s+(\d+))?$", raw)
    if m:
        n = m.group(3) or "1"
        return f"{m.group(1)}({m.group(2)}, {n}) OVER ({over})"
    m = re.match(r"^(sum|min|max|average|count)\s+([A-Za-z_]\w*)$", raw)
    if m:
        fn = {"average": "avg"}.get(m.group(1), m.group(1))
        return (f"{fn}({m.group(2)}) OVER ({over} "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    raise ChSqlError(
        f"PRQL window derive {raw!r}: subset takes rank/row_number/"
        "dense_rank [this], lag/lead col [n], or sum/min/max/average/"
        "count col")


@records_errors
def prql_sql(spark, text: str, params=None):
    """Execute a PRQL pipeline through the chsql shim. ``loop`` is
    handled here — it needs runtime iteration, which SQL text alone
    cannot express (the prql-compiler lowers loop to WITH RECURSIVE;
    this engine iterates DataFrames instead, which Spark executes as a
    bounded union of checkpointed stages)."""
    from clickhouse_25_5_3_75_stable_spark.chsql import ch_sql

    stmts = _split_statements(text)
    for i, st in enumerate(stmts):
        if re.match(r"^loop\b", st):
            return _loop_execute(spark, stmts, i, params=params)
    return ch_sql(spark, prql_to_sql(text), params=params)


def _loop_execute(spark, stmts: list[str], idx: int, params=None,
                  max_iterations: int = 100):
    """PRQL ``loop (pipeline)``: apply the inner pipeline to the
    previous iteration's rows until an iteration is empty; the result
    is the UNION ALL of the initial relation and every iteration —
    exactly the recursive-CTE semantics the prql-compiler emits
    (base UNION ALL step), which the oracle states as WITH RECURSIVE.

    Scale shape: every iteration is localCheckpoint'ed — the iterative
    lineage is cut per round (the star-contraction pattern from
    operators/dedup.py), so N iterations cost N bounded jobs, not an
    exponentially deep plan. Iterations are capped; the inner pipeline
    must preserve the relation's schema (refused otherwise, since
    UNION ALL of drifting schemas silently corrupts)."""
    from functools import reduce

    from clickhouse_25_5_3_75_stable_spark.chsql import ch_sql

    m = re.match(r"^loop\s*\((.*)\)\s*$", stmts[idx], re.DOTALL)
    if not m or not m.group(1).strip():
        raise ChSqlError("PRQL loop subset: loop (<pipeline>)")
    if idx == 0:
        raise ChSqlError("PRQL loop needs an initial relation before it")
    inner_sql = prql_to_sql("from __prql_loop_src\n" + m.group(1).strip())
    prefix_sql = prql_to_sql("\n".join(stmts[:idx]))
    base = ch_sql(spark, prefix_sql, params=params).localCheckpoint(eager=True)
    parts = [base]
    frontier = base
    for _ in range(max_iterations):
        frontier.createOrReplaceTempView("__prql_loop_src")
        nxt = ch_sql(spark, inner_sql, params=params)
        if [f.simpleString() for f in nxt.schema.fields] != [
            f.simpleString() for f in base.schema.fields
        ]:
            raise ChSqlError(
                "PRQL loop: the pipeline must preserve the relation schema "
                f"(got {nxt.schema.simpleString()}, "
                f"want {base.schema.simpleString()})")
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        parts.append(nxt)
        frontier = nxt
    else:
        raise ChSqlError(
            f"PRQL loop did not terminate within {max_iterations} iterations")
    out = reduce(lambda a, b: a.unionByName(b), parts)
    suffix = stmts[idx + 1:]
    if not suffix:
        return out
    out.createOrReplaceTempView("__prql_loop_out")
    return prql_sql(spark, "\n".join(["from __prql_loop_out"] + suffix),
                    params=params)
