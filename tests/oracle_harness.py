"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a registry query on Spark and its oracle SQL on DuckDB over the
same parquet dir, normalizes both (columns sorted by name, rows sorted
by all columns), and compares values exactly — stricter than any
reasonable hash, so passing here implies passing the driver's gate.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb

from clickhouse_25_5_3_75_stable_spark.queries import REGISTRY
from clickhouse_25_5_3_75_stable_spark.sources.catalog import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    return v


def _sort_key(row):
    return tuple((x is None, str(x)) for x in row)


def normalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=_sort_key)
    return cols_sorted, out


def run_spark(spark, sf_dir: str, name: str):
    df = REGISTRY[name].fn(spark, sf_dir)
    rows = [tuple(r) for r in df.collect()]
    return df.columns, rows


def run_oracle(con, name: str):
    spec = REGISTRY[name]
    assert spec.oracle is not None
    res = con.execute(spec.oracle)
    cols = [d[0] for d in res.description]
    return cols, res.fetchall()


# ---------------------------------------------------------------------------
# Dtype parity (round-4): the driver's row hash is dtype-sensitive —
# round 3 went red on three queries whose only divergence was DuckDB
# widening SUM(BIGINT)->HUGEINT / EXTRACT->BIGINT past Spark's dtype
# while values matched exactly. This check canonicalizes both engines'
# result dtypes and demands STRICT width equality, so any future
# uncast-widening oracle fails pytest before the driver sees it.

_DUCK_SCALARS = {
    "TINYINT": "int8",
    "SMALLINT": "int16",
    "INTEGER": "int32",
    "BIGINT": "int64",
    "HUGEINT": "int128",
    "UTINYINT": "uint8",
    "USMALLINT": "uint16",
    "UINTEGER": "uint32",
    "UBIGINT": "uint64",
    "UHUGEINT": "uint128",
    "FLOAT": "float32",
    "REAL": "float32",
    "DOUBLE": "float64",
    "VARCHAR": "string",
    "BOOLEAN": "bool",
    "DATE": "date",
    "BLOB": "binary",
    # tz-awareness and sub-µs width are DISTINCT canonical names
    # (round-4 advisor): a TIMESTAMPTZ or TIMESTAMP_NS oracle column can
    # change the driver's dtype-sensitive row rendering, so it must be
    # pinned explicitly, never pass silently. The one sanctioned
    # equivalence is Spark ltz 'timestamp' ≡ DuckDB naive TIMESTAMP —
    # under the harness/driver UTC session both render identical
    # microsecond instants (all current oracles use this pairing).
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamptz",
    "TIMESTAMP_NS": "timestamp_ns",
}

_SPARK_SCALARS = {
    "tinyint": "int8",
    "smallint": "int16",
    "int": "int32",
    "bigint": "int64",
    "float": "float32",
    "double": "float64",
    "string": "string",
    "boolean": "bool",
    "date": "date",
    "binary": "binary",
    "timestamp": "timestamp",  # ltz ≡ DuckDB naive under UTC (see above)
    "timestamp_ntz": "timestamp_ntz",
    "void": "null",
}


def _split_top(s: str) -> list[str]:
    """Split on top-level commas, respecting <>, () and quotes."""
    parts, depth, cur, quote = [], 0, [], None
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "\"'":
            quote = ch
            cur.append(ch)
        elif ch in "<(":
            depth += 1
            cur.append(ch)
        elif ch in ">)":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts]


def canon_duck(t: str) -> str:
    t = t.strip()
    if t.endswith("[]"):
        return f"array<{canon_duck(t[:-2])}>"
    up = t.upper()
    if up.startswith("DECIMAL"):
        return t.lower().replace(" ", "")
    if up.startswith("MAP("):
        k, v = _split_top(t[4:-1])
        return f"map<{canon_duck(k)},{canon_duck(v)}>"
    if up.startswith("STRUCT("):
        fields = []
        for f in _split_top(t[7:-1]):
            # quote-aware name/type split (round-4 advisor): a quoted
            # field name may itself contain spaces
            if f.startswith('"'):
                close = f.index('"', 1)
                fname, ftype = f[1:close], f[close + 1:].strip()
            else:
                fname, ftype = f.split(" ", 1)
            fields.append(f"{fname}:{canon_duck(ftype)}")
        return "struct<" + ",".join(fields) + ">"
    return _DUCK_SCALARS.get(up, t.lower())


def canon_spark(t: str) -> str:
    t = t.strip()
    if t.startswith("array<"):
        return f"array<{canon_spark(t[6:-1])}>"
    if t.startswith("map<"):
        k, v = _split_top(t[4:-1])
        return f"map<{canon_spark(k)},{canon_spark(v)}>"
    if t.startswith("struct<"):
        fields = []
        for f in _split_top(t[7:-1]):
            fname, ftype = f.split(":", 1)
            fields.append(f"{fname}:{canon_spark(ftype)}")
        return "struct<" + ",".join(fields) + ">"
    if t.startswith("decimal"):
        return t.replace(" ", "")
    return _SPARK_SCALARS.get(t, t)


def dtype_parity(spark, con, sf_dir: str, name: str) -> list[str]:
    """Strict per-column dtype comparison between the Spark query's
    schema and the DuckDB oracle's bound types (no execution on the
    DuckDB side). Returns mismatch descriptions (empty = pass)."""
    spec = REGISTRY[name]
    assert spec.oracle is not None
    df = spec.fn(spark, sf_dir)
    # positional (name, type) comparison (round-4 advisor): name-keyed
    # dicts silently dropped duplicate output column names
    s = [(f.name, canon_spark(f.dataType.simpleString()))
         for f in df.schema.fields]
    rel = con.sql(spec.oracle)
    o = [(c, canon_duck(str(t))) for c, t in zip(rel.columns, rel.types)]
    problems = []
    if len(s) != len(o):
        problems.append(f"column count: spark={len(s)} duckdb={len(o)}")
    # the value compare sorts columns BY NAME before hashing, so dtype
    # parity must bind the same pairing: sort both sides by name (with
    # position as tiebreaker for duplicates), then compare per slot
    for (sn, st), (on, ot) in zip(sorted(s), sorted(o)):
        if sn != on or st != ot:
            problems.append(f"spark=({sn!r}, {st!r}) duckdb=({on!r}, {ot!r})")
    return problems


def compare(spark, con, sf_dir: str, name: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty = pass)."""
    s_cols, s_rows = run_spark(spark, sf_dir, name)
    o_cols, o_rows = run_oracle(con, name)
    sc, sr = normalize(s_cols, s_rows)
    oc, orr = normalize(o_cols, o_rows)
    problems: list[str] = []
    if sc != oc:
        problems.append(f"columns differ: spark={sc} oracle={oc}")
        return problems
    if len(sr) != len(orr):
        problems.append(f"row count differs: spark={len(sr)} oracle={len(orr)}")
    for i, (a, b) in enumerate(zip(sr, orr)):
        if a != b:
            problems.append(f"row {i} differs:\n  spark : {a}\n  oracle: {b}")
            if len(problems) >= 4:
                problems.append("... (further diffs suppressed)")
                break
    return problems
