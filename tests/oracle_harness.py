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
