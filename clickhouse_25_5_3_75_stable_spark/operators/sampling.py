"""Deterministic SAMPLE clause semantics.

The reference's ``SAMPLE k`` / ``SAMPLE k OFFSET m`` reads a stable
slice of the sampling-key hash space, chosen at plan time
(/root/reference/src/Storages/MergeTree/MergeTreeDataSelectExecutor.cpp:206
``getSampling``; sampling key declared per MergeTree table). Key
properties we preserve:

- **deterministic**: the same rows are sampled on every run and on
  every node — unlike Spark's Bernoulli ``df.sample`` whose outcome
  depends on partition split and seed plumbing;
- **consistent across tables**: two tables sampled on the same key at
  the same rate keep joinable rows (the reference uses this for
  sampled JOINs);
- **cheap at scale**: the predicate is a pure row-local filter, pushed
  below every shuffle; no extra pass, no skew.

Spark realization: a filter on a slice of a hash (or key) space.
``xxhash64`` keeps the whole predicate inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sample_by_key(
    df: DataFrame,
    key: str | Column,
    numerator: int,
    denominator: int,
    offset: int = 0,
    hashed: bool = True,
) -> DataFrame:
    """``SAMPLE numerator/denominator OFFSET offset/denominator``.

    ``hashed=True`` spreads the sampling key uniformly via xxhash64
    (the reference's intHash32-over-sampling-key analogue); with
    ``hashed=False`` the key's own value is bucketed directly, which
    keeps the predicate expressible in vanilla ANSI SQL (oracle-able)
    and is appropriate for keys that are already uniform (surrogate
    ids).
    """
    if not (0 < numerator <= denominator):
        raise ValueError("need 0 < numerator <= denominator")
    if not (0 <= offset < denominator):
        raise ValueError("need 0 <= offset < denominator")
    c = F.col(key) if isinstance(key, str) else key
    bucket = F.pmod(F.xxhash64(c) if hashed else c, F.lit(denominator))
    lo, hi = offset, offset + numerator
    if hi <= denominator:
        pred = (bucket >= lo) & (bucket < hi)
    else:  # wrap around the ring
        pred = (bucket >= lo) | (bucket < hi - denominator)
    return df.filter(pred)


def sample_fraction(df: DataFrame, key: str | Column, fraction: float) -> DataFrame:
    """``SAMPLE 0.1``-style relative sampling on a key (deterministic)."""
    denom = 1_000_000
    return sample_by_key(df, key, max(1, int(round(fraction * denom))), denom)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key: str | Column,
    rates: dict,
    default_rate: float = 0.0,
    denominator: int = 10_000,
) -> DataFrame:
    """Deterministic per-stratum sampling — the corpus-mixture op of a
    training-data pipeline (hit a target language/source/quality mix).
    Each stratum keeps the fraction of its hash ring given by
    rates[stratum]; the hash derives from md5 (text.portable_hash64)
    so the SAME rows are kept in any engine/run — reproducible corpus
    cuts, no RNG. One scan, no shuffle."""
    from clickhouse_25_5_3_75_stable_spark.operators.text import portable_hash64

    c = F.col(key) if isinstance(key, str) else key
    bucket = F.pmod(portable_hash64(c.cast("string")), F.lit(denominator))
    rate = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(float(r))).otherwise(rate)
    return df.filter(bucket < (rate * denominator).cast("bigint"))


def stratified_sample_sql(
    stratum_col: str, key_expr: str, rates: dict, default_rate: float = 0.0,
    denominator: int = 10_000,
) -> str:
    """DuckDB predicate mirroring :func:`stratified_sample`."""
    from clickhouse_25_5_3_75_stable_spark.operators.text import portable_hash64_sql

    h = portable_hash64_sql(f"CAST({key_expr} AS VARCHAR)")
    cases = " ".join(
        f"WHEN {stratum_col} = '{s}' THEN {float(r)!r}" for s, r in sorted(rates.items())
    )
    rate = f"(CASE {cases} ELSE {float(default_rate)!r} END)"
    return f"(({h} % {denominator} + {denominator}) % {denominator}) < CAST({rate} * {denominator} AS BIGINT)"
