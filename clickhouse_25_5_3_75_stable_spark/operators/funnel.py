"""Behavioral / sequence analytics aggregates (SURVEY §2.4 "Sequence/
funnel"): windowFunnel, sequenceMatch, sequenceCount, retention.

Reference: /root/reference/src/AggregateFunctions/
AggregateFunctionWindowFunnel.h (levels within a time window),
AggregateFunctionSequenceMatch.h (pattern over ordered events),
AggregateFunctionRetention.h — all fold per-key event streams.

Spark shape: `collect_list(struct(tu, id, flags))` per key →
`array_sort` → `F.aggregate` fold — ONE hash aggregation (one shuffle
on the key), then a pure expression over each group's array. At 100 TB
the per-user event array is the memory unit; pathologically long
histories should be pre-capped with `slice` (the reference caps via
max_events the same way).

Chain order is the total order (tu, event_id) — ties in the truncated
µs timestamp are broken by the unique id, so the fold and any SQL
restatement agree exactly.

windowFunnel greedy invariant: per level keep the LATEST chain-start
time among chains reaching it. A later start is always at least as
extendable under `t_k − t_1 ≤ window`, so greedy equals the true
"exists chain" maximum (the reference's per-level timestamp array
makes the same argument).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# shared: per-event condition flags packed into a sorted struct array
# --------------------------------------------------------------------------


def event_stream(ts: Column, ev_id: Column, conds: list[Column]) -> Column:
    """Aggregate expression: array of (tu=epoch µs, id, m=cond bitmask)
    structs sorted by (tu, id) for one group."""
    mask = F.lit(0).cast("bigint")
    for i, c in enumerate(conds):
        mask = mask + F.when(c, F.lit(1 << i).cast("bigint")).otherwise(F.lit(0))
    item = F.struct(
        F.unix_micros(ts.cast("timestamp")).alias("tu"),
        ev_id.cast("bigint").alias("id"),
        mask.alias("m"),
    )
    return F.array_sort(F.collect_list(item))


def _interval_us(window: str) -> int:
    qty, unit = window.split()
    mult = {
        "second": 1_000_000,
        "seconds": 1_000_000,
        "minute": 60_000_000,
        "minutes": 60_000_000,
        "hour": 3_600_000_000,
        "hours": 3_600_000_000,
        "day": 86_400_000_000,
        "days": 86_400_000_000,
    }[unit]
    return int(qty) * mult


# --------------------------------------------------------------------------
# windowFunnel(window)(ts, c1..ck) — max chain depth within the window
# --------------------------------------------------------------------------


def window_funnel(
    ts: Column, ev_id: Column, conds: list[Column], window: str = "1 hour"
) -> Column:
    """Max funnel level: deepest k with chain e1 < … < ek in (tu, id)
    order, e_i matching cond_i, t_k − t_1 ≤ window.

    Fold state: per level, the latest chain-start µs of any chain
    reaching it (see module docstring for why latest is optimal).
    Updates read only the pre-event state, so one event advances a
    chain at most one level — events strictly later in the order
    extend it further."""
    k = len(conds)
    window_us = _interval_us(window)
    stream = event_stream(ts, ev_id, conds)
    init = F.array(*[F.lit(None).cast("bigint") for _ in range(k)])

    def step(acc: Column, ev: Column) -> Column:
        t = ev["tu"]
        m = ev["m"]
        upper = []  # new values for levels 2..k (ascending)
        for j in range(2, k + 1):
            prev_start = F.element_at(acc, j - 1)
            cur = F.element_at(acc, j)
            matches = m.bitwiseAND(F.lit(1 << (j - 1))) != 0
            extend = matches & prev_start.isNotNull() & ((t - prev_start) <= F.lit(window_us))
            upper.append(
                F.when(extend & (cur.isNull() | (prev_start > cur)), prev_start).otherwise(cur)
            )
        first = F.element_at(acc, 1)
        m1 = m.bitwiseAND(F.lit(1)) != 0
        l1 = F.when(m1 & (first.isNull() | (t > first)), t).otherwise(first)
        return F.array(l1, *upper)

    folded = F.aggregate(stream, init, step)
    level = F.lit(0)
    for j in range(1, k + 1):
        level = F.when(F.element_at(folded, j).isNotNull(), F.lit(j)).otherwise(level)
    return level


def window_funnel_oracle_sql(
    events_rel: str,
    key: str,
    ts: str,
    ev_id: str,
    conds: list[str],
    window: str = "1 hour",
    level_alias: str = "funnel_level",
) -> str:
    """Independent DuckDB restatement: level >= j iff an in-order chain
    of j condition-events exists within the window (join formulation,
    no fold) — a stronger oracle than replaying the Spark algorithm."""
    w = _interval_us(window)
    base = (
        f"SELECT {key} AS k, epoch_us(CAST({ts} AS TIMESTAMP)) AS tu,"
        f" {ev_id} AS id, * FROM {events_rel}"
    )
    lvl_sets = []
    for j in range(1, len(conds) + 1):
        froms = ", ".join(f"e{i}" for i in range(1, j + 1))
        wheres = [f"e{i}.k = e1.k" for i in range(2, j + 1)]
        for i, c in enumerate(conds[:j], start=1):
            wheres.append(c.replace("{e}", f"e{i}"))
        for i in range(2, j + 1):
            wheres.append(
                f"(e{i}.tu > e{i-1}.tu OR (e{i}.tu = e{i-1}.tu AND e{i}.id > e{i-1}.id))"
            )
        if j > 1:
            wheres.append(f"e{j}.tu - e1.tu <= {w}")
        aliased = ", ".join(f"ev AS e{i}" for i in range(1, j + 1))
        lvl_sets.append(
            f"l{j} AS (SELECT DISTINCT e1.k FROM {aliased} WHERE " + " AND ".join(wheres) + ")"
        )
    case = "0"
    for j in range(1, len(conds) + 1):
        case = f"CASE WHEN u.k IN (SELECT k FROM l{j}) THEN {j} ELSE {case} END"
    return (
        f"WITH ev AS ({base}), u AS (SELECT DISTINCT k FROM ev), "
        + ", ".join(lvl_sets)
        + f" SELECT u.k AS {key}, {case} AS {level_alias} FROM u"
    )


# --------------------------------------------------------------------------
# sequenceMatch / sequenceCount for (?1).*(?2)...(?k) patterns
# --------------------------------------------------------------------------


def sequence_match(ts: Column, ev_id: Column, conds: list[Column]) -> Column:
    """True when the conditions occur in order (other events may
    interleave) — the `(?1).*(?2)…` pattern subset, which covers the
    dominant share of real sequenceMatch uses."""
    k = len(conds)
    stream = event_stream(ts, ev_id, conds)

    def step(acc: Column, ev: Column) -> Column:
        nxt = acc  # matched prefix length so far
        for j in range(k, 0, -1):
            hits = ev["m"].bitwiseAND(F.lit(1 << (j - 1))) != 0
            nxt = F.when((acc == j - 1) & hits, F.lit(j)).otherwise(nxt)
        return nxt

    return F.aggregate(stream, F.lit(0), step) >= k


def sequence_count(ts: Column, ev_id: Column, conds: list[Column]) -> Column:
    """Number of non-overlapping in-order occurrences (greedy restart
    after each completed match — reference sequenceCount semantics)."""
    k = len(conds)
    stream = event_stream(ts, ev_id, conds)
    pack = k + 1  # state = count * pack + prefix

    def step(acc: Column, ev: Column) -> Column:
        prefix = acc % pack
        nxt = prefix
        for j in range(k, 0, -1):
            hits = ev["m"].bitwiseAND(F.lit(1 << (j - 1))) != 0
            nxt = F.when((prefix == j - 1) & hits, F.lit(j)).otherwise(nxt)
        return F.when(nxt == k, acc - prefix + F.lit(pack)).otherwise(acc - prefix + nxt)

    return (F.aggregate(stream, F.lit(0), step) / pack).cast("bigint")


# --------------------------------------------------------------------------
# retention(c1..ck)
# --------------------------------------------------------------------------


def retention(conds: list[Column]) -> Column:
    """Array r: r[1] = any(c1); r[j] = any(c1) AND any(cj) — reference
    AggregateFunctionRetention.h. Plain boolean aggregates, fully
    map-side combinable."""
    first = F.max(F.when(conds[0], F.lit(1)).otherwise(F.lit(0)))
    out = [first == 1]
    for c in conds[1:]:
        out.append((first == 1) & (F.max(F.when(c, F.lit(1)).otherwise(F.lit(0))) == 1))
    return F.array(*out)


def retention_sql(conds: list[str]) -> str:
    first = f"max(CASE WHEN {conds[0]} THEN 1 ELSE 0 END)"
    parts = [f"{first} = 1"]
    for c in conds[1:]:
        parts.append(f"({first} = 1 AND max(CASE WHEN {c} THEN 1 ELSE 0 END) = 1)")
    return "[" + ", ".join(parts) + "]"
