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


_LEVEL_T = "struct<start:bigint,last:bigint>"


def window_funnel(
    ts: Column,
    ev_id: Column,
    conds: list[Column],
    window: str = "1 hour",
    modes: tuple[str, ...] = (),
) -> Column:
    """Max funnel level: deepest k with chain e1 < … < ek in (tu, id)
    order, e_i matching cond_i, t_k − t_1 ≤ window.

    Fold state: per level, the (start, last) µs of the latest-start
    chain reaching it (see module docstring for why latest-start is
    optimal), plus the best level ever reached and a stop flag.
    Updates read only the pre-event state, so one event advances a
    chain at most one level.

    `modes` mirrors the reference's variants
    (AggregateFunctionWindowFunnel.h):
      strict_dedup    — a condition-j event while level j is already
                        live stops the scan; the result is j (the
                        reference returns event_idx + 1 there).
      strict_order    — an event that extends/starts no chain (e.g.
                        the D in A→B→D→C) kills every live chain;
                        levels already reached still count.
      strict_increase — chain timestamps must be strictly increasing
                        (an equal-timestamp event cannot extend).
    """
    for mmode in modes:
        if mmode not in ("strict_dedup", "strict_order", "strict_increase"):
            raise ValueError(f"unknown windowFunnel mode {mmode!r}")
    k = len(conds)
    window_us = _interval_us(window)
    strict_dedup = "strict_dedup" in modes
    strict_order = "strict_order" in modes
    strict_increase = "strict_increase" in modes

    stream = event_stream(ts, ev_id, conds)
    init = F.struct(
        F.array(*[F.lit(None).cast(_LEVEL_T) for _ in range(k)]).alias("ls"),
        F.lit(0).alias("best"),
        F.lit(False).alias("stopped"),
    )

    def step(acc: Column, ev: Column) -> Column:
        t = ev["tu"]
        m = ev["m"]
        ls, best, stopped = acc["ls"], acc["best"], acc["stopped"]

        def matches(j: int) -> Column:
            return m.bitwiseAND(F.lit(1 << (j - 1))) != 0

        # strict_dedup: smallest condition whose level is already live
        dup_level = F.lit(None).cast("int")
        if strict_dedup:
            for j in range(k, 0, -1):
                dup_level = F.when(
                    matches(j) & F.element_at(ls, j).isNotNull(), F.lit(j)
                ).otherwise(dup_level)

        new_levels = []
        extended_flags = []
        for j in range(1, k + 1):
            cur = F.element_at(ls, j)
            if j == 1:
                can = matches(1)
                cand_start, cand_last = t, t
                better = cur.isNull() | (t > cur["start"])
            else:
                prev = F.element_at(ls, j - 1)
                can = (
                    matches(j)
                    & prev.isNotNull()
                    & ((t - prev["start"]) <= F.lit(window_us))
                )
                if strict_increase:
                    can = can & prev.isNotNull() & (t > prev["last"])
                cand_start, cand_last = prev["start"], t
                better = cur.isNull() | (cand_start > cur["start"])
            new_j = F.when(
                can & better,
                F.struct(cand_start.alias("start"), cand_last.alias("last")),
            ).otherwise(cur)
            new_levels.append(new_j)
            extended_flags.append(can)

        extended_any = extended_flags[0]
        for f in extended_flags[1:]:
            extended_any = extended_any | f

        reached = F.lit(0)
        for j in range(1, k + 1):
            reached = F.when(new_levels[j - 1].isNotNull(), F.lit(j)).otherwise(reached)
        new_best = F.greatest(best, reached)

        null_levels = F.array(*[F.lit(None).cast(_LEVEL_T) for _ in range(k)])
        updated = F.struct(
            F.array(*new_levels).alias("ls"),
            new_best.alias("best"),
            F.lit(False).alias("stopped"),
        )
        if strict_order:
            updated = F.when(
                extended_any, updated
            ).otherwise(
                F.struct(null_levels.alias("ls"), best.alias("best"),
                         F.lit(False).alias("stopped"))
            )
        if strict_dedup:
            updated = F.when(
                dup_level.isNotNull(),
                F.struct(null_levels.alias("ls"), dup_level.alias("best"),
                         F.lit(True).alias("stopped")),
            ).otherwise(updated)
        return F.when(stopped, acc).otherwise(updated)

    folded = F.aggregate(stream, init, step)
    return folded["best"]


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


def parse_sequence_pattern(pattern: str) -> list[tuple[int, str | None, int]]:
    """Parse the reference sequenceMatch pattern subset
    ``(?1).*(?t<=500)(?2)...`` into steps
    ``[(cond_idx, gap_op|None, gap_value_ms), ...]`` — each step is an
    event atom with the time constraint (if any) that guards the gap
    from the PREVIOUS atom. ``.*`` contributes no constraint; strict
    adjacency (no separator) is not supported and raises."""
    import re as _re

    steps: list[tuple[int, str | None, int]] = []
    pending: tuple[str, int] | None = None
    i = 0
    last_was_atom = False
    while i < len(pattern):
        if pattern.startswith(".*", i):
            i += 2
            last_was_atom = False
            continue
        m = _re.match(r"\(\?(\d+)\)", pattern[i:])
        if m:
            if last_was_atom and pending is None and steps:
                raise ValueError(
                    "sequenceMatch: strict adjacency '(?a)(?b)' not supported — "
                    "separate atoms with .* or a (?t...) constraint"
                )
            steps.append((int(m.group(1)), pending[0] if pending else None,
                          pending[1] if pending else 0))
            pending = None
            i += m.end()
            last_was_atom = True
            continue
        m = _re.match(r"\(\?t\s*(<=|>=|<|>)\s*(\d+)\)", pattern[i:])
        if m:
            pending = (m.group(1), int(m.group(2)))
            i += m.end()
            last_was_atom = False
            continue
        if _re.match(r"\(\?t\s*==", pattern[i:]):
            raise ValueError(
                "sequenceMatch: (?t==N) needs exact reachable-time sets; "
                "only monotone gap constraints (<, <=, >, >=) are supported"
            )
        raise ValueError(f"sequenceMatch: cannot parse pattern at ...{pattern[i:]!r}")
    if pending is not None:
        raise ValueError("sequenceMatch: trailing time constraint")
    return steps


def sequence_match_pattern(
    ts: Column, ev_id: Column, conds: list[Column], pattern: str
) -> Column:
    """sequenceMatch with the pattern language's time constraints
    (reference AggregateFunctionSequenceMatch.h pattern actions
    TimeLessOrEqual/TimeGreater/...): ``(?1)(?t<=500)(?2)`` matches
    when a cond-2 event follows a cond-1 event within 500 ms.

    Fold state: per pattern position, the MIN and MAX timestamps (µs)
    at which any match prefix can end. A `t<=c` gap is satisfiable iff
    it holds against the max (latest possible prefix end), `t>=c`/`t>c`
    iff against the min — exact for one monotone constraint per gap,
    which is the pattern language's shape."""
    steps = parse_sequence_pattern(pattern)
    k = len(steps)
    stream = event_stream(ts, ev_id, conds)
    # state: array of struct(mn,mx) per pattern position (NULL = not reached)
    init = F.array(*[F.lit(None).cast(_LEVEL_T) for _ in range(k)])

    def gap_ok(op: str | None, c_ms: int, prev: Column, t: Column) -> Column:
        if op is None:
            return F.lit(True)
        c = F.lit(c_ms * 1000)  # pattern times are ms; stream is µs
        gap_from_mx = t - prev["last"]   # smallest achievable gap
        gap_from_mn = t - prev["start"]  # largest achievable gap
        if op == "<":
            return gap_from_mx < c
        if op == "<=":
            return gap_from_mx <= c
        if op == ">":
            return gap_from_mn > c
        return gap_from_mn >= c  # ">="

    def step_fn(acc: Column, ev: Column) -> Column:
        t = ev["tu"]
        m = ev["m"]
        new_state = []
        for p, (cond_idx, op, c_ms) in enumerate(steps, start=1):
            cur = F.element_at(acc, p)
            hits = m.bitwiseAND(F.lit(1 << (cond_idx - 1))) != 0
            if p == 1:
                can = hits
            else:
                prev = F.element_at(acc, p - 1)
                can = hits & prev.isNotNull() & gap_ok(op, c_ms, prev, t)
            widened = F.when(
                can,
                F.when(
                    cur.isNull(),
                    F.struct(t.alias("start"), t.alias("last")),
                ).otherwise(
                    F.struct(
                        F.least(cur["start"], t).alias("start"),
                        F.greatest(cur["last"], t).alias("last"),
                    )
                ),
            ).otherwise(cur)
            new_state.append(widened)
        return F.array(*new_state)

    folded = F.aggregate(stream, init, step_fn)
    return F.element_at(folded, k).isNotNull()


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
