"""Explicit ClickHouse → Spark type mapping (SURVEY §1.2).

Reference type inventory: /root/reference/src/DataTypes/
DataTypesNumber.h, DataTypesDecimal.h, DataTypeString.h,
DataTypeDate.h / DataTypeDate32.h / DataTypeDateTime(64).h,
DataTypeUUID.h, DataTypeEnum.h, DataTypeFixedString.h,
DataTypeArray/Map/Tuple/Nullable/LowCardinality, TypeId.h.

Two modes:

- ``fast``    — unsigned widths map to the next SAME-width signed Spark
  type (UInt64 → bigint). Cheapest plans, but a UInt64 above 2^63-1
  wraps negative. Right when the data provably stays in range.
- ``exact``   — unsigned widths map to the next WIDER type, with
  UInt64 → DECIMAL(20,0) (holds the full 0..2^64-1 domain) and the
  128/256-bit integers → DECIMAL(38,0) (truncated domain, documented:
  Spark has no 256-bit integer; values beyond 38 digits need string
  transport). This is the correctness mode the oracle gate runs under.

Parametrized and composite types (Decimal(P,S), FixedString(N),
DateTime64(p), Nullable/LowCardinality wrappers, Array/Map/Tuple,
Enum8/16) are parsed structurally.
"""

from __future__ import annotations

# scalar CH name -> (fast spark type, exact spark type)
_SCALARS = {
    "int8": ("tinyint", "tinyint"),
    "int16": ("smallint", "smallint"),
    "int32": ("int", "int"),
    "int64": ("bigint", "bigint"),
    "int128": ("decimal(38,0)", "decimal(38,0)"),
    "int256": ("decimal(38,0)", "decimal(38,0)"),
    "uint8": ("smallint", "smallint"),
    "uint16": ("int", "int"),
    "uint32": ("bigint", "bigint"),
    "uint64": ("bigint", "decimal(20,0)"),
    "uint128": ("decimal(38,0)", "decimal(38,0)"),
    "uint256": ("decimal(38,0)", "decimal(38,0)"),
    "float32": ("float", "float"),
    "float64": ("double", "double"),
    "bfloat16": ("float", "float"),
    "bool": ("boolean", "boolean"),
    "string": ("string", "string"),
    "date": ("date", "date"),
    "date32": ("date", "date"),
    "datetime": ("timestamp", "timestamp"),
    "datetime32": ("timestamp", "timestamp"),
    "uuid": ("string", "string"),
    "ipv4": ("string", "string"),
    "ipv6": ("string", "string"),
    "json": ("variant", "variant"),
    "dynamic": ("variant", "variant"),
    "nothing": ("void", "void"),
}

UINT64_MAX = 2**64 - 1
INT64_MAX = 2**63 - 1


def _split_args(s: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def ch_type_to_spark(ch_type: str, mode: str = "exact") -> str:
    """Spark SQL type string for a ClickHouse type declaration."""
    if mode not in ("fast", "exact"):
        raise ValueError(f"mode must be 'fast' or 'exact', got {mode!r}")
    t = ch_type.strip()
    low = t.lower()
    if low in _SCALARS:
        return _SCALARS[low][0 if mode == "fast" else 1]
    if "(" in t and t.endswith(")"):
        head, args_s = t.split("(", 1)
        head_l = head.strip().lower()
        args = _split_args(args_s[:-1])
        if head_l in ("nullable", "lowcardinality"):
            # Spark columns are nullable by default; LowCardinality is
            # a storage hint (dictionary encoding is parquet's job)
            return ch_type_to_spark(args[0], mode)
        if head_l == "array":
            return f"array<{ch_type_to_spark(args[0], mode)}>"
        if head_l == "map":
            return (
                f"map<{ch_type_to_spark(args[0], mode)},"
                f"{ch_type_to_spark(args[1], mode)}>"
            )
        if head_l == "tuple":
            fields = []
            for i, a in enumerate(args):
                parts = a.split(None, 1)
                if len(parts) == 2 and "(" not in parts[0]:
                    name, sub = parts[0], parts[1]
                else:
                    name, sub = f"_{i + 1}", a
                fields.append(f"{name}:{ch_type_to_spark(sub, mode)}")
            return "struct<" + ",".join(fields) + ">"
        if head_l == "fixedstring":
            return "string"  # padded semantics via toFixedString in the dialect
        if head_l == "datetime64":
            return "timestamp"  # Spark is µs; p>6 truncates (documented)
        if head_l == "datetime":
            return "timestamp"  # tz argument: Spark session tz governs
        if head_l == "decimal":
            p, s = (int(args[0]), int(args[1])) if len(args) == 2 else (10, int(args[0]))
            return f"decimal({min(p, 38)},{s})"
        if head_l in ("decimal32", "decimal64", "decimal128", "decimal256"):
            prec = {"decimal32": 9, "decimal64": 18, "decimal128": 38, "decimal256": 38}[head_l]
            return f"decimal({prec},{int(args[0])})"
        if head_l in ("enum8", "enum16"):
            return "string"  # the name domain; codes via the dialect's transcoders
        if head_l == "aggregatefunction" or head_l == "simpleaggregatefunction":
            return "binary"  # opaque state (functions/states.py carries real ones)
    raise ValueError(f"unmapped ClickHouse type: {ch_type!r}")


def uint64_col(col):
    """Tag an expression as UInt64 in exact mode: DECIMAL(20,0) carries
    the full unsigned domain through aggregation without wrap."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(20,0)")
