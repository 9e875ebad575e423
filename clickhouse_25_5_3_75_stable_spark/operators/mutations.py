"""Mutations: ``ALTER TABLE ... UPDATE / DELETE`` semantics.

The reference implements mutations as asynchronous whole-part rewrites
(/root/reference/src/Interpreters/MutationsInterpreter.h — turns a
mutation command list into a SELECT that re-materializes each part) and
lightweight deletes as a hidden ``_row_exists`` column applied as a
filter at read time (/root/reference/src/Storages/MergeTree/
MergeTreeSequentialSource.cpp, mask column logic in
MutationsInterpreter.cpp).

Spark realization is the same copy-on-write idea, expressed
declaratively so Catalyst keeps pushdown/pruning intact:

- ``mutate_update``   — ``CASE WHEN pred THEN expr ELSE col END`` per
  assigned column (the exact SELECT the reference generates);
- ``mutate_delete``   — an anti-filter;
- ``lightweight_delete`` / ``apply_row_mask`` — materialize
  ``_row_exists`` and filter it at read, preserving the two-phase
  delete-then-compact lifecycle.

At 100 TB these run as full-scan rewrite jobs (like the reference's
background mutations); on Delta/Iceberg the same API maps to
``MERGE``/``DELETE`` with file-level pruning so only affected files
rewrite.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ROW_EXISTS = "_row_exists"


def mutate_update(df: DataFrame, predicate: Column, assignments: Mapping[str, Column]) -> DataFrame:
    """ALTER TABLE UPDATE col=expr, ... WHERE predicate (copy-on-write)."""
    out = df
    for name, expr in assignments.items():
        if name not in df.columns:
            raise KeyError(f"UPDATE of unknown column {name!r}")
        out = out.withColumn(name, F.when(predicate, expr).otherwise(F.col(name)))
    return out


def mutate_delete(df: DataFrame, predicate: Column) -> DataFrame:
    """ALTER TABLE DELETE WHERE predicate (copy-on-write rewrite)."""
    return df.filter(~F.coalesce(predicate, F.lit(False)))


def lightweight_delete(df: DataFrame, predicate: Column) -> DataFrame:
    """Mark rows deleted via the hidden ``_row_exists`` mask column."""
    existing = F.col(ROW_EXISTS) if ROW_EXISTS in df.columns else F.lit(True)
    keep = existing & ~F.coalesce(predicate, F.lit(False))
    return df.withColumn(ROW_EXISTS, keep)


def apply_row_mask(df: DataFrame) -> DataFrame:
    """Read-time filter of masked rows (and drop the mask column)."""
    if ROW_EXISTS not in df.columns:
        return df
    return df.filter(F.col(ROW_EXISTS)).drop(ROW_EXISTS)
