"""Column kinds: DEFAULT / MATERIALIZED / ALIAS / EPHEMERAL.

The reference's table schema attaches a kind to each column
(/root/reference/src/Storages/ColumnDefault.h — Default, Materialized,
Alias, Ephemeral; ColumnsDescription.h): DEFAULT fills missing insert
values, MATERIALIZED is always computed at insert (not insertable, is
stored), ALIAS is a stored-nowhere projection computed at read, and
EPHEMERAL exists only as an insert-time input for other defaults.

Spark mapping: the table is a plain DataFrame; the kinds become two
transformation points —

- :meth:`TableSchema.apply_insert` runs at write time: fills DEFAULT
  for absent/null columns, always (re)computes MATERIALIZED, consumes
  and drops EPHEMERAL inputs;
- :meth:`TableSchema.reading_view` runs at read time: projects ALIAS
  columns on top of the stored ones (they cost nothing until selected,
  and Catalyst prunes them like any expression).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class TableSchema:
    """Declarative column-kind layer over a stored DataFrame."""

    defaults: dict[str, Column] = field(default_factory=dict)
    materialized: dict[str, Column] = field(default_factory=dict)
    aliases: dict[str, Column] = field(default_factory=dict)
    ephemeral: tuple[str, ...] = ()

    def apply_insert(self, df: DataFrame) -> DataFrame:
        """INSERT-time semantics (reference
        src/Interpreters/InterpreterInsertQuery.h:26 + column defaults
        resolution in AddingDefaultsTransform): absent or null DEFAULT
        columns fill from their expression (which may read EPHEMERAL
        inputs), MATERIALIZED always recomputes, EPHEMERAL never
        lands."""
        out = df
        for name, expr in self.defaults.items():
            if name in out.columns:
                out = out.withColumn(name, F.coalesce(F.col(name), expr))
            else:
                out = out.withColumn(name, expr)
        for name, expr in self.materialized.items():
            out = out.withColumn(name, expr)
        drop = [c for c in self.ephemeral if c in out.columns]
        return out.drop(*drop) if drop else out

    def reading_view(self, stored: DataFrame) -> DataFrame:
        """SELECT-time ALIAS projection (reference ColumnDefault.h
        Alias kind: computed on read, never stored)."""
        out = stored
        for name, expr in self.aliases.items():
            out = out.withColumn(name, expr)
        return out

    def insertable_columns(self, all_columns: list[str]) -> list[str]:
        """Columns a plain INSERT may name: everything stored except
        MATERIALIZED (reference rejects inserting into MATERIALIZED),
        plus EPHEMERAL inputs."""
        return [c for c in all_columns if c not in self.materialized] + list(self.ephemeral)
