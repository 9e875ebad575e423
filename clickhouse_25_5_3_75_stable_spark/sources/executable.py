"""Executable-script table surface: Python UDTFs and mapInPandas.

The reference runs external programs as functions and as tables:
executable UDFs stream rows over a pipe
(/root/reference/src/Functions/UserDefined/
UserDefinedExecutableFunctionFactory.h:16) and ``StorageExecutable``
turns a script into a table source
(/root/reference/src/Storages/registerStorages.cpp:26,
src/Storages/ExecutableSettings.h). Spark's native shape for both is
Python running *inside* the executors — a UDTF (table-valued, Spark 4)
or ``mapInPandas`` (Arrow record-batch streams) — so "external script"
becomes "shipped closure" with the same row-stream contract and none
of the process-pipe overhead.

Here: a generic UDTF wrapper plus two concrete executables mirroring
the reference's doc examples (a tokenizer UDTF, a per-batch script
runner).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="token string, pos int")
class TokenizeUDTF:
    """Table-from-function: one row per whitespace token (the shape of
    an executable tokenizer script in the reference docs)."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for i, tok in enumerate(text.split()):
            yield (tok, i)


def tokenize_table(spark: SparkSession, text: str) -> DataFrame:
    """StorageExecutable analogue: TABLE(tokenize(<literal>))."""
    from pyspark.sql.functions import lit

    return TokenizeUDTF(lit(text))


def script_transform(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
) -> DataFrame:
    """Executable-over-rows analogue: run ``fn`` on Arrow batches
    (mapInPandas). ``fn`` sees a pandas DataFrame per batch and returns
    one — the same stdin/stdout row-stream contract as the reference's
    executable UDFs, minus the subprocess."""

    def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield fn(pdf)

    return df.mapInPandas(runner, schema=schema)
