"""Query result cache (reference
/root/reference/src/Interpreters/Cache/QueryResultCache.h:39: keyed by
the query AST, entries expire / evict by size).

Spark mapping: keyed by the *canonicalized logical plan* (so two
syntactically different but semantically identical DataFrames share an
entry, like the reference's normalized-AST key), realized as
``persist()`` on first use. The cache holds references, not copied
rows — executors keep the blocks, the driver keeps the map — and
``evict``/``clear`` unpersist. This is the explicit-opt-in surface the
reference gates behind ``use_query_cache``; nothing in the engine
caches implicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


class QueryResultCache:
    def __init__(self, max_entries: int = 64):
        self.max_entries = max_entries
        self._entries: dict[str, DataFrame] = {}

    @staticmethod
    def _key(df: DataFrame) -> str:
        return df._jdf.queryExecution().analyzed().canonicalized().toString()

    def get_or_cache(self, df: DataFrame) -> DataFrame:
        """Return the cached DataFrame for this plan, persisting on
        first sight (FIFO eviction past max_entries)."""
        key = self._key(df)
        hit = self._entries.get(key)
        if hit is not None:
            return hit
        if len(self._entries) >= self.max_entries:
            oldest_key = next(iter(self._entries))
            self._entries.pop(oldest_key).unpersist()
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        self._entries[key] = df
        return df

    def evict(self, df: DataFrame) -> bool:
        entry = self._entries.pop(self._key(df), None)
        if entry is not None:
            entry.unpersist()
            return True
        return False

    def clear(self) -> None:
        for df in self._entries.values():
            df.unpersist()
        self._entries.clear()

    def __len__(self) -> int:
        return len(self._entries)


_DEFAULT: QueryResultCache | None = None


def default_cache() -> QueryResultCache:
    """Process-wide cache instance — the one SYSTEM DROP QUERY CACHE
    clears (reference: a single server-level QueryResultCache)."""
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = QueryResultCache()
    return _DEFAULT
