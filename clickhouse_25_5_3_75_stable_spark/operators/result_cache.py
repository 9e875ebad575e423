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
        self._meta: dict[str, dict] = {}

    @staticmethod
    def _key(df: DataFrame) -> str:
        return df._jdf.queryExecution().analyzed().canonicalized().toString()

    def get_or_cache(self, df: DataFrame, query: str = "",
                     query_id: str = "") -> DataFrame:
        """Return the cached DataFrame for this plan, persisting on
        first sight (FIFO eviction past max_entries). query/query_id
        feed system.query_cache (StorageSystemQueryResultCache.cpp)."""
        import datetime

        key = self._key(df)
        hit = self._entries.get(key)
        if hit is not None:
            return hit
        if len(self._entries) >= self.max_entries:
            oldest_key = next(iter(self._entries))
            self._entries.pop(oldest_key).unpersist()
            self._meta.pop(oldest_key, None)
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        self._entries[key] = df
        self._meta[key] = {
            "query": query,
            "query_id": query_id,
            "inserted_at": datetime.datetime.now(),
        }
        return df

    def entries(self):
        return list(self._entries.items())

    def entry_meta(self, key: str) -> dict:
        import datetime

        return self._meta.get(key) or {
            "query": "", "query_id": "",
            "inserted_at": datetime.datetime.now(),
        }

    def evict(self, df: DataFrame) -> bool:
        key = self._key(df)
        entry = self._entries.pop(key, None)
        self._meta.pop(key, None)
        if entry is not None:
            entry.unpersist()
            return True
        return False

    def clear(self) -> None:
        for df in self._entries.values():
            df.unpersist()
        self._entries.clear()
        self._meta.clear()

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
