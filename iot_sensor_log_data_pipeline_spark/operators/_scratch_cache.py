"""Per-operator-call scratch caching with bounded lifetime.

Spark's CacheManager holds cached plans until an explicit unpersist,
so operators that cache intermediates (shingle tables, LSH band
tables) would leak storage across calls in a long-lived session.
Contract: each registry caches at most the CURRENT call's scratch --
a new call releases the previous call's entries first, and
``release()`` drops everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class ScratchCaches:
    def __init__(self) -> None:
        self._live: list[DataFrame] = []

    def cache(self, df: DataFrame) -> DataFrame:
        """Cache ``df`` for the current operator call, releasing the
        previous call's scratch first."""
        self.release()
        df = df.cache()
        self._live.append(df)
        return df

    def cache_more(self, df: DataFrame) -> DataFrame:
        """Cache an ADDITIONAL intermediate for the same operator call
        (multi-stage operators like ``bm25_prf_rank`` cache each
        stage's tiny derived table).  Does NOT release -- the next
        ``cache()`` call (i.e. the next operator call) drops the whole
        set at once, preserving the one-call-lifetime contract."""
        df = df.cache()
        self._live.append(df)
        return df

    def release(self) -> None:
        while self._live:
            self._live.pop().unpersist()
