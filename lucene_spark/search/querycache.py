"""Query-result caching (LRUQueryCache analog).

`core/src/java/org/apache/lucene/search/LRUQueryCache.java:60-108`
caches the doc-id sets of filter-like (non-scoring) clauses per
segment, evicting least-recently-used entries; cached clauses skip
re-evaluation entirely.

Spark re-expression: the match set of a rewritten query is a
DataFrame of doc_ids; caching = ``persist()`` (memory-and-disk, the
same tier Lucene's bitsets occupy), keyed by the canonical rewritten
query repr. Eviction unpersists. Spark's own CacheManager would reuse
an identical PLAN anyway, but an explicit LRU gives the Lucene
behaviors plans don't: bounded entry count, recency eviction, and
cross-plan reuse when differently-built trees rewrite to the same
canonical query.
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame

from lucene_spark.search.query import Query, rewrite

__all__ = ["LRUQueryCache"]


class LRUQueryCache:
    """Bounded LRU of match-set DataFrames keyed by rewritten query."""

    def __init__(self, searcher, max_entries: int = 32):
        self._searcher = searcher
        self._max = int(max_entries)
        self._entries: OrderedDict[str, DataFrame] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def _key(self, query: Query) -> str:
        # Key on the canonical UNEXPANDED query repr: expanding a
        # MultiTermQuery needs a terms-table probe (a Spark job), and
        # running one per lookup — hits included — would defeat the
        # cache. Structural rewrites that need no dictionary (boolean
        # simplification etc.) still canonicalize the key; the
        # dictionary-dependent expansion happens once, on miss, inside
        # search().
        try:
            return repr(rewrite(query, None))
        except ValueError:  # tree contains a multi-term query
            return repr(query)

    def matching_docs(self, query: Query) -> DataFrame:
        """doc_ids matching `query` (constant-score semantics), served
        from cache when the rewritten query was seen before."""
        key = self._key(query)
        if key in self._entries:
            self.hits += 1
            self._entries.move_to_end(key)
            return self._entries[key]
        self.misses += 1
        df = (
            self._searcher.search(query, k=(1 << 31) - 1, mode="exhaustive")
            .select("doc_id")
            .persist()
        )
        self._entries[key] = df
        if len(self._entries) > self._max:
            _, evicted = self._entries.popitem(last=False)
            evicted.unpersist()
        return df

    def clear(self) -> None:
        for df in self._entries.values():
            df.unpersist()
        self._entries.clear()
