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

__all__ = [
    "LRUQueryCache",
    "UsageTrackingQueryCachingPolicy",
    "FrequencyTrackingRingBuffer",
]


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


class FrequencyTrackingRingBuffer:
    """`core/util/FrequencyTrackingRingBuffer.java:30`: a fixed-size
    FIFO of recently-seen keys with O(1) frequency lookups — the
    oldest entry's count decrements as it falls out of the window."""

    def __init__(self, max_size: int):
        from collections import deque

        self._max = int(max_size)
        self._buf: "deque[str]" = deque()
        self._freq: dict[str, int] = {}

    def add(self, key: str) -> None:
        self._buf.append(key)
        self._freq[key] = self._freq.get(key, 0) + 1
        if len(self._buf) > self._max:
            old = self._buf.popleft()
            n = self._freq[old] - 1
            if n:
                self._freq[old] = n
            else:
                del self._freq[old]

    def frequency(self, key: str) -> int:
        return self._freq.get(key, 0)


class UsageTrackingQueryCachingPolicy:
    """`core/search/UsageTrackingQueryCachingPolicy.java:28`: cache a
    filter only once it has appeared often enough in the recent-use
    history — 2 uses for COSTLY filters (MultiTermQuery expansions,
    point/set queries, :45 `isCostly`), 5 for ordinary filters,
    4 for compound Boolean/DisMax trees (:122-137, the "don't also
    cache A and B when only 'A OR B' recurs" discount); TermQuery /
    MatchAll / MatchNo / FieldExists are never cached because
    re-running them is cheaper than a bitset (:56-75)."""

    def __init__(self, history_size: int = 256):
        from lucene_spark.search.query import (
            BooleanQuery,
            DisjunctionMaxQuery,
            MatchAllDocsQuery,
            MatchNoDocsQuery,
            MultiTermQuery,
            TermQuery,
        )

        self._never = (TermQuery, MatchAllDocsQuery, MatchNoDocsQuery)
        self._costly = (MultiTermQuery,)
        self._compound = (BooleanQuery, DisjunctionMaxQuery)
        self._ring = FrequencyTrackingRingBuffer(history_size)

    @staticmethod
    def _key(query) -> str:
        return repr(query)

    def min_frequency_to_cache(self, query) -> int:
        if isinstance(query, self._costly):
            return 2
        return 4 if isinstance(query, self._compound) else 5

    def on_use(self, query) -> None:
        if isinstance(query, self._never):
            return
        self._ring.add(self._key(query))

    def frequency(self, query) -> int:
        return self._ring.frequency(self._key(query))

    def should_cache(self, query) -> bool:
        if isinstance(query, self._never):
            return False
        return self.frequency(query) >= self.min_frequency_to_cache(query)
