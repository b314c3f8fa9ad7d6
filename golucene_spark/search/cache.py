"""Query caching: an LRU of persisted score frames (the Lucene core
LRUQueryCache role — it caches per-segment DocIdSets; here the cached
unit is the scored match frame, which Spark can hold distributed and
columnar via persist()).

A CachingSearcher wraps a Searcher: the first execution of a query
persists its score frame; repeated executions (same AST, same
similarity) reuse the cached distributed dataset — top-k, totalHits,
facets and grouping all re-derive from it without re-scanning
postings.  Eviction is LRU with a bounded entry count; evicted frames
are unpersisted (blocking=False) so executor storage is reclaimed.

Scale note: cache entries live in executor storage memory
(MEMORY_AND_DISK), not on the driver; cache() is per-session, exactly
like Lucene's per-IndexSearcher cache.
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame
from pyspark import StorageLevel


def _query_key(q) -> str:
    # AST dataclasses are frozen/hashable with value equality; repr is
    # deterministic and includes boosts/slops/occurs
    return repr(q)


class CachingSearcher:
    """Decorator over Searcher adding an LRU score-frame cache."""

    def __init__(self, searcher, max_entries: int = 32,
                 storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK):
        self.searcher = searcher
        self.max_entries = max_entries
        self.storage_level = storage_level
        self._cache: OrderedDict[str, DataFrame] = OrderedDict()
        self.hits = 0
        self.misses = 0

    # -- cached core ------------------------------------------------------
    def score_frame(self, query) -> DataFrame:
        if isinstance(query, str):
            from .parser import parse_query

            query = parse_query(query)
        key = (self.searcher.sim.name, _query_key(query))
        if key in self._cache:
            self.hits += 1
            self._cache.move_to_end(key)
            return self._cache[key]
        self.misses += 1
        frame = self.searcher.score_frame(query).persist(self.storage_level)
        self._cache[key] = frame
        while len(self._cache) > self.max_entries:
            _, evicted = self._cache.popitem(last=False)
            evicted.unpersist(blocking=False)
        return frame

    def search(self, query, k: int = 10) -> DataFrame:
        # collects through executor.collect_topk — ONE collector order
        # shared with Searcher.search/search_after (ADVICE r4)
        from .executor import collect_topk

        return collect_topk(self.score_frame(query), k)

    def search_with_total(self, query, k: int = 10, hydrate: bool = False):
        from .executor import collect_topk

        frame = self.score_frame(query)
        total = frame.count()
        meta = (self.searcher._live_meta().drop("segment_id")
                if hydrate and hasattr(self.searcher.index, "doc_meta")
                else None)
        return total, collect_topk(frame, k, hydrate_meta=meta)

    def search_after(self, query, after, k: int = 10) -> DataFrame:
        # pagination is the cache's best case: every page after the
        # first filters the SAME persisted frame instead of rescanning.
        from .executor import collect_topk

        return collect_topk(self.score_frame(query), k, after=after)

    def clear(self):
        for f in self._cache.values():
            f.unpersist(blocking=False)
        self._cache.clear()

    # everything else (explain, search_sorted, index, sim, ...) passes
    # through to the wrapped searcher
    def __getattr__(self, name):
        return getattr(self.searcher, name)
