"""CachingSearcher: LRU score-frame cache (LRUQueryCache role)."""

import pytest

from golucene_spark.index import CorpusSpec, LogicalIndex
from golucene_spark.search import CachingSearcher, Searcher, TermQuery


@pytest.fixture(scope="module")
def cs(spark):
    rows = [(i, f"alpha beta w{i % 3}", "en", "web") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    ix = LogicalIndex(df, CorpusSpec.documents(), analyzer="simple", quantize_norms=False)
    return CachingSearcher(Searcher(ix, "bm25"), max_entries=2)


def test_cache_hit_identical_results(cs):
    q = TermQuery("text", "alpha")
    a = cs.search(q, 5).collect()
    assert (cs.hits, cs.misses) == (0, 1)
    b = cs.search(q, 5).collect()
    assert (cs.hits, cs.misses) == (1, 1)
    assert a == b
    assert cs.score_frame(q).is_cached


def test_lru_eviction_and_clear(cs):
    q1, q2, q3 = (TermQuery("text", t) for t in ("w0", "w1", "w2"))
    f1 = cs.score_frame(q1)
    cs.score_frame(q2)
    cs.score_frame(q3)  # evicts the oldest beyond max_entries=2
    assert len(cs._cache) == 2
    assert not f1.is_cached  # evicted frame was unpersisted
    # totalHits path reuses the cache
    total, top = cs.search_with_total(q3, 2)
    assert total == 10 and len(top.collect()) == 2
    cs.clear()
    assert len(cs._cache) == 0


def test_passthrough_to_searcher(cs):
    # explain and stats pass through the wrapped Searcher
    q = TermQuery("text", "alpha")
    ex = cs.explain(q, 0)
    assert ex["match"]
