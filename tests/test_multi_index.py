"""MultiIndex (CompositeReader role) over materialized indexes:
docBase-shifted ids, aggregated stats, hydration and document routing."""

import pytest

from golucene_spark.index import CorpusSpec, IndexBuilder, MaterializedIndex, MultiIndex
from golucene_spark.search import Searcher, TermQuery, facet_counts


@pytest.fixture(scope="module")
def mix(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("multi")
    dirs = []
    for i, rows in enumerate([
        [(0, "spark engine alpha", "en", "web"), (1, "other beta", "de", "web")],
        [(0, "spark planner gamma", "fr", "book"), (1, "spark shuffle", "en", "book")],
    ]):
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
        d = str(base / f"ix{i}")
        IndexBuilder(spark, CorpusSpec.documents(), analyzer="simple",
                     quantize_norms=False, num_segments=2).build(df, d)
        dirs.append(d)
    subs = [MaterializedIndex(spark, d) for d in dirs]
    return MultiIndex(subs), subs


def test_multi_materialized_search_and_stats(mix):
    multi, subs = mix
    s = Searcher(multi, "bm25")
    hits = s.search(TermQuery("text", "spark"), 10).collect()
    assert len(hits) == 3
    ids = {r["doc_id"] for r in hits}
    assert ids == {0, multi.doc_base(1) + 0, multi.doc_base(1) + 1}
    st = {r["term"]: (r["df"], r["ttf"]) for r in multi.term_stats("text", ["spark"]).collect()}
    assert st["spark"] == (3, 3)
    assert multi.collection_stats_row("text")["max_doc"] == 4


def test_multi_document_routing_and_hydration(mix):
    multi, subs = mix
    # document() routes by docBase to the right sub-index
    assert multi.document(0)["lang"] == "en"
    assert multi.document(multi.doc_base(1) + 0)["lang"] == "fr"
    assert multi.document(multi.doc_base(5)) is None
    s = Searcher(multi, "bm25")
    total, top = s.search_with_total(TermQuery("text", "spark"), 10, hydrate=True)
    assert total == 3
    langs = {r["doc_id"]: r["lang"] for r in top.collect()}
    assert langs[multi.doc_base(1) + 0] == "fr"
    from golucene_spark.search import group_search

    grp = group_search(s, TermQuery("text", "spark"), "lang").collect()
    assert {r["group"] for r in grp} == {"en", "fr"}
    # facets compose too: per-leaf keyword postings union, docBase-shifted
    fc = {r["value"]: r["count"] for r in facet_counts(s, TermQuery("text", "spark"), "lang").collect()}
    assert fc == {"en": 2, "fr": 1}


def test_multi_term_vector_routing(spark, tmp_path):
    from golucene_spark.index import IndexBuilder

    base = tmp_path
    dirs = []
    for i, text in enumerate(["alpha beta alpha", "gamma delta"]):
        df = spark.createDataFrame([(0, text, "en", "web")],
                                   "doc_id long, text string, lang string, source string")
        d = str(base / f"tvix{i}")
        IndexBuilder(spark, CorpusSpec.documents(), analyzer="simple",
                     quantize_norms=False, num_segments=1,
                     store_term_vectors=True).build(df, d)
        dirs.append(d)
    multi = MultiIndex([MaterializedIndex(spark, d) for d in dirs])
    tv0 = {e["term"]: e["freq"] for e in multi.term_vector(0, field="text")}
    assert tv0 == {"alpha": 2, "beta": 1}
    tv1 = {e["term"]: e["freq"] for e in multi.term_vector(multi.doc_base(1), field="text")}
    assert tv1 == {"gamma": 1, "delta": 1}
    assert multi.term_vector(multi.doc_base(5)) == []


def test_join_search_across_indexes(spark, mix):
    # JoinUtil role across two DIFFERENT indexes: langs of index-0 docs
    # matching 'spark' filter index-1 docs by lang
    from golucene_spark.search import join_search

    multi, subs = mix
    s0 = Searcher(subs[0], "bm25")  # docs: en(spark), de
    s1 = Searcher(subs[1], "bm25")  # docs: fr(spark), en(spark)
    # from s0: 'spark' matches only the en doc -> join value {'en'}
    hits = join_search(s0, TermQuery("text", "spark"), "lang", s1, "lang", k=10).collect()
    assert [r["doc_id"] for r in hits] == [1]  # only s1's en doc
    assert hits[0]["score"] == 1.0
