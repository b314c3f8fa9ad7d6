"""Faceting (keyword-postings docvalues counting) and MoreLikeThis."""

import math

import pytest

from golucene_spark.index import CorpusSpec, FieldSpec, IndexBuilder, LogicalIndex, MaterializedIndex
from golucene_spark.search import (
    Searcher,
    TermQuery,
    facet_counts,
    interesting_terms,
    more_like_this,
)

ROWS = [
    (0, "spark engine internals", "en", "web"),
    (1, "spark planner", "en", "book"),
    (2, "spark spark streams", "de", "web"),
    (3, "storage formats", "de", "web"),
    (4, "spark shuffle notes", "en", "web"),
]


@pytest.fixture(scope="module")
def fix(spark, tmp_path_factory):
    df = spark.createDataFrame(ROWS, "doc_id long, text string, lang string, source string")
    ixdir = str(tmp_path_factory.mktemp("facets") / "ix")
    IndexBuilder(spark, CorpusSpec.documents(), analyzer="simple",
                 quantize_norms=False, num_segments=2).build(df, ixdir)
    return MaterializedIndex(spark, ixdir)


def test_facet_counts_materialized(fix):
    s = Searcher(fix, "bm25")
    got = [(r["value"], r["count"]) for r in
           facet_counts(s, TermQuery("text", "spark"), "lang").collect()]
    assert got == [("en", 3), ("de", 1)]
    got2 = [(r["value"], r["count"]) for r in
            facet_counts(s, TermQuery("text", "spark"), "source").collect()]
    assert got2 == [("web", 3), ("book", 1)]


def test_facet_counts_logical(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string, lang string, source string")
    ix = LogicalIndex(df, CorpusSpec.documents(), analyzer="simple", quantize_norms=False)
    s = Searcher(ix, "bm25")
    got = [(r["value"], r["count"]) for r in
           facet_counts(s, TermQuery("text", "spark"), "lang").collect()]
    assert got == [("en", 3), ("de", 1)]


def test_interesting_terms_ranking(fix):
    s = Searcher(fix, "bm25")
    sel = interesting_terms(s, "text", "spark spark planner zzzz", analyzer="simple")
    # zzzz has df=0 -> dropped; spark tf=2 beats planner tf=1 despite lower idf
    assert [r["term"] for r in sel] == ["spark", "planner"]
    n = 5
    assert sel[0]["score"] == pytest.approx(2 * (math.log(n / (4 + 1.0)) + 1.0))
    assert sel[1]["score"] == pytest.approx(1 * (math.log(n / (1 + 1.0)) + 1.0))
    # min_doc_freq filters the rare term
    sel2 = interesting_terms(s, "text", "spark planner", min_doc_freq=2, analyzer="simple")
    assert [r["term"] for r in sel2] == ["spark"]


def test_more_like_this_end_to_end(fix):
    s = Searcher(fix, "bm25")
    top = more_like_this(s, "text", "spark engine deep dive", analyzer="simple", k=3).collect()
    assert top and top[0]["doc_id"] == 0  # matches both spark AND engine
    # boolean-equivalence: same as searching the selected terms directly
    got = {r["doc_id"]: r["score"] for r in top}
    want = {r["doc_id"]: r["score"] for r in s.search("text:spark OR text:engine", 3).collect()}
    assert got == want
    # empty probe -> empty frame
    assert more_like_this(s, "text", "qqqq zzzz", analyzer="simple").count() == 0


def test_group_search(fix):
    from golucene_spark.search import group_search

    s = Searcher(fix, "bm25")
    rows = group_search(s, TermQuery("text", "spark"), "lang",
                        k_groups=2, k_per_group=1).collect()
    # doc2 ('spark spark streams', de) has the top score -> de group first
    assert [(r["group"], r["doc_id"], r["rnk"]) for r in rows] == [("de", 2, 1), ("en", 1, 1)]
    # k_per_group widens within groups; en has 3 matching docs
    rows2 = group_search(s, TermQuery("text", "spark"), "lang",
                         k_groups=2, k_per_group=5).collect()
    en = [r for r in rows2 if r["group"] == "en"]
    assert len(en) == 3 and [r["rnk"] for r in en] == [1, 2, 3]
    assert all(en[i]["score"] >= en[i + 1]["score"] for i in range(len(en) - 1))
