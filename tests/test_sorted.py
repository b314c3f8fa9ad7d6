"""search_sorted: Sort/TopFieldCollector analogue over doc_meta fields."""

import pytest

from golucene_spark.index import CorpusSpec, IndexBuilder, LogicalIndex, MaterializedIndex
from golucene_spark.search import Searcher


@pytest.fixture(scope="module")
def six(spark, tmp_path_factory):
    rows = [
        (0, "data engine", "en", "web"),
        (1, "data pipeline data", "de", "book"),
        (2, "data lake", "en", "archive"),
        (3, "other text", "fr", "web"),
        (4, "data store", "de", "web"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    ixdir = str(tmp_path_factory.mktemp("sorted") / "ix")
    IndexBuilder(spark, CorpusSpec.documents(), analyzer="simple",
                 quantize_norms=False, num_segments=2).build(df, ixdir)
    return MaterializedIndex(spark, ixdir)


def test_sorted_asc_desc_and_tiebreak(six):
    s = Searcher(six, "bm25")
    asc = s.search_sorted("text:data", [("source", True)], k=10).collect()
    assert [r["doc_id"] for r in asc] == [2, 1, 0, 4]  # archive, book, web(0<4)
    desc = s.search_sorted("text:data", [("source", False)], k=10).collect()
    assert [r["doc_id"] for r in desc] == [0, 4, 1, 2]
    # k truncates after the sort
    assert [r["doc_id"] for r in s.search_sorted("text:data", [("source", True)], k=2).collect()] == [2, 1]
    # scores ride along and match the relevance path
    rel = {r["doc_id"]: r["score"] for r in s.search("text:data", 10).collect()}
    for r in asc:
        assert r["score"] == pytest.approx(rel[r["doc_id"]], rel=1e-12)


def test_sorted_multi_key(six):
    s = Searcher(six, "bm25")
    rows = s.search_sorted("text:data", [("lang", True), ("source", False)], k=10).collect()
    assert [r["doc_id"] for r in rows] == [4, 1, 0, 2]  # de:(web,book), en:(web,archive)


def test_sorted_requires_doc_meta(spark):
    df = spark.createDataFrame([(0, "x", "en", "w")], "doc_id long, text string, lang string, source string")
    ix = LogicalIndex(df, CorpusSpec.documents(), analyzer="simple")
    with pytest.raises(ValueError):
        Searcher(ix).search_sorted("text:x", [("source", True)])


def test_search_filtered_predicate(six):
    # FilteredQuery role: relevance from the query, matches restricted
    # by a stored-field predicate that never touches the score
    s = Searcher(six, "bm25")
    hits = s.search_filtered("text:data", "lang = 'de'", k=10).collect()
    assert {r["doc_id"] for r in hits} == {1, 4}
    rel = {r["doc_id"]: r["score"] for r in s.search("text:data", 10).collect()}
    for r in hits:
        assert r["score"] == rel[r["doc_id"]]
    assert s.search_filtered("text:data", "source = 'nope'", 10).count() == 0


def test_doc_values_column(spark, six):
    """doc_values(column): live per-doc values frame (the DocValues role
    served from the columnar doc_meta store)."""
    vals = {r["doc_id"]: r["value"] for r in six.doc_values("lang").collect()}
    metas = {r["doc_id"]: r["lang"] for r in six.live_doc_meta().collect()}
    assert vals == metas and len(vals) > 0
    import pytest

    with pytest.raises(ValueError):
        six.doc_values("not_a_column")


def test_function_score_modes(spark, six):
    """FunctionScoreQuery: relevance combined with a doc-values
    expression, multiply and sum modes."""
    from golucene_spark.search import Searcher

    s = Searcher(six, "bm25")
    base = {r["doc_id"]: r["score"] for r in s.search("text:data", 50).collect()}
    mult = {r["doc_id"]: r["score"]
            for r in s.function_score(
                "text:data", "case when lang = 'de' then 2.0 else 0.5 end",
                k=50).collect()}
    metas = {r["doc_id"]: r["lang"] for r in six.live_doc_meta().collect()}
    for d, v in mult.items():
        want = base[d] * (2.0 if metas[d] == "de" else 0.5)
        assert v == pytest.approx(want, rel=1e-12)
    add = {r["doc_id"]: r["score"]
           for r in s.function_score("text:data", "doc_id * 0.25",
                                     mode="sum", k=50).collect()}
    for d, v in add.items():
        assert v == pytest.approx(base[d] + d * 0.25, rel=1e-12)
    with pytest.raises(ValueError):
        s.function_score("text:data", "1.0", mode="nope")
