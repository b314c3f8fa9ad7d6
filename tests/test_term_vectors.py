"""Term vectors (the .tvd/.tvx doc-major store —
codec/lucene42/termVectors.go, whose reader panics in the reference):
getTermVector point reads, stop-gap position preservation, liveDocs."""

import pytest

from golucene_spark.index import CorpusSpec, IndexBuilder, MaterializedIndex
from golucene_spark.index.deletes import delete_docs


@pytest.fixture(scope="module")
def ix(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tv") / "ix")
    rows = [
        (0, "the quick fox the fox", "en", "web"),
        (1, "spark spark engine", "en", "web"),
        (2, "doomed document", "de", "web"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    IndexBuilder(spark, CorpusSpec.documents(), analyzer="standard",
                 num_segments=2, store_term_vectors=True).build(df, d)
    return MaterializedIndex(spark, d), d


def test_positions_preserve_stop_gaps(ix):
    index, _ = ix
    # standard chain: 'the' (stop) leaves a position gap
    # (filtering.go:56-80) — fox sits at ordinals 2 and 4, quick at 1
    tv = {e["term"]: e for e in index.term_vector(0, field="text")}
    assert tv["fox"]["freq"] == 2 and tv["fox"]["positions"] == [2, 4]
    assert tv["quick"]["positions"] == [1]
    assert "the" not in tv


def test_term_vector_matches_postings_freq(ix):
    index, _ = ix
    tv = {e["term"]: e["freq"] for e in index.term_vector(1, field="text")}
    assert tv == {"spark": 2, "engine": 1}


def test_deleted_doc_has_no_vector(ix, spark):
    index, d = ix
    delete_docs(spark, d, [2])
    fresh = MaterializedIndex(spark, d)
    assert fresh.term_vector(2) == []
    # frame-level liveDocs: doc 2 rows gone, others intact
    ids = {r["doc_id"] for r in fresh.term_vectors_frame().select("doc_id").distinct().collect()}
    assert ids == {0, 1}


def test_unbuilt_store_raises(spark, tmp_path):
    d = str(tmp_path / "notv")
    df = spark.createDataFrame([(0, "a b", "en", "web")],
                               "doc_id long, text string, lang string, source string")
    IndexBuilder(spark, CorpusSpec.documents(), num_segments=1).build(df, d)
    with pytest.raises(ValueError, match="store_term_vectors"):
        MaterializedIndex(spark, d).term_vectors_frame()


def test_update_refreshes_term_vector(spark, tmp_path):
    from golucene_spark.index.deletes import update_documents
    from golucene_spark.index import CorpusSpec as CS

    d = str(tmp_path / "ix")
    df = spark.createDataFrame([(0, "old words here", "en", "web")],
                               "doc_id long, text string, lang string, source string")
    IndexBuilder(spark, CS.documents(), analyzer="simple", num_segments=1,
                 store_term_vectors=True).build(df, d)
    new = spark.createDataFrame([(0, "fresh fresh tokens", "en", "web")],
                                "doc_id long, text string, lang string, source string")
    update_documents(spark, d, new, CS.documents(), analyzer="simple")
    tv = {e["term"]: e["freq"] for e in MaterializedIndex(spark, d).term_vector(0, field="text")}
    assert tv == {"fresh": 2, "tokens": 1}
