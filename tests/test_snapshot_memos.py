"""Snapshot-scoped memoization semantics: term stats and multi-term
expansions cache ON the index object (shared by every Searcher over
the snapshot), and mutation paths drop them by re-opening the index."""

import shutil

import pytest

from golucene_spark.index import CorpusSpec, IndexBuilder, MaterializedIndex
from golucene_spark.search import Searcher, parse_query


@pytest.fixture(scope="module")
def mix(spark, tmp_path_factory):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ixdir = str(tmp_path_factory.mktemp("memo_ix") / "ix")
    shutil.rmtree(ixdir, ignore_errors=True)
    IndexBuilder(spark, CorpusSpec.documents(), num_segments=4).build(docs, ixdir)
    return MaterializedIndex(spark, ixdir)


def test_fresh_searchers_share_stats_memo(spark, mix):
    q = parse_query("text:data", default_field="text", analyzer="standard")
    s1 = Searcher(mix, "bm25")
    r1 = s1.search(q, 5).collect()
    assert ("text", "data") in mix._tstats_shared
    s2 = Searcher(mix, "bm25")  # fresh searcher, same snapshot
    assert s2._tstats_cache is mix._tstats_shared
    assert s2.search(q, 5).collect() == r1


def test_expansion_memo_hit_and_key_separation(spark, mix):
    s = Searcher(mix, "bm25")
    q = parse_query("text:da*", default_field="text", analyzer="standard")
    r1 = s.search(q, 5).collect()
    memo = mix._expand_shared
    n = len(memo)
    assert n >= 1
    # same pattern again: no new memo entry, same results
    assert Searcher(mix, "bm25").search(q, 5).collect() == r1
    assert len(memo) == n
    # different boost is a different expansion (boost folds into clauses)
    qb = parse_query("text:da*^2", default_field="text", analyzer="standard")
    rb = Searcher(mix, "bm25").search(qb, 5).collect()
    assert len(memo) == n + 1
    assert {r.doc_id for r in rb} == {r.doc_id for r in r1}
    for a, b in zip(sorted(r1, key=lambda r: r.doc_id),
                    sorted(rb, key=lambda r: r.doc_id)):
        assert b.score == pytest.approx(2.0 * a.score, rel=1e-12)


def test_reopen_drops_memos(spark, mix):
    """Mutation paths (deletes/updates/NRT/merge) re-open the index; a
    re-opened snapshot must start with empty memos."""
    Searcher(mix, "bm25").search(
        parse_query("text:data", default_field="text", analyzer="standard"), 1
    ).collect()
    assert mix._tstats_shared
    reopened = MaterializedIndex(spark, mix.index_dir)
    assert getattr(reopened, "_tstats_shared", None) is None
    assert getattr(reopened, "_expand_shared", None) is None
    assert getattr(reopened, "_plan_shared", None) is None


def test_plan_memo_reuses_frames_and_keys_correctly(spark, mix):
    """The prepared-plan memo (r6): a repeated (query, k, similarity)
    returns the SAME immutable DataFrame (no rebuilt plan), every
    collect recomputes identical rows, and distinct k / similarity /
    boost produce distinct plans."""
    q = parse_query("text:data OR text:table", default_field="text",
                    analyzer="standard")
    f1 = Searcher(mix, "bm25").search(q, 5)
    r1 = [(r.doc_id, r.score) for r in f1.collect()]
    f2 = Searcher(mix, "bm25").search(q, 5)  # fresh searcher, same snapshot
    assert f2 is f1  # memo hit: the very same DataFrame object
    assert [(r.doc_id, r.score) for r in f2.collect()] == r1
    assert Searcher(mix, "bm25").search(q, 3) is not f1       # k differs
    assert Searcher(mix, "classic").search(q, 5) is not f1    # sim differs
    qb = parse_query("text:data^2 OR text:table", default_field="text",
                     analyzer="standard")
    assert Searcher(mix, "bm25").search(qb, 5) is not f1      # boost differs
    # custom-k1 BM25 must not collide with the default-parameter plan
    from golucene_spark.search.similarity import BM25Similarity

    fk = Searcher(mix, BM25Similarity(k1=0.5)).search(q, 5)
    assert fk is not f1
