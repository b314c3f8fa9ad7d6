"""Regression tests for duplicate-content docs and merge segment-id
allocation.

Docs with identical text share a sha256 sentinel term within a segment,
so the sentinel posting list holds >1 doc; doc_stats must emit one row
per doc (not per sentinel list).  Merge must never relabel onto a
still-live segment id.
"""

import pytest
from pyspark.sql import functions as F

from golucene_spark.corpus import make_corpus
from golucene_spark.index import (
    CorpusSpec,
    FieldSpec,
    IndexBuilder,
    LogicalIndex,
    MaterializedIndex,
    merge_segments,
    verify_index,
)
from golucene_spark.search import Searcher, TermQuery


def dup_spec():
    return CorpusSpec(
        text_fields=[FieldSpec("content", "content", True)],
        keyword_fields=[FieldSpec("lang", "lang", False)],
        key_cols=["doc_id"],
        id_col="doc_id",
        meta_cols=["lang"],
    )


@pytest.fixture(scope="module")
def dup_corpus(spark):
    """40 docs; ids 0-9 all share one text, 10/11 share another, 12 is
    empty, 13 is empty too (empty docs share the empty-string sha)."""
    rows = []
    for i in range(10):
        rows.append((i, "identical duplicate payload body", "go"))
    rows.append((10, "another clone pair body", "py"))
    rows.append((11, "another clone pair body", "py"))
    rows.append((12, "", "go"))
    rows.append((13, "", "py"))
    for i in range(14, 40):
        rows.append((i, f"unique document number {i} with filler tokens", "go"))
    return spark.createDataFrame(rows, "doc_id long, content string, lang string")


def test_doc_stats_one_row_per_duplicate_doc(spark, dup_corpus, tmp_path_factory):
    ixdir = str(tmp_path_factory.mktemp("dup")) + "/ix"
    # num_segments=1 forces every duplicate into the SAME segment —
    # the worst case for the sentinel grouping
    IndexBuilder(spark, dup_spec(), num_segments=1).build(dup_corpus, ixdir)
    ix = MaterializedIndex(spark, ixdir)
    n = ix.doc_stats.select(F.countDistinct("doc_id")).collect()[0][0]
    assert n == 40
    assert ix.doc_stats.count() == 40  # exactly one row per doc
    # collection stats see every doc
    assert ix.collection_stats_row("content")["max_doc"] == 40
    # every duplicate is searchable with the same score
    s = Searcher(ix, "bm25")
    hits = s.search(TermQuery("content", "duplicate"), k=20).collect()
    assert [h["doc_id"] for h in hits] == list(range(10))
    assert len({round(h["score"], 12) for h in hits}) == 1
    # CheckIndex passes incl. sha parity vs source
    verify_index(spark, ixdir, source_df=dup_corpus, text_col="content", id_col="doc_id")


def test_logical_index_duplicates(spark, dup_corpus):
    ix = LogicalIndex(dup_corpus, dup_spec(), analyzer="standard", num_segments=1)
    assert ix.doc_stats.select(F.countDistinct("doc_id")).collect()[0][0] == 40
    assert ix.collection_stats_row("content")["max_doc"] == 40


def test_merge_default_id_not_live(spark, tmp_path_factory):
    ixdir = str(tmp_path_factory.mktemp("mrg")) + "/ix"
    corpus = spark.createDataFrame(make_corpus(200, seed=7))
    IndexBuilder(spark, CorpusSpec.source_code(), num_segments=6).build(corpus, ixdir)
    before = Searcher(MaterializedIndex(spark, ixdir), "bm25")
    top_before = [(r["doc_id"], round(r["score"], 10))
                  for r in before.search(TermQuery("content", "parse"), 10).collect()]
    segs = sorted(
        r["segment_id"]
        for r in spark.read.parquet(ixdir + "/doc_stats").select("segment_id").distinct().collect()
    )
    # default new_segment_id must NOT reuse a merged-away id (which
    # would leave the source chunk's rows visible) nor any live id
    rec = merge_segments(spark, ixdir, segs[:2])
    assert rec["new_segment_id"] not in segs
    ix = MaterializedIndex(spark, ixdir)
    assert ix.doc_stats.count() == ix.doc_stats.select(F.countDistinct("doc_id")).collect()[0][0] == 200
    verify_index(spark, ixdir, source_df=corpus, text_col="content")
    after = Searcher(ix, "bm25")
    top_after = [(r["doc_id"], round(r["score"], 10))
                 for r in after.search(TermQuery("content", "parse"), 10).collect()]
    assert top_before == top_after


def test_search_with_total_and_hydration(spark, dup_corpus, tmp_path_factory):
    """TopDocs{totalHits,[ScoreDoc]} (collect.go:53-57) + stored-field
    hydration (document.go:75)."""
    ixdir = str(tmp_path_factory.mktemp("th")) + "/ix"
    IndexBuilder(spark, dup_spec(), num_segments=2).build(dup_corpus, ixdir)
    s = Searcher(MaterializedIndex(spark, ixdir), "bm25")
    q = TermQuery("content", "duplicate")
    total, top = s.search_with_total(q, k=3, hydrate=True)
    assert total == s.score_frame(q).count() == 10
    rows = top.collect()
    assert len(rows) == 3
    assert [r["doc_id"] for r in rows] == [0, 1, 2]
    # hydrated stored fields (lang) present per hit
    assert all(r["lang"] in ("go", "py") for r in rows)
    # top-k scores identical to plain search
    plain = s.search(q, 3).collect()
    assert [(r["doc_id"], r["score"]) for r in rows] == [
        (r["doc_id"], r["score"]) for r in plain
    ]
