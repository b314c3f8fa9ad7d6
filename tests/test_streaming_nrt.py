"""NRT incremental indexing: streamed micro-batches become searchable
segments (the Spark re-expression of core/store/nrt.go reopen semantics)."""

import pytest
from pyspark.sql import functions as F, types as T

from golucene_spark.corpus import make_corpus
from golucene_spark.index import CorpusSpec, FieldSpec, MaterializedIndex, verify_index
from golucene_spark.search import Searcher, TermQuery
from golucene_spark.streaming import start_incremental_index


def doc_spec():
    return CorpusSpec(
        text_fields=[FieldSpec("content", "content", True)],
        keyword_fields=[FieldSpec("lang", "lang", False)],
        key_cols=["doc_id"],
        id_col="doc_id",
        meta_cols=["repo", "path", "lang"],
    )


def test_streaming_incremental_index(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("nrt")
    src = str(base / "incoming")
    ixdir = str(base / "index")
    ckpt = str(base / "ckpt")

    pdf = make_corpus(120, seed=42)
    pdf = pdf.reset_index().rename(columns={"index": "doc_id"})
    wave1 = spark.createDataFrame(pdf.iloc[:60])
    wave2 = spark.createDataFrame(pdf.iloc[60:])
    wave1.coalesce(1).write.mode("append").parquet(src)

    schema = wave1.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = start_incremental_index(stream, ixdir, doc_spec(), checkpoint_dir=ckpt)
    try:
        q.processAllAvailable()
        ix1 = MaterializedIndex(spark, ixdir)
        n1 = ix1.doc_stats.select(F.countDistinct("doc_id")).collect()[0][0]
        assert n1 == 60

        wave2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    ix2 = MaterializedIndex(spark, ixdir)
    n2 = ix2.doc_stats.select(F.countDistinct("doc_id")).collect()[0][0]
    assert n2 == 120
    # docs from both waves are searchable with consistent global stats
    s = Searcher(ix2, "bm25")
    hits = s.search(TermQuery("content", "parse"), 120).collect()
    hit_ids = {r["doc_id"] for r in hits}
    assert hit_ids & set(range(60)) and hit_ids & set(range(60, 120))
    verify_index(spark, ixdir)

    # incremental field_stats: batches after the first fold manifest
    # deltas instead of re-scanning doc_stats/term_dict per epoch, and
    # the folded table equals a full recompute
    import json
    import os

    mdir = os.path.join(ixdir, "manifest")
    recs = []
    for fn in os.listdir(mdir):
        if fn.endswith(".json"):
            with open(os.path.join(mdir, fn)) as f:
                recs.append(json.load(f))
    stream_recs = sorted(
        (r for r in recs if r.get("kind") == "stream"), key=lambda r: r["epoch"]
    )
    assert len(stream_recs) == 2
    assert all("field_stats" in r for r in stream_recs)
    assert stream_recs[1]["stats_mode"] == "incremental"

    folded = {
        r["field"]: (r["doc_count"], r["sum_ttf_exact"], r["sum_ttf"], r["sum_df"], r["max_doc"])
        for r in spark.read.parquet(os.path.join(ixdir, "field_stats")).collect()
    }
    from golucene_spark.index.merge import refresh_field_stats

    refresh_field_stats(spark, ixdir)
    full = {
        r["field"]: (r["doc_count"], r["sum_ttf_exact"], r["sum_ttf"], r["sum_df"], r["max_doc"])
        for r in spark.read.parquet(os.path.join(ixdir, "field_stats")).collect()
    }
    assert folded == full


def test_update_and_stream_epoch_no_collision(spark, tmp_path_factory):
    """ADVICE r2 (medium): an 'update' flush and a stream micro-batch
    reaching the SAME epoch number must not share a chunk directory or
    segment id — the stream used to overwrite the update's postings
    while its tombstones persisted, silently losing the updated docs."""
    import os

    from golucene_spark.index.deletes import update_documents
    from golucene_spark.streaming import incremental_index_batch

    base = tmp_path_factory.mktemp("nrt_upd")
    ixdir = str(base / "index")
    spec = doc_spec()

    seed = spark.createDataFrame(
        [(0, "r", "p", "py", "alpha original body"),
         (1, "r", "p", "py", "beta original body")],
        "doc_id long, repo string, path string, lang string, content string",
    )
    incremental_index_batch(seed, 0, ixdir, spec, analyzer="simple",
                            quantize_norms=False)

    upd = spark.createDataFrame(
        [(1, "r", "p", "py", "beta replaced body")],
        "doc_id long, repo string, path string, lang string, content string",
    )
    rec_u = update_documents(spark, ixdir, upd, spec, analyzer="simple",
                             quantize_norms=False)

    # a (resumed) stream reaches the same epoch number as the update
    more = spark.createDataFrame(
        [(2, "r", "p", "py", "gamma streamed body")],
        "doc_id long, repo string, path string, lang string, content string",
    )
    rec_s = incremental_index_batch(more, rec_u["epoch"], ixdir, spec,
                                    analyzer="simple", quantize_norms=False)

    assert rec_u["chunk"] != rec_s["chunk"]
    assert rec_u["segment_id"] != rec_s["segment_id"]
    assert os.path.isdir(os.path.join(ixdir, "postings", f"chunk={rec_u['chunk']}"))
    assert os.path.isdir(os.path.join(ixdir, "postings", f"chunk={rec_s['chunk']}"))

    s = Searcher(MaterializedIndex(spark, ixdir), "bm25")
    assert {r["doc_id"] for r in s.search(TermQuery("content", "replaced"), 10).collect()} == {1}
    assert {r["doc_id"] for r in s.search(TermQuery("content", "original"), 10).collect()} == {0}
    assert {r["doc_id"] for r in s.search(TermQuery("content", "streamed"), 10).collect()} == {2}


def test_merge_id_never_collides_with_future_stream_epoch(spark, tmp_path_factory):
    """A merge of stream segments must not allocate the id a FUTURE
    stream epoch will deterministically use (1_000_000 + epoch)."""
    from golucene_spark.index.merge import MERGE_ID_BASE, merge_segments
    from golucene_spark.streaming import incremental_index_batch

    base = tmp_path_factory.mktemp("nrt_merge")
    ixdir = str(base / "index")
    spec = doc_spec()
    for epoch, (i, w) in enumerate([(0, "alpha early"), (1, "beta early")]):
        b = spark.createDataFrame(
            [(i, "r", "p", "py", w)],
            "doc_id long, repo string, path string, lang string, content string",
        )
        incremental_index_batch(b, epoch, ixdir, spec, analyzer="simple",
                                quantize_norms=False)
    rec = merge_segments(spark, ixdir, [1_000_000, 1_000_001])
    assert rec["new_segment_id"] >= MERGE_ID_BASE
    # the next stream epoch's deterministic id is now guaranteed free
    b2 = spark.createDataFrame(
        [(2, "r", "p", "py", "gamma later")],
        "doc_id long, repo string, path string, lang string, content string",
    )
    rec2 = incremental_index_batch(b2, 2, ixdir, spec, analyzer="simple",
                                   quantize_norms=False)
    assert rec2["segment_id"] == 1_000_002 != rec["new_segment_id"]
    s = Searcher(MaterializedIndex(spark, ixdir), "bm25")
    for term, want in [("early", {0, 1}), ("later", {2})]:
        got = {r["doc_id"] for r in s.search(TermQuery("content", term), 10).collect()}
        assert got == want, (term, got)
