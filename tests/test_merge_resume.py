"""F5 resume/lineage + F6 merge/skew fixtures + CheckIndex invariants."""

import shutil

import pytest
from pyspark.sql import functions as F

from golucene_spark.corpus import make_corpus
from golucene_spark.index import (
    CorpusSpec,
    IndexBuilder,
    MaterializedIndex,
    blocked_postings,
    merge_segments,
    select_merges,
    tokenize_tf,
    verify_index,
    assign_doc_ids,
)
from golucene_spark.search import Searcher, parse_query


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = make_corpus(400, seed=42)
    return spark.createDataFrame(pdf).repartition(8).cache()


def _rows(spark, path, cols):
    return sorted(
        tuple(r[c] for c in cols)
        for r in spark.read.parquet(path).select(*cols).collect()
    )


def test_resume_after_interruption(spark, corpus, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("ix"))
    full_dir, part_dir = base + "/full", base + "/part"

    b1 = IndexBuilder(spark, CorpusSpec.source_code(), num_segments=8)
    b1.build(corpus, full_dir, num_chunks=4)

    # interrupted build: commit hook raises after 2 chunks
    b2 = IndexBuilder(spark, CorpusSpec.source_code(), num_segments=8)
    orig = IndexBuilder._commit_chunk
    calls = {"n": 0}

    def bomb(self, index_dir, rec):
        calls["n"] += 1
        orig(self, index_dir, rec)
        if calls["n"] == 2:
            raise RuntimeError("simulated crash")

    IndexBuilder._commit_chunk = bomb
    try:
        with pytest.raises(RuntimeError):
            b2.build(corpus, part_dir, num_chunks=4)
    finally:
        IndexBuilder._commit_chunk = orig

    # resume: only the 2 missing chunks are built
    b3 = IndexBuilder(spark, CorpusSpec.source_code(), num_segments=8)
    m = b3.build(corpus, part_dir, num_chunks=4)
    assert m["chunks_skipped"] == 2 and m["chunks_built"] == 2

    # final index logically identical to the uninterrupted build
    cols = ["segment_id", "doc_id", "field", "term", "freq"]
    a = _rows(spark, full_dir + "/term_dict", ["segment_id", "field", "term", "df", "ttf"])
    b = _rows(spark, part_dir + "/term_dict", ["segment_id", "field", "term", "df", "ttf"])
    assert a == b
    da = _rows(spark, full_dir + "/doc_stats", ["doc_id", "length", "norm_byte", "content_sha256"])
    db = _rows(spark, part_dir + "/doc_stats", ["doc_id", "length", "norm_byte", "content_sha256"])
    assert da == db

    verify_index(spark, part_dir, source_df=corpus, text_col="content")


def test_salted_blocking_equivalence(spark, corpus):
    docs = assign_doc_ids(corpus, CorpusSpec.source_code(), 4)
    tf = tokenize_tf(docs, CorpusSpec.source_code()).cache()
    plain = blocked_postings(tf)
    salted = blocked_postings(tf, salt_range=64)

    def flat(b):
        return sorted(
            (r["segment_id"], r["field"], r["term"], d, f)
            for r in b.select(
                "segment_id", "field", "term",
                F.explode(F.arrays_zip("doc_ids", "freqs")).alias("e")
            ).select("segment_id", "field", "term",
                     F.col("e.doc_ids").alias("d"), F.col("e.freqs").alias("f")).collect()
            for d, f in [(r["d"], r["f"])]
        )

    assert flat(plain) == flat(salted)
    stats = lambda b: sorted(
        (r["segment_id"], r["field"], r["term"], r["df_seg"], r["ttf_seg"])
        for r in b.select("segment_id", "field", "term", "df_seg", "ttf_seg").distinct().collect()
    )
    assert stats(plain) == stats(salted)
    # the Zipf-hot term `return` must route through >1 salt bucket (F6)
    hot = salted.filter((F.col("term") == "return") & (F.col("field") == "content"))
    assert hot.select(F.max("n_buckets")).collect()[0][0] > 1
    tf.unpersist()


def test_merge_preserves_semantics(spark, corpus, tmp_path_factory):
    ixdir = str(tmp_path_factory.mktemp("ixm"))
    IndexBuilder(spark, CorpusSpec.source_code(), num_segments=16).build(corpus, ixdir)

    pre = MaterializedIndex(spark, ixdir)
    pre_td = sorted(
        (r["field"], r["term"], r["df"], r["ttf"])
        for r in pre.term_dict.groupBy("field", "term")
        .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf")).collect()
    )
    s_pre = Searcher(pre, "bm25")
    q = parse_query("content:parse OR content:tokenize")
    hits_pre = [(r["doc_id"], round(r["score"], 10)) for r in s_pre.search(q, 10).collect()]

    segs = [r["segment_id"] for r in pre.term_dict.select("segment_id").distinct().collect()]
    rec = merge_segments(spark, ixdir, segs, new_segment_id=max(segs) + 1)
    assert rec["kind"] == "merge"

    post = MaterializedIndex(spark, ixdir)
    assert post.term_dict.select("segment_id").distinct().count() == 1
    post_td = sorted(
        (r["field"], r["term"], r["df"], r["ttf"])
        for r in post.term_dict.groupBy("field", "term")
        .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf")).collect()
    )
    assert pre_td == post_td  # W6 invariants: merged df/ttf = sums

    s_post = Searcher(post, "bm25")
    hits_post = [(r["doc_id"], round(r["score"], 10)) for r in s_post.search(q, 10).collect()]
    assert hits_pre == hits_post

    verify_index(spark, ixdir, source_df=corpus, text_col="content")


def test_select_merges_policy():
    segs = {i: 2000 + i for i in range(25)}
    merges = select_merges(segs)
    assert merges and all(2 <= len(g) <= 10 for g in merges)
    flat = [s for g in merges for s in g]
    assert len(flat) == len(set(flat))  # no segment in two merges
    # big segments above the cap are never merged together
    merges2 = select_merges({0: 10, 1: 20, **{i: 6_000_000 for i in range(2, 15)}})
    for g in merges2:
        assert sum({0: 10, 1: 20, **{i: 6_000_000 for i in range(2, 15)}}[s] for s in g) <= 6_000_020


def test_range_layout_equivalence(spark, corpus, tmp_path_factory):
    """range_layout changes only the physical file layout, not results."""
    from pyspark.sql import functions as F

    d1 = str(tmp_path_factory.mktemp("ixr") / "plain")
    d2 = str(tmp_path_factory.mktemp("ixr") / "ranged")
    IndexBuilder(spark, CorpusSpec.source_code(), num_segments=4).build(corpus, d1)
    IndexBuilder(spark, CorpusSpec.source_code(), num_segments=4, range_layout=True, range_partitions=8).build(corpus, d2)
    s1 = Searcher(MaterializedIndex(spark, d1), "bm25")
    ix2 = MaterializedIndex(spark, d2)
    s2 = Searcher(ix2, "bm25")
    q = parse_query("content:parse OR content:buffer")
    r1 = [(r["doc_id"], round(r["score"], 10)) for r in s1.search(q, 10).collect()]
    r2 = [(r["doc_id"], round(r["score"], 10)) for r in s2.search(q, 10).collect()]
    assert r1 == r2
    verify_index(spark, d2, source_df=corpus, text_col="content")

    # file-level term pruning (the .tip role): the ranged build records
    # per-file [min_term, max_term] in the manifest, and a term query
    # opens strictly fewer files than the index has
    assert ix2._prune_files
    total, opened = ix2.last_prune_stats
    assert opened < total and opened >= 1
    # the plain build records no ranges -> full scan path
    assert not MaterializedIndex(spark, d1)._prune_files
    # pruning returns the identical result set for a rare and a hot term
    for qs in ("content:zyzzyva_rare0", "content:return"):
        qq = parse_query(qs)
        a = [(r["doc_id"], round(r["score"], 10)) for r in s1.search(qq, 10).collect()]
        b = [(r["doc_id"], round(r["score"], 10)) for r in s2.search(qq, 10).collect()]
        assert a == b, qs


def test_explicit_new_segment_id_collisions_raise(spark, tmp_path_factory):
    """A caller-supplied new_segment_id equal to a merge input or an
    already-merged-away id would make the merge output invisible
    (dead_segments kills by id); merge_segments must reject it
    (ADVICE r4)."""
    import pytest as _pytest

    from golucene_spark.corpus import make_corpus
    from golucene_spark.index import CorpusSpec, IndexBuilder, MaterializedIndex
    from golucene_spark.index.merge import merge_segments

    pdf = make_corpus(120, seed=7)
    df = spark.createDataFrame(pdf).repartition(4)
    ixdir = str(tmp_path_factory.mktemp("ixcol"))
    IndexBuilder(spark, CorpusSpec.source_code(), num_segments=4).build(df, ixdir)
    segs = sorted(
        int(r["segment_id"])
        for r in MaterializedIndex(spark, ixdir)
        .term_dict.select("segment_id")
        .distinct()
        .collect()
    )
    with _pytest.raises(ValueError, match="merge inputs"):
        merge_segments(spark, ixdir, segs[:2], new_segment_id=segs[0])
    # LIVE non-input segment: scoped tombstones translated through the
    # merge lineage would kill the unrelated segment's rows
    with _pytest.raises(ValueError, match="live segment"):
        merge_segments(spark, ixdir, segs[:2], new_segment_id=segs[3])
    # reserved NRT/update epoch ranges: a future stream flush could
    # silently duplicate the id
    with _pytest.raises(ValueError, match="reserved epoch"):
        merge_segments(spark, ixdir, segs[:2], new_segment_id=1_000_123)
    rec = merge_segments(spark, ixdir, segs[:2])
    with _pytest.raises(ValueError, match="merged away"):
        merge_segments(
            spark, ixdir, [int(rec["new_segment_id"]), segs[2]],
            new_segment_id=segs[0],
        )


def test_chained_merge_sha_parity_not_vacuous(spark, corpus, tmp_path_factory):
    """ADVICE r5: after a merge, doc_stats carries the merge-output
    segment id while doc_meta keeps the originals — the old (segment,
    doc) parity join matched ZERO rows for merged docs and passed
    vacuously.  The reworked check translates doc_meta through the
    merge CHAIN and asserts coverage, so a chain of two merges must (a)
    still pass, and (b) demonstrably cover the merged docs (uncovered
    would equal every merged ds row if translation broke)."""
    ixdir = str(tmp_path_factory.mktemp("ixchain"))
    IndexBuilder(spark, CorpusSpec.source_code(), num_segments=6).build(corpus, ixdir)
    ix = MaterializedIndex(spark, ixdir)
    segs = sorted(
        int(r["segment_id"])
        for r in ix.term_dict.select("segment_id").distinct().collect()
    )
    assert len(segs) >= 3
    rec1 = merge_segments(spark, ixdir, segs[:2])
    m1 = int(rec1["new_segment_id"])
    rec2 = merge_segments(spark, ixdir, [m1, segs[2]])  # chain: (s0+s1)+s2
    m2 = int(rec2["new_segment_id"])
    report = verify_index(spark, ixdir, source_df=corpus, text_col="content")
    assert report["sha256_parity_uncovered"] == 0
    assert report["sha256_mismatches"] == 0
    # non-vacuity: the twice-merged segment holds real docs, and since
    # uncovered == 0 the parity join matched every one of them
    post = MaterializedIndex(spark, ixdir)
    n_merged = post.doc_stats.filter(F.col("segment_id") == m2).count()
    assert n_merged > 0
