"""Block-max WAND pruning: results identical to exhaustive scoring."""

import pytest
from pyspark.sql import functions as F

from golucene_spark.corpus import make_corpus
from golucene_spark.index import CorpusSpec, IndexBuilder, MaterializedIndex
from golucene_spark.search import Searcher, parse_query
from golucene_spark.search.wand import wand_topk


@pytest.fixture(scope="module")
def mat_index(spark, tmp_path_factory):
    pdf = make_corpus(600, seed=42)
    df = spark.createDataFrame(pdf).repartition(4)
    ixdir = str(tmp_path_factory.mktemp("ixw"))
    IndexBuilder(spark, CorpusSpec.source_code(), num_segments=4, wand_layout=True).build(df, ixdir)
    return MaterializedIndex(spark, ixdir)


@pytest.mark.parametrize(
    "qs",
    [
        "content:return",                    # hot single term
        "content:zyzzyva_rare0",             # singleton
        "content:parse OR content:tokenize",
        "content:return OR content:func OR content:import",
        "content:missingterm123",
        "content:parse AND content:buffer",  # non-prunable shape -> fallback
    ],
)
def test_wand_equals_exhaustive(mat_index, qs):
    s = Searcher(mat_index, "bm25")
    q = parse_query(qs)
    exact = [(r["doc_id"], round(r["score"], 9)) for r in s.search(q, 10).collect()]
    pruned = [(r["doc_id"], round(r["score"], 9)) for r in wand_topk(s, q, 10, min_postings=0).collect()]
    assert exact == pruned, qs


def test_wand_actually_prunes_decode_work(spark, tmp_path_factory):
    """The phase-2 rescore must decode strictly fewer blocks than an
    exhaustive scan of the query terms' postings (the whole point).

    Corpus with real block skew: the first 64 docs carry freq=40 of the
    query term, the remaining 960 carry freq=1 — posting blocks are
    doc-ordered, so later blocks have block_max_freq=1 and an upper
    bound far below theta."""
    rows = []
    for i in range(64):
        rows.append((i, "hot " * 40 + " ".join(f"pad{j}" for j in range(10))))
    for i in range(64, 1024):
        rows.append((i, "hot " + " ".join(f"pad{j}" for j in range(49))))
    df = spark.createDataFrame(rows, "doc_id long, content string")
    from golucene_spark.index import CorpusSpec, FieldSpec

    spec = CorpusSpec(
        text_fields=[FieldSpec("content", "content", True)],
        keyword_fields=[], key_cols=["doc_id"], id_col="doc_id", meta_cols=[],
    )
    ixdir = str(tmp_path_factory.mktemp("ixskew"))
    IndexBuilder(spark, spec, num_segments=1, wand_layout=True).build(df, ixdir)
    s = Searcher(MaterializedIndex(spark, ixdir), "bm25")
    q = parse_query("content:hot")
    stats = {}
    exact = [(r["doc_id"], round(r["score"], 9)) for r in s.search(q, 10).collect()]
    pruned = [(r["doc_id"], round(r["score"], 9))
              for r in wand_topk(s, q, 10, stats_out=stats, min_postings=0).collect()]
    assert exact == pruned
    assert stats["blocks_total"] == 8  # 1024 docs / 128
    assert stats["blocks_surviving"] < stats["blocks_total"]
    assert stats["blocks_decoded_rescore"] < stats["blocks_total"]


def test_wand_with_deletes_matches_exhaustive(spark, tmp_path_factory):
    """With tombstones present the metadata threshold could certify dead
    docs; wand_topk must stay exact (it falls back to the liveDocs-
    filtered exhaustive plan)."""
    rows = []
    for i in range(64):
        rows.append((i, "hot " * 40 + " ".join(f"pad{j}" for j in range(10))))
    for i in range(64, 512):
        rows.append((i, "hot " + " ".join(f"pad{j}" for j in range(49))))
    df = spark.createDataFrame(rows, "doc_id long, content string")
    from golucene_spark.index import CorpusSpec, FieldSpec
    from golucene_spark.index.deletes import delete_docs

    spec = CorpusSpec(
        text_fields=[FieldSpec("content", "content", True)],
        keyword_fields=[], key_cols=["doc_id"], id_col="doc_id", meta_cols=[],
    )
    ixdir = str(tmp_path_factory.mktemp("ixdel"))
    IndexBuilder(spark, spec, num_segments=1, wand_layout=True).build(df, ixdir)
    # delete most of the hot block, incl. what would certify theta
    delete_docs(spark, ixdir, list(range(0, 60)))
    s = Searcher(MaterializedIndex(spark, ixdir), "bm25")
    q = parse_query("content:hot")
    exact = [(r["doc_id"], round(r["score"], 9)) for r in s.search(q, 10).collect()]
    pruned = [(r["doc_id"], round(r["score"], 9))
              for r in wand_topk(s, q, 10, min_postings=0).collect()]
    assert exact == pruned
    assert all(d >= 60 for d, _ in exact[:4])  # deleted docs really gone


def test_wand_sparse_doc_ids(spark, tmp_path_factory):
    """Doc ids are NOT required to be dense: bucket granularity must
    derive from the actual id RANGE, not countDistinct(doc_id).  With a
    1e12 stride, a distinct-count granularity would ask F.sequence for
    ~1e12-element arrays per block (hard failure); range-derived
    granularity keeps every per-block sequence <= MAX_BUCKETS entries
    (ADVICE r4)."""
    stride = 1_000_000_000_000
    rows = []
    for i in range(64):
        rows.append((i * stride, "hot " * 40 + " ".join(f"pad{j}" for j in range(10))))
    for i in range(64, 1024):
        rows.append((i * stride, "hot " + " ".join(f"pad{j}" for j in range(49))))
    df = spark.createDataFrame(rows, "doc_id long, content string")
    from golucene_spark.index import CorpusSpec, FieldSpec

    spec = CorpusSpec(
        text_fields=[FieldSpec("content", "content", True)],
        keyword_fields=[], key_cols=["doc_id"], id_col="doc_id", meta_cols=[],
    )
    ixdir = str(tmp_path_factory.mktemp("ixsparse"))
    IndexBuilder(spark, spec, num_segments=1, wand_layout=True).build(df, ixdir)
    s = Searcher(MaterializedIndex(spark, ixdir), "bm25")
    q = parse_query("content:hot")
    stats = {}
    exact = [(r["doc_id"], round(r["score"], 9)) for r in s.search(q, 10).collect()]
    pruned = [(r["doc_id"], round(r["score"], 9))
              for r in wand_topk(s, q, 10, stats_out=stats, min_postings=0).collect()]
    assert exact == pruned
    assert stats["blocks_decoded_rescore"] < stats["blocks_total"]


def test_wand_mixed_layout_null_metadata(spark, tmp_path_factory):
    """A mergeSchema read over wand + pre-wand chunks passes the
    'block_max_freq_cnt in columns' gate but carries NULL metadata rows.
    NULL cnt must not poison the theta fold into an empty top-k: such
    blocks certify nothing (cnt coalesced to 0) and results stay exactly
    equal to the exhaustive plan (ADVICE r4)."""
    import os

    rows = []
    for i in range(64):
        rows.append((i, "hot " * 40 + " ".join(f"pad{j}" for j in range(10))))
    for i in range(64, 512):
        rows.append((i, "hot " + " ".join(f"pad{j}" for j in range(49))))
    df = spark.createDataFrame(rows, "doc_id long, content string")
    from golucene_spark.index import CorpusSpec, FieldSpec

    spec = CorpusSpec(
        text_fields=[FieldSpec("content", "content", True)],
        keyword_fields=[], key_cols=["doc_id"], id_col="doc_id", meta_cols=[],
    )
    ixdir = str(tmp_path_factory.mktemp("ixmixed"))
    # TWO chunks: stripping one leaves a genuinely MIXED chunk set —
    # with a single chunk the wand columns vanish entirely and wand_topk
    # takes the pre-wand early return, never the NULL-coalesce path
    IndexBuilder(spark, spec, num_segments=2, wand_layout=True).build(
        df, ixdir, num_chunks=2
    )
    # strip the wand metadata from ONE chunk — exactly what a chunk
    # written by a pre-wand engine version looks like after mergeSchema
    pdir = os.path.join(ixdir, "postings")
    chunks = sorted(d for d in os.listdir(pdir) if d.startswith("chunk="))
    assert len(chunks) == 2
    cpath = os.path.join(pdir, chunks[0])
    import shutil

    (
        spark.read.parquet(cpath)
        .drop("block_max_dlq", "block_max_freq_cnt")
        .write.partitionBy("kind")
        .parquet(cpath + ".tmp")
    )
    shutil.rmtree(cpath)
    shutil.move(cpath + ".tmp", cpath)
    ix = MaterializedIndex(spark, ixdir)
    # vacuity guard: the mergeSchema read must carry BOTH null and
    # non-null metadata rows, or this test proves nothing
    meta = ix.postings_frame("content", ["hot"]).select("block_max_freq_cnt")
    n_null = meta.filter(F.col("block_max_freq_cnt").isNull()).count()
    n_set = meta.filter(F.col("block_max_freq_cnt").isNotNull()).count()
    assert n_null > 0 and n_set > 0, (n_null, n_set)
    s = Searcher(ix, "bm25")
    q = parse_query("content:hot")
    exact = [(r["doc_id"], round(r["score"], 9)) for r in s.search(q, 10).collect()]
    stats = {}
    pruned = [(r["doc_id"], round(r["score"], 9))
              for r in wand_topk(s, q, 10, min_postings=0, stats_out=stats).collect()]
    # the fused path actually ran (no early-return fallback)
    assert stats.get("blocks_total", 0) > 0, stats
    assert len(pruned) == 10
    assert exact == pruned
