"""Position payloads: prox-stream payload bytes
(termsHashConsumerPerField.go:268-282) re-expressed as packed float32
blobs parallel to the positions blob, with PayloadTermQuery scoring."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from golucene_spark.index import CorpusSpec, FieldSpec, IndexBuilder, LogicalIndex, MaterializedIndex
from golucene_spark.search import Searcher, payload_term_search
from golucene_spark.search.phrase import payload_floats_col


def _spec():
    return CorpusSpec(
        text_fields=[FieldSpec("text", "text", True, analyzer="whitespace",
                               payloads=True)],
        keyword_fields=[],
        key_cols=["doc_id"],
        id_col="doc_id",
        meta_cols=[],
    )


@pytest.fixture()
def docs(spark):
    rows = [
        (0, "alpha|2.0 beta|4.0 alpha|6.0"),
        (1, "alpha|1.5 gamma"),
        (2, "beta beta|0.25"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_payload_blob_roundtrip(spark, docs):
    ix = LogicalIndex(docs, _spec(), analyzer="whitespace", quantize_norms=False)
    rows = ix.postings_for_terms("text", ["alpha"], with_payloads=True).collect()
    by_doc = {r["doc_id"]: np.frombuffer(r["payloads"], "<f4").tolist() for r in rows}
    assert by_doc == {0: [2.0, 6.0], 1: [1.5]}
    # bare tokens (no delimiter / unparseable suffix) carry payload 1.0
    rows_g = ix.postings_for_terms("text", ["gamma"], with_payloads=True).collect()
    assert np.frombuffer(rows_g[0]["payloads"], "<f4").tolist() == [1.0]


def test_jvm_float32_decode_bit_exact(spark):
    """payload_floats_col must reproduce NumPy's float32 decode exactly,
    including negatives, denormals, and zero."""
    vals = np.array([0.0, 1.0, -1.0, 0.25, 3.5, 1e-40, -1e-40, 123.456, 7.0],
                    dtype=np.float32)
    blob = vals.astype("<f4").tobytes()
    df = spark.createDataFrame([(blob,)], "payloads binary")
    got = df.select(payload_floats_col().alias("d")).collect()[0]["d"]
    want = [float(x) for x in vals]
    assert got == want  # exact, not approx


def test_payload_term_scoring(spark, docs):
    ix = LogicalIndex(docs, _spec(), analyzer="whitespace", quantize_norms=False)
    s = Searcher(ix, "bm25")
    hits = {r["doc_id"]: r["score"]
            for r in payload_term_search(s, "text", "alpha", 10).collect()}
    base = {r["doc_id"]: r["score"]
            for r in payload_term_search(s, "text", "alpha", 10,
                                         include_span_score=False).collect()}
    # avg payloads: doc0 = (2+6)/2 = 4, doc1 = 1.5
    assert base[0] == pytest.approx(4.0, abs=0)
    assert base[1] == pytest.approx(1.5, abs=0)
    from golucene_spark.search import TermQuery

    plain = {r["doc_id"]: r["score"]
             for r in s.search(TermQuery("text", "alpha"), 10).collect()}
    for d in hits:
        assert hits[d] == pytest.approx(plain[d] * base[d], rel=1e-12)


def test_payloads_survive_materialized_build_and_merge(spark, docs, tmp_path):
    ixdir = str(tmp_path / "ix")
    IndexBuilder(spark, _spec(), analyzer="whitespace", quantize_norms=False,
                 num_segments=2).build(docs, ixdir)
    ix = MaterializedIndex(spark, ixdir)
    rows = ix.postings_for_terms("text", ["alpha"], with_payloads=True).collect()
    by_doc = {r["doc_id"]: np.frombuffer(r["payloads"], "<f4").tolist() for r in rows}
    assert by_doc == {0: [2.0, 6.0], 1: [1.5]}
    # expunge-merge re-blocks through the explode path; payloads survive
    from golucene_spark.index.merge import merge_segments

    segs = [r["segment_id"] for r in ix.term_dict.select("segment_id").distinct().collect()]
    merge_segments(spark, ixdir, segs, expunge_deletes=True)
    ix2 = MaterializedIndex(spark, ixdir)
    rows2 = ix2.postings_for_terms("text", ["alpha"], with_payloads=True).collect()
    by_doc2 = {r["doc_id"]: np.frombuffer(r["payloads"], "<f4").tolist() for r in rows2}
    assert by_doc2 == by_doc


def test_payload_field_requires_whitespace_analyzer(spark, tmp_path):
    """ADVICE r3: standard/simple analyzers tokenize the '|' delimiter
    away, silently indexing junk terms with payload 1.0 — build must
    refuse instead."""
    import pytest as _pytest

    from golucene_spark.index import CorpusSpec, FieldSpec, IndexBuilder

    df = spark.createDataFrame([(0, "alpha|2.0 beta|0.5")], "doc_id long, text string")
    spec = CorpusSpec(
        text_fields=[FieldSpec("text", "text", True, payloads=True)],
        keyword_fields=[], key_cols=["doc_id"], id_col="doc_id", meta_cols=[],
    )
    with _pytest.raises(ValueError, match="whitespace"):
        IndexBuilder(spark, spec, analyzer="standard", num_segments=1).build(
            df, str(tmp_path / "pix")
        )
    # per-field override to whitespace is accepted even under a
    # non-whitespace index analyzer
    spec_ok = CorpusSpec(
        text_fields=[FieldSpec("text", "text", True, payloads=True, analyzer="whitespace")],
        keyword_fields=[], key_cols=["doc_id"], id_col="doc_id", meta_cols=[],
    )
    IndexBuilder(spark, spec_ok, analyzer="standard", num_segments=1).build(
        df, str(tmp_path / "pix_ok")
    )
