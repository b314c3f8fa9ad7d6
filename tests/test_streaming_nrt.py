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
