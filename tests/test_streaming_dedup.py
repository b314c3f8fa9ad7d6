"""Streaming dedup: exact within-watermark suppression + stateful
MinHash-LSH candidate emission, batch-parity checked."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from golucene_spark.streaming import dedup_exact_stream, lsh_candidates_stream
from golucene_spark.text.dedup import (
    band_buckets,
    minhash_signatures,
    minhash_signatures_stateless,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again"),
    (1, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat again and again"),  # near dup
    (3, "completely different text about spark query engines and parquet files"),
    (4, "completely different text about spark query engines and parquet files"),  # dup of 3
]


def _ts(i):
    return datetime(2026, 1, 1, 0, i)


def test_stateless_minhash_equals_shuffle_version(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = {r["doc_id"]: r["minhash"] for r in minhash_signatures(df).collect()}
    b = {r["doc_id"]: r["minhash"] for r in minhash_signatures_stateless(df).collect()}
    assert a == b


def test_dedup_exact_stream(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sdedup")
    src = str(base / "in")
    schema = "doc_id long, text string, ts timestamp"
    rows = [(i, t, _ts(i)) for i, t in DOCS]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    out = dedup_exact_stream(stream, watermark="10 minutes")
    q = (out.writeStream.format("memory").queryName("sded")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = sorted(r["doc_id"] for r in spark.sql("SELECT doc_id FROM sded").collect())
        assert got == [0, 2, 3]  # 1 and 4 suppressed as exact dups
    finally:
        q.stop()


def test_lsh_candidates_stream_matches_batch_buckets(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("slsh")
    src = str(base / "in")
    schema = "doc_id long, text string"
    df = spark.createDataFrame(DOCS, schema)
    # two waves: docs 0-2 first, then 3-4 (state must persist across batches)
    df.filter("doc_id <= 2").coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    out = lsh_candidates_stream(stream)
    q = (out.writeStream.format("memory").queryName("slsh")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        df.filter("doc_id >= 3").coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = {
            (r["id_a"], r["id_b"])
            for r in spark.sql("SELECT id_a, id_b FROM slsh").collect()
        }
    finally:
        q.stop()
    # batch reference: pairs sharing any (band, bucket)
    banded = band_buckets(minhash_signatures_stateless(df))
    l, r = banded.alias("l"), banded.alias("r")
    want = {
        (x["id_a"], x["id_b"])
        for x in l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        ).select(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"))
        .distinct().collect()
    }
    assert got == want
    assert (0, 1) in got and (3, 4) in got  # exact dups collide in every band
