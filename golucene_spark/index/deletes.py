"""Deletes (W12): tombstones + query-time anti-join.

The reference buffers delete terms and applies them as a liveDocs
bitmap at flush (core/index/bufferedDeletes.go:33-91, dwpt.go:313-321);
delete-by-query is stubbed there.  Spark-native equivalent: an
append-only tombstones table; readers anti-join posting rows against
it.  Faithful to Lucene's visibility semantics: collection statistics
(maxDoc, df, ttf) still count deleted docs until a merge/expunge
rewrites the segments — exactly numDocs vs maxDoc in Lucene.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


def _tombstone_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "tombstones")


def delete_docs(spark: SparkSession, index_dir: str, doc_ids: list[int]) -> dict:
    """Tombstone explicit doc ids (delete-by-id)."""
    df = spark.createDataFrame([(int(d),) for d in doc_ids], "doc_id long")
    return _append_tombstones(spark, index_dir, df, {"kind": "ids", "n": len(doc_ids)})


def delete_by_query(spark: SparkSession, index_dir: str, query, searcher=None) -> dict:
    """Tombstone every doc matching a query (the reference's stubbed
    path, bufferedDeletes.go delete-by-query)."""
    from ..search.executor import Searcher
    from .builder import MaterializedIndex

    s = searcher or Searcher(MaterializedIndex(spark, index_dir))
    if isinstance(query, str):
        from ..search.parser import parse_query

        query = parse_query(query)
    matches = s.score_frame(query).select("doc_id").distinct()
    n = matches.count()
    return _append_tombstones(spark, index_dir, matches, {"kind": "query", "n": n})


def _append_tombstones(spark, index_dir, df: DataFrame, info: dict) -> dict:
    gen = int(time.time() * 1000)
    out = os.path.join(_tombstone_dir(index_dir), f"gen={gen}")
    df.select(F.col("doc_id").cast("long")).distinct().write.mode("overwrite").parquet(out)
    mdir = os.path.join(index_dir, "manifest")
    os.makedirs(mdir, exist_ok=True)
    rec = {"chunk": f"tombstones-{gen}", "status": "committed", "kind": "delete", **info}
    with open(os.path.join(mdir, f"tombstones-{gen}.json"), "w") as f:
        json.dump(rec, f)
    return rec


def tombstones(spark: SparkSession, index_dir: str) -> DataFrame | None:
    d = _tombstone_dir(index_dir)
    if not os.path.isdir(d):
        return None
    return spark.read.parquet(d).select("doc_id").distinct()
