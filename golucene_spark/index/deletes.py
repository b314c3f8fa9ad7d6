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


def _append_tombstones(spark, index_dir, df: DataFrame, info: dict,
                       before_segment: int | None = None) -> dict:
    gen = int(time.time() * 1000)
    out = os.path.join(_tombstone_dir(index_dir), f"gen={gen}")
    (df.select(F.col("doc_id").cast("long")).distinct()
       .withColumn("before_segment",
                   F.lit(before_segment).cast("long"))
       .write.mode("overwrite").parquet(out))
    if info.get("n") is None:
        # row count from the just-written footers: no extra Spark job
        # (update_documents used to pay a whole ids.count() action here)
        import glob

        import pyarrow.parquet as pq

        info["n"] = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(os.path.join(out, "*.parquet"))
        )
    mdir = os.path.join(index_dir, "manifest")
    os.makedirs(mdir, exist_ok=True)
    rec = {"chunk": f"tombstones-{gen}", "status": "committed", "kind": "delete", **info}
    with open(os.path.join(mdir, f"tombstones-{gen}.json"), "w") as f:
        json.dump(rec, f)
    return rec


def tombstones(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """(doc_id, before_segment, exact_segment):

    - before_segment NULL (and exact NULL) kills every version of the
      doc (plain delete);
    - before_segment = V kills only versions in segments < V
      (updateDocument supersede);
    - exact_segment = M kills the doc's versions in exactly segment M —
      synthesized here for MERGED segments: merge relabels inputs to a
      MERGE_ID_BASE+ id that is not ordinally comparable with V, so a
      scoped tombstone is translated through the manifest's
      merged_from_segments: if every transitive original input of M is
      < V, the doc's copies inside M are superseded versions and die.
      (A merged segment whose inputs straddle V cannot exist with live
      stale versions: merge_segments routes such merges through the
      scoped-expunge path, which applies the then-existing scoped
      tombstones physically.)"""
    d = _tombstone_dir(index_dir)
    if not os.path.isdir(d):
        return None
    t = spark.read.option("mergeSchema", "true").parquet(d)
    if "before_segment" not in t.columns:  # pre-update-era tombstones
        t = t.withColumn("before_segment", F.lit(None).cast("long"))
    t = t.select("doc_id", "before_segment").distinct()
    t = t.withColumn("exact_segment", F.lit(None).cast("long"))
    from .merge import merged_origin_ranges

    origin = merged_origin_ranges(index_dir)
    if origin:
        m = spark.createDataFrame(
            [(int(k), int(v[1])) for k, v in origin.items()],
            "m_seg long, m_maxorig long",
        )
        scoped = t.filter(F.col("before_segment").isNotNull())
        exact = scoped.join(
            F.broadcast(m), scoped["before_segment"] > m["m_maxorig"]
        ).select(
            "doc_id", "before_segment", F.col("m_seg").alias("exact_segment")
        )
        t = t.unionByName(exact)
    return t


def filter_live(frame: DataFrame, tomb: DataFrame | None,
                seg_col: str = "segment_id") -> DataFrame:
    """Drop tombstoned rows from ``frame`` (the liveDocs filter).
    With a ``seg_col`` present, update tombstones (before_segment = V)
    drop only rows whose segment < V; without one, only full-delete
    tombstones (before_segment NULL) apply — updated docs' live
    versions always survive."""
    if tomb is None:
        return frame
    if "exact_segment" not in tomb.columns:  # externally built tomb frames
        tomb = tomb.withColumn("exact_segment", F.lit(None).cast("long"))
    if seg_col not in frame.columns:
        full = tomb.filter(
            F.col("before_segment").isNull() & F.col("exact_segment").isNull()
        ).select("doc_id")
        return frame.join(full, "doc_id", "left_anti")
    t = tomb.select(
        F.col("doc_id").alias("_t_doc"),
        F.col("before_segment").alias("_t_seg"),
        F.col("exact_segment").alias("_t_exact"),
    )
    cond = (frame["doc_id"] == t["_t_doc"]) & (
        (t["_t_seg"].isNull() & t["_t_exact"].isNull())
        | (t["_t_exact"].isNull() & (frame[seg_col] < t["_t_seg"]))
        | (frame[seg_col] == t["_t_exact"])
    )
    return frame.join(t, cond, "left_anti")


def update_documents(spark: SparkSession, index_dir: str, df: DataFrame,
                     spec, analyzer: str = "standard",
                     quantize_norms: bool = True) -> dict:
    """IndexWriter.UpdateDocuments (writer.go's delete-then-add): flush
    ``df`` (keyed by spec.id_col) as a NEW segment, then tombstone
    every PRIOR version of those ids (before_segment = the new
    segment), so readers see exactly the new versions — Lucene's
    update visibility, without rewriting any old segment."""
    import json as _json

    from ..streaming.nrt import incremental_index_batch

    assert spec.id_col, "update_documents requires a stable id column"
    mdir = os.path.join(index_dir, "manifest")
    epoch = 0
    if os.path.isdir(mdir):
        for fn in os.listdir(mdir):
            if fn.endswith(".json"):
                with open(os.path.join(mdir, fn)) as f:
                    rec = _json.load(f)
                if rec.get("kind") in ("stream", "update"):
                    epoch = max(epoch, int(rec.get("epoch", 0)) + 1)
    rec = incremental_index_batch(
        df, epoch, index_dir, spec, analyzer, quantize_norms, kind="update"
    )
    ids = df.select(F.col(spec.id_col).cast("long").alias("doc_id"))
    _append_tombstones(
        spark, index_dir, ids,
        {"kind": "delete", "reason": "update", "n": None},
        before_segment=rec["segment_id"],
    )
    return rec
