"""spark-submit entry point: build and/or query an index on a cluster.

Usage (cluster):
  cd /root/repo && zip -r /tmp/golucene_spark.zip golucene_spark
  spark-submit --py-files /tmp/golucene_spark.zip scripts/submit_build.py \
      --input /data/corpus_parquet --index /data/index \
      --segments 4096 --chunks 16 --salt-range 8192

  spark-submit --py-files /tmp/golucene_spark.zip scripts/submit_build.py \
      --index /data/index --query "content:parse AND NOT content:test" -k 10

Local smoke:
  python3 scripts/submit_build.py --input .data/scaling_corpus.parquet \
      --index .data/submit_ix --segments 16
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="corpus source: iceberg:<cat.db.table> | "
                                    "parquet:<path> | table:<name> | <path> "
                                    "(columns repo,path,commit,lang,content)")
    ap.add_argument("--snapshot-id", type=int, default=None,
                    help="pin an Iceberg snapshot for the whole (resumable) build")
    ap.add_argument("--index", required=True, help="index directory")
    ap.add_argument("--segments", type=int, default=None)
    ap.add_argument("--chunks", type=int, default=1, help="commit/resume chunks")
    ap.add_argument("--salt-range", type=int, default=None, help="hot-term skew salting")
    ap.add_argument("--analyzer", default="standard")
    ap.add_argument("--spec", default="source_code",
                    choices=["source_code", "documents"],
                    help="input-table shape (column mapping)")
    ap.add_argument("--no-positions", action="store_true")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--verify", action="store_true", help="run CheckIndex after build")
    ap.add_argument("--query", help="query string to run against --index")
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--similarity", default="bm25")
    ap.add_argument("--wand", action="store_true", help="block-max pruned top-k")
    a = ap.parse_args()

    from pyspark.sql import SparkSession

    from golucene_spark.session import warm_workers

    # under spark-submit the session/master/memory come from the submit
    # command; builder() only fills in engine-specific defaults
    spark = SparkSession.builder.appName("golucene_spark").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    warm_workers(spark)

    if a.input:
        from golucene_spark.index import CorpusSpec, IndexBuilder

        from golucene_spark.sources import load_corpus

        df = load_corpus(spark, a.input, snapshot_id=a.snapshot_id)
        t0 = time.time()
        b = IndexBuilder(
            spark,
            getattr(CorpusSpec, a.spec)(),
            analyzer=a.analyzer,
            num_segments=a.segments,
            index_positions=not a.no_positions,
            salt_range=a.salt_range,
        )
        m = b.build(df, a.index, num_chunks=a.chunks, resume=not a.no_resume)
        wall = time.time() - t0
        print(json.dumps({**m, "wall_sec": round(wall, 1),
                          "docs_per_sec": round(m["docs"] / wall, 1)}))
        if a.verify:
            from golucene_spark.index import verify_index

            print(json.dumps(verify_index(spark, a.index, source_df=df)))

    if a.query:
        from golucene_spark.index import MaterializedIndex
        from golucene_spark.search import Searcher, parse_query

        ix = MaterializedIndex(spark, a.index)
        s = Searcher(ix, a.similarity)
        q = parse_query(a.query, analyzer=a.analyzer)
        t0 = time.time()
        if a.wand:
            from golucene_spark.search.wand import wand_topk

            rows = wand_topk(s, q, a.k).collect()
        else:
            rows = s.search(q, a.k).collect()
        print(json.dumps({
            "query": a.query,
            "wall_sec": round(time.time() - t0, 3),
            "hits": [{"doc_id": r["doc_id"], "score": r["score"]} for r in rows],
        }))


if __name__ == "__main__":
    main()
