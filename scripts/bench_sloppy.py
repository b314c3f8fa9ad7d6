"""Sloppy-phrase / SpanNear constant-factor benchmark (BENCH/sloppy.json).

Worst shapes for the positional matcher: many terms x large slop over
the HOTTEST terms of the corpus (max candidate docs, max positions per
doc).  Terms are picked deterministically: top-5 text terms by df at
the benchmark scale factor.  Run: python3 scripts/bench_sloppy.py
"""

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from golucene_spark.session import get_spark, warm_workers
from golucene_spark.index import CorpusSpec, IndexBuilder, MaterializedIndex
from golucene_spark.search import Searcher
from golucene_spark.search.ast import PhraseQuery

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 3


def main():
    spark = get_spark(app_name="bench-sloppy", master="local[32]",
                      shuffle_partitions=8,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_docs = docs.count()
    warm_workers(spark)
    ixdir = "/root/repo/.data/bench_sloppy_ix"
    shutil.rmtree(ixdir, ignore_errors=True)
    IndexBuilder(spark, CorpusSpec.documents(), analyzer="standard",
                 num_segments=8).build(docs, ixdir)
    ix = MaterializedIndex(spark, ixdir)
    ix.postings = ix.postings.cache(); ix.postings.count()
    s = Searcher(ix, "bm25")
    hot = [
        r["term"] for r in ix.term_dict.filter(F.col("field") == "text")
        .groupBy("term").agg(F.sum("df").alias("df"))
        .orderBy(F.desc("df"), "term").limit(5).collect()
    ]
    print("terms:", hot, file=sys.stderr)
    shapes = {
        "sloppy_s4_n5": PhraseQuery("text", tuple(hot), 1.0, 4, False),
        "span_near_s4_n5": PhraseQuery("text", tuple(hot), 1.0, 4, True),
        "sloppy_s1_n2": PhraseQuery("text", tuple(hot[:2]), 1.0, 1, False),
        "sloppy_s3_n3": PhraseQuery("text", tuple(hot[:3]), 1.0, 3, False),
        "exact_n2": PhraseQuery("text", tuple(hot[:2]), 1.0, 0, False),
    }
    out = {"sf": SF_DIR.rsplit("sf", 1)[-1], "n_docs": n_docs,
           "terms": hot,
           "note": "vectorized polynomial matcher (2-D searchsorted per "
                   "term); single-scan conjunction (one In(term,...) scan "
                   "+ one groupBy pivot, no per-term join chain)"}
    for name, q in shapes.items():
        best = None
        for _ in range(REPS):
            t0 = time.time()
            hits = s.search(q, 10).collect()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        out[name] = {"sec": round(best, 3), "hits": len(hits)}
        print(name, out[name], file=sys.stderr)
    with open("/root/repo/BENCH/sloppy.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
