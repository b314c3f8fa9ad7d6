"""Benchmark: index build + query latency over $SPARK_GRAFT_SF_DIR documents.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., extras...}

Build: materialized inverted index (standard UAX#29 analyzer, BM25
norms quantized) over documents.parquet.  Queries: the FIXTURES.md F4
shapes (hot/mid/rare term, OR/AND/NOT, keyword+term, wide OR, miss).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from golucene_spark.session import get_spark, warm_workers
from golucene_spark.index import CorpusSpec, IndexBuilder, MaterializedIndex
from golucene_spark.search import Searcher, parse_query

QUERIES = {
    "q01_hot_term": "text:join",
    "q02_mid_term": "text:data",
    "q03_rare_term": "text:throughput",
    "q04_or2": "text:data OR text:window",
    "q05_and2": "text:data AND text:join",
    "q06_not": "text:data AND NOT text:model",
    "q07_or3_hot": "text:join OR text:hash OR text:row",
    "q08_keyword_and": "lang:de AND text:data",
    "q09_wide_or": " OR ".join(
        f"text:{t}" for t in [
            "data", "window", "query", "table", "column", "batch", "merge",
            "scan", "filter", "vector", "order", "line", "small", "fast",
            "slow", "customer",
        ]
    ),
    "q10_miss": "text:zzz_missing_term",
    "q11_classic": "text:data",  # scored with classic TFIDF
    "q12_phrase": 'text:"data query"',
    "q13_fuzzy": "text:part~2",
    "q14_nested": "text:data AND (text:query OR text:window)",
    # sloppy/dismax/range/facet paths are covered by the oracle gates;
    # the bench mix stays fixed across rounds for comparability
}

REPS = 3


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1) if "sf" in Path(sf_dir).name else 0.0

    spark = get_spark(
        app_name="golucene-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(8, cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    warm_sec = warm_workers(spark)

    ixdir = os.path.join(str(Path(__file__).resolve().parent), ".data", "bench_index")
    shutil.rmtree(ixdir, ignore_errors=True)

    t0 = time.time()
    builder = IndexBuilder(
        spark, CorpusSpec.documents(), analyzer="standard",
        num_segments=max(8, cpus), index_positions=True,
    )
    builder.build(docs, ixdir, num_chunks=1)
    build_sec = time.time() - t0

    ix = MaterializedIndex(spark, ixdir)
    ix.postings = ix.postings.cache()
    ix.term_dict = ix.term_dict.cache()
    ix.term_dict.count()  # warm
    ix.postings.count()
    # query path: tiny reduce sides; large shuffle fan-out only adds
    # map-side write overhead (see BENCH/BASELINE.md interpretation)
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    qtimes: dict[str, float] = {}
    lat_all: list[float] = []
    for name, qs in QUERIES.items():
        sim = "classic" if name.endswith("classic") else "bm25"
        s = Searcher(ix, sim)
        q = parse_query(qs, default_field="text", analyzer="standard")
        reps = []
        for _ in range(REPS):
            t1 = time.time()
            s.search(q, k=10).collect()
            reps.append(time.time() - t1)
        qtimes[name] = round(statistics.median(reps), 4)
        lat_all.extend(reps)

    total = round(build_sec + sum(qtimes.values()), 3)
    out = {
        "metric": "index_build_plus_query_wall",
        "value": total,
        "unit": "sec",
        "queries": qtimes,
        "sf": sf,
        "n_docs": n_docs,
        "build_sec": round(build_sec, 3),
        "index_docs_per_sec": round(n_docs / build_sec, 1),
        "query_p50_sec": round(statistics.median(lat_all), 4),
        "query_p99_sec": round(sorted(lat_all)[max(0, int(len(lat_all) * 0.99) - 1)], 4),
        "warmup_sec": round(warm_sec, 1),
        "cpus": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
