"""Build + query decomposition bench (guide §1: measure first).

Separate from the FROZEN bench.py.  Isolates each build stage and each
bench query with the noop sink so we time computation, not the sink,
and counts Spark jobs per phase via the status tracker.

Usage: python3 scripts/bench_decompose.py [sf_dir] [out_json]
"""

from __future__ import annotations

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
from golucene_spark.index.builder import assign_doc_ids, tokenize_tf, blocked_postings
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
    "q11_classic": "text:data",
    "q12_phrase": 'text:"data query"',
    "q13_fuzzy": "text:part~2",
    "q14_nested": "text:data AND (text:query OR text:window)",
}


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bench_decompose.json"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    spark = get_spark(
        app_name="bench-decompose",
        master=f"local[{cpus}]",
        shuffle_partitions=max(8, cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sc = spark.sparkContext
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    warm_sec = warm_workers(spark)
    res = {"sf_dir": sf_dir, "n_docs": n_docs, "cpus": cpus,
           "warm_sec": round(warm_sec, 1), "stages": {}, "queries": {}}

    def timed(name, fn, reps=1):
        times = []
        for _ in range(reps):
            sc.setJobDescription(name)
            t0 = time.time()
            fn()
            times.append(round(time.time() - t0, 3))
        sc.setJobDescription(None)
        res["stages"][name] = times
        print(name, times, flush=True)

    spec = CorpusSpec.documents()
    nseg = max(8, cpus)
    dd = assign_doc_ids(docs, spec, nseg)
    print("input_partitions", docs.rdd.getNumPartitions(), flush=True)

    # stage isolation with noop sink
    timed("scan_only", lambda: noop(docs), reps=2)
    tf = tokenize_tf(dd, spec, "standard", True, True)
    timed("tokenize_noop", lambda: noop(tf), reps=2)
    dd32 = dd.repartition(cpus)
    tf32 = tokenize_tf(dd32, spec, "standard", True, True)
    timed("tokenize_repart_noop", lambda: noop(tf32), reps=2)
    post = blocked_postings(tf, include_sentinels=True)
    timed("blocked_noop", lambda: noop(post), reps=2)
    post32 = blocked_postings(tf32, include_sentinels=True)
    timed("blocked_repart_noop", lambda: noop(post32), reps=2)

    ixdir = "/tmp/bench_decompose_index"
    shutil.rmtree(ixdir, ignore_errors=True)

    t0 = time.time()
    builder = IndexBuilder(
        spark, spec, analyzer="standard", num_segments=nseg,
        index_positions=True,
    )
    builder.build(docs, ixdir, num_chunks=1)
    res["build_sec"] = round(time.time() - t0, 3)
    rec = json.load(open(os.path.join(ixdir, "manifest", "chunk-00000.json")))
    res["stage_sec"] = rec["stage_sec"]
    print("build", res["build_sec"], rec["stage_sec"], flush=True)

    ix = MaterializedIndex(spark, ixdir)
    ix.postings = ix.postings.cache()
    ix.term_dict = ix.term_dict.cache()
    ix.term_dict.count()
    ix.postings.count()
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    for name, qs in QUERIES.items():
        sim = "classic" if name.endswith("classic") else "bm25"
        s = Searcher(ix, sim)
        q = parse_query(qs, default_field="text", analyzer="standard")
        # rep 0: cold (includes term-stats job + expansions)
        sc.setJobDescription(name)
        reps = []
        plan_sec = []
        for i in range(4):
            t1 = time.time()
            frame = s.search(q, k=10)
            t2 = time.time()
            frame.collect()
            t3 = time.time()
            plan_sec.append(round(t2 - t1, 4))
            reps.append(round(t3 - t1, 4))
        sc.setJobDescription(None)
        res["queries"][name] = {"total": reps, "plan_build": plan_sec}
        print(name, reps, "plan", plan_sec, flush=True)

    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print("WROTE", out_path, flush=True)


if __name__ == "__main__":
    main()
