"""Block-max WAND vs exhaustive: wall time AND decode work.

Writes BENCH/wand.json.  Two corpora:
- skewed: per-block freq decay (first 5k docs carry freq=40 of the hot
  term, the rest freq=1) — the regime block-max pruning exists for.
- zipf: the uniform synthetic source-code corpus, where every 128-doc
  block has near-identical (max_freq, min_dlq) metadata, so the upper
  bounds cannot separate blocks and pruning degenerates (reported
  honestly).

Per query we record THREE timings:
- exhaustive_sec: the plain single-scan plan;
- wand_sec: wand_topk with the DEFAULT policy (corpus-size guard +
  degenerate-bounds early-out) — what a user gets;
- wand_engaged_sec: wand_topk with min_postings=0 (machinery always on)
  — locates the crossover honestly even below the guard.

Run: python3 scripts/bench_wand.py [n_docs]
Env: WAND_SKEW_ONLY=1 appends a skew-only row for this n_docs.
     WAND_COLD=1 also measures a cold (page-cache-dropped-ish fresh
     session, uncached parquet) pair for the skew corpus.
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
from golucene_spark.corpus import make_corpus
from golucene_spark.index import CorpusSpec, FieldSpec, IndexBuilder, MaterializedIndex
from golucene_spark.search import Searcher, parse_query
from golucene_spark.search.wand import wand_topk

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
DATA = Path(__file__).resolve().parent.parent / ".data"
BENCH = Path(__file__).resolve().parent.parent / "BENCH" / "wand.json"
SKEW_ONLY = bool(int(os.environ.get("WAND_SKEW_ONLY", "0")))
COLD = bool(int(os.environ.get("WAND_COLD", "0")))

SKEW_SPEC = CorpusSpec(
    text_fields=[FieldSpec("content", "content", True)],
    keyword_fields=[], key_cols=["doc_id"], id_col="doc_id", meta_cols=[],
)


def skewed_corpus_df(spark, n: int):
    """Deterministic skewed corpus, generated DISTRIBUTEDLY (spark.range):
    first 5k docs carry freq=40 of the hot term, the rest freq=1."""
    import numpy as np

    rng = np.random.default_rng(42)
    pads = [f"pad{j}" for j in range(200)]
    fill = " ".join(pads[i] for i in rng.integers(0, 200, size=60))
    hot_text = "hot " * 40 + fill
    cold_text = "hot " + fill
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 5_000, F.lit(hot_text))
        .otherwise(F.lit(cold_text)).alias("content"),
    ).repartition(32)


def run_pair(s: Searcher, qs: str, k: int = 10) -> dict:
    q = parse_query(qs)
    best_ex = best_wd = best_en = 1e9
    for _ in range(5):
        t0 = time.time()
        ex = s.search(q, k).collect()
        best_ex = min(best_ex, time.time() - t0)
        t0 = time.time()
        wd = wand_topk(s, q, k).collect()          # default policy
        best_wd = min(best_wd, time.time() - t0)
        t0 = time.time()
        en = wand_topk(s, q, k, min_postings=0).collect()  # forced engage
        best_en = min(best_en, time.time() - t0)
    stats: dict = {}
    en = wand_topk(s, q, k, stats_out=stats, min_postings=0).collect()
    for res, name in ((wd, "wand"), (en, "wand_engaged")):
        assert [(r["doc_id"], round(r["score"], 9)) for r in ex] == [
            (r["doc_id"], round(r["score"], 9)) for r in res
        ], f"{name} != exhaustive for {qs}"
    decoded = stats.get("blocks_decoded_rescore", 0)
    return {
        "exhaustive_sec": round(best_ex, 3),
        "wand_sec": round(best_wd, 3),
        "wand_engaged_sec": round(best_en, 3),
        "early_out": stats.get("early_out"),
        "blocks_total": stats.get("blocks_total"),
        "blocks_decoded_wand": decoded,
        "decode_reduction": round(1 - decoded / stats["blocks_total"], 3)
        if stats.get("blocks_total")
        else None,
    }


def uncached_pair(spark, ixdir: str, qs: str, k: int = 10) -> dict:
    """UNCACHED parquet reads (no .cache(); OS page cache still warm —
    a true cold-storage run is not reachable in this sandbox).  WAND
    runs first so any page warming helps only exhaustive."""
    ix = MaterializedIndex(spark, ixdir)
    s = Searcher(ix, "bm25")
    q = parse_query(qs)
    t0 = time.time()
    wand_topk(s, q, k, min_postings=0).collect()
    wd = time.time() - t0
    t0 = time.time()
    wand_topk(s, q, k, min_postings=0).collect()
    wd_warm = time.time() - t0
    t0 = time.time()
    s.search(q, k).collect()
    ex = time.time() - t0
    t0 = time.time()
    s.search(q, k).collect()
    ex_warm = time.time() - t0
    return {
        "wand_engaged_sec": round(wd, 3),
        "exhaustive_sec": round(ex, 3),
        "wand_engaged_warm_sec": round(wd_warm, 3),
        "exhaustive_warm_sec": round(ex_warm, 3),
    }


def main():
    spark = get_spark(app_name="wand-bench",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    warm_workers(spark)
    out: dict = {"n_docs": N}

    # --- skewed corpus -------------------------------------------------
    ixdir = str(DATA / f"wand_bench_skew_{N}")
    if not os.path.isdir(os.path.join(ixdir, "manifest")):
        shutil.rmtree(ixdir, ignore_errors=True)
        df = skewed_corpus_df(spark, N)
        t0 = time.time()
        # the hot term appears in EVERY doc: doc-range salting keeps any
        # single reducer's collect_list bounded (the skew-defusal path)
        IndexBuilder(spark, SKEW_SPEC, num_segments=8, salt_range=131072,
                     wand_layout=True).build(df, ixdir)
        out["skew_build_sec"] = round(time.time() - t0, 1)
    ix = MaterializedIndex(spark, ixdir)
    # JVM-cache the scoring columns only below ~4M docs (position blobs
    # would OOM the heap; past 4M even the scoring columns do).  Larger
    # corpora run off parquet + OS page cache.
    if N <= 4_000_000:
        ix.postings = ix.postings.drop("positions").cache(); ix.postings.count()
    s = Searcher(ix, "bm25")
    out["skew_hot"] = run_pair(s, "content:hot")
    if COLD:
        ix.postings.unpersist()
        out["skew_uncached"] = uncached_pair(spark, ixdir, "content:hot")

    if SKEW_ONLY:
        prev = json.loads(BENCH.read_text()) if BENCH.exists() else {}
        prev[f"skew_hot_{N}"] = {**out["skew_hot"],
                                 "build_sec": out.get("skew_build_sec")}
        if COLD:
            prev[f"skew_uncached_{N}"] = out["skew_uncached"]
        BENCH.write_text(json.dumps(prev, indent=1))
        print(json.dumps(prev, indent=1))
        return

    # --- zipf corpus ----------------------------------------------------
    ixdir2 = str(DATA / "wand_bench_zipf")
    shutil.rmtree(ixdir2, ignore_errors=True)
    df2 = spark.createDataFrame(make_corpus(N)).repartition(32)
    t0 = time.time()
    IndexBuilder(spark, CorpusSpec.source_code(), num_segments=8,
                 wand_layout=True).build(df2, ixdir2)
    out["zipf_build_sec"] = round(time.time() - t0, 1)
    ix2 = MaterializedIndex(spark, ixdir2)
    ix2.postings = ix2.postings.cache(); ix2.postings.count()
    s2 = Searcher(ix2, "bm25")
    out["zipf_hot"] = run_pair(s2, "content:return")
    out["zipf_or3"] = run_pair(s2, "content:return OR content:func OR content:import")
    out["note"] = (
        "Round-4 WAND: ONE fused Catalyst action (no driver interval "
        "collect): theta/total-ub/per-term-max fold into one broadcast "
        "scalar row; surviving blocks reduce in-plan to a doc-range "
        "bucket set (second broadcast scalar); rescore decodes only "
        "blocks overlapping the set (arrays_overlap hash probe). "
        "Default policy adds a corpus-size guard (WAND_MIN_POSTINGS): "
        "below ~1M summed df the exhaustive single-scan plan is page-"
        "cache-trivial and wand_topk routes straight to it, so wand_sec "
        "== exhaustive + a dict lookup there. wand_engaged_sec forces "
        "the machinery on to locate the crossover honestly."
    )
    print(json.dumps(out, indent=2))
    with open(BENCH, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
