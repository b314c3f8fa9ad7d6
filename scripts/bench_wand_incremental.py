"""Past-guard WAND win, measured (round-5, VERDICT r4 item #1).

The round-4 cost model put the WAND/exhaustive crossover at ~20M summed
df (= WAND_MIN_POSTINGS), but the demonstration corpus could not be
built: 24M+ docs in ONE IndexBuilder shuffle OOMs this sandbox's heap.
This script builds the corpus INCREMENTALLY — one 4M-doc IndexBuilder
base + N-1 4M-doc NRT chunks (incremental_index_batch, each chunk's
shuffle sandbox-sized, salt_range defusing the every-doc hot term) —
then measures the skewed hot-term query with the DEFAULT policy, which
must engage (no early_out) because summed df > WAND_MIN_POSTINGS.

Corpus (deterministic, generated distributedly via spark.range):
  docs 0..4999: freq=40 of 'hot' + 3 modular fill terms  (the skew)
  docs 5000+ : freq=1 of 'hot'  + 3 modular fill terms
Fill terms cycle through prime-sized pools so each has df ~ N/prime —
realistic dictionary spread without inflating build cost.

Run: python3 scripts/bench_wand_incremental.py [n_chunks] [chunk_docs]
Defaults 8 x 4M = 32M docs (summed df for 'hot' = 32M > the 20M guard).
Resumable: chunks with a committed manifest record are skipped.
Appends results to BENCH/wand.json under 'skew_hot_<N>_incremental'.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from golucene_spark.session import get_spark, warm_workers
from golucene_spark.index import CorpusSpec, FieldSpec, IndexBuilder, MaterializedIndex
from golucene_spark.search import Searcher, parse_query
from golucene_spark.search.wand import wand_topk

N_CHUNKS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
N = N_CHUNKS * CHUNK
DATA = Path(__file__).resolve().parent.parent / ".data"
BENCH = Path(__file__).resolve().parent.parent / "BENCH" / "wand.json"
SALT = 131_072

SPEC = CorpusSpec(
    text_fields=[FieldSpec("content", "content", True)],
    keyword_fields=[], key_cols=["doc_id"], id_col="doc_id", meta_cols=[],
)


def chunk_df(spark, lo: int, hi: int):
    fill = F.concat_ws(
        " ",
        F.concat(F.lit("p"), (F.col("id") % 197).cast("string")),
        F.concat(F.lit("q"), (F.col("id") % 193).cast("string")),
        F.concat(F.lit("r"), ((F.col("id") * 7) % 191).cast("string")),
    )
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.when(F.col("id") < 5_000, F.lit("hot " * 40)).otherwise(F.lit("hot ")),
            fill,
        ).alias("content"),
    ).repartition(32)


def committed_epochs(ixdir: str) -> set[int]:
    mdir = os.path.join(ixdir, "manifest")
    out = set()
    if os.path.isdir(mdir):
        for fn in os.listdir(mdir):
            if fn.endswith(".json"):
                with open(os.path.join(mdir, fn)) as f:
                    rec = json.load(f)
                if rec.get("kind") == "stream" and rec.get("status") == "committed":
                    out.add(int(rec["epoch"]))
    return out


def main():
    spark = get_spark(app_name="wand-incr",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    warm_workers(spark)
    ixdir = str(DATA / f"wand_incr_{N}")
    build_secs = []

    if not os.path.isdir(os.path.join(ixdir, "manifest")):
        t0 = time.time()
        IndexBuilder(spark, SPEC, num_segments=4, salt_range=SALT,
                     wand_layout=True).build(chunk_df(spark, 0, CHUNK), ixdir)
        build_secs.append(round(time.time() - t0, 1))
        print(f"base chunk 0: {build_secs[-1]}s", flush=True)

    from golucene_spark.streaming.nrt import incremental_index_batch

    done = committed_epochs(ixdir)
    for i in range(1, N_CHUNKS):
        if i in done:
            continue
        t0 = time.time()
        incremental_index_batch(
            chunk_df(spark, i * CHUNK, (i + 1) * CHUNK), i, ixdir, SPEC,
            salt_range=SALT,
        )
        build_secs.append(round(time.time() - t0, 1))
        print(f"nrt chunk {i}: {build_secs[-1]}s", flush=True)

    ix = MaterializedIndex(spark, ixdir)
    s = Searcher(ix, "bm25")
    q = parse_query("content:hot")
    # sanity: guard must NOT trip (summed df = N > WAND_MIN_POSTINGS)
    from golucene_spark.search.wand import WAND_MIN_POSTINGS

    stats: dict = {}
    top_w = wand_topk(s, q, 10, stats_out=stats).collect()
    if N > WAND_MIN_POSTINGS:
        assert stats.get("early_out") is None, f"guard tripped: {stats}"
    top_e = s.search(q, 10).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in top_e] == \
           [(r["doc_id"], round(r["score"], 9)) for r in top_w], "results differ"

    best_ex = best_wd = 1e9
    for _ in range(5):
        t0 = time.time(); s.search(q, 10).collect()
        best_ex = min(best_ex, time.time() - t0)
        t0 = time.time(); wand_topk(s, q, 10).collect()   # DEFAULT policy
        best_wd = min(best_wd, time.time() - t0)
    row = {
        "n_docs": N,
        "built_as": f"1 base + {N_CHUNKS - 1} NRT chunks of {CHUNK}",
        "chunk_build_secs": build_secs,
        "exhaustive_sec": round(best_ex, 3),
        "wand_default_sec": round(best_wd, 3),
        "engaged_by_default": stats.get("early_out") is None,
        "early_out": stats.get("early_out"),
        "blocks_total": stats.get("blocks_total"),
        "blocks_decoded_wand": stats.get("blocks_decoded_rescore"),
        "decode_reduction": round(
            1 - stats["blocks_decoded_rescore"] / stats["blocks_total"], 4)
        if stats.get("blocks_total") else None,
        "speedup_vs_exhaustive": round(best_ex / best_wd, 3),
    }
    prev = json.loads(BENCH.read_text()) if BENCH.exists() else {}
    prev[f"skew_hot_{N}_incremental"] = row
    BENCH.write_text(json.dumps(prev, indent=1))
    print(json.dumps(row, indent=1))


if __name__ == "__main__":
    main()
