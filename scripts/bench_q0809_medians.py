"""5-run medians for q08_keyword_and / q09_wide_or (BENCH_r04 flagged
+19%/+11% vs r03 on untouched code paths; separate host noise from a
real regression).  Reuses bench.py's exact build + query shapes.

Writes BENCH/q08_q09_medians_r5.json.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import QUERIES  # noqa: E402
from golucene_spark.session import get_spark, warm_workers  # noqa: E402
from golucene_spark.index import CorpusSpec, IndexBuilder, MaterializedIndex  # noqa: E402
from golucene_spark.search import Searcher, parse_query  # noqa: E402

TARGETS = ["q08_keyword_and", "q09_wide_or"]
REPS = 5


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    spark = get_spark(
        app_name="golucene-q0809",
        master=f"local[{cpus}]",
        shuffle_partitions=max(8, cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    warm_workers(spark)

    ixdir = os.path.join(str(Path(__file__).resolve().parent.parent), ".data", "q0809_index")
    shutil.rmtree(ixdir, ignore_errors=True)
    builder = IndexBuilder(
        spark, CorpusSpec.documents(), analyzer="standard",
        num_segments=max(8, cpus), index_positions=True,
    )
    builder.build(docs, ixdir, num_chunks=1)

    ix = MaterializedIndex(spark, ixdir)
    ix.postings = ix.postings.cache()
    ix.term_dict = ix.term_dict.cache()
    ix.term_dict.count()
    ix.postings.count()
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    out: dict[str, dict] = {}
    for name in TARGETS:
        s = Searcher(ix, "bm25")
        q = parse_query(QUERIES[name], default_field="text", analyzer="standard")
        s.search(q, k=10).collect()  # warm plan, excluded
        reps = []
        for _ in range(REPS):
            t1 = time.time()
            s.search(q, k=10).collect()
            reps.append(round(time.time() - t1, 4))
        out[name] = {
            "reps": reps,
            "median": round(statistics.median(reps), 4),
            "min": min(reps),
            "max": max(reps),
        }

    result = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "reps_per_query": REPS,
        "r03_medians": {"q08_keyword_and": 0.280, "q09_wide_or": 0.293},
        "r04_medians": {"q08_keyword_and": 0.334, "q09_wide_or": 0.324},
        "queries": out,
        "note": "one warm rep excluded; same build shape as bench.py",
    }
    dst = Path(__file__).resolve().parent.parent / "BENCH" / "q08_q09_medians_r5.json"
    dst.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
