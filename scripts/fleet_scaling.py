"""Worker-fleet scaling microbench (supplementary north-rule evidence).

Measures the tokenize+invert stage (the engine's dominant compute at
real scale) as N independent worker processes — exactly what Spark's
python workers execute per task — at 1/2/8/32-way concurrency, on the
same batch.  This isolates the ENGINE's parallel scalability from the
sandbox host's serialized page-supply artifact that caps end-to-end
Spark wall times here (see BENCH/BASELINE.md).

Writes BENCH/fleet.json.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def worker(q, reps, rows):
    import numpy as np
    import pyarrow as pa

    from golucene_spark.corpus import make_corpus
    from golucene_spark.index.builder import CorpusSpec, _tf_arrow_fn

    pdf = make_corpus(rows, seed=3)
    pdf.insert(0, "doc_id", np.arange(len(pdf)))
    pdf.insert(0, "segment_id", np.zeros(len(pdf), dtype=np.int32))
    rb = pa.RecordBatch.from_pandas(pdf)
    fn = _tf_arrow_fn(CorpusSpec.source_code(), "standard", True, True)
    list(fn(iter([rb])))  # warm
    t = time.time()
    for _ in range(reps):
        list(fn(iter([rb])))
    q.put((time.time() - t) / reps)


def main():
    rows, reps = 4000, 3
    out = {}
    for n in (1, 2, 8, 32):
        q = mp.Queue()
        ps = [mp.Process(target=worker, args=(q, reps, rows)) for _ in range(n)]
        [p.start() for p in ps]
        [p.join() for p in ps]
        times = [q.get() for _ in range(n)]
        agg = n * rows / (sum(times) / len(times))
        out[n] = {"per_task_sec": round(sum(times) / len(times), 3),
                  "aggregate_docs_per_sec": round(agg, 1)}
        print(n, out[n])
    out["efficiency_2_to_8"] = round(
        (out[8]["aggregate_docs_per_sec"] / out[2]["aggregate_docs_per_sec"]) / 4, 3)
    out["efficiency_8_to_32"] = round(
        (out[32]["aggregate_docs_per_sec"] / out[8]["aggregate_docs_per_sec"]) / 4, 3)
    (ROOT / "BENCH").mkdir(exist_ok=True)
    (ROOT / "BENCH" / "fleet.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
