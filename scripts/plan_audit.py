"""Plan audit over EVERY declared query (guide §7.2): for each
queries() entry, capture the physical plan and count the nodes that
matter at scale — Exchange (shuffles), BatchEvalPython/ArrowEvalPython
(row-at-a-time Python), MapInArrow/MapInPandas (sanctioned vectorized
boundaries), SortAggregate (sort-based agg fallbacks), and
CartesianProduct.  Writes a JSON summary.

Usage: python3 scripts/plan_audit.py [sf_dir] [out_json] [name ...]
"""

from __future__ import annotations

import json
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from golucene_spark.session import get_spark

NODES = [
    "Exchange",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "SortAggregate",
    "ObjectHashAggregate",
    "HashAggregate",
    "SortMergeJoin",
    "BroadcastHashJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "TakeOrderedAndProject",
    "Window",
]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/plan_audit.json"
    only = set(sys.argv[3:])
    spark = get_spark(app_name="plan-audit", shuffle_partitions=8,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    jvm = spark.sparkContext._jvm
    out = {}
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            txt = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
            # operator list is the numbered tree before the details section
            tree = txt.split("\n\n")[0]
            counts = {}
            for node in NODES:
                c = len(re.findall(rf"\b{node} \(", tree))
                if c:
                    counts[node] = c
            pushed = "PushedFilters: [" in txt and not re.search(
                r"PushedFilters: \[\]", txt)
            out[name] = {
                "nodes": counts,
                "pushed_filters": bool(pushed),
                "plan_sec": round(time.time() - t0, 2),
            }
        except Exception as e:  # noqa
            out[name] = {"err": f"{type(e).__name__}: {e}"[:300]}
        print(name, out[name], flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("WROTE", out_path)


if __name__ == "__main__":
    main()
