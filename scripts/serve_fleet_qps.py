"""Multi-session serve-fleet throughput scaling (north-rule evidence,
query path).

A single Spark session's tiny-query QPS is capped by the driver's
DAGScheduler event loop (BENCH/BASELINE.md experiment #1), so query
THROUGHPUT on a real cluster scales by adding serving sessions, not by
adding cores to one driver.  This experiment measures exactly that,
in-sandbox, with genuinely disjoint compute:

  level N : 1 serving process pinned to cores 0-7      (8 cores)
  level 4N: 4 serving processes pinned to cores 0-7 /
            8-15 / 16-23 / 24-31                       (32 cores)

All processes serve the SAME on-disk index (built once), run the SAME
per-process query mix, and are start-synchronized through a file
barrier; aggregate QPS = total queries / wall of the overlapped
window.  Efficiency = (qps_4N / qps_N) / 4.

Usage:
  python3 scripts/serve_fleet_qps.py --all [--rows 1000000]
  python3 scripts/serve_fleet_qps.py --child I --cores A-B --ixdir D --sync S
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from scaling_bench import QUERIES, ensure_corpus  # noqa: E402

def ixdir_for(rows: int) -> Path:
    # the original 1M index keeps its legacy name (matches the recorded
    # serve_fleet*.json runs); other sizes get their own
    suffix = "" if rows == 1_000_000 else f"_{rows}"
    return ROOT / ".data" / f"serve_fleet_index{suffix}"
REPS = 8  # query-mix repetitions per process


def build_index(rows: int) -> Path:
    from golucene_spark.session import get_spark, warm_workers
    from golucene_spark.index import CorpusSpec, IndexBuilder

    corpus = ensure_corpus(rows)
    ixdir = ixdir_for(rows)
    if (ixdir / "field_stats").exists():
        return ixdir
    spark = get_spark(
        app_name="fleet-build", master="local[32]", shuffle_partitions=128,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    warm_workers(spark)
    shutil.rmtree(ixdir, ignore_errors=True)
    docs = spark.read.parquet(str(corpus))
    IndexBuilder(spark, CorpusSpec.source_code(), analyzer="standard",
                 num_segments=64).build(docs, str(ixdir))
    spark.stop()
    return ixdir


def child(idx: int, cores: int, ixdir: str, sync_dir: str) -> None:
    from concurrent.futures import ThreadPoolExecutor

    from golucene_spark.session import get_spark, warm_workers
    from golucene_spark.index import MaterializedIndex
    from golucene_spark.search import Searcher, parse_query

    # leave ONE core slice of scheduler headroom per process: the JVM's
    # service threads (GC, shuffle IO, Py4J) plus the Python client pool
    # otherwise push the fleet's 4N run queue to ~40 runnable on 32
    # cores (measured via vmstat: r=35-48, st=1-7%), and the resulting
    # involuntary context switches cost more than the lost task slot.
    # Measured A/B at 4N: local[7]+7 clients 5.20 qps vs local[8]+8
    # clients 5.08 qps, efficiency 0.86 vs 0.83.
    exec_threads = cores - 1 if cores >= 4 else cores
    spark = get_spark(
        app_name=f"fleet-serve-{idx}", master=f"local[{exec_threads}]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    warm_workers(spark)
    ix = MaterializedIndex(spark, ixdir)
    # serve sessions persist the SCORING columns only (no position
    # blobs, no block metadata: ~0.5GB columnar at 1M docs) in executor
    # storage — repeated queries then read process-local memory instead
    # of all four processes churning the one shared page cache, which
    # the r4 run left as the residual contention after the snapshot
    # memos.  On a real cluster this is the standard hot-index cache
    # tier.
    from pyspark import StorageLevel

    ix.postings = ix.postings.select(
        "segment_id", "field", "term",
        "doc_ids", "freqs", "dlqs", "norm_bytes",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    ix.postings.count()
    s = Searcher(ix, "bm25")
    parsed = {
        n: parse_query(q, default_field="content", analyzer="standard")
        for n, q in QUERIES.items()
    }

    def run_q(q):
        s.search(q, 10).collect()

    qlist = list(parsed.values()) * REPS
    with ThreadPoolExecutor(max_workers=exec_threads) as pool:  # warm plans+pool
        list(pool.map(run_q, parsed.values()))

    # barrier: announce ready, wait for the parent's go file
    Path(sync_dir, f"ready-{idx}").touch()
    go = Path(sync_dir, "go")
    while not go.exists():
        time.sleep(0.05)

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=exec_threads) as pool:
        list(pool.map(run_q, qlist))
    wall = time.time() - t0
    print(json.dumps({
        "idx": idx, "n_queries": len(qlist), "wall_sec": round(wall, 3),
        "qps": round(len(qlist) / wall, 3),
        "t_start": round(t0, 3), "t_end": round(t0 + wall, 3),
    }))


def run_level(n_procs: int, cores_per_proc: int, ixdir: Path) -> dict:
    sync = ROOT / ".data" / f"fleet_sync_{n_procs}"
    shutil.rmtree(sync, ignore_errors=True)
    sync.mkdir(parents=True)
    procs = []
    errfiles = []
    for i in range(n_procs):
        lo = i * cores_per_proc
        hi = lo + cores_per_proc - 1
        cmd = [
            "taskset", "-c", f"{lo}-{hi}", sys.executable, __file__,
            "--child", str(i), "--cores", str(cores_per_proc),
            "--ixdir", str(ixdir), "--sync", str(sync),
        ]
        env = dict(os.environ)
        # heap sized for the scoring-column cache (~0.5GB columnar) +
        # 8-thread scan batches during materialization (3g OOMed there).
        # The CAP is 5g but actual residency stays ~1.5-2GB/process, so
        # the fleet's combined resident set remains inside the host's
        # ~14GB fast-page window (what the old 3g comment guarded).
        env["SPARK_GRAFT_DRIVER_MEM"] = "5g"
        # stderr to a FILE, not a PIPE: a chatty Spark startup can fill
        # a 64KB pipe before anyone drains it, blocking the child mid-
        # write so it never touches its ready file (stdout stays a pipe
        # — it only carries the child's one JSON result line)
        errfiles.append(open(sync / f"stderr-{i}.log", "w"))
        procs.append(
            subprocess.Popen(cmd, stdout=subprocess.PIPE,
                             stderr=errfiles[-1], text=True, env=env)
        )
    results = []
    try:
        deadline = time.time() + 600
        while time.time() < deadline:
            if all((sync / f"ready-{i}").exists() for i in range(n_procs)):
                break
            if any(p.poll() is not None for p in procs):
                raise RuntimeError("a child exited before the barrier")
            time.sleep(0.2)
        else:
            raise TimeoutError("children never became ready")
        (sync / "go").touch()
        for i, p in enumerate(procs):
            out, _ = p.communicate(timeout=900)
            lines = [l for l in out.splitlines() if l.startswith("{")]
            if not lines:
                err = (sync / f"stderr-{i}.log").read_text(errors="replace")
                raise RuntimeError(
                    f"child {i} produced no result (rc={p.returncode}); "
                    f"stderr tail:\n" + "\n".join(err.splitlines()[-25:])
                )
            results.append(json.loads(lines[-1]))
    finally:
        # never orphan a pinned 5g-heap child: a pre-barrier crash or
        # timeout would otherwise leave survivors spinning on a go file
        # that will never appear, corrupting every later measurement
        for p in procs:
            if p.poll() is None:
                p.kill()
        for f in errfiles:
            f.close()
    total_q = sum(r["n_queries"] for r in results)
    # overlapped window: first start to last end (children are
    # barrier-released together, so this is the honest aggregate wall)
    wall = max(r["t_end"] for r in results) - min(r["t_start"] for r in results)
    return {
        "n_procs": n_procs,
        "cores_per_proc": cores_per_proc,
        "total_cores": n_procs * cores_per_proc,
        "total_queries": total_q,
        "window_sec": round(wall, 3),
        "aggregate_qps": round(total_q / wall, 3),
        "per_proc": results,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--reps", type=int, default=3,
                    help="interleaved repetitions per level; best-of-N "
                         "at BOTH levels symmetrically (drifting host)")
    ap.add_argument("--child", type=int)
    ap.add_argument("--cores", type=int)
    ap.add_argument("--ixdir")
    ap.add_argument("--sync")
    args = ap.parse_args()
    if args.child is not None:
        child(args.child, args.cores, args.ixdir, args.sync)
        return
    ixdir = build_index(args.rows)
    # best-of-2 per level, interleaved: this host's page-supply/bus
    # throughput drifts +-50% between runs (same discipline as the
    # build bench's best-of-N)
    lo_runs, hi_runs = [], []
    for _ in range(args.reps):
        lo_runs.append(run_level(1, 8, ixdir))
        hi_runs.append(run_level(4, 8, ixdir))
    import statistics

    lo = max(lo_runs, key=lambda r: r["aggregate_qps"])
    hi = max(hi_runs, key=lambda r: r["aggregate_qps"])
    lo_med = statistics.median(r["aggregate_qps"] for r in lo_runs)
    hi_med = statistics.median(r["aggregate_qps"] for r in hi_runs)
    # HEADLINE efficiency from per-level MEDIANS (r5 verdict: best-of-N
    # on a 2-4x-noise host is a thin statistic; medians are the honest
    # one).  best-of is kept as a secondary diagnostic.
    eff_med = (hi_med / lo_med) / 4
    eff_best = (hi["aggregate_qps"] / lo["aggregate_qps"]) / 4
    summary = {
        "rows": args.rows,
        "levels": {"N": lo, "4N": hi},
        "all_qps": {
            "N": [r["aggregate_qps"] for r in lo_runs],
            "4N": [r["aggregate_qps"] for r in hi_runs],
        },
        "median_qps": {"N": round(lo_med, 3), "4N": round(hi_med, 3)},
        "serve_fleet_qps_scaling_efficiency_N_to_4N": round(eff_med, 3),
        "efficiency_best_of": round(eff_best, 3),
        "note": "disjoint taskset core sets; one shared on-disk index; "
                "file-barrier synchronized start; same per-process mix; "
                f"{args.reps} interleaved reps per level; headline "
                "efficiency from per-level medians (best-of kept as "
                "diagnostic)",
    }
    (ROOT / "BENCH").mkdir(exist_ok=True)
    # per-rows output file: a smoke run at a non-protocol size must
    # never clobber the recorded 1M-row protocol artifacts
    suffix = "" if args.rows == 1_000_000 else f"_{args.rows}"
    (ROOT / "BENCH" / f"serve_fleet{suffix}.json").write_text(
        json.dumps(summary, indent=2))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
