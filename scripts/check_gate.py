"""Self-check harness mimicking the driver's correctness gate:
runs every queries()/oracle_sql() pair at sf0.01, compares row count,
column names, and order-insensitive row-value sets.

Usage: python3 scripts/check_gate.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

import __spark_entry__ as entrymod
from golucene_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if v is None:
        return "\x00<NULL>"  # sortable sentinel (cube/rollup totals)
    return v


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="gate-check", shuffle_partitions=8,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    # the std-tokens oracle embeds the sf0.01 golden-fixture path
    # (ORACLES is static; the driver always runs sf0.01) — at any other
    # sf, regenerate the reference-DFA tokens for THAT corpus and
    # rewrite the path so the pair stays corpus-consistent
    if Path(sf_dir).resolve() != Path("/root/testdata/sf0.01").resolve():
        from golucene_spark.gate import _std_tokens_parquet

        sf01 = _std_tokens_parquet("/root/testdata/sf0.01")
        here = _std_tokens_parquet(sf_dir)
        osql = {k: v.replace(sf01, here) for k, v in osql.items()}
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(norm(v) for v in r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in osql:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(osql[name])
            ocols = [d[0] for d in cur.description]
            orows = [tuple(norm(v) for v in r) for r in cur.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            failures += 1
            continue
        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns {scols} vs {ocols}")
            ok = False
        elif len(srows) != len(orows):
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(orows)}")
            ok = False
        else:
            # order-insensitive compare after aligning column order by name
            sidx = [scols.index(c) for c in sorted(scols)]
            oidx = [ocols.index(c) for c in sorted(ocols)]
            key = lambda t: tuple(repr(x) for x in t)
            sset = sorted((tuple(r[i] for i in sidx) for r in srows), key=key)
            oset = sorted((tuple(r[i] for i in oidx) for r in orows), key=key)
            if sset != oset:
                diffs = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
                print(f"FAIL {name}: value mismatch, first diffs {diffs}")
                ok = False
        if ok:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
        else:
            failures += 1
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
