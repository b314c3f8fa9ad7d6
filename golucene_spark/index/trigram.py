"""Character-trigram index over the term dictionary — the sublinear
seek for PREFIX-LESS multiterm patterns (``*bar*``, ``.*foo.*``).

The reference carries a full automaton library
(core/util/automaton/regexp.go, run.go, ~3k LoC) whose term-dictionary
intersection role its live queries never reach (queryParser.go:178-190
panics).  Spark-native equivalent: literal-prefix patterns already seek
via pushed StartsWith range predicates (search/multiterm.py); patterns
with NO literal prefix used to rlike-scan the whole dictionary.  This
optional side table inverts the dictionary by character trigram so any
pattern containing a literal run of >= 3 chars pre-prunes its rlike to
the terms containing ALL the run's trigrams:

    trigram/   (field string, gram string, term string)

sorted by (field, gram) at write time, so a gram IN-list pushes into
parquet row-group min/max stats — the candidate fetch reads only the
grams' slices, never the whole dictionary.

Staleness: the manifest record carries the number of data chunks the
table was built over; MaterializedIndex ignores the table when the live
chunk count has moved on (a rebuild is one call of build_trigram_index).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

TRIGRAM_CHUNK = "trigram"


def _data_chunk_count(index_dir: str) -> int:
    """Number of committed segment-data manifest records (build chunks,
    stream/update flushes, merges) — the trigram table's freshness key."""
    mdir = os.path.join(index_dir, "manifest")
    n = 0
    if os.path.isdir(mdir):
        for fn in os.listdir(mdir):
            if not fn.endswith(".json"):
                continue
            with open(os.path.join(mdir, fn)) as f:
                rec = json.load(f)
            if rec.get("kind") not in ("delete", "trigram") and (
                rec.get("status") == "committed"
            ):
                n += 1
    return n


def trigrams_col(term_col="term"):
    """array<string> of the term's character trigrams, JVM-side."""
    return F.expr(
        f"transform(sequence(1, greatest(length({term_col}) - 2, 0)), "
        f"i -> substring({term_col}, i, 3))"
    )


def build_trigram_index(spark: SparkSession, index_dir: str) -> dict:
    """(Re)build the trigram side table from the live term dictionary.
    One scan of term_dict + one range shuffle; output sorted by
    (field, gram) for row-group pruning on gram IN-lists."""
    from .builder import dead_segments

    t0 = time.time()
    td = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(index_dir, "term_dict")
    )
    dead = dead_segments(index_dir)
    if dead:
        td = td.filter(~F.col("segment_id").isin([int(x) for x in dead]))
    terms = td.select("field", "term").distinct()
    tri = (
        terms.select("field", "term", F.explode(trigrams_col()).alias("gram"))
        .distinct()
        .repartitionByRange(8, "field", "gram")
        .sortWithinPartitions("field", "gram", "term")
    )
    out = os.path.join(index_dir, TRIGRAM_CHUNK)
    tri.write.mode("overwrite").parquet(out)
    rec = {
        "chunk": TRIGRAM_CHUNK,
        "status": "committed",
        "kind": "trigram",
        "built_over_chunks": _data_chunk_count(index_dir),
        "wall_sec": round(time.time() - t0, 3),
    }
    mdir = os.path.join(index_dir, "manifest")
    os.makedirs(mdir, exist_ok=True)
    with open(os.path.join(mdir, f"{TRIGRAM_CHUNK}.json"), "w") as f:
        json.dump(rec, f)
    return rec


def refresh_trigram_index(spark: SparkSession, index_dir: str,
                          new_terms: DataFrame | None = None) -> dict | None:
    """Keep an EXISTING trigram table fresh across commit paths (NRT /
    update flushes, merges) so infix seeks survive a living index
    without a manual rebuild.  No-op when the index never built one.

    ``new_terms``: the just-committed chunk's (field, term) frame — its
    trigrams are APPENDED as a delta (duplicates are harmless:
    trigram_candidates counts DISTINCT grams per term).  None = the
    commit introduced no new terms (a merge: its output terms are a
    subset of the union of its inputs'), so only the freshness key
    moves.  Scale note: the delta append touches only the new chunk's
    terms — never a full term_dict rescan per commit; the full rebuild
    below only fires when commits happened while refresh was disabled
    (freshness key more than one behind)."""
    mpath = os.path.join(index_dir, "manifest", f"{TRIGRAM_CHUNK}.json")
    ddir = os.path.join(index_dir, TRIGRAM_CHUNK)
    if not (os.path.exists(mpath) and os.path.isdir(ddir)):
        return None
    with open(mpath) as f:
        rec = json.load(f)
    cur = _data_chunk_count(index_dir)
    built_over = rec.get("built_over_chunks")
    if built_over == cur:
        return rec
    if built_over != cur - 1:
        # table was already stale before this commit (refresh skipped
        # for some earlier chunk) — a delta can't recover; full rebuild
        return build_trigram_index(spark, index_dir)
    t0 = time.time()
    if new_terms is not None:
        (
            new_terms.select("field", "term").distinct()
            .select("field", "term", F.explode(trigrams_col()).alias("gram"))
            .distinct()
            .repartitionByRange(1, "field", "gram")
            .sortWithinPartitions("field", "gram", "term")
            .write.mode("append").parquet(ddir)
        )
    rec["built_over_chunks"] = cur
    rec["wall_sec"] = round(time.time() - t0, 3)
    rec["kind"] = "trigram"
    with open(mpath, "w") as f:
        json.dump(rec, f)
    return rec


def load_trigram_index(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """The trigram table if present AND fresh (built over the current
    live chunk set); None otherwise — callers fall back to the full
    dictionary scan, which is always correct."""
    mpath = os.path.join(index_dir, "manifest", f"{TRIGRAM_CHUNK}.json")
    ddir = os.path.join(index_dir, TRIGRAM_CHUNK)
    if not (os.path.exists(mpath) and os.path.isdir(ddir)):
        return None
    with open(mpath) as f:
        rec = json.load(f)
    if rec.get("built_over_chunks") != _data_chunk_count(index_dir):
        return None  # stale: chunks were added/merged since the build
    return spark.read.parquet(ddir)


def trigram_candidates(trigram: DataFrame, field: str,
                       runs: list[str]) -> DataFrame | None:
    """Terms containing ALL trigrams of every literal run (a superset of
    the pattern's true matches — the caller still applies its rlike).
    None when no run yields a trigram (pattern too short to prune)."""
    need = sorted({
        run[i:i + 3] for run in runs if len(run) >= 3
        for i in range(len(run) - 2)
    })
    if not need:
        return None
    return (
        trigram.filter((F.col("field") == field) & F.col("gram").isin(need))
        .groupBy("term")
        .agg(F.countDistinct("gram").alias("_ng"))
        .filter(F.col("_ng") == len(need))
        .select("term")
    )
