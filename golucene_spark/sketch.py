"""Deterministic distinct-count sketching: the KMV (k-minimum-values)
estimator of Bar-Yossef et al. — the "novel sketch" slot of the
training-pipeline toolbox.

Each distinct value hashes to a uniform point in (0,1] (md5-prefix /
2^32 — content-derived, no seed, so the sketch is REPRODUCIBLE across
runs and engines, unlike Spark's approx_count_distinct whose HLL++
internals no SQL oracle can mirror).  Keeping the k smallest hash
points, the density estimate is distinct ≈ (k-1)/h_k where h_k is the
k-th smallest.

The k-smallest reduction is exactly Spark's TakeOrdered: every
partition keeps its own k smallest, the driver merges — which IS the
sketch's mergeability (k-smallest of a union = k-smallest over the
per-part k-smallest sets), so the operator scales as a narrow
per-partition top-k, never a global sort."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SCALE = float(1 << 32)


def kmv_hashes(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """The k smallest distinct hash points of ``col`` (column ``h`` in
    (0,1], ascending) — the sketch itself; union + re-limit merges two
    sketches."""
    h = (
        F.conv(F.substring(F.md5(F.col(col)), 1, 8), 16, 10).cast("double")
        / F.lit(_SCALE)
    )
    return df.select(h.alias("h")).distinct().orderBy("h").limit(k)


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One-row frame (k, n_kept, kth_e9, estimate_e6): the KMV distinct
    estimate (k-1)/h_k, or the EXACT kept count when fewer than k
    distinct hash points exist (the sketch saw everything)."""
    hs = kmv_hashes(df, col, k)
    return hs.agg(
        F.lit(k).cast("long").alias("k"),
        F.count("*").cast("long").alias("n_kept"),
        F.round(F.max("h") * 1e9, 0).cast("long").alias("kth_e9"),
        F.round(
            F.when(F.count("*") < k, F.count("*").cast("double")).otherwise(
                (F.lit(float(k - 1))) / F.max("h")
            )
            * 1e6,
            0,
        )
        .cast("long")
        .alias("estimate_e6"),
    )


def cms_build(df: DataFrame, col: str, weight_col: str | None = None,
              depth: int = 4, width: int = 1024) -> DataFrame:
    """Count-min sketch build (Cormode-Muthukrishnan): depth salted
    md5 hash rows x width counters, one explode + ONE groupBy — the
    whole sketch is a (depth*width)-row frame regardless of input
    size, and two sketches merge by unioning + re-summing.  Seedless
    (md5 of "r:value"), so estimates are reproducible and SQL-
    mirrorable, unlike JVM hashCode-based sketches."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = df.select(F.col(col).alias("v"), w.alias("w")).withColumn(
        "r", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
    )
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.col("r").cast("string"), F.lit(":"), F.col("v"))), 1, 8),
            16, 10,
        ).cast("long"),
        F.lit(width),
    )
    return (
        rows.withColumn("bucket", bucket)
        .groupBy("r", "bucket")
        .agg(F.sum("w").alias("cnt"))
    )


def cms_estimate(cms: DataFrame, terms: list[str],
                 depth: int = 4, width: int = 1024) -> DataFrame:
    """(term, est): point estimates (min over the depth rows) for the
    probe terms — an upper bound on the true total, exact for terms
    whose buckets saw no collisions."""
    import hashlib

    probes = []
    for t in terms:
        for r in range(depth):
            h = int(hashlib.md5(f"{r}:{t}".encode()).hexdigest()[:8], 16) % width
            probes.append((t, r, h))
    spark = cms.sparkSession
    p = spark.createDataFrame(probes, "term string, r int, bucket long")
    return (
        p.join(cms, ["r", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est"))
    )
