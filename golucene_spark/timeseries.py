"""Time-series densification: gap-fill + last-observation-carried-
forward (the TimescaleDB time_bucket_gapfill/locf surface — the
"hypertable rollup" class of custom operator).

A dense (bucket x series) grid is generated from the observed time
bounds, left-joined with the sparse per-bucket rollup, and missing
buckets are filled by carrying the last observed value forward within
each series — one window over the grid, no iterative driver logic.

Scale shape: the grid is `sequence()`-exploded per series (narrow, no
shuffle to build), the rollup is the usual one-exchange partial agg,
and the LOCF window shuffles once by series key — at 100 TB the series
key is the natural partitioner and AQE handles skewed hot series.
Only the two scalar time bounds are collected to the driver."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def gapfill_locf(
    events: DataFrame,
    bucket_seconds: int = 900,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """(win_start, <key>, n, sum_value_e6, filled_e6): dense buckets per
    key over the GLOBAL observed range; ``n`` is 0 and ``sum_value_e6``
    NULL on gap rows; ``filled_e6`` carries the last observed rounded
    sum forward (NULL until the series' first observation).  The fill
    runs over the e6-rounded integers so it is exact — never re-derived
    from floats after rounding."""
    b = (F.floor(F.unix_timestamp(F.col(ts_col).cast("timestamp")) / bucket_seconds)
         * bucket_seconds).cast("long")
    agg = (
        events.select(b.alias("win_start"), F.col(key_col).alias("key"), F.col(value_col).alias("v"))
        .groupBy("win_start", "key")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("v") * 1e6, 0).cast("long").alias("sum_value_e6"),
        )
    )
    lo, hi = agg.agg(F.min("win_start"), F.max("win_start")).collect()[0]
    keys = agg.select("key").distinct()
    grid = keys.select(
        "key",
        F.explode(
            F.sequence(F.lit(int(lo)), F.lit(int(hi)), F.lit(bucket_seconds))
        ).alias("win_start"),
    )
    joined = grid.join(agg, ["key", "win_start"], "left").select(
        "win_start",
        F.col("key").alias(key_col),
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        "sum_value_e6",
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("win_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.withColumn(
        "filled_e6", F.last("sum_value_e6", ignorenulls=True).over(w)
    )
