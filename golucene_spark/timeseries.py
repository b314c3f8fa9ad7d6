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


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: tuple = (),
    bucket_seconds: int = 900,
) -> DataFrame:
    """Point-in-interval range join: every point row joins the interval
    rows (same ``by`` key) with start <= ts <= end — WITHOUT the naive
    range-condition join Catalyst would turn into a per-key cross
    product.  Each interval is exploded into the time buckets it
    covers, the point maps to one bucket, and the join is a plain hash
    equi-join on (by, bucket) followed by the exact range filter — the
    standard interval-bucketing trick; pick ``bucket_seconds`` near the
    typical interval length so intervals explode into O(1) buckets."""
    by = list(by)
    bs = bucket_seconds

    def bucket(c):
        return (F.floor(c.cast("double") / bs) * bs).cast("long")

    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(bucket(F.col(start_col)), bucket(F.col(end_col)), F.lit(bs))
        ),
    )
    pt = points.withColumn("_b", bucket(F.col(ts_col)))
    out = pt.join(iv, by + ["_b"]).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    )
    return out.drop("_b")


def gapfill_interpolate(
    events: DataFrame,
    bucket_seconds: int = 900,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Gap-fill with LINEAR interpolation (TimescaleDB ``interpolate``):
    like :func:`gapfill_locf` but gap buckets take the straight line
    between the surrounding observations (NULL before the first / after
    the last).  All endpoints are the e6-rounded integers, so the
    interpolation arithmetic (int + int-diff * int-ratio) is the same
    double expression on both engines — rounded once at the end."""
    dense = gapfill_locf(events, bucket_seconds, ts_col, key_col, value_col)
    asc = (
        Window.partitionBy(key_col)
        .orderBy("win_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    desc = (
        Window.partitionBy(key_col)
        .orderBy(F.desc("win_start"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_t = F.when(F.col("sum_value_e6").isNotNull(), F.col("win_start"))
    d = (
        dense.withColumn("_pv", F.col("filled_e6"))
        .withColumn("_pt", F.last(obs_t, ignorenulls=True).over(asc))
        .withColumn("_nv", F.last("sum_value_e6", ignorenulls=True).over(desc))
        .withColumn("_nt", F.last(obs_t, ignorenulls=True).over(desc))
    )
    interp = F.when(
        F.col("sum_value_e6").isNotNull(), F.col("sum_value_e6").cast("double")
    ).otherwise(
        F.col("_pv").cast("double")
        + (F.col("_nv") - F.col("_pv")).cast("double")
        * ((F.col("win_start") - F.col("_pt")).cast("double")
           / (F.col("_nt") - F.col("_pt")).cast("double"))
    )
    return (
        d.withColumn("interp_e6", F.round(interp, 0).cast("long"))
        .drop("_pv", "_pt", "_nv", "_nt")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    by: tuple = ("user_id",),
    value_cols: tuple = ("value",),
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join: every left row picks the LATEST right row
    of the same ``by`` key with right.ts <= left.ts (inclusive) — the
    kdb/TimescaleDB/DuckDB ASOF JOIN.  Joined right columns come back
    as ``asof_ts`` + ``value_cols`` (NULL when no prior right row, or
    when the match is older than ``tolerance_seconds``).

    Execution shape: ONE shuffle — union the two sides tagged, sort
    within each ``by`` partition by (ts, side) with right-before-left
    at equal ts (that ordering IS the inclusive bound), and carry the
    last right values forward with one window.  Never a range
    cross-join; at 100 TB the window partitions by the natural series
    key.  Right rows are deduped to one per (by, ts) (latest values by
    max) so the carried value is deterministic."""
    by = list(by)
    value_cols = list(value_cols)
    r = (
        right.groupBy(*by, ts_col)
        .agg(*[F.max(v).alias(v) for v in value_cols])
        .select(
            *by,
            F.col(ts_col).alias("_ts"),
            F.lit(0).alias("_side"),
            F.col(ts_col).alias("_r_ts"),
            *[F.col(v).alias(f"_r_{v}") for v in value_cols],
        )
    )
    l = left.withColumn("_ts", F.col(ts_col)).withColumn("_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("asof_ts", F.last("_r_ts", ignorenulls=True).over(w))
    for v in value_cols:
        u = u.withColumn(f"asof_{v}", F.last(f"_r_{v}", ignorenulls=True).over(w))
    out = u.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        out = out.withColumn(
            "_stale",
            (
                F.unix_timestamp(F.col(ts_col).cast("timestamp"))
                - F.unix_timestamp(F.col("asof_ts").cast("timestamp"))
            )
            > tolerance_seconds,
        )
        for c in ["asof_ts"] + [f"asof_{v}" for v in value_cols]:
            out = out.withColumn(c, F.when(F.col("_stale"), None).otherwise(F.col(c)))
        out = out.drop("_stale")
    return out.drop("_ts", "_side", "_r_ts", *[f"_r_{v}" for v in value_cols])


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
