"""Ordered-funnel analysis over event streams: how many users reach
each step of view -> click -> purchase (earliest-completion semantics)
within a conversion window.

Step i's entry time for a user is the EARLIEST event of step i's type
strictly after their step i-1 entry and within ``within_seconds`` of
it — the standard strict-order funnel.  Each stage is one
filter + groupBy(min) + join against the previous stage's (small)
per-user frame; no window over the raw event stream, no cross joins,
so the plan is len(steps) tiny hash joins over per-user aggregates."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel(
    events: DataFrame,
    steps: tuple = ("view", "click", "purchase"),
    within_seconds: int | None = 86400,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(step, step_idx, n_users): users whose earliest qualifying chain
    reaches each step, earliest-entry semantics per stage."""
    e = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        F.unix_timestamp(F.col(ts_col).cast("timestamp")).cast("long").alias("s"),
    )
    stage = (
        e.filter(F.col("t") == steps[0]).groupBy("u").agg(F.min("s").alias("entry"))
    )
    counts = [(steps[0], 0, stage.count())]
    for i, st in enumerate(steps[1:], start=1):
        nxt = e.filter(F.col("t") == st).join(stage, "u")
        cond = F.col("s") > F.col("entry")
        if within_seconds is not None:
            cond = cond & (F.col("s") <= F.col("entry") + within_seconds)
        stage = (
            nxt.filter(cond).groupBy("u").agg(F.min("s").alias("entry"))
        )
        counts.append((st, i, stage.count()))
    spark = events.sparkSession
    return spark.createDataFrame(
        counts, "step string, step_idx long, n_users long"
    )


def cohort_retention(
    events: DataFrame,
    bucket_seconds: int = 7 * 86400,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Cohort retention: users grouped by their FIRST-activity bucket
    (the cohort), counted again in every later bucket they return in —
    (cohort, offset, n_users) with offset 0 = the cohort size.  Two
    aggregations and one join on the per-user first-activity frame;
    the raw event stream is bucketed once, never windowed."""
    e = events.select(
        F.col(user_col).alias("u"),
        (F.floor(
            F.unix_timestamp(F.col(ts_col).cast("timestamp")) / bucket_seconds
        )).cast("long").alias("b"),
    ).distinct()
    first = e.groupBy("u").agg(F.min("b").alias("cohort"))
    return (
        e.join(first, "u")
        .groupBy("cohort", (F.col("b") - F.col("cohort")).alias("offset"))
        .agg(F.countDistinct("u").cast("long").alias("n_users"))
    )
