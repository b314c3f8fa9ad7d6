"""Ordered-funnel analysis: strict order, conversion window."""

from datetime import datetime

from golucene_spark.funnel import funnel


def test_funnel_strict_order_and_window(spark):
    d = datetime
    rows = [
        # u1 completes all three in order
        (1, "view", d(2025, 1, 1, 0, 0)),
        (1, "click", d(2025, 1, 1, 1, 0)),
        (1, "purchase", d(2025, 1, 1, 2, 0)),
        # u2 clicks BEFORE viewing: click doesn't count, no purchase step
        (2, "click", d(2025, 1, 1, 0, 0)),
        (2, "view", d(2025, 1, 1, 1, 0)),
        # u3 views then clicks outside the 1h window
        (3, "view", d(2025, 1, 1, 0, 0)),
        (3, "click", d(2025, 1, 1, 5, 0)),
        # u4 never enters the funnel
        (4, "purchase", d(2025, 1, 1, 0, 0)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {r["step"]: r["n_users"]
           for r in funnel(ev, ("view", "click", "purchase"),
                           within_seconds=3600).collect()}
    assert got == {"view": 3, "click": 1, "purchase": 1}
    # no window: u3's late click now qualifies
    loose = {r["step"]: r["n_users"]
             for r in funnel(ev, ("view", "click", "purchase"),
                             within_seconds=None).collect()}
    assert loose == {"view": 3, "click": 2, "purchase": 1}


def test_cohort_retention(spark):
    from datetime import datetime as d
    from golucene_spark.funnel import cohort_retention

    rows = [
        (1, d(2025, 1, 6)), (1, d(2025, 1, 14)),   # cohort w0, returns w1
        (2, d(2025, 1, 7)),                         # cohort w0, never returns
        (3, d(2025, 1, 15)), (3, d(2025, 1, 15, 18)),  # cohort w1, same-week dup
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(r["cohort"], r["offset"]): r["n_users"]
           for r in cohort_retention(ev, bucket_seconds=7 * 86400).collect()}
    cohorts = sorted({c for c, _ in got})
    w0, w1 = cohorts
    assert got[(w0, 0)] == 2 and got[(w0, 1)] == 1
    assert got[(w1, 0)] == 1 and (w1, 1) not in got
