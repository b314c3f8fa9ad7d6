"""Gap-fill + LOCF densification (hypertable rollup surface)."""

from datetime import datetime

from golucene_spark.timeseries import gapfill_locf


def test_gapfill_locf_dense_grid_and_fill(spark):
    rows = [
        (datetime(2025, 1, 1, 0, 1), "a", 10.0),
        (datetime(2025, 1, 1, 0, 50), "a", 20.0),   # 0:15 and 0:30 are gaps
        (datetime(2025, 1, 1, 0, 20), "b", 5.0),
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = {
        (r["event_type"], r["win_start"]): (r["n"], r["sum_value_e6"], r["filled_e6"])
        for r in gapfill_locf(ev, bucket_seconds=900).collect()
    }
    base = 1735689600  # 2025-01-01 00:00 UTC
    # dense: every key gets every bucket of the global range
    assert len(out) == 2 * 4
    assert out[("a", base)] == (1, 10_000_000, 10_000_000)
    assert out[("a", base + 900)] == (0, None, 10_000_000)     # gap, filled
    assert out[("a", base + 1800)] == (0, None, 10_000_000)
    assert out[("a", base + 2700)] == (1, 20_000_000, 20_000_000)
    # series b: leading gap has no prior observation -> NULL fill
    assert out[("b", base)] == (0, None, None)
    assert out[("b", base + 900)] == (1, 5_000_000, 5_000_000)
    assert out[("b", base + 2700)] == (0, None, 5_000_000)


def test_asof_join_backward_inclusive_and_tolerance(spark):
    from golucene_spark.timeseries import asof_join

    left = spark.createDataFrame(
        [(1, 1, 10), (2, 1, 25), (3, 2, 5)], "event_id long, user_id long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0), (2, 50, 900.0)],
        "user_id long, ts long, value double",
    )
    out = {r["event_id"]: (r["asof_ts"], r["asof_value"])
           for r in asof_join(left, right, by=("user_id",)).collect()}
    assert out[1] == (10, 100.0)     # inclusive: equal ts matches
    assert out[2] == (20, 200.0)     # latest at-or-before
    assert out[3] == (None, None)    # no prior right row
    # tolerance: match older than 5s is nulled
    tol = {r["event_id"]: r["asof_value"]
           for r in asof_join(left, right, by=("user_id",),
                              tolerance_seconds=5).collect()}
    assert tol[1] == 100.0 and tol[2] == 200.0 and tol[3] is None


def test_asof_join_dedupes_equal_ts(spark):
    from golucene_spark.timeseries import asof_join

    left = spark.createDataFrame([(1, 1, 10)], "event_id long, user_id long, ts long")
    right = spark.createDataFrame(
        [(1, 10, 1.0), (1, 10, 7.0)], "user_id long, ts long, value double"
    )
    row = asof_join(left, right, by=("user_id",)).collect()[0]
    assert row["asof_value"] == 7.0  # deterministic: max per (key, ts)


def test_gapfill_interpolate_linear(spark):
    from datetime import datetime
    from golucene_spark.timeseries import gapfill_interpolate

    rows = [
        (datetime(2025, 1, 1, 0, 1), "a", 10.0),
        (datetime(2025, 1, 1, 0, 50), "a", 40.0),   # two gap buckets between
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = {r["win_start"]: r["interp_e6"]
           for r in gapfill_interpolate(ev, bucket_seconds=900).collect()}
    base = 1735689600
    assert out[base] == 10_000_000
    assert out[base + 900] == 20_000_000    # 10 + (40-10)*1/3
    assert out[base + 1800] == 30_000_000   # 10 + (40-10)*2/3
    assert out[base + 2700] == 40_000_000
