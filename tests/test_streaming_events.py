"""Streaming event analytics: watermarked windowed aggregation (late
data dropped) + applyInPandasWithState sessionization."""

import time
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from golucene_spark.streaming import sessionize_stream, windowed_counts_stream


def _ts(minute, second=0):
    return datetime(2026, 1, 1, minute // 60, minute % 60, second)


def test_windowed_agg_watermark_drops_late(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sev")
    src = str(base / "in")
    schema = "ts timestamp, event_type string, value double"

    wave1 = spark.createDataFrame(
        [
            (_ts(1), "click", 1.0),
            (_ts(2), "click", 2.0),
            (_ts(16), "view", 3.0),
            (_ts(60), "click", 4.0),   # advances watermark to 00:50
        ],
        schema,
    )
    wave1.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(wave1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = windowed_counts_stream(stream, window="15 minutes", watermark="10 minutes")
    q = (
        out.writeStream.format("memory").queryName("winagg")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        # late event: 00:05 is far behind the 00:50 watermark -> dropped;
        # 02:00 advances the watermark so the 01:00 window finalizes
        wave2 = spark.createDataFrame(
            [(_ts(5), "click", 100.0), (_ts(120), "view", 5.0)], schema
        )
        wave2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        # one more empty-ish advance so pending windows flush
        spark.createDataFrame([(_ts(180), "view", 6.0)], schema).coalesce(
            1
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {
        (r["win_start"].minute + r["win_start"].hour * 60, r["event_type"]):
            (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM winagg").collect()
    }
    # [00:00, 00:15) click: the late 00:05 event (value 100) MUST NOT be
    # counted — the window finalized with 2 events before it arrived
    assert rows[(0, "click")] == (2, 3.0)
    assert rows[(15, "view")] == (1, 3.0)
    assert rows[(60, "click")] == (1, 4.0)


def test_sessionize_stream_stateful(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sess")
    src = str(base / "in")
    schema = "user_id long, ts timestamp"

    def T(sec):
        return datetime.fromtimestamp(1767225600 + sec, tz=timezone.utc).replace(tzinfo=None)

    wave1 = spark.createDataFrame(
        [
            (1, T(0)), (1, T(100)),          # session A (user 1)
            (1, T(5000)),                     # gap > 1800 -> closes A
            (2, T(0)),                        # user 2 open session
        ],
        schema,
    )
    wave1.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(wave1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = sessionize_stream(stream, gap_seconds=1800)
    q = (
        out.writeStream.format("memory").queryName("sess")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        wave2 = spark.createDataFrame(
            [
                (1, T(10000)),   # closes user 1's [5000] session
                (2, T(50)),      # same session for user 2 (stays open)
            ],
            schema,
        )
        wave2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    rows = sorted(
        (r["user_id"], int(r["session_start"].timestamp()) - 1767225600,
         int(r["session_end"].timestamp()) - 1767225600, r["n_events"])
        for r in spark.sql("SELECT * FROM sess").collect()
    )
    # closed sessions only: user 1's [0,100] (2 events) and [5000,5000]
    assert rows == [(1, 0, 100, 2), (1, 5000, 5000, 1)]
