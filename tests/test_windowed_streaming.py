"""Watermarked tumbling-window aggregation over a file-source stream:
append mode emits each window exactly once (when the watermark passes its
end), and a row arriving behind the watermark is dropped, not re-emitted."""

from __future__ import annotations

import time
import uuid

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kgraph_spark.streaming.windowed import windowed_event_counts

SCHEMA = "event_id bigint, ts timestamp, event_type string, value double"


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, ts=ts, event_type=et, value=v) for i, (ts, et, v) in enumerate(rows)],
        schema="event_id bigint, ts string, event_type string, value double",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")


def _wait_rows(spark, table, want, timeout_s=90):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        got = {
            (r["window_start_us"], r["event_type"], r["n_events"]) for r in spark.sql(f"SELECT * FROM {table}").collect()
        }
        if got >= want:
            return got
        time.sleep(1.0)
    return {
        (r["window_start_us"], r["event_type"], r["n_events"]) for r in spark.sql(f"SELECT * FROM {table}").collect()
    }


def test_windowed_append_finalizes_and_drops_late(spark, tmp_path):
    indir = tmp_path / "ev_in"
    indir.mkdir()
    table = f"winagg_{uuid.uuid4().hex[:8]}"

    # 10s tumbling windows, 5s watermark. All timestamps on 2024-01-01.
    def t(sec):
        return f"2024-01-01 00:00:{sec:02d}"

    w0 = 1704067200 * 1_000_000  # epoch us of 2024-01-01 00:00:00 UTC

    # batch 1: two rows in window [0,10) and one at :27 → max event time 27,
    # watermark 22 → window [0,10) (end 10 ≤ 22) finalizes and is emitted
    _events(spark, [(t(1), "click", 1.0), (t(3), "click", 2.0), (t(27), "view", 1.0)]) \
        .coalesce(1).write.mode("append").parquet(str(indir))

    stream = spark.readStream.schema(SCHEMA).parquet(str(indir))
    q = (
        windowed_event_counts(stream, window_duration="10 seconds", watermark="5 seconds")
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = _wait_rows(spark, table, {(w0, "click", 2)})
        assert (w0, "click", 2) in got1, got1

        # batch 2: one LATE row at :02 (behind watermark 22 → dropped) and
        # one at :45 → watermark 40 → window [20,30) finalizes with exactly
        # the one :27 row; the late click must not re-open [0,10)
        _events(spark, [(t(2), "click", 99.0), (t(45), "view", 1.0)]) \
            .coalesce(1).write.mode("append").parquet(str(indir))
        q.processAllAvailable()

        got2 = _wait_rows(spark, table, {(w0 + 20_000_000, "view", 1)})
        assert (w0 + 20_000_000, "view", 1) in got2, got2
        # the [0,10) click window was emitted once, with 2 events — the late
        # row neither duplicated it nor bumped the count
        click_rows = [g for g in got2 if g[0] == w0 and g[1] == "click"]
        assert click_rows == [(w0, "click", 2)], got2
    finally:
        q.stop()


def test_windowed_batch_twin_matches_sql(spark):
    """The batch twin groups identically to a plain SQL GROUP BY on the
    truncated hour — the shape the DuckDB oracle checks at driver time."""
    rows = [
        ("2024-01-01 00:05:00", "click", 1.5),
        ("2024-01-01 00:55:00", "click", 2.0),
        ("2024-01-01 01:05:00", "view", 3.0),
    ]
    ev = _events(spark, rows)
    out = {
        (r["window_start_us"], r["event_type"], r["n_events"], r["total_value"])
        for r in windowed_event_counts(ev).collect()
    }
    base = 1704067200 * 1_000_000
    assert out == {
        (base, "click", 2, 3.5),
        (base + 3600 * 1_000_000, "view", 1, 3.0),
    }
