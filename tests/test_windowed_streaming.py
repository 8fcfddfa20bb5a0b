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


def test_session_windows_append_and_late_drop(spark, tmp_path):
    """Native session windows on a stream: a session emits once when the
    watermark passes its end (last event + gap); a late row behind the
    watermark is dropped, not merged into a closed session."""
    from kgraph_spark.streaming.windowed import session_window_counts

    indir = tmp_path / "sess_in"
    indir.mkdir()
    table = f"sesswin_{uuid.uuid4().hex[:8]}"
    schema = "event_id bigint, ts timestamp, user_id string, value double"

    def t(sec):
        return f"2024-01-01 00:00:{sec:02d}"

    def rows(spark, data):
        return spark.createDataFrame(
            [Row(event_id=i, ts=ts, user_id=u, value=v) for i, (ts, u, v) in enumerate(data)],
            schema="event_id bigint, ts string, user_id string, value double",
        ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id", "value")

    w0 = 1704067200 * 1_000_000  # 2024-01-01 00:00:00 UTC in epoch us

    # batch 1: u1 events at :01,:03 (one session, end = 13) and :40 →
    # watermark 35 > 13 closes the first session with n=2
    rows(spark, [(t(1), "u1", 1.0), (t(3), "u1", 2.0), (t(40), "u1", 4.0)]) \
        .coalesce(1).write.mode("append").parquet(str(indir))

    stream = spark.readStream.schema(schema).parquet(str(indir))
    q = (
        session_window_counts(stream, gap="10 seconds", watermark="5 seconds")
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .start()
    )

    def got():
        return {
            (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"],
             r["session_value"])
            for r in spark.sql(f"SELECT * FROM {table}").collect()
        }

    try:
        q.processAllAvailable()
        first = ("u1", w0 + 1_000_000, w0 + 13_000_000, 2, 3.0)
        assert first in got(), got()

        # batch 2: late :02 (behind watermark → dropped) + :80 → watermark
        # 75 closes the [40, 50) session with exactly its one event
        rows(spark, [(t(2), "u1", 99.0), (t(50), "u2", 1.0), (t(59) , "u2", 1.0)]) \
            .coalesce(1).write.mode("append").parquet(str(indir))
        q.processAllAvailable()
        rows(spark, [("2024-01-01 00:02:00", "u1", 1.0)]) \
            .coalesce(1).write.mode("append").parquet(str(indir))
        q.processAllAvailable()
        res = got()
        assert ("u1", w0 + 40_000_000, w0 + 50_000_000, 1, 4.0) in res, res
        # the closed first session was neither re-emitted nor bumped by :02
        assert first in res and len([r for r in res if r[1] == w0 + 1_000_000]) == 1
    finally:
        q.stop()

    # batch twin equals the same expression on a static frame
    allrows = rows(spark, [(t(1), "u1", 1.0), (t(3), "u1", 2.0), (t(40), "u1", 4.0),
                           (t(50), "u2", 1.0), (t(59), "u2", 1.0)])
    twin = {
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"],
         r["session_value"])
        for r in session_window_counts(allrows, gap="10 seconds").collect()
    }
    assert ("u1", w0 + 1_000_000, w0 + 13_000_000, 2, 3.0) in twin
    assert ("u2", w0 + 50_000_000, w0 + 69_000_000, 2, 2.0) in twin


def test_hopping_windows_fan_out_and_finalize(spark, tmp_path):
    from kgraph_spark.streaming.windowed import hopping_event_counts

    indir = tmp_path / "hop_in"
    indir.mkdir()
    table = f"hopagg_{uuid.uuid4().hex[:8]}"

    def t(sec):
        return f"2024-01-01 00:00:{sec:02d}"

    w0 = 1704067200 * 1_000_000  # epoch us of 2024-01-01 00:00:00 UTC
    s = 5_000_000  # 5s slide in us

    # 10s windows hopping every 5s → every event sits in exactly 2 windows.
    # :03 click → windows starting at :00 and -:05; :27 view advances the
    # watermark to 22 so both click windows (ends 10 and 5) finalize.
    _events(spark, [(t(3), "click", 1.0), (t(27), "view", 1.0)]) \
        .coalesce(1).write.mode("append").parquet(str(indir))

    stream = spark.readStream.schema(SCHEMA).parquet(str(indir))
    q = (
        hopping_event_counts(
            stream, window_duration="10 seconds", slide_duration="5 seconds",
            watermark="5 seconds",
        )
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "hop_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        want = {(w0, "click", 1), (w0 - s, "click", 1)}
        got = _wait_rows(spark, table, want)
        assert want <= got, got

        # a late :02 click (behind watermark 22) must not re-open either
        # finalized click window; :45 view finalizes the :27 view's
        # earlier window [20,30)
        _events(spark, [(t(2), "click", 99.0), (t(45), "view", 1.0)]) \
            .coalesce(1).write.mode("append").parquet(str(indir))
        q.processAllAvailable()
        got2 = _wait_rows(spark, table, {(w0 + 4 * s, "view", 1)})
        assert (w0 + 4 * s, "view", 1) in got2, got2
        assert (w0, "click", 1) in got2 and (w0, "click", 2) not in got2
    finally:
        q.stop()


def test_hopping_batch_twin_fans_out(spark):
    from kgraph_spark.streaming.windowed import hopping_event_counts

    ev = _events(spark, [("2024-01-01 00:00:03", "click", 1.5)])
    rows = {(r["window_start_us"], r["n_events"], r["total_value"])
            for r in hopping_event_counts(
                ev, window_duration="10 seconds", slide_duration="5 seconds"
            ).collect()}
    w0 = 1704067200 * 1_000_000
    assert rows == {(w0, 1, 1.5), (w0 - 5_000_000, 1, 1.5)}
