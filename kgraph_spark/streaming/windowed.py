"""Watermarked tumbling-window aggregation (Structured Streaming late-data
handling).

The reference accumulates batch statistics per ingest run (kgraph/ingest.py
stage counters); the streaming restatement is the standard Spark shape:
event-time tumbling windows + a watermark that bounds how late an event may
arrive before it is dropped and the window's state is finalized and evicted
— without the watermark, window state grows forever on an unbounded stream.

`windowed_event_counts` works on BOTH a streaming and a batch DataFrame
(`F.window` is the same expression either way), so the batch twin is the
oracle-checkable `evt_windowed_counts` driver query and the streaming path
is exercised by tests/test_windowed_streaming.py (append mode: a window row
is emitted exactly once, when the watermark passes its end; late rows behind
the watermark are dropped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "15 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Per (tumbling event-time window, key) counts and value totals.

    Streaming input: `withWatermark` bounds state (windows older than
    max_event_time - watermark are finalized + evicted; later-arriving rows
    for them are dropped). Batch input: identical grouping, no watermark —
    the exact result the stream converges to.

    window_start_us is epoch microseconds (UTC) rather than a timestamp so
    the value is engine-portable for the DuckDB oracle (same trick as
    evt_sessionize's unix_micros)."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(ts_col, window_duration).alias("w"), key_col)
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def session_window_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "15 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessionization via Spark's native merging session windows
    (F.session_window) — the engine-managed state machine behind both the
    lag+cumsum batch sessionizer (evt_sessionize) and the
    applyInPandasWithState variant. A session's window is
    [first event, last event + gap); two events share a session when their
    gap is STRICTLY below `gap` (session_window merges on window overlap —
    note the boundary differs from the lag formulation's `> gap` test, so
    the oracle mirrors `>= gap → new session`).

    Streaming input: withWatermark bounds session state — a session
    finalizes and emits (append mode) once the watermark passes its end;
    later events behind the watermark are dropped instead of re-opening it.
    Batch input: identical expression, the exact result the stream
    converges to. Epoch-microsecond outputs keep the values
    engine-portable for the DuckDB oracle."""
    # cast BEFORE the watermark: a cast inside session_window would be a
    # different expression than the watermarked column and Spark would
    # reject the append-mode aggregation as unwatermarked
    src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if events.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(key_col, F.session_window(F.col(ts_col), gap))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum(value_col), 4).alias("session_value"),
        )
        .select(
            key_col,
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
            "n_events",
            "session_value",
        )
    )


def hopping_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide_duration: str = "15 minutes",
    watermark: str = "15 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Per (HOPPING event-time window, key) counts and value totals —
    F.window with a slide shorter than the window, so every event lands in
    window/slide overlapping windows (the moving-average shape tumbling
    windows can't express; window must be a multiple of slide for aligned
    hops).

    Streaming input: withWatermark bounds state exactly as in the tumbling
    form — each overlapping window finalizes independently when the
    watermark passes ITS end, so one event's windows finalize across
    several triggers. Batch input: identical expression, the exact result
    the stream converges to. The fan-out is the honest cost: window/slide
    state rows per event; size the slide, not the watermark, to control
    state. Epoch-microsecond window starts keep values engine-portable
    (the DuckDB oracle regenerates each event's window set with integer
    epoch arithmetic — aligned hops make window starts exact multiples of
    the slide, Spark's 1970-epoch alignment)."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(
            F.window(ts_col, window_duration, slide_duration).alias("w"), key_col
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            key_col,
            "n_events",
            "total_value",
        )
    )
