"""Watermarked stream-stream interval join — the Structured Streaming
join family (the batch twin is temporal.range_join's point-in-interval
shape): match right-stream events to left-stream events with the same
key within a bounded event-time interval, state expired by watermarks on
BOTH sides (unbounded-state stream joins are rejected by Spark; the
interval condition + watermarks are what make state finite — each side
buffers only rows younger than watermark + interval).

The classic use: attribute purchases to the view that preceded them
within the window, per user, as the events ARRIVE rather than in a
nightly batch."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """left/right may each be streaming or batch; with both streaming the
    watermarks bound the join state. Emits matches where
    left_ts <= right_ts <= left_ts + within for equal keys. Column names
    must be pre-disambiguated (no shared names besides `key`)."""
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond).drop(r[key])
