"""Streaming exact deduplication (training-data ingest path).

Batch twin: operators/dedup_text.exact_duplicates (content-hash groupBy).
The streaming restatement uses Spark's built-in
`dropDuplicatesWithinWatermark`: the first document with a given content
hash is emitted immediately (append mode); subsequent copies arriving
while the hash is inside the watermark horizon are suppressed; state for
hashes older than max_event_time - watermark is evicted, which bounds the
dedup state on an unbounded stream.

Contract at 100-TB scale: within-watermark duplicates are exactly deduped;
a copy arriving later than the watermark horizon can pass (state for its
hash was evicted) — the standard bounded-state trade. Exact global dedup
over all history is the batch operator's job (one shuffle on the 16-byte
digest over the accumulated table); the stream guarantees uniqueness per
watermark window with O(active-window) state. A real deployment composes
both: streaming dedup trims the firehose, periodic batch dedup compacts
the store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    docs: DataFrame,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Streaming input → one row per content hash within the watermark
    horizon. Works on a batch DataFrame too: the batch twin keeps the
    EARLIEST row per hash (min-of-struct on event time, id tie-break). The
    stream keeps each hash's first ARRIVAL, so the two agree row-for-row
    only when duplicates arrive in event-time order (each hash's first
    arrival is its earliest-timestamped row) and inside the horizon; under
    out-of-order arrival the key column still matches but payload columns
    (doc_id, ts) can differ — the batch twin's min-event-time choice is the
    deterministic one (a plain dropDuplicates would keep an arbitrary row,
    ADVICE r3); arrival order is not a function of the data, so no batch
    restatement can reproduce it.

    Batch contract (narrower than a bare dropDuplicates): `ts_col` must
    exist (the streaming path requires it anyway — checked here with a
    clear error) and the payload columns must be struct-orderable (no map
    types). Rows with NULL ts sort FIRST in the struct comparison and win
    over real-timestamped rows; a stream would never emit such a row, so
    feed the batch twin timestamped data if the two must agree."""
    if ts_col not in docs.columns:
        raise ValueError(
            f"streaming_exact_dedup requires the event-time column {ts_col!r} "
            f"(got columns {docs.columns})"
        )
    hashed = docs.withColumn("content_hash", F.md5(F.col(text_col)))
    if not docs.isStreaming:
        other = [c for c in hashed.columns if c != "content_hash"]
        first = hashed.groupBy("content_hash").agg(
            F.min(F.struct(ts_col, *[c for c in other if c != ts_col])).alias("_r")
        )
        return first.select(
            "content_hash", *[F.col(f"_r.{c}").alias(c) for c in other]
        ).select(*hashed.columns)
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )
