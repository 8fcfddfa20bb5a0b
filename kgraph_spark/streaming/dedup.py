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


def streaming_incremental_dedup(
    stream_docs: DataFrame,
    old_hashes: DataFrame,
    bloom: bytes,
    n_bits: int = 1 << 23,
    n_hashes: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    exact: bool = True,
) -> DataFrame:
    """Continuous-crawl twin of corpus_curation.incremental_dedup: emit only
    the stream rows whose content is absent from the HISTORICAL corpus.

    stream_docs: streaming (or batch) DataFrame of incoming documents.
    old_hashes:  static table with a `content_hash` column (md5 of text,
                 NULL text hashed as '') — the history's digest store.
    bloom:       build_bloom(old_hashes, 'content_hash', n_bits, n_hashes),
                 computed once per history snapshot, broadcast here.

    Dataflow (all stateless — no watermark, no streaming state store):
      * bloom probe (Arrow map) — rows FAILING it are definitely new and
        bypass the join entirely (novel content never pays join cost);
      * rows passing it ("maybe-old": the steady-state bulk, plus an
        FPR-sized sliver of new rows) take a stream-static LEFT OUTER join
        against old_hashes and survive only when unmatched — exactly the
        batch operator's confirm stage, so the emitted set is EXACT.
    exact=False skips the confirm and drops every maybe-old row — the
    firehose-trimming mode: bounded work per micro-batch with a documented
    FPR-sized loss of genuinely-new rows.

    Within-stream duplicates are streaming_exact_dedup's job (compose:
    probe history first, then watermarked self-dedup)."""
    if "content_hash" not in old_hashes.columns:
        raise ValueError("old_hashes must carry a 'content_hash' column")
    from kgraph_spark.operators.corpus_curation import bloom_might_contain

    spark = stream_docs.sparkSession
    h = stream_docs.withColumn(
        "content_hash", F.md5(F.coalesce(F.col(text_col), F.lit("")))
    ).withColumn(
        "_maybe_old",
        bloom_might_contain(spark, bloom, F.col("content_hash"), n_bits, n_hashes),
    )
    definite = h.filter(~F.col("_maybe_old")).drop("_maybe_old")
    if not exact:
        return definite
    seen = old_hashes.select("content_hash").distinct().withColumn("_seen", F.lit(True))
    confirmed = (
        h.filter(F.col("_maybe_old"))
        .drop("_maybe_old")
        .join(seen, "content_hash", "left_outer")
        .filter(F.col("_seen").isNull())
        .drop("_seen")
    )
    return definite.unionByName(confirmed)


def streaming_span_dedup(
    docs: DataFrame,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    spans_col: str = "spans",
) -> DataFrame:
    """Streaming exact dedup of INTERLEAVED documents keyed on the
    span-sequence hash (operators/interleave.span_sequence_hash's
    serialization — kind, text, media_ref in order), not the text hash:
    two docs whose prose matches but whose media differ are NOT merged,
    and reordering text around media is a different document. Same
    `dropDuplicatesWithinWatermark` machinery, bounded-state contract and
    batch twin (earliest event-time row per hash, min-of-struct) as
    streaming_exact_dedup — see that docstring for the horizon trade and
    the arrival-vs-event-time caveat."""
    if ts_col not in docs.columns:
        raise ValueError(
            f"streaming_span_dedup requires the event-time column {ts_col!r} "
            f"(got columns {docs.columns})"
        )
    serial = F.concat_ws(
        "\x1e",
        F.transform(
            F.col(spans_col),
            lambda s: F.concat_ws(
                "\x1f",
                s["kind"],
                F.coalesce(s["text"], F.lit("")),
                F.coalesce(s["media_ref"], F.lit("")),
            ),
        ),
    )
    hashed = docs.withColumn("seq_hash", F.md5(serial))
    if not docs.isStreaming:
        other = [c for c in hashed.columns if c != "seq_hash"]
        first = hashed.groupBy("seq_hash").agg(
            F.min(F.struct(ts_col, *[c for c in other if c != ts_col])).alias("_r")
        )
        return first.select(
            "seq_hash", *[F.col(f"_r.{c}").alias(c) for c in other]
        ).select(*hashed.columns)
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["seq_hash"]
    )
