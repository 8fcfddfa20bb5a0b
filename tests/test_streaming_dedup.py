"""Streaming exact dedup: first copy of a content hash is emitted once;
within-watermark duplicates (same batch or later batches) are suppressed;
the batch twin returns the identical distinct-hash set."""

from __future__ import annotations

import time
import uuid

from pyspark.sql import Row
from pyspark.sql import functions as F

from kgraph_spark.streaming.dedup import streaming_exact_dedup

SCHEMA = "doc_id bigint, ts timestamp, text string"


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, ts=ts, text=tx) for i, (ts, tx) in enumerate(rows)],
        schema="doc_id bigint, ts string, text string",
    ).select("doc_id", F.col("ts").cast("timestamp").alias("ts"), "text")


def _hashes(spark, table):
    return [r["content_hash"] for r in spark.sql(f"SELECT * FROM {table}").collect()]


def _wait_n(spark, table, n, timeout_s=90):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        got = _hashes(spark, table)
        if len(got) >= n:
            return got
        time.sleep(1.0)
    return _hashes(spark, table)


def test_streaming_dedup_suppresses_within_watermark(spark, tmp_path):
    indir = tmp_path / "docs_in"
    indir.mkdir()
    table = f"sdedup_{uuid.uuid4().hex[:8]}"

    def t(sec):
        return f"2024-01-01 00:00:{sec:02d}"

    # batch 1: two copies of the same text + one unique → 2 rows out
    _docs(spark, [(t(1), "same text"), (t(2), "same text"), (t(3), "other")]) \
        .coalesce(1).write.mode("append").parquet(str(indir))

    stream = spark.readStream.schema(SCHEMA).parquet(str(indir))
    q = (
        streaming_exact_dedup(stream, watermark="1 hour")
        .select("doc_id", "ts", "content_hash")
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = _wait_n(spark, table, 2)
        assert len(got1) == 2 and len(set(got1)) == 2, got1

        # batch 2: another copy of "same text" (within the 1h watermark →
        # suppressed) plus a genuinely new text → exactly 1 new row
        _docs(spark, [(t(10), "same text"), (t(11), "brand new")]) \
            .coalesce(1).write.mode("append").parquet(str(indir))
        q.processAllAvailable()
        got2 = _wait_n(spark, table, 3)
        assert len(got2) == 3 and len(set(got2)) == 3, got2
    finally:
        q.stop()

    # batch twin over the union of both batches → identical hash set AND
    # identical surviving rows: the twin keeps the EARLIEST arrival per
    # hash (min-of-struct on ts), which is the row the stream emitted —
    # payload columns (doc_id, ts) must agree, not just the key
    allrows = _docs(
        spark,
        [(t(1), "same text"), (t(2), "same text"), (t(3), "other"),
         (t(10), "same text"), (t(11), "brand new")],
    )
    twin_rows = streaming_exact_dedup(allrows).collect()
    assert {r["content_hash"] for r in twin_rows} == set(got2)
    # ts is globally unique in the fixture (doc_id re-enumerates per batch)
    assert {r["content_hash"]: r["ts"] for r in twin_rows} == {
        r["content_hash"]: r["ts"]
        for r in spark.sql(f"SELECT * FROM {table}").collect()
    }
    # schema preserved by the min-of-struct rewrite
    assert [f.name for f in streaming_exact_dedup(allrows).schema.fields] == [
        "doc_id", "ts", "text", "content_hash"
    ]


def test_streaming_incremental_dedup_vs_history(spark, tmp_path):
    """Stream rows already in the historical corpus are suppressed; new
    content passes — EXACTLY (the tiny 64-bit sketch makes nearly every
    row a Bloom false positive, so the stream-static confirm join must do
    the real work). approximate mode (exact=False) still never emits an
    old row."""
    from kgraph_spark.operators.corpus_curation import build_bloom
    from kgraph_spark.streaming.dedup import streaming_incremental_dedup

    old = spark.createDataFrame(
        [(i, f"hist {i}") for i in range(30)], "doc_id bigint, text string"
    )
    old_hashes = old.select(F.md5(F.coalesce("text", F.lit(""))).alias("content_hash"))
    bloom = build_bloom(old_hashes, "content_hash", n_bits=64, n_hashes=3)

    indir = tmp_path / "inc_in"
    indir.mkdir()
    table = f"sinc_{uuid.uuid4().hex[:8]}"
    _docs(
        spark,
        [("2024-01-01 00:00:01", "hist 5"), ("2024-01-01 00:00:02", "hist 6"),
         ("2024-01-01 00:00:03", "fresh A"), ("2024-01-01 00:00:04", "fresh B")],
    ).coalesce(1).write.mode("append").parquet(str(indir))

    stream = spark.readStream.schema(SCHEMA).parquet(str(indir))
    q = (
        streaming_incremental_dedup(stream, old_hashes, bloom, n_bits=64, n_hashes=3)
        .select("doc_id", "text", "content_hash")
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "inc_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r["text"] for r in spark.sql(f"SELECT * FROM {table}").collect()}
        assert got == {"fresh A", "fresh B"}, got
    finally:
        q.stop()

    # batch twin of the same call: identical verdicts
    batch = _docs(
        spark,
        [("2024-01-01 00:00:01", "hist 5"), ("2024-01-01 00:00:03", "fresh A")],
    )
    out = streaming_incremental_dedup(batch, old_hashes, bloom, n_bits=64, n_hashes=3)
    assert {r["text"] for r in out.collect()} == {"fresh A"}
    # approximate mode never emits an old row (may drop FP new rows)
    approx = streaming_incremental_dedup(
        batch, old_hashes, bloom, n_bits=64, n_hashes=3, exact=False
    )
    assert {r["text"] for r in approx.collect()} <= {"fresh A"}


# ---- interleaved span-sequence streaming dedup -----------------------------

SPAN_SCHEMA = (
    "doc_id bigint, ts timestamp, spans array<struct<kind string,"
    " text string, media_ref string, offset int>>"
)


def _span_docs(spark, rows):
    return spark.createDataFrame(rows, SPAN_SCHEMA)


def _wait_rows(spark, table, n, timeout_s=90):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        got = spark.sql(f"SELECT * FROM {table}").collect()
        if len(got) >= n:
            return got
        time.sleep(1.0)
    return spark.sql(f"SELECT * FROM {table}").collect()


def test_streaming_span_dedup_real_stream(spark, tmp_path):
    import datetime as dt

    from kgraph_spark.streaming.dedup import streaming_span_dedup

    indir = tmp_path / "spans_in"
    indir.mkdir()
    t0 = dt.datetime(2024, 1, 1)
    a = [("text", "hello", None, 0), ("media", None, "m://1", 1)]
    b = [("text", "hello", None, 0), ("media", None, "m://2", 1)]  # media differs
    batch1 = _span_docs(spark, [(1, t0, a), (2, t0, a)])           # in-batch dup
    batch1.coalesce(1).write.mode("overwrite").parquet(str(indir / "b1"))

    src = spark.readStream.schema(SPAN_SCHEMA).option(
        "recursiveFileLookup", "true"
    ).parquet(str(indir))
    table = f"spandedup_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_span_dedup(src, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        got = _wait_rows(spark, table, 1)
        assert len(got) == 1  # the in-batch duplicate was suppressed
        batch2 = _span_docs(
            spark, [(3, t0 + dt.timedelta(minutes=1), a),  # cross-batch dup
                    (4, t0 + dt.timedelta(minutes=1), b)]  # new sequence
        )
        batch2.coalesce(1).write.mode("overwrite").parquet(str(indir / "b2"))
        got = _wait_rows(spark, table, 2)
        assert len(got) == 2  # only the media-differing doc added
    finally:
        q.stop()
    # batch twin on the union: same distinct hash set, earliest row kept
    union = _span_docs(
        spark,
        [(1, t0, a), (2, t0, a), (3, t0 + dt.timedelta(minutes=1), a),
         (4, t0 + dt.timedelta(minutes=1), b)],
    )
    twin = streaming_span_dedup(union)
    rows = {r["seq_hash"]: r["doc_id"] for r in twin.collect()}
    assert len(rows) == 2 and sorted(rows.values()) == [1, 4]


def test_streaming_span_dedup_validation(spark):
    import pytest

    from kgraph_spark.streaming.dedup import streaming_span_dedup

    df = _span_docs(spark, []).drop("ts")
    with pytest.raises(ValueError):
        streaming_span_dedup(df)
