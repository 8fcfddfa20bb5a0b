"""Streaming count-min sketch: the batch sketch's incremental twin.

CMS cells are counters, and counter tables merge by cell-wise ADDITION —
so the streaming form is foreachBatch: sketch the micro-batch with the
SAME cms_sketch used in batch (same md5 hash rows → the merged sketch is
bit-identical to a one-shot batch sketch over the union of all batches,
which the test asserts), then fold it into the persisted d×w table. State
is bounded at d·w rows forever, the property that makes CMS the right
frequency structure for an unbounded stream (per-key state — the naive
groupBy().count() — grows with the key universe).

Same persistence pattern as streaming/dedup.py's Bloom digest: the sketch
lives as a tiny parquet table the next batch (or a batch job) reads back;
under Iceberg the fold is a MERGE INTO on (row, bucket)."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgraph_spark.operators.sketches import cms_sketch


def merge_cms(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Cell-wise sum of two (row, bucket, cnt) sketches — associative and
    commutative, so any batch/stream interleaving yields the same table."""
    return (
        base.unionByName(delta)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def start_streaming_cms(
    spark: SparkSession,
    input_dir: str,
    workdir: str,
    key_col: str,
    schema,
    d: int = 3,
    w: int = 512,
):
    """Watch input_dir; per micro-batch, sketch the new rows and fold the
    cells into the persisted sketch at <workdir>/cms. Returns the
    StreamingQuery; read the sketch table any time for heavy-hitter
    probes (operators/sketches.cms_heavy_hitters shape)."""
    sketch_dir = str(Path(workdir) / "cms")
    checkpoint_dir = str(Path(workdir) / "_cms_checkpoint")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )

    def process_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        delta = cms_sketch(batch_df, key_col, d, w)
        if Path(sketch_dir).exists():
            merged = merge_cms(sess.read.parquet(sketch_dir), delta)
        else:
            merged = delta
        # d×w rows: driver-side materialize keeps the read-then-overwrite
        # race-free (the table is sketch-sized by construction)
        rows = merged.collect()
        sess.createDataFrame(rows, merged.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(sketch_dir)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_streaming_hll(
    spark: SparkSession,
    input_dir: str,
    workdir: str,
    key_col: str,
    schema,
    p: int = 8,
):
    """Streaming HyperLogLog twin (same shape as start_streaming_cms):
    per micro-batch, sketch the new rows with the SAME hll_sketch the
    batch path uses and fold register-wise MAX into the persisted ≤ 2^p
    row table at <workdir>/hll. MAX is associative, commutative AND
    idempotent — so unlike CMS, replayed batches cannot even inflate the
    sketch; any interleaving equals the one-shot batch sketch over the
    union (asserted by the test). Read the table any time and feed it to
    operators/sketches.hll_estimate."""
    from kgraph_spark.operators.sketches import hll_sketch, merge_hll

    sketch_dir = str(Path(workdir) / "hll")
    checkpoint_dir = str(Path(workdir) / "_hll_checkpoint")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )

    def process_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        delta = hll_sketch(batch_df, key_col, p)
        if Path(sketch_dir).exists():
            merged = merge_hll(sess.read.parquet(sketch_dir), delta)
        else:
            merged = delta
        rows = merged.collect()
        sess.createDataFrame(rows, merged.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(sketch_dir)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
