"""Streaming CMS: the folded sketch over micro-batches must equal the
one-shot batch sketch over the full data — cell-wise addition is exact."""

from pyspark.sql import types as T

from kgraph_spark.operators.sketches import cms_sketch
from kgraph_spark.streaming.sketches import merge_cms, start_streaming_cms

SCHEMA = T.StructType([T.StructField("key", T.StringType(), True)])


def _rows(keys):
    return [(k,) for k in keys]


def test_merge_cms_is_cellwise_addition(spark):
    a = spark.createDataFrame(_rows(["x", "x", "y"]), SCHEMA)
    b = spark.createDataFrame(_rows(["x", "z"]), SCHEMA)
    merged = merge_cms(cms_sketch(a, "key", 2, 32), cms_sketch(b, "key", 2, 32))
    full = cms_sketch(a.unionByName(b), "key", 2, 32)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_streaming_cms_converges_to_batch_sketch(spark, tmp_path):
    inp = tmp_path / "in"
    work = tmp_path / "work"
    batch1 = spark.createDataFrame(_rows(["a"] * 5 + ["b"]), SCHEMA)
    batch2 = spark.createDataFrame(_rows(["a"] * 3 + ["c", "c"]), SCHEMA)
    batch1.write.parquet(str(inp / "p1"))

    q = start_streaming_cms(spark, str(inp / "*"), str(work), "key", SCHEMA, d=3, w=64)
    q.awaitTermination(120)

    batch2.write.parquet(str(inp / "p2"))
    q2 = start_streaming_cms(spark, str(inp / "*"), str(work), "key", SCHEMA, d=3, w=64)
    q2.awaitTermination(120)

    got = sorted(map(tuple, spark.read.parquet(str(work / "cms")).collect()))
    want = sorted(
        map(tuple, cms_sketch(batch1.unionByName(batch2), "key", 3, 64).collect())
    )
    assert got == want
    # bounded state: never more than d*w cells
    assert len(got) <= 3 * 64


def test_streaming_hll_converges_to_batch_sketch(spark, tmp_path):
    from kgraph_spark.operators.sketches import hll_sketch
    from kgraph_spark.streaming.sketches import start_streaming_hll

    inp = tmp_path / "in"
    work = tmp_path / "work"
    batch1 = spark.createDataFrame(_rows([f"k{i}" for i in range(300)]), SCHEMA)
    # overlap with batch1: MAX-merge idempotence absorbs re-seen keys
    batch2 = spark.createDataFrame(_rows([f"k{i}" for i in range(200, 500)]), SCHEMA)
    batch1.write.parquet(str(inp / "p1"))

    q = start_streaming_hll(spark, str(inp / "*"), str(work), "key", SCHEMA)
    q.awaitTermination(120)

    batch2.write.parquet(str(inp / "p2"))
    q2 = start_streaming_hll(spark, str(inp / "*"), str(work), "key", SCHEMA)
    q2.awaitTermination(120)

    got = sorted(map(tuple, spark.read.parquet(str(work / "hll")).collect()))
    want = sorted(
        map(tuple, hll_sketch(batch1.unionByName(batch2), "key").collect())
    )
    assert got == want
    assert len(got) <= 256  # bounded state forever
