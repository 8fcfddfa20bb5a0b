"""stream_interval_join: watermarked stream-stream join over real file
streams must equal the batch interval join over the same data."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgraph_spark.streaming.joins import stream_interval_join

L_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("l_ts", T.TimestampType()),
        T.StructField("l_id", T.LongType()),
    ]
)
R_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("r_ts", T.TimestampType()),
        T.StructField("r_id", T.LongType()),
    ]
)


def _mk(spark, schema, rows):
    return spark.createDataFrame(rows, schema).withColumn(
        "l_ts" if "l_ts" in schema.names else "r_ts",
        F.col("l_ts" if "l_ts" in schema.names else "r_ts").cast("timestamp"),
    )


def test_stream_interval_join_matches_batch(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def ts(mins):
        return t0 + dt.timedelta(minutes=mins)

    views = [(1, ts(0), 100), (1, ts(90), 101), (2, ts(0), 102)]
    buys = [(1, ts(30), 200), (1, ts(95), 201), (2, ts(200), 202), (3, ts(5), 203)]
    ldf = spark.createDataFrame(views, L_SCHEMA)
    rdf = spark.createDataFrame(buys, R_SCHEMA)
    ldf.write.parquet(str(tmp_path / "l"))
    rdf.write.parquet(str(tmp_path / "r"))

    ls = spark.readStream.schema(L_SCHEMA).parquet(str(tmp_path / "l"))
    rs = spark.readStream.schema(R_SCHEMA).parquet(str(tmp_path / "r"))
    joined = stream_interval_join(ls, rs, within="1 hour", watermark="4 hours")
    q = (
        joined.writeStream.format("memory")
        .queryName("sij")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["l_id"], r["r_id"]) for r in spark.sql("SELECT * FROM sij").collect()
    }
    # batch truth: view 100 ⋈ buy 200 (30min), view 101 ⋈ buy 201 (5min);
    # buy 202 is 200min after view 102 (out of window); user 3 has no view
    assert got == {(100, 200), (101, 201)}
    # batch twin equality over the same frames
    batch = stream_interval_join(ldf, rdf, within="1 hour", watermark="4 hours")
    assert {(r["l_id"], r["r_id"]) for r in batch.collect()} == got
