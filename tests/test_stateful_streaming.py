"""applyInPandasWithState running entity-usage counts over a doc stream:
totals must converge to the batch pipeline's usage counts, and accumulate
across micro-batches."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from kgraph_spark import synth
from kgraph_spark.operators import resolve
from kgraph_spark.operators.mentions import extract_all, mentions_from_extracted
from kgraph_spark.streaming.stateful import start_entity_usage_stream


def _expected_counts(spark, docs, gaz):
    gb = spark.sparkContext.broadcast(gaz)
    mm = resolve.resolve_mentions(
        mentions_from_extracted(extract_all(docs, gb)), resolve.alias_index_df(spark, gaz)
    )
    return {r["entity_id"]: r["n"] for r in mm.groupBy("entity_id").agg(F.count("*").alias("n")).collect()}


def _latest_totals(spark, name):
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    # update-mode memory sink appends each update; keep the max per key
    out = {}
    for r in rows:
        out[r["entity_id"]] = max(out.get(r["entity_id"], 0), r["total_mentions"])
    return out


def test_stateful_usage_counts_accumulate(spark, tmp_path):
    gaz = synth.gazetteer_rows()
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    all_docs = synth.documents_df(spark, 80)
    b1 = all_docs.filter("doc_id < 'DOC00000040'")
    b2 = all_docs.filter("doc_id >= 'DOC00000040'")
    b1.coalesce(1).write.mode("append").parquet(str(input_dir))

    q = start_entity_usage_stream(spark, str(input_dir), str(tmp_path / "ckpt"), gaz, "usage_t")
    try:
        want1 = _expected_counts(spark, b1, gaz)
        deadline = time.time() + 90
        while time.time() < deadline:
            got = _latest_totals(spark, "usage_t")
            if got == want1:
                break
            time.sleep(2)
        assert _latest_totals(spark, "usage_t") == want1

        b2.coalesce(1).write.mode("append").parquet(str(input_dir))
        want_all = _expected_counts(spark, all_docs, gaz)
        deadline = time.time() + 90
        while time.time() < deadline:
            got = _latest_totals(spark, "usage_t")
            if got == want_all:
                break
            time.sleep(2)
        assert _latest_totals(spark, "usage_t") == want_all
    finally:
        q.stop()
