"""Structured Streaming incremental ingest: new document files arriving in
a watched directory flow through extraction incrementally; the triples
table refreshes per micro-batch and converges to the batch-pipeline result."""

from __future__ import annotations

import time
from pathlib import Path

from kgraph_spark import synth
from kgraph_spark.pipeline import run_pipeline
from kgraph_spark.streaming.incremental import read_triples, start_incremental_ingest

N1, N2 = 40, 80  # first batch: docs [0,40); second batch: docs [40,80)


def _wait_for(fn, timeout_s=120, every=2.0):
    deadline = time.time() + timeout_s
    last = None
    while time.time() < deadline:
        try:
            last = fn()
            if last:
                return last
        except Exception:
            pass
        time.sleep(every)
    return last


def test_incremental_ingest_converges(spark, tmp_path):
    gaz = synth.gazetteer_rows()
    input_dir = tmp_path / "incoming"
    input_dir.mkdir()
    workdir = str(tmp_path / "stream_work")

    all_docs = synth.documents_df(spark, N2)
    batch1 = all_docs.filter("doc_id < 'DOC00000040'")
    batch2 = all_docs.filter("doc_id >= 'DOC00000040'")
    batch1.coalesce(1).write.mode("append").parquet(str(input_dir))

    q = start_incremental_ingest(spark, str(input_dir), workdir, gaz)
    try:
        got1 = _wait_for(
            lambda: read_triples(spark, workdir).count()
            if (Path(workdir) / "triples_stream").exists() else 0
        )
        expected1 = run_pipeline(spark, batch1, gaz)
        e1 = expected1.triples.count()
        assert got1 == e1, f"batch1 triples {got1} != {e1}"
        expected1.unpersist()

        batch2.coalesce(1).write.mode("append").parquet(str(input_dir))
        expected_all = run_pipeline(spark, all_docs, gaz)
        e2 = expected_all.triples.count()
        got2 = _wait_for(
            lambda: c if (c := read_triples(spark, workdir).count()) == e2 else 0
        )
        want = {
            (r["subject_id"], r["predicate"], r["object_id"], r["confidence"])
            for r in expected_all.triples.collect()
        }
        got = {
            (r["subject_id"], r["predicate"], r["object_id"], r["confidence"])
            for r in read_triples(spark, workdir).collect()
        }
        assert got == want
        expected_all.unpersist()
    finally:
        q.stop()
