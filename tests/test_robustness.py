"""Malformed-input robustness: the pipeline must not crash on degenerate
documents (nulls, empties, single-span docs, huge docs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgraph_spark import synth
from kgraph_spark.pipeline import run_pipeline
from kgraph_spark.schemas import DOCUMENTS


def test_degenerate_documents(spark):
    rows = [
        ("D_EMPTY", []),                                              # no spans
        ("D_MEDIA", [("media", "", "media://x/0", 0)]),               # media only
        ("D_NULLTEXT", [("text", None, None, 0)]),                    # null text span
        ("D_EMPTYTEXT", [("text", "", None, 0)]),                     # empty text span
        ("D_ONE", [("text", "zelfatonib treats leukemia.", None, 0)]),
        ("D_HUGE", [("text", ("zelfatonib " + "filler " * 400) * 3, None, 0)]),
        ("D_WS", [("text", "   \t  ", None, 0)]),                     # whitespace only
    ]
    docs = spark.createDataFrame(rows, schema=DOCUMENTS)
    res = run_pipeline(spark, docs, synth.gazetteer_rows())
    triples = res.triples.collect()
    # the one well-formed relation sentence must still come through
    keys = {(r["subject_id"], r["predicate"], r["object_id"]) for r in triples}
    assert any(p == "treats" for _s, p, _o in keys)
    assert any(p == "appears_in" and o == "DOC:D_ONE" for _s, p, o in keys)
    # hot entity in the huge doc found
    assert any(p == "appears_in" and o == "DOC:D_HUGE" for _s, p, o in keys)
    # degenerate docs contribute nothing and crash nothing
    assert not any(o in ("DOC:D_EMPTY", "DOC:D_MEDIA", "DOC:D_WS") for _s, _p, o in keys)
    res.unpersist()


def test_duplicate_doc_ids_are_idempotent(spark):
    """Re-delivered documents (same doc_id) must behave as ONE logical
    document: per-doc dedup keys on doc_id, so duplicates never double-count
    — the property that makes at-least-once delivery / resume safe."""
    one = [("DUP", [("text", "zelfatonib treats leukemia.", None, 0)])]
    docs1 = spark.createDataFrame(one, schema=DOCUMENTS)
    docs2 = spark.createDataFrame(one * 2, schema=DOCUMENTS)
    r1 = run_pipeline(spark, docs1, synth.gazetteer_rows())
    r2 = run_pipeline(spark, docs2, synth.gazetteer_rows())
    snap = lambda res: {
        (r["subject_id"], r["predicate"], r["object_id"]):
        (round(r["confidence"], 9), r["evidence_count"], tuple(r["source_documents"]))
        for r in res.triples.collect()
    }
    assert snap(r1) == snap(r2)
    r1.unpersist(); r2.unpersist()
