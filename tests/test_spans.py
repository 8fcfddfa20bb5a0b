"""Per-row invariant (BASELINE.json input_hint): every stage preserves the
span sequence (kind, text, media_ref, order) per document."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgraph_spark import synth
from kgraph_spark.operators.chunking import assemble_content
from kgraph_spark.operators.multimodal import media_refs_from_documents

N = 120


def _span_map(df):
    return {
        r["doc_id"]: [tuple(s) for s in r["spans"]]
        for r in df.select("doc_id", "spans").collect()
    }


def test_spans_strictly_increasing_offsets(spark):
    docs = synth.documents_df(spark, N)
    bad = docs.select(
        "doc_id",
        F.size(
            F.filter(
                F.zip_with(
                    F.slice("spans", 1, F.size("spans") - 1),
                    F.slice("spans", 2, F.size("spans") - 1),
                    lambda a, b: a["offset"] >= b["offset"],
                ),
                lambda x: x,
            )
        ).alias("violations"),
    ).filter(F.col("violations") > 0)
    assert bad.count() == 0


def test_assemble_content_preserves_spans(spark):
    docs = synth.documents_df(spark, N)
    before = _span_map(docs)
    after = _span_map(assemble_content(docs))
    assert before == after


def test_media_spans_pass_through_untouched(spark):
    docs = synth.documents_df(spark, N)
    want = {
        (d["doc_id"], s[2], s[3])
        for d in docs.collect()
        for s in d["spans"]
        if s[0] == "media"
    }
    got = {
        (r["doc_id"], r["media_ref"], r["span_offset"])
        for r in media_refs_from_documents(docs).collect()
    }
    assert got == want
    assert want, "synthetic corpus should contain media spans"


def test_pipeline_does_not_mutate_input(spark):
    from kgraph_spark.pipeline import run_pipeline

    docs = synth.documents_df(spark, 60)
    before = _span_map(docs)
    res = run_pipeline(spark, docs, synth.gazetteer_rows())
    res.triples.count()
    after = _span_map(docs)
    assert before == after
    res.unpersist()
