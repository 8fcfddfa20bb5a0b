"""The two co-occurrence formulations (join-based operator form vs the
shuffle-minimal fast form used by the pipeline) must agree exactly."""

from __future__ import annotations

from kgraph_spark import synth
from kgraph_spark.config import PipelineConfig
from kgraph_spark.operators import resolve
from kgraph_spark.operators.mentions import (
    extract_all,
    presence_from_extracted,
    windows_from_extracted,
)
from kgraph_spark.operators.relationships import (
    cooccurrence_triples,
    cooccurrence_triples_fast,
)


def test_join_and_fast_cooccurrence_agree(spark):
    cfg = PipelineConfig()
    docs = synth.documents_df(spark, 150)
    gaz = synth.gazetteer_rows()
    gb = spark.sparkContext.broadcast(gaz)
    ai = resolve.alias_index_df(spark, gaz)
    ex = extract_all(docs, gb, cfg).persist()
    mm = resolve.resolve_mentions(presence_from_extracted(ex), ai)

    fast = {
        (r["doc_id"], r["subject_id"], r["object_id"]): round(r["confidence"], 9)
        for r in cooccurrence_triples_fast(mm, cfg).collect()
    }
    joined = {
        (r["doc_id"], r["subject_id"], r["object_id"]): round(r["confidence"], 9)
        for r in cooccurrence_triples(mm, windows_from_extracted(ex), cfg).collect()
    }
    assert fast == joined
    assert fast, "expected co-occurrence pairs"
    ex.unpersist()


def test_dict_encoded_pipeline_equals_string_pipeline(spark):
    """The dictionary-encoded co-occurrence branch (fused F1+F10, 8-byte
    codes through the accumulate shuffle) and the per-doc string-pair path
    produce identical final triple tables."""
    from kgraph_spark import synth
    from kgraph_spark.config import PipelineConfig
    from kgraph_spark.pipeline import run_pipeline

    docs = synth.documents_df(spark, 120)
    gaz = synth.gazetteer_rows()

    def rows(enc):
        cfg = PipelineConfig(cooc_dict_encode=enc)
        res = run_pipeline(spark, docs, gaz, cfg)
        out = {
            (
                r["subject_id"], r["predicate"], r["object_id"],
                round(r["confidence"], 9), tuple(r["source_documents"]),
                r["evidence_count"],
            )
            for r in res.triples.collect()
        }
        res.unpersist()
        return out

    assert rows(True) == rows(False)
