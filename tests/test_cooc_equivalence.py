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
