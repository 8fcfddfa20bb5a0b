from __future__ import annotations

from kgraph_spark import synth
from kgraph_spark.operators import resolve
from kgraph_spark.operators.export import entities_table
from kgraph_spark.operators.mentions import extract_all, mentions_from_extracted


def test_salted_entities_table_equivalent(spark):
    """Salted two-phase entity aggregation (hot-entity path) must match the
    plain aggregation on every deterministic field. (name/entity_type have
    unspecified tie-breaks under equal (confidence, offset) keys in BOTH
    forms, so they're excluded.)"""
    docs = synth.documents_df(spark, 150)
    gaz = synth.gazetteer_rows()
    gb = spark.sparkContext.broadcast(gaz)
    mm = resolve.resolve_mentions(
        mentions_from_extracted(extract_all(docs, gb)), resolve.alias_index_df(spark, gaz)
    ).persist()

    def snap(df):
        return {
            r["entity_id"]: (
                round(r["confidence"], 9), r["usage_count"], r["total_mentions"],
                tuple(r["synonyms"]), r["first_seen_document"],
                tuple(r["supporting_documents"]), r["status"],
            )
            for r in df.collect()
        }

    plain = snap(entities_table(mm))
    salted = snap(entities_table(mm, n_salts=16))
    assert plain == salted
    # the skew entity really is hot (sanity that the test exercises skew)
    hot = [v for v in plain.values() if len(v[5]) > 10]
    assert hot, "expected at least one high-support entity"
    mm.unpersist()
