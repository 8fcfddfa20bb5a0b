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

    # scale-guard caps: binding caps stay salted/unsalted-equivalent (the
    # per-salt prefix-of-prefixes argument) and equal the truncated uncapped
    # arrays (sorted deterministic prefix, counts exact)
    cap_plain = snap(entities_table(mm, max_supporting_documents=5, max_synonyms=2))
    cap_salted = snap(entities_table(mm, n_salts=16, max_supporting_documents=5, max_synonyms=2))
    assert cap_plain == cap_salted
    assert any(len(v[5]) == 5 for v in cap_plain.values()), "doc cap never bound"
    for eid, v in plain.items():
        c = cap_plain[eid]
        assert c[5] == v[5][:5] and c[3] == v[3][:2], eid
        assert c[1] == v[1] and c[2] == v[2], eid  # counts stay exact
    mm.unpersist()
