from __future__ import annotations

from pyspark.sql import functions as F

from kgraph_spark import synth
from kgraph_spark.pipeline import run_pipeline_from_extracted
from kgraph_spark.operators.mentions import extract_all


def test_embedding_dedup_is_parity_neutral_with_hash_embeddings(spark):
    """With identity (hash) embeddings, D10 merges only identical normalized
    surfaces — already merged by the alias index — so enabling the stage
    must not change the triple set (the seam itself is exercised)."""
    docs = synth.documents_df(spark, 120)
    gaz = synth.gazetteer_rows()
    gb = spark.sparkContext.broadcast(gaz)
    extracted = extract_all(docs, gb).persist()
    base = run_pipeline_from_extracted(spark, extracted, gaz, persist_intermediates=False)
    with_dedup = run_pipeline_from_extracted(
        spark, extracted, gaz, persist_intermediates=False, embedding_dedup=True
    )
    k = lambda df: {(r["subject_id"], r["predicate"], r["object_id"]) for r in df.collect()}
    assert k(base.triples) == k(with_dedup.triples)
    extracted.unpersist()


def test_bucketed_triples_roundtrip_and_lookup(spark, tmp_path):
    from kgraph_spark.operators.export import write_bucketed_triples
    from kgraph_spark.operators.graph import get_by_subject

    # spark.sql.warehouse.dir is static; the session default (cwd/spark-warehouse)
    # receives the managed table, dropped at the end
    triples = spark.createDataFrame(
        [("A", "treats", "B", 0.9, ["d1"], 1), ("C", "causes", "B", 0.8, ["d2"], 1)],
        "subject_id string, predicate string, object_id string, confidence double, "
        "source_documents array<string>, evidence_count long",
    )
    write_bucketed_triples(triples, "triples_bucketed_test", buckets=4)
    back = spark.table("triples_bucketed_test")
    assert back.count() == 2
    got = get_by_subject(back, "A").collect()
    assert len(got) == 1 and got[0]["object_id"] == "B"
    spark.sql("DROP TABLE triples_bucketed_test")
