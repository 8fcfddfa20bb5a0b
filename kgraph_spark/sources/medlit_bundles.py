"""Distributed reader for per-paper Pass-1 bundles (reference pass1_bundles/).

One JSON file per paper (reference bundle_models.PerPaperBundle,
examples/medlit/bundle_models.py:90-200). The paper_id is taken from the
FILENAME, never from the bundle body — the reference treats the filename as
ground truth because Pass-1 LLM output can hallucinate wrong PMC ids
(dedup.py:292-295). Reading is a distributed `spark.read.json(multiLine)`
scan: at 10^12-document scale the bundles live in an Iceberg/parquet table
with the same three nested columns and everything below is unchanged.

Ordering contract: the reference processes bundles sorted by filename and
rows in bundle order, and its first-wins merge semantics depend on that
order. Filenames are `paper_<paper_id>.json` with a constant prefix, so
sorted(filenames) == sorted(paper_ids): the deterministic per-row sort key
(paper_id, pos) reproduces the reference's processing order without any
global sequence number (no window over an unpartitioned frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Only the fields Pass 2 consumes; extra JSON keys are ignored by the scan.
_BUNDLE_SCHEMA = T.StructType(
    [
        T.StructField(
            "entities",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField("class", T.StringType()),
                        T.StructField("name", T.StringType()),
                        T.StructField("synonyms", T.ArrayType(T.StringType())),
                        T.StructField("source", T.StringType()),
                        T.StructField("canonical_id", T.StringType()),
                        T.StructField("umls_id", T.StringType()),
                        T.StructField("hgnc_id", T.StringType()),
                        T.StructField("rxnorm_id", T.StringType()),
                        T.StructField("uniprot_id", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "evidence_entities",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("confidence", T.DoubleType()),
                        T.StructField("extraction_method", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "relationships",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("subject", T.StringType()),
                        T.StructField("predicate", T.StringType()),
                        T.StructField("object", T.StringType()),
                        T.StructField("evidence_ids", T.ArrayType(T.StringType())),
                        T.StructField("source_papers", T.ArrayType(T.StringType())),
                        T.StructField("confidence", T.DoubleType()),
                        T.StructField("linguistic_trust", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def read_bundles(spark: SparkSession, bundle_dir: str) -> DataFrame:
    """Scan paper_*.json bundles -> one row per bundle with filename paper_id."""
    raw = spark.read.schema(_BUNDLE_SCHEMA).option("multiLine", "true").json(
        f"{bundle_dir}/paper_*.json"
    )
    return raw.withColumn(
        "paper_id",
        F.regexp_extract(F.input_file_name(), r"paper_([A-Za-z0-9]+)\.json", 1),
    )


def bundle_entities(bundles: DataFrame) -> DataFrame:
    """Explode entity rows: (paper_id, pos, local_id, entity_class, name,
    synonyms, source, canonical_id, umls_id, hgnc_id, rxnorm_id, uniprot_id)."""
    e = bundles.select("paper_id", F.posexplode("entities").alias("pos", "e"))
    return e.select(
        "paper_id",
        "pos",
        F.col("e.id").alias("local_id"),
        F.col("e.class").alias("entity_class"),
        F.col("e.name").alias("name"),
        F.coalesce("e.synonyms", F.array()).alias("synonyms"),
        F.coalesce("e.source", F.lit("extracted")).alias("source"),
        F.col("e.canonical_id"),
        F.col("e.umls_id"),
        F.col("e.hgnc_id"),
        F.col("e.rxnorm_id"),
        F.col("e.uniprot_id"),
    )


def bundle_relationships(bundles: DataFrame) -> DataFrame:
    """Explode relationship rows with per-bundle position (processing order)."""
    r = bundles.select("paper_id", F.posexplode("relationships").alias("pos", "r"))
    return r.select(
        "paper_id",
        "pos",
        F.col("r.subject").alias("subject"),
        F.col("r.predicate").alias("predicate"),
        F.col("r.object").alias("object_id"),
        F.coalesce("r.evidence_ids", F.array()).alias("evidence_ids"),
        F.coalesce("r.source_papers", F.array()).alias("source_papers"),
        # RelationshipRow.confidence defaults to 0.5 (bundle_models.py:158)
        F.coalesce("r.confidence", F.lit(0.5)).alias("confidence"),
        F.col("r.linguistic_trust"),
    )


def bundle_evidence(bundles: DataFrame) -> DataFrame:
    """Explode evidence rows: (paper_id, evidence_id, text, confidence,
    extraction_method). Defaults mirror EvidenceEntityRow
    (bundle_models.py:114-130: confidence 0.5, method 'llm')."""
    ev = bundles.select("paper_id", F.explode("evidence_entities").alias("ev"))
    return ev.select(
        "paper_id",
        F.col("ev.id").alias("evidence_id"),
        F.col("ev.text").alias("text"),
        F.coalesce("ev.confidence", F.lit(0.5)).alias("confidence"),
        F.coalesce("ev.extraction_method", F.lit("llm")).alias("extraction_method"),
    )
