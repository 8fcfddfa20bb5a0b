"""Embedding-based resolution & dedup (SURVEY.md §2 D3, D10, D11).

The reference brute-forces cosine against every stored embedding
(find_by_embedding, kgraph/storage/memory.py:123-151; O(n²) merge-candidate
matrix, ingest.py:864-925 with its own "use ANN at scale" caveat). Here:
blocked similarity joins — block by entity class (+ optional LSH bucket for
very large blocks, operators/similarity.py), cosine via built-in
zip_with/aggregate, top-1 via min-of-struct hash agg. Thresholds pinned to
the reference semantics (BASELINE.md): resolve ≥ 0.85, same-class
provisional merge ≥ 0.88, cross-type flag ≥ 0.90, canonical candidates ≥ 0.95."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgraph_spark.operators.similarity import cosine_col, hyperplane_buckets

RESOLVE_THRESHOLD = 0.85       # examples/medlit/pipeline/resolve.py:44
PROVISIONAL_MERGE = 0.88       # dedup.py:220
CROSS_TYPE_FLAG = 0.90         # dedup.py:221
CANONICAL_CANDIDATES = 0.95    # kgraph/ingest.py:866


def resolve_by_embedding(
    mentions: DataFrame,
    entities: DataFrame,
    threshold: float = RESOLVE_THRESHOLD,
) -> DataFrame:
    """D3: best entity per mention by cosine ≥ threshold within the same
    entity_type block; match confidence = similarity × mention confidence
    (resolve.py:173). mentions(mention_id, entity_type, confidence,
    embedding); entities(entity_id, entity_type, embedding)."""
    e = entities.select(
        F.col("entity_id"),
        F.col("entity_type").alias("_etype"),
        F.col("embedding").alias("_evec"),
    )
    scored = (
        mentions.join(e, mentions["entity_type"] == e["_etype"], "inner")
        .withColumn("similarity", cosine_col(F.col("embedding"), F.col("_evec")))
        .filter(F.col("similarity") >= threshold)
    )
    # top-1 per mention: min over (-sim, entity_id) — deterministic ties
    best = scored.groupBy("mention_id").agg(
        F.min(
            F.struct(
                (-F.col("similarity")).alias("nsim"),
                F.col("entity_id").alias("entity_id"),
                F.col("similarity").alias("similarity"),
                F.col("confidence").alias("mention_conf"),
            )
        ).alias("_b")
    )
    return best.select(
        "mention_id",
        F.col("_b.entity_id").alias("entity_id"),
        F.col("_b.similarity").alias("similarity"),
        (F.col("_b.similarity") * F.col("_b.mention_conf")).alias("confidence"),
    )


def provisional_merge_edges(
    entities: DataFrame, threshold: float = PROVISIONAL_MERGE
) -> DataFrame:
    """D10: same-class provisional pairs with cosine ≥ 0.88 → merge edges
    for the connected-components pass (same CC machinery as SAME_AS)."""
    prov = entities.filter(F.col("status") == "provisional")
    a = prov.select(F.col("entity_id").alias("src"), F.col("entity_type").alias("blk"), F.col("embedding").alias("va"))
    b = prov.select(F.col("entity_id").alias("dst"), F.col("entity_type").alias("blk"), F.col("embedding").alias("vb"))
    return (
        a.join(b, "blk")
        .filter(F.col("src") < F.col("dst"))
        .withColumn("cosine", cosine_col(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("src", "dst", "cosine")
    )


def cross_type_candidates(
    entities: DataFrame,
    threshold: float = CROSS_TYPE_FLAG,
    n_planes: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """D10 side output: cross-class pairs ≥ 0.90 flagged (NOT merged) —
    the reference writes cross_type_candidates.json (dedup.py:640-761).

    Pairing is blocked on sign-random-projection LSH buckets
    (similarity.hyperplane_buckets): the self-join key is the bucket id, so
    pair cardinality is bounded by similarity structure, never the entity
    count. Provisional entities grow with the corpus (not the dimension
    tables), so an unblocked pairing is exactly the O(n²) anti-pattern the
    reference itself warns about (kgraph/ingest.py:877-880). Recall note:
    pairs at cosine ≥ 0.90 are near-parallel and agree on most hyperplane
    signs; n_planes trades recall (fewer planes → bigger buckets → higher
    recall) against bucket size."""
    if dim is None:
        row = entities.select("embedding").first()
        if row is None or row[0] is None:
            spark = entities.sparkSession
            return spark.createDataFrame(
                [], "id_a string, type_a string, id_b string, type_b string, cosine double"
            )
        dim = len(row[0])
    bucketed = hyperplane_buckets(entities, dim, n_planes)
    a = bucketed.select(
        F.col("entity_id").alias("id_a"), F.col("entity_type").alias("type_a"),
        F.col("embedding").alias("va"), "bucket",
    )
    b = bucketed.select(
        F.col("entity_id").alias("id_b"), F.col("entity_type").alias("type_b"),
        F.col("embedding").alias("vb"), "bucket",
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.col("type_a") != F.col("type_b"))
        .withColumn("cosine", cosine_col(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "type_a", "id_b", "type_b", "cosine")
    )


def merge_candidates(
    entities: DataFrame, threshold: float = CANONICAL_CANDIDATES
) -> DataFrame:
    """D11: canonical-entity merge candidates ≥ 0.95, same-class blocked —
    the ANN-ready restatement of the reference's O(n²) matrix
    (ingest.py:864-925)."""
    canon = entities.filter(F.col("status") == "canonical")
    a = canon.select(F.col("entity_id").alias("id_a"), F.col("entity_type").alias("blk"), F.col("embedding").alias("va"))
    b = canon.select(F.col("entity_id").alias("id_b"), F.col("entity_type").alias("blk"), F.col("embedding").alias("vb"))
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_col(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("blk", "id_a", "id_b", "cosine")
    )
