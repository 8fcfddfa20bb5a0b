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

from kgraph_spark.operators.similarity import (
    banded_hyperplane_buckets,
    blocked_pair_similarity,
    cosine_col,
)

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
    entities: DataFrame, threshold: float = PROVISIONAL_MERGE, dim: int | None = None
) -> DataFrame:
    """D10: same-class provisional pairs with cosine ≥ 0.88 → merge edges
    for the connected-components pass (same CC machinery as SAME_AS).

    Pairing is blocked on (class, banded LSH bucket) via
    blocked_pair_similarity — provisional entities grow with the corpus, so
    the class alone is not a bound (kgraph/ingest.py:877-880); banding keeps
    recall ≥0.98 at the 0.88 threshold. Merges missed by LSH in one batch
    are re-candidates every later batch (CC is idempotent), so the residual
    miss rate decays across incremental runs."""
    prov = entities.filter(F.col("status") == "provisional")
    return blocked_pair_similarity(prov, threshold, dim=dim).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst"), "cosine"
    )


def cross_type_candidates(
    entities: DataFrame,
    threshold: float = CROSS_TYPE_FLAG,
    n_planes: int = 4,
    n_bands: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """D10 side output: cross-class pairs ≥ 0.90 flagged (NOT merged) —
    the reference writes cross_type_candidates.json (dedup.py:640-761).

    Pairing is blocked on banded sign-random-projection LSH buckets
    (similarity.banded_hyperplane_buckets): the self-join key is
    (band, bucket), so pair cardinality is bounded by similarity structure,
    never the entity count. Provisional entities grow with the corpus (not
    the dimension tables), so an unblocked pairing is exactly the O(n²)
    anti-pattern the reference itself warns about (kgraph/ingest.py:877-880).
    Banding (n_bands tables of n_planes each, OR-amplified) lifts pair
    recall at cosine ≥ 0.90 to ≥0.99 vs ~0.4 for the round-2 single
    6-plane table."""
    if dim is None:
        row = entities.select("embedding").filter(F.col("embedding").isNotNull()).first()
        if row is None:
            spark = entities.sparkSession
            return spark.createDataFrame(
                [], "id_a string, type_a string, id_b string, type_b string, cosine double"
            )
        dim = len(row[0])
    # null embeddings would share (band, bucket 0) everywhere — drop them
    # pre-bucketing (they can never clear the cosine threshold)
    bucketed = banded_hyperplane_buckets(
        entities.filter(F.col("embedding").isNotNull()), dim, n_planes=n_planes, n_bands=n_bands
    )
    a = bucketed.select(
        "band", "bucket",
        F.col("entity_id").alias("id_a"), F.col("entity_type").alias("type_a"),
        F.col("embedding").alias("va"),
    )
    b = bucketed.select(
        "band", "bucket",
        F.col("entity_id").alias("id_b"), F.col("entity_type").alias("type_b"),
        F.col("embedding").alias("vb"),
    )
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.col("type_a") != F.col("type_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("cosine", cosine_col(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "type_a", "id_b", "type_b", "cosine")
    )


def merge_candidates(
    entities: DataFrame, threshold: float = CANONICAL_CANDIDATES, dim: int | None = None
) -> DataFrame:
    """D11: canonical-entity merge candidates ≥ 0.95, blocked on
    (class, banded LSH bucket) — the ANN-ready restatement of the
    reference's O(n²) matrix (ingest.py:864-925). Recall ≥0.998 at the
    0.95 threshold with the banding defaults (near-parallel vectors agree
    on almost every hyperplane sign)."""
    canon = entities.filter(F.col("status") == "canonical")
    return blocked_pair_similarity(canon, threshold, dim=dim)
