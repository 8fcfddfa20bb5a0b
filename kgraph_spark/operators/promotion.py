"""Promotion: provisional → canonical (SURVEY.md §2 E1–E3).

E1 candidate filter (thresholds: min_usage=1, min_conf=0.4, force-promote
at conf ≥ 0.7 — reference kgschema/promotion.py:21-26,
examples/medlit/domain.py:97-110, promotion.py:86-96; canonical-ID hit
promotes regardless, ingest.py:689-704).
E2 canonical-ID assignment: the 3-strategy priority chain becomes coalesce
over join results (no 15-at-a-time batching — the join IS the batch,
SURVEY §2 E2).
E3 promote + reference rewrite: swap entity ids, rewrite both triple
endpoints through the id map (same broadcast-map machinery as D12),
re-accumulate collided triples."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgraph_spark.config import PromotionConfig
from kgraph_spark.functions.normalize import norm_dedup_col
from kgraph_spark.operators.canonicalize import apply_merge, is_authoritative_col


def promotion_candidates(entities: DataFrame, cfg: PromotionConfig | None = None) -> DataFrame:
    """E1: provisional AND usage ≥ min_usage AND conf ≥ min_conf
    (find_provisional_for_promotion, memory.py:184-204)."""
    cfg = cfg or PromotionConfig()
    return entities.filter(
        (F.col("status") == "provisional")
        & (F.col("usage_count") >= cfg.min_usage)
        & (F.col("confidence") >= cfg.min_confidence)
    )


def assign_canonical_ids(candidates: DataFrame, kb: DataFrame) -> DataFrame:
    """E2: candidates + broadcast KB → (entity_id, new_id?) via the priority
    chain: existing canonical_ids dict → id-format sniffing → KB name/synonym
    lookup (promotion.py:132-220). Here strategy 1/2 collapse to 'already
    authoritative' (our ids are the merge keys); strategy 3 is the join."""
    alias_rows = kb.select(
        F.explode(F.concat(F.array("name"), F.coalesce(F.col("synonyms"), F.array()))).alias("alias"),
        F.col("canonical_id"),
        F.col("entity_type").alias("_kb_type"),
    ).withColumn("_kb_key", norm_dedup_col(F.col("alias"))).dropDuplicates(["_kb_key"])
    joined = candidates.withColumn("_key", norm_dedup_col(F.col("name"))).join(
        F.broadcast(alias_rows),
        (F.col("_key") == F.col("_kb_key")) & (F.col("entity_type") == F.col("_kb_type")),
        "left",
    )
    return joined.select(
        "entity_id",
        F.col("canonical_id").alias("assigned_id"),
    ).filter(F.col("assigned_id").isNotNull())


def promote_and_rewrite(
    entities: DataFrame,
    triples: DataFrame,
    kb: DataFrame,
    cfg: PromotionConfig | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """E3: returns (entities', triples', id_map).

    - candidates with a KB hit get their id swapped to the canonical id and
      status 'canonical' (canonical-ID hit promotes regardless of
      thresholds, ingest.py:689-704);
    - force-promote at conf ≥ 0.7 keeps the prov- id but flips status;
    - triples rewritten through the id map and re-accumulated (max conf,
      union sources) — the reference's update_entity_references +
      triple-collision merge (memory.py:496-546, dedup.py:556-598)."""
    cfg = cfg or PromotionConfig()
    cands = promotion_candidates(entities, cfg)
    id_map = assign_canonical_ids(cands, kb).withColumnRenamed("assigned_id", "final_id")

    ent2 = apply_merge(entities, id_map, "entity_id")
    promoted_status = F.when(F.col("status") == "merged", F.lit("merged")).when(
        is_authoritative_col(F.col("entity_id"))
        | (
            (F.col("status") == "provisional")
            & (F.col("confidence") >= cfg.force_promote_confidence)
            & (F.col("usage_count") >= cfg.min_usage)
        ),
        F.lit("canonical"),
    ).otherwise(F.col("status"))
    ent2 = ent2.withColumn("status", promoted_status)
    # id collisions after rewrite (two provs promoted to one canonical id)
    extra = (
        [F.min("merged_into").alias("merged_into")] if "merged_into" in ent2.columns else []
    )
    ent2 = ent2.groupBy("entity_id").agg(
        F.max("confidence").alias("confidence"),
        F.sum("usage_count").alias("usage_count"),
        F.min("status").alias("status"),  # 'canonical' < 'merged' < 'provisional'
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("synonyms")))).alias("synonyms"),
        F.min("first_seen_document").alias("first_seen_document"),
        F.sum("total_mentions").alias("total_mentions"),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("supporting_documents")))).alias(
            "supporting_documents"
        ),
        F.min("entity_type").alias("entity_type"),
        F.min("name").alias("name"),
        *extra,
    )

    tri2 = apply_merge(triples, id_map, "subject_id", "object_id")
    t_aggs = [
        F.max("confidence").alias("confidence"),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("source_documents")))).alias(
            "source_documents"
        ),
        F.sum("evidence_count").alias("evidence_count"),
    ]
    enriched = "strongest_evidence_quote" in tri2.columns
    if enriched:
        # merge the evidence summaries: strongest = max (confidence, quote)
        # over groups that have one; avg = evidence-count-weighted mean
        # (for enriched keys every accumulated row was an evidence row)
        t_aggs += [
            F.max(
                F.when(
                    F.col("strongest_evidence_quote").isNotNull(),
                    F.struct(F.col("confidence").alias("c"),
                             F.col("strongest_evidence_quote").alias("q")),
                )
            ).alias("_b"),
            (
                F.sum(F.col("evidence_confidence_avg") * F.col("evidence_count"))
                / F.sum(
                    F.when(F.col("evidence_confidence_avg").isNotNull(), F.col("evidence_count"))
                )
            ).alias("evidence_confidence_avg"),
        ]
    tri2 = (
        tri2.filter(F.col("subject_id") != F.col("object_id"))
        .groupBy("subject_id", "predicate", "object_id")
        .agg(*t_aggs)
    )
    if enriched:
        tri2 = tri2.withColumn("strongest_evidence_quote", F.col("_b.q")).drop("_b")
    return ent2, tri2, id_map
