"""End-to-end KG construction pipeline (SURVEY.md §3.2 Spark restatement).

    documents(doc_id, spans)
      → mentions (fused chunk+gazetteer pUDF)          [no shuffle]
      → resolved mentions (broadcast alias-index join) [no shuffle]
      → raw pattern relations (pUDF)                   [no shuffle]
      → resolved relations (broadcast joins)           [no shuffle]
      → SAME_AS connected components → merge map       [tiny iterative]
      → validated relations (swap/constraints/F8)      [per-doc window]
      → appears_in + co-occurrence triples             [per-doc self-join]
      → symmetric ordering + cross-doc accumulation    [one (s,p,o) shuffle]
      → entities / mentions / relationships / evidence tables

The per-document stages all co-partition on doc_id; the only global shuffle
is the final triple accumulation (plus the tiny CC loop over merge edges).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from kgraph_spark.config import PipelineConfig
from kgraph_spark.operators import canonicalize, export, relationships, resolve
from kgraph_spark.operators.chunking import paragraphs as paragraphs_op
from kgraph_spark.operators.mentions import extract_mentions, extract_raw_relations


@dataclass
class PipelineResult:
    mentions: DataFrame
    merge_mapping: DataFrame
    validated_relations: DataFrame
    triples: DataFrame
    entities: DataFrame
    tables: dict[str, DataFrame] = field(default_factory=dict)


def run_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    gazetteer_rows: list[tuple],
    cfg: PipelineConfig | None = None,
    persist_intermediates: bool = True,
) -> PipelineResult:
    cfg = cfg or PipelineConfig()
    gaz_bcast = spark.sparkContext.broadcast(gazetteer_rows)
    alias_index = resolve.alias_index_df(spark, gazetteer_rows)
    spec = relationships.predicate_spec_df(spark)

    # ---- pass 1: extraction + resolution (map-only) ----------------------
    mentions = resolve.resolve_mentions(extract_mentions(docs, gaz_bcast, cfg.chunking), alias_index)
    raw_rel = extract_raw_relations(docs)
    resolved_rel = resolve.resolve_relation_endpoints(raw_rel, alias_index)
    if persist_intermediates:
        # extraction is the expensive pass — reuse it for SAME_AS edges,
        # validation, co-occurrence and the entity table without recompute
        mentions = mentions.persist()
        resolved_rel = resolved_rel.persist()

    # ---- pass 2a: canonical merge (D8 connected components) --------------
    edges = relationships.same_as_edges(resolved_rel, cfg)
    mapping = canonicalize.merge_mapping(edges, cfg.cc_max_iterations).persist()

    merged_mentions = canonicalize.apply_merge(mentions, mapping, "entity_id")
    if persist_intermediates:
        merged_mentions = merged_mentions.persist()

    # ---- pass 2b: relation validation + per-doc triples -------------------
    validated = relationships.validate_relations(resolved_rel, spec)
    validated = canonicalize.apply_merge(validated, mapping, "subject_id", "object_id")

    paras = paragraphs_op(docs)
    cooc = relationships.cooccurrence_triples(merged_mentions, paras, cfg)
    appear = relationships.appears_in_triples(merged_mentions, cfg)

    per_doc = (
        validated.select("doc_id", "subject_id", "predicate", "object_id", "confidence")
        .unionByName(cooc)
        .unionByName(appear)
    )
    per_doc = relationships.symmetric_order(per_doc, spec)

    # ---- pass 3: accumulation + export tables -----------------------------
    triples = relationships.accumulate_triples(per_doc)
    entities = export.entities_table(merged_mentions, cfg_promotion(cfg))

    tables = {
        "entities": entities,
        "relationships": triples,
        "mentions": export.mentions_table(merged_mentions),
        "evidence": export.evidence_table(
            canonicalize.apply_merge(
                relationships.symmetric_order(
                    validated.select("doc_id", "subject_id", "predicate", "object_id", "confidence"),
                    spec,
                ),
                mapping,
            )
        ),
    }
    return PipelineResult(
        mentions=merged_mentions,
        merge_mapping=mapping,
        validated_relations=validated,
        triples=triples,
        entities=entities,
        tables=tables,
    )


def cfg_promotion(cfg: PipelineConfig):
    return cfg.promotion
