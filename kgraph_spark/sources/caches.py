"""Persistent caches as tables (SURVEY.md §2 A8/A9).

The reference keeps JSON-file caches: a synonym cache keyed by normalized
name that persists SAME_AS links across runs (kgraph/pipeline/synonym_cache.py:16-83)
and a canonical-ID cache with a 'known_bad' negative cache
(kgraph/canonical_id/json_cache.py:17-278). The Spark restatement: each
cache is an append-only dimension table; 'load' is a join, 'save' is a
merge-append, the negative cache is an anti-join set."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgraph_spark.functions.normalize import norm_dedup_col

SYNONYM_CACHE_SCHEMA = (
    "norm_name string, entity_class string, canonical_id string, "
    "confidence double, resolution string, source_papers array<string>"
)


def synonym_cache_lookup(names: DataFrame, cache: DataFrame) -> DataFrame:
    """(name, entity_class) ⟕ cache on normalized key → + canonical_id
    (lookup_entity, synonym_cache.py:16-83)."""
    c = F.broadcast(
        cache.select(
            F.col("norm_name").alias("_c_key"),
            F.col("entity_class").alias("_c_class"),
            F.col("canonical_id").alias("cached_canonical_id"),
        )
    )
    return names.withColumn("_key", norm_dedup_col(F.col("name"))).join(
        c,
        (F.col("_key") == F.col("_c_key")) & (F.col("entity_class") == F.col("_c_class")),
        "left",
    ).drop("_key", "_c_key", "_c_class")


def synonym_cache_merge(cache: DataFrame, new_links: DataFrame) -> DataFrame:
    """Append new SAME_AS resolutions; on key collision keep max confidence
    (add_same_as_to_cache semantics). Idempotent — re-running the same merge
    yields the same table (pass-2 idempotency, SURVEY §2 A8)."""
    all_rows = cache.unionByName(new_links)
    return all_rows.groupBy("norm_name", "entity_class").agg(
        F.max_by(F.col("canonical_id"), F.struct("confidence", "canonical_id")).alias("canonical_id"),
        F.max("confidence").alias("confidence"),
        F.max_by(F.col("resolution"), F.struct("confidence", "canonical_id")).alias("resolution"),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("source_papers")))).alias("source_papers"),
    )


def negative_cache_filter(candidates: DataFrame, known_bad: DataFrame, on: list[str]) -> DataFrame:
    """A9 'known_bad' negative cache: drop candidates already known to fail
    lookup (json_cache.py:214-277) — a left anti join."""
    return candidates.join(known_bad.select(*on).distinct(), on, "left_anti")
