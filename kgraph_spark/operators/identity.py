"""D13 identity server — the complete batch restatement (SURVEY.md §2 D13).

The reference's event-driven IdentityServer (kgschema/kgschema/identity.py:
31-194; run_ingest_with_identity_server, examples/medlit/pipeline/
dedup.py:795-988) resolves mentions one at a time and fires
on_entity_added → find_synonyms → merge after every insert, guarded by
advisory locks and a concurrency semaphore. The ABC itself declares the
batch form canonical: "This event-driven model subsumes batch synonym
sweeps: a batch sweep is equivalent to replaying on_entity_added for every
entity in the store" (identity.py:180-182). This module IS that replay,
stated once over the whole store:

  resolve()          → resolve_identity_requests: authoritative hint, else
                       broadcast join against the store's name/synonym
                       index, else a deterministic content-hash provisional
                       id. Content hashing is the INSERT..ON CONFLICT
                       idempotency analog — the same mention yields the
                       same id on every retry, in any order, on any
                       executor, with no coordination (identity.py:61-63
                       "resolving the same mention twice returns the same
                       ID").
  on_entity_added()  → synonym_sweep: the per-insert synonym probe becomes
                       ONE equi-join on the normalized-name key, emitting
                       star edges (hub = min id per key) instead of all
                       pairs — O(n) edges per collision group, same
                       component closure. The embedding criterion plugs in
                       through blocked_pair_similarity (D10/D11), the same
                       seam the reference's pgvector check occupies.
  merge()            → merge_identities: D8 connected components over the
                       SAME_AS edges, survivor = authoritative-first then
                       lexicographic per component (the preferred_entity
                       election), D12 tombstones on the losers. Status
                       rules per identity.py:141-144: provisional +
                       provisional → provisional, canonical + anything →
                       canonical — which the authoritative-first election
                       yields for free (an authoritative survivor IS the
                       canonical member; an all-provisional component keeps
                       a provisional survivor).
  promote()          → operators/promotion.py (E1–E3); promote of a merged
                       id follows the tombstone's merged_into pointer
                       (identity.py:90-93) — see follow_tombstones.

Concurrency contract restated for batch: the reference needs advisory
locks because two workers can race on the same pair; a deterministic batch
job has no races to guard — the equivalence is proven by replay in
tests/test_identity_server.py, which runs the same mention stream through
an in-memory event-driven server ONE MENTION AT A TIME (any order) and
asserts the final mention→survivor map equals the batch output exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgraph_spark.functions.normalize import norm_dedup_col
from kgraph_spark.operators.canonicalize import (
    apply_merge,
    is_authoritative_col,
    merge_mapping,
)
from kgraph_spark.operators.resolve import prov_id_col


def keyed_surfaces(entities: DataFrame) -> DataFrame:
    """(norm_key, entity_type, entity_id), one row per distinct normalized
    name/synonym surface per entity — the ONE place surfaces are keyed.
    store_name_index (resolve side) and synonym_sweep (merge side) both
    build on this, so the two can never disagree about which normalized
    key a surface maps to (the invariant the module's correctness argument
    rests on)."""
    surfaces = F.array(F.col("name"))
    if "synonyms" in entities.columns:
        surfaces = F.concat(surfaces, F.coalesce(F.col("synonyms"), F.array()))
    return (
        entities.select(
            F.explode(F.array_distinct(surfaces)).alias("_surface"),
            "entity_id",
            "entity_type",
        )
        .withColumn("norm_key", norm_dedup_col(F.col("_surface")))
        .filter(F.col("norm_key") != "")
        .select("norm_key", "entity_type", "entity_id")
        .distinct()
    )


def store_name_index(entities: DataFrame) -> DataFrame:
    """(entity_id, entity_type, name, synonyms?, status?) → one elected
    (norm_key, entity_type, entity_id) row per normalized surface+type.

    Collisions elect authoritative-first then lexicographic — the same
    total order merge_identities uses for survivors, so resolve() and
    merge() can never disagree about which id a surface maps to."""
    elected = keyed_surfaces(entities).groupBy("norm_key", "entity_type").agg(
        F.min(
            F.struct(
                F.when(is_authoritative_col(F.col("entity_id")), 0).otherwise(1).alias("na"),
                F.col("entity_id").alias("entity_id"),
            )
        ).alias("_b")
    )
    return elected.select(
        "norm_key", "entity_type", F.col("_b.entity_id").alias("entity_id")
    )


def resolve_identity_requests(requests: DataFrame, entities: DataFrame) -> DataFrame:
    """Batch resolve(): requests(request_id, mention, entity_type,
    canonical_id_hint?) → + entity_id.

    Priority (reference dedup.py:848-867 + identity.py:52-76): an
    authoritative hint short-circuits the server entirely; otherwise the
    store's name/synonym index answers; otherwise a content-hash
    provisional id is minted — idempotently, so re-running the batch (or
    resolving the same mention from two executors) yields the same id
    without the reference's ON CONFLICT dance."""
    idx = F.broadcast(
        store_name_index(entities).withColumnRenamed("entity_id", "_store_id")
    )
    src = requests.withColumn("norm_key", norm_dedup_col(F.col("mention")))
    joined = src.join(idx, ["norm_key", "entity_type"], "left")
    hint = (
        F.col("canonical_id_hint")
        if "canonical_id_hint" in requests.columns
        else F.lit(None).cast("string")
    )
    auth_hint = F.when(hint.isNotNull() & is_authoritative_col(hint), hint)
    return joined.withColumn(
        "entity_id",
        F.coalesce(auth_hint, F.col("_store_id"), prov_id_col(F.col("mention"), F.col("entity_type"))),
    ).drop("_store_id", "norm_key")


def synonym_sweep(entities: DataFrame) -> DataFrame:
    """Batch on_entity_added(): SAME_AS edges(src, dst) for every pair of
    same-type entities sharing a normalized surface form (name or synonym).

    Star edges — every member links to the min id of its (key, type) group
    — keep edge count linear in group size; connected components closes the
    transitive chains exactly as pairwise merges would. Criteria are
    pluggable exactly like the reference's find_synonyms (identity.py:
    109-127): union these edges with blocked_pair_similarity output for the
    pgvector-cosine criterion."""
    keyed = keyed_surfaces(entities)
    hubs = keyed.groupBy("norm_key", "entity_type").agg(
        F.min("entity_id").alias("src"), F.count("*").alias("_n")
    )
    return (
        keyed.join(hubs.filter(F.col("_n") > 1), ["norm_key", "entity_type"])
        .filter(F.col("entity_id") != F.col("src"))
        .select("src", F.col("entity_id").alias("dst"))
        .distinct()
    )


def merge_identities(
    entities: DataFrame, edges: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Batch merge(): (entities', id_map) — CC over the SAME_AS edges,
    survivor per component by (authoritative DESC, id ASC), losers
    tombstoned status='merged' with merged_into (identity.py:131-141:
    "Absorbed entities are marked status=MERGED with merged_into=
    survivor_id so that stale external references remain resolvable").

    Status rules (identity.py:141-144) fall out of the election: a
    component containing a canonical (authoritative) member elects it, so
    canonical+anything keeps a canonical survivor; an all-provisional
    component elects a provisional survivor, still promotable by E1–E3."""
    id_map = merge_mapping(edges)
    losers = (
        entities.join(F.broadcast(id_map), "entity_id", "inner")
        .withColumn("status", F.lit("merged"))
        .withColumn("merged_into", F.col("final_id"))
        .drop("final_id")
    )
    kept = entities.join(F.broadcast(id_map.select("entity_id")), "entity_id", "left_anti")
    if "status" not in entities.columns:
        # a minimal store (status is optional in this module's contract)
        # must still carry the losers' status='merged' marker through the
        # union — losers are projected onto kept's columns below, so kept
        # needs the column too or the tombstone marker is silently dropped
        # and follow_tombstones fails on an unresolved column
        kept = kept.withColumn("status", F.lit(None).cast("string"))
    if "merged_into" in entities.columns:
        # pre-existing tombstones whose survivor just merged again: rewrite
        # the pointer so every tombstone stays ONE hop from a live row
        kept = apply_merge(kept, id_map, "merged_into")
    else:
        kept = kept.withColumn("merged_into", F.lit(None).cast("string"))
    return kept.unionByName(losers.select(*kept.columns)), id_map


def follow_tombstones(ids: DataFrame, entities: DataFrame, id_col: str = "entity_id") -> DataFrame:
    """promote()/resolve() on a merged id returns the survivor
    (identity.py:90-93: "Logs a warning with the stale ID and returns the
    survivor's ID; does not raise"): one broadcast join against the
    tombstone rows' merged_into pointers. Single-hop suffices — merge
    rewrites every pre-existing tombstone's pointer to the final survivor
    (apply_merge over merged_into keeps pointers one hop from live)."""
    ptr = F.broadcast(
        entities.filter(F.col("status") == "merged").select(
            F.col("entity_id").alias("_t_id"), F.col("merged_into").alias("_t_final")
        )
    )
    return (
        ids.join(ptr, ids[id_col] == F.col("_t_id"), "left")
        .withColumn(id_col, F.coalesce(F.col("_t_final"), F.col(id_col)))
        .drop("_t_id", "_t_final")
    )
