"""Pass-3 kgbundle build over the merged graph — medlit parity mode.

Re-implements the reference's bundle builder
(examples/medlit/pipeline/bundle_builder.py:413-548) as DataFrame
transforms over the Pass-2 outputs + the original bundles:

  * orphan pruning: entities must be referenced by a triple AND carry at
    least one usage credit; triples must keep both endpoints alive;
  * usage statistics (usage_count / total_mentions / supporting_documents
    / first_seen_*) from bundle relationship evidence credits
    (bundle_builder.py:106-162), denylist papers excluded from provenance;
  * entity rows with status/confidence from canonical-ness and ontology
    deep links (canonical_urls.py:6-86 as one JVM CASE chain);
  * relationship rows with evidence_count / strongest quote (max
    confidence, first occurrence on ties) / avg confidence, matched on the
    UNCORRECTED bundle keys exactly as the reference does (a swap-corrected
    triple whose bundle form never matches gets stats 0/None — mirrored);
  * evidence + mention rows (offsets stubbed 0..len, the reference's own
    contract).

Offline stance: the reference's NCBI title patch (_fetch_pmc_titles) is a
network call and is skipped — identical to replaying the reference with
the fetch stubbed, which is how the parity target is produced.

Everything here is joins + hash aggregates on entity/triple-keyed frames;
no Python stages at all (the one order-sensitive artifact —
supporting_documents order — is a min-ordkey aggregation, not a fold).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# bundle_builder.py:36-47
PROVENANCE_DENYLIST = (
    "PMC_UNKNOWN",
    "PMC_extracted",
    "PMC_PLACEHOLDER",
    "PMC_ID_NOT_PROVIDED",
    "PMC11000000",
)
PROVENANCE_DERIVED_PREDICATES = ("AUTHORED", "AFFILIATED_WITH", "DESCRIBED", "CITES")


def canonical_url_col(cid: Column, etype: Column) -> Column:
    """Ontology deep link (canonical_urls.py:6-86), same branch order."""
    bare = cid
    strip = lambda pre: F.regexp_replace(cid, f"^{pre}:", "")  # noqa: E731
    is_digits = cid.rlike(r"^[0-9]+$")
    return (
        F.when(cid.isNull() | (cid == ""), F.lit(None))
        .when(
            cid.startswith("DBPedia:"),
            F.concat(F.lit("https://dbpedia.org/page/"), F.translate(strip("DBPedia"), " ", "_")),
        )
        .when(
            cid.startswith("MeSH:"),
            F.concat(F.lit("https://meshb.nlm.nih.gov/record/ui?ui="), strip("MeSH")),
        )
        .when(
            bare.rlike(r"^D[0-9]+$") & (etype == "disease"),
            F.concat(F.lit("https://meshb.nlm.nih.gov/record/ui?ui="), bare),
        )
        .when(
            cid.startswith("UniProt:"),
            F.concat(F.lit("https://www.uniprot.org/uniprotkb/"), strip("UniProt")),
        )
        .when(
            bare.rlike(r"^[PQ][A-Za-z0-9]{5,}$") & (etype == "protein"),
            F.concat(F.lit("https://www.uniprot.org/uniprotkb/"), bare),
        )
        .when(
            cid.startswith("HGNC:"),
            F.concat(
                F.lit("https://www.genenames.org/data/gene-symbol-report/#!/hgnc_id/"),
                strip("HGNC"),
            ),
        )
        .when(
            is_digits & (etype == "gene"),
            F.concat(
                F.lit("https://www.genenames.org/data/gene-symbol-report/#!/hgnc_id/"), bare
            ),
        )
        .when(
            bare.rlike(r"^C[0-9]+$"),
            F.concat(F.lit("https://uts.nlm.nih.gov/uts/umls/concept/"), bare),
        )
        .when(cid.startswith("RxNorm:"), F.lit(None))
        .when(cid.startswith("ROR:"), F.concat(F.lit("https://ror.org/"), strip("ROR")))
        .when(cid.startswith("https://ror.org/"), cid)
        .when(
            cid.startswith("ORCID:"), F.concat(F.lit("https://orcid.org/"), strip("ORCID"))
        )
        .otherwise(F.lit(None))
    )


def _resolved_rels(rels: DataFrame, id_map: DataFrame) -> DataFrame:
    """Bundle rels with endpoints mapped through the final id_map."""
    s = id_map.select(
        "paper_id", F.col("local_id").alias("subject"), F.col("cid").alias("s_cid")
    )
    o = id_map.select(
        "paper_id", F.col("local_id").alias("object_id"), F.col("cid").alias("o_cid")
    )
    return rels.join(s, ["paper_id", "subject"], "left").join(
        o, ["paper_id", "object_id"], "left"
    )


def usage_stats(r2: DataFrame) -> DataFrame:
    """Per-merge-key usage credits (bundle_builder.py:106-162): one credit
    per (rel, evidence_id, endpoint); provenance-derived predicates with no
    evidence credit once per endpoint; total_mentions counts ALL credits,
    supporting_documents / first_seen only allowed papers, in credit order."""
    evex = r2.select(
        "paper_id", "pos", "predicate", "s_cid", "o_cid",
        F.posexplode_outer("evidence_ids").alias("eidx", "eid"),
    ).filter(
        F.col("eid").isNotNull()
        | F.col("predicate").isin(*PROVENANCE_DERIVED_PREDICATES)
    )
    credits = None
    for side, col in ((0, "s_cid"), (1, "o_cid")):
        c = evex.select(
            F.col(col).alias("cid"), "paper_id", "pos", "eid",
            F.struct(
                "paper_id", "pos",
                F.coalesce("eidx", F.lit(-1)).alias("eidx"),
                F.lit(side).alias("side"),
            ).alias("ord"),
        ).filter(F.col("cid").isNotNull())
        credits = c if credits is None else credits.union(c)
    allowed = ~F.col("paper_id").isin(*PROVENANCE_DENYLIST) & ~F.col(
        "paper_id"
    ).startswith("PMC_UNKNOWN_")
    totals = credits.groupBy("cid").agg(F.count("*").cast("long").alias("total_mentions"))
    ok = credits.filter(allowed)
    first_per_doc = ok.groupBy("cid", "paper_id").agg(F.min("ord").alias("ford"))
    docs = first_per_doc.groupBy("cid").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ford", "paper_id"))),
            lambda x: x.paper_id,
        ).alias("supporting_documents")
    )
    first_seen = ok.groupBy("cid").agg(F.min(F.struct("ord", "paper_id", "eid")).alias("fs"))
    sec = F.split(F.col("fs.eid"), ":")
    return (
        totals.join(docs, "cid", "left")
        .join(first_seen, "cid", "left")
        .select(
            "cid",
            "total_mentions",
            F.coalesce("supporting_documents", F.array().cast("array<string>")).alias(
                "supporting_documents"
            ),
            F.size(F.coalesce("supporting_documents", F.array().cast("array<string>")))
            .cast("long")
            .alias("usage_count"),
            F.col("fs.paper_id").alias("first_seen_document"),
            F.when(F.col("fs.eid").isNotNull() & (F.size(sec) >= 2), sec[1]).alias(
                "first_seen_section"
            ),
        )
    )


def build_bundle_tables(
    spark: SparkSession,
    bundles: DataFrame,
    pass2: dict[str, DataFrame],
    created_at: str = "1970-01-01T00:00:00Z",
) -> dict[str, DataFrame]:
    """Pass-2 outputs + original bundles -> kgbundle tables
    (entities, relationships, evidence, mentions) as DataFrames."""
    from kgraph_spark.sources.medlit_bundles import bundle_evidence, bundle_relationships

    rels = bundle_relationships(bundles)
    ev = bundle_evidence(bundles)
    idm = pass2["id_map"].select("paper_id", "local_id", "cid")
    trip = pass2["triples"]
    ents = pass2["entities"]

    # orphan entity drop #1: must be referenced by some triple
    referenced = (
        trip.select(F.col("subject").alias("entity_id"))
        .union(trip.select(F.col("object").alias("entity_id")))
        .distinct()
    )
    e1 = ents.join(referenced, "entity_id", "left_semi")

    r2 = _resolved_rels(rels, idm).localCheckpoint(eager=False)
    usage = usage_stats(r2)

    # orphan drop #2: zero-mention entities (referenced but never credited)
    e2 = e1.join(
        F.broadcast(usage.withColumnRenamed("cid", "entity_id")), "entity_id", "left"
    ).filter(F.coalesce("usage_count", F.lit(0)) > 0)
    surviving = e2.select("entity_id").localCheckpoint(eager=False)

    trip2 = trip.join(
        surviving.withColumnRenamed("entity_id", "subject"), "subject", "left_semi"
    ).join(surviving.withColumnRenamed("entity_id", "object"), "object", "left_semi")

    etype = F.lower(F.coalesce("entity_class", F.lit("unknown")))
    entity_rows = e2.select(
        "entity_id",
        etype.alias("entity_type"),
        "name",
        F.when(F.col("canonical_id").isNotNull(), F.lit("canonical"))
        .otherwise(F.lit("provisional"))
        .alias("status"),
        F.when(F.col("canonical_id").isNotNull(), F.lit(0.8)).otherwise(F.lit(0.5)).alias(
            "confidence"
        ),
        F.coalesce("usage_count", F.lit(0)).alias("usage_count"),
        F.lit(created_at).alias("created_at"),
        F.lit("medlit:llm").alias("source"),
        canonical_url_col(F.col("canonical_id"), etype).alias("canonical_url"),
        F.struct(F.coalesce("synonyms", F.array()).alias("synonyms")).alias("properties"),
        "first_seen_document",
        "first_seen_section",
        F.coalesce("total_mentions", F.lit(0)).alias("total_mentions"),
        "supporting_documents",
    )

    # relationship evidence stats on the UNCORRECTED bundle keys
    # (bundle_builder.py:203-248): contributions only when both endpoints
    # resolve AND the raw (s, p, o) matches a surviving merged triple
    pairs = (
        r2.filter(F.col("s_cid").isNotNull() & F.col("o_cid").isNotNull())
        .select(
            F.col("s_cid").alias("subject"),
            F.col("predicate"),
            F.col("o_cid").alias("object"),
            "paper_id", "pos",
            F.posexplode_outer("evidence_ids").alias("eidx", "eid"),
        )
        .filter(F.col("eid").isNotNull())
        .join(trip2.select("subject", "predicate", "object"), ["subject", "predicate", "object"], "left_semi")
        .join(
            ev.select(
                "paper_id",
                F.col("evidence_id").alias("eid"),
                F.coalesce("text", F.lit("")).alias("etext"),
                F.col("confidence").alias("econf"),
            ),
            ["paper_id", "eid"],
        )
    )
    stats = pairs.groupBy("subject", "predicate", "object").agg(
        F.count("*").cast("long").alias("evidence_count"),
        # strongest = max confidence, first occurrence on ties (Python max
        # keeps the first maximal element in iteration order)
        F.min(
            F.struct(
                (-F.col("econf")).alias("nc"),
                F.struct("paper_id", "pos", "eidx").alias("o"),
                F.col("etext").alias("t"),
            )
        ).alias("best"),
        F.round(F.avg("econf"), 4).alias("evidence_confidence_avg"),
    )
    rel_rows = (
        trip2.join(F.broadcast(stats), ["subject", "predicate", "object"], "left")
        .select(
            F.col("subject").alias("subject_id"),
            F.col("object").alias("object_id"),
            "predicate",
            "confidence",
            F.col("source_papers").alias("source_documents"),
            F.lit(created_at).alias("created_at"),
            F.struct(
                F.col("linguistic_trust"),
                # props carry provenance only when non-empty
                # (bundle_builder.py:258-261: `if rel.get("provenance")`)
                F.when(F.size("provenance") > 0, F.col("provenance")).alias("provenance"),
            ).alias("properties"),
            F.coalesce("evidence_count", F.lit(0)).alias("evidence_count"),
            F.when(F.col("best.t") != "", F.col("best.t")).alias(
                "strongest_evidence_quote"
            ),
            "evidence_confidence_avg",
        )
    )

    # evidence rows (bundle_builder.py:278-319): raw-key matches only
    ev_rows = (
        r2.filter(F.col("s_cid").isNotNull() & F.col("o_cid").isNotNull())
        .select(
            F.col("s_cid").alias("subject"),
            "predicate",
            F.col("o_cid").alias("object"),
            "paper_id",
            F.posexplode_outer("evidence_ids").alias("eidx", "eid"),
        )
        .filter(F.col("eid").isNotNull())
        .join(trip2.select("subject", "predicate", "object"), ["subject", "predicate", "object"], "left_semi")
        .join(
            ev.select("paper_id", F.col("evidence_id").alias("eid"),
                      F.coalesce("text", F.lit("")).alias("etext"),
                      F.col("confidence").alias("econf")),
            ["paper_id", "eid"],
        )
        .select(
            F.concat_ws(":", "subject", "predicate", "object").alias("relationship_key"),
            F.col("paper_id").alias("document_id"),
            F.lit(None).cast("string").alias("section"),
            F.lit(0).alias("start_offset"),
            F.length("etext").alias("end_offset"),
            F.col("etext").alias("text_span"),
            F.col("econf").alias("confidence"),
            F.lit(True).alias("supports"),
        )
    )

    # mention rows (bundle_builder.py:322-371): every rel, each endpoint
    # independently, existing evidence only; orphan guard at the end
    mex = r2.select(
        "paper_id", "s_cid", "o_cid",
        F.posexplode_outer("evidence_ids").alias("eidx", "eid"),
    ).filter(F.col("eid").isNotNull()).join(
        ev.select("paper_id", F.col("evidence_id").alias("eid"),
                  F.coalesce("text", F.lit("")).alias("etext"),
                  F.col("confidence").alias("econf"),
                  "extraction_method"),
        ["paper_id", "eid"],
    )
    mention_rows = None
    for col in ("s_cid", "o_cid"):
        m = mex.filter(F.col(col).isNotNull()).select(
            F.col(col).alias("entity_id"),
            F.col("paper_id").alias("document_id"),
            F.lit(None).cast("string").alias("section"),
            F.lit(0).alias("start_offset"),
            F.length("etext").alias("end_offset"),
            F.col("etext").alias("text_span"),
            F.col("econf").alias("confidence"),
            "extraction_method",
            F.lit(created_at).alias("created_at"),
        )
        mention_rows = m if mention_rows is None else mention_rows.union(m)
    mention_rows = mention_rows.join(surviving, "entity_id", "left_semi")

    return {
        "entities": entity_rows,
        "relationships": rel_rows,
        "evidence": ev_rows,
        "mentions": mention_rows,
    }
