"""F12 provenance expansion (reference examples/medlit/pipeline/
provenance_expansion.py:31-155): derive Author / Institution / Paper
entities and AUTHORED / AFFILIATED_WITH / CITES / DESCRIBED edges from
paper metadata. Pure column transforms + explodes; DESCRIBED top-2 uses a
per-paper window (row_number ≤ 2 over relationship count)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PAPER_META_SCHEMA = (
    "doc_id string, authors array<struct<name string, affiliation string, ror string>>, "
    "cited array<string>"
)


def _author_id(name_col):
    """'Ada B Lovelace' → 'Author:lovelace_a' (reference id rule
    provenance_expansion.py:8-28: last name + first initial, normalized)."""
    parts = F.split(F.trim(F.lower(F.regexp_replace(name_col, r"[^A-Za-z ]", ""))), r"\s+")
    last = F.element_at(parts, -1)
    first_initial = F.substring(F.element_at(parts, 1), 1, 1)
    return F.concat(F.lit("Author:"), last, F.lit("_"), first_initial)


def _institution_id(aff_col):
    """Affiliation → 'Institution:{slug50}' (lowercase, alnum→dash, 50 cap)."""
    slug = F.regexp_replace(F.lower(F.trim(aff_col)), r"[^a-z0-9]+", "-")
    return F.concat(F.lit("Institution:"), F.substring(F.regexp_replace(slug, r"^-|-$", ""), 1, 50))


def expand_provenance(papers: DataFrame, triples: DataFrame | None = None) -> DataFrame:
    """papers(doc_id, authors, cited) [+ optional triples for DESCRIBED] →
    provenance triples (doc_id, subject_id, predicate, object_id, confidence).

    AUTHORED:        author → PAPER:doc                  (conf 1.0)
    AFFILIATED_WITH: author → institution (ROR in KB id when present)
    CITES:           PAPER:doc → PAPER:cited
    DESCRIBED:       PAPER:doc → top-2 entities by per-doc relationship count
                     (provenance_expansion.py DESCRIBED rule)."""
    a = papers.select("doc_id", F.explode_outer("authors").alias("au")).filter(
        F.col("au").isNotNull() & (F.trim(F.col("au.name")) != "")
    )
    author_id = _author_id(F.col("au.name"))
    paper_id = F.concat(F.lit("PAPER:"), F.col("doc_id"))

    authored = a.select(
        "doc_id",
        author_id.alias("subject_id"),
        F.lit("authored").alias("predicate"),
        paper_id.alias("object_id"),
        F.lit(1.0).alias("confidence"),
    )
    affiliated = (
        a.filter(F.coalesce(F.trim("au.affiliation"), F.lit("")) != "")
        .select(
            "doc_id",
            author_id.alias("subject_id"),
            F.lit("affiliated_with").alias("predicate"),
            F.coalesce(
                F.when(F.coalesce(F.trim("au.ror"), F.lit("")) != "",
                       F.concat(F.lit("ROR:"), F.trim("au.ror"))),
                _institution_id(F.col("au.affiliation")),
            ).alias("object_id"),
            F.lit(1.0).alias("confidence"),
        )
    )
    cites = papers.select(
        "doc_id", F.explode_outer("cited").alias("c")
    ).filter(F.coalesce(F.trim("c"), F.lit("")) != "").select(
        "doc_id",
        F.concat(F.lit("PAPER:"), F.col("doc_id")).alias("subject_id"),
        F.lit("cites").alias("predicate"),
        F.concat(F.lit("PAPER:"), F.trim("c")).alias("object_id"),
        F.lit(1.0).alias("confidence"),
    )
    out = authored.unionByName(affiliated).unionByName(cites).distinct()

    if triples is not None:
        counts = (
            triples.select(F.explode("source_documents").alias("doc_id"), "subject_id")
            .groupBy("doc_id", "subject_id")
            .agg(F.count("*").alias("rel_count"))
        )
        w = Window.partitionBy("doc_id").orderBy(
            F.col("rel_count").desc(), F.col("subject_id").asc()
        )
        described = (
            counts.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= 2)
            .select(
                "doc_id",
                F.concat(F.lit("PAPER:"), F.col("doc_id")).alias("subject_id"),
                F.lit("described").alias("predicate"),
                F.col("subject_id").alias("object_id"),
                F.lit(0.9).alias("confidence"),
            )
        )
        out = out.unionByName(described)
    return out
