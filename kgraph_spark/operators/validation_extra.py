"""Evidence / semantics validation extras (SURVEY.md §2 F4, F5, F13) and
the vocab pre-pass (C6).

Our deterministic pattern extractor guarantees evidence containment by
construction, so in the default pipeline these are no-ops — but they are
the reference's guard rails against a sloppier (LLM) extractor and are
part of the operator contract, implemented as pure column expressions."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgraph_spark.functions.normalize import norm_key_col

# F5 keyword polarity lists (reference _validate_predicate_semantics,
# examples/medlit/pipeline/relationships.py:293-378)
NEGATIVE_MARKERS = ["not", "no", "never", "failed", "without", "absence", "lack"]
POSITIVE_MARKERS = ["improved", "reduced", "effective", "benefit", "response"]


def evidence_containment_filter(
    relations: DataFrame,
    subject_col: str = "subject_norm",
    object_col: str = "object_norm",
) -> DataFrame:
    """F4: both endpoints must appear (normalized substring) in the evidence
    quote (reference _evidence_contains_both_entities,
    relationships.py:101-139). relations must carry evidence plus the two
    endpoint-key columns.

    Column-choice caveat (mirrors the reference, which matches the RAW
    surface name/synonyms against the evidence, relationships.py:114-125):
    pass a norm_key-of-surface column here, NOT the spelling-normalized
    dedup key — 'tumour' in a quote contains the surface key 'tumour' but
    not the dedup key 'tumor'."""
    norm_ev = norm_key_col(F.col("evidence"))
    return relations.filter(
        F.col("evidence").isNotNull()
        & norm_ev.contains(F.col(subject_col))
        & norm_ev.contains(F.col(object_col))
    )


# reference _EVIDENCE_DISEASE_CONTEXT_WORDS (relationships.py:83-85)
DISEASE_CONTEXT_WORDS = [
    "tumor", "cancer", "cell", "cells", "positive", "negativity", "negative",
    "staining", "ihc", "immunohisto", "immunoreactivity", "positivity", "neoplastic",
]


def evidence_containment_semantic_filter(
    relations: DataFrame,
    threshold: float = 0.5,
    embed_fn=None,
    subject_col: str = "subject_norm",
    object_col: str = "object_norm",
    documents: DataFrame | None = None,
) -> DataFrame:
    """F4 with the reference's full fallback ladder (relationships.py:744-774):

      1. substring: both endpoint keys appear in the normalized quote → pass;
      2. exactly ONE endpoint appears → DROP immediately (the reference's
         early exit at relationships.py:747-750 — an anchored extraction
         missing one endpoint is treated as a real signal, the semantic
         check is NOT consulted);
      3. neither appears → semantic fallback: both endpoints must reach
         cosine(embed(evidence), embed(endpoint)) ≥ threshold
         (_evidence_contains_both_entities_semantic, relationships.py:142-206;
         default threshold 0.5 at :225);
      4. marker-disease context rescue (relationships.py:765-774, only when
         `documents` is provided): predicate ∈ {indicates, associated_with},
         object_type == 'disease', subject reached the evidence semantically,
         the disease name appears in the FULL document content, and the quote
         carries a disease-context word (DISEASE_CONTEXT_WORDS) → pass.

    Split-and-union keeps the Arrow UDF off the hot path: rows deciding at
    steps 1-2 never compute an embedding; only the neither-endpoint residue
    pays for 3 embedding calls. `embed_fn` is the I1 seam — defaults to the
    deterministic hash embedding (functions/embeddings.embed_text); a real
    encoder plugs in with the same (string column → array<float>) signature.
    `documents(doc_id, content)` joins at most the residue rows. Step 4
    needs `predicate` and `object_type` columns; absent those (or documents),
    the rescue is skipped — matching the reference with no embedding/window
    context available."""
    from kgraph_spark.operators.similarity import cosine_col

    if embed_fn is None:
        from kgraph_spark.functions.embeddings import embed_text as embed_fn

    norm_ev = norm_key_col(F.col("evidence"))
    # empty/whitespace evidence rejects before any embedding work
    # (reference 'evidence_empty', relationships.py:154-160 + its
    # tests/test_evidence_semantic.py::test_evidence_empty_rejected)
    has_ev = F.col("evidence").isNotNull() & (F.trim(F.col("evidence")) != "")
    sub_ok = norm_ev.contains(F.col(subject_col))
    obj_ok = norm_ev.contains(F.col(object_col))

    fast = relations.filter(has_ev & sub_ok & obj_ok)
    # rows where exactly one endpoint string-matched are dropped here by
    # construction: the residue keeps only the neither-matched rows
    residue_base = relations.filter(has_ev & ~sub_ok & ~obj_ok)
    # embedding caches as joins (the reference's evidence_cache /
    # entity_name_cache, relationships.py:162-186): each DISTINCT quote and
    # endpoint surface is embedded once, however many candidate relations
    # share it — with a real encoder this is the difference between
    # O(distinct strings) and O(rows) model calls. Name dictionaries are
    # vocabulary-sized → broadcast.
    ev_cache = (
        residue_base.select(F.col("evidence").alias("_ev_txt"))
        .distinct()
        .withColumn("_ev_emb", embed_fn(F.col("_ev_txt")))
    )
    s_cache = F.broadcast(
        residue_base.select(F.col(subject_col).alias("_s_txt"))
        .distinct()
        .withColumn("_s_emb", embed_fn(F.col("_s_txt")))
    )
    o_cache = F.broadcast(
        residue_base.select(F.col(object_col).alias("_o_txt"))
        .distinct()
        .withColumn("_o_emb", embed_fn(F.col("_o_txt")))
    )
    residue = (
        residue_base.join(ev_cache, F.col("evidence") == F.col("_ev_txt"))
        .join(s_cache, F.col(subject_col) == F.col("_s_txt"))
        .join(o_cache, F.col(object_col) == F.col("_o_txt"))
        .withColumn("_s_sem", cosine_col(F.col("_ev_emb"), F.col("_s_emb")) >= threshold)
        .withColumn("_o_sem", cosine_col(F.col("_ev_emb"), F.col("_o_emb")) >= threshold)
        .drop("_ev_txt", "_s_txt", "_o_txt", "_ev_emb", "_s_emb", "_o_emb")
    )
    semantic = residue.filter(F.col("_s_sem") & F.col("_o_sem")).drop("_s_sem", "_o_sem")
    out = fast.unionByName(semantic)
    if (
        documents is not None
        and "predicate" in relations.columns
        and "object_type" in relations.columns
        and "doc_id" in relations.columns
    ):
        ctx_words = F.array(*[F.lit(w) for w in DISEASE_CONTEXT_WORDS])
        has_ctx = F.exists(ctx_words, lambda w: norm_ev.contains(w))
        # content normalized with the SAME norm_key pipeline as the object
        # key — lower() alone would never contain a punctuation-stripped
        # key like 'nonhodgkin lymphoma' (reference compares raw-lower vs
        # raw-lower, relationships.py:769-770; our column contract carries
        # the normalized key, so both sides normalize)
        d = documents.select(
            "doc_id", norm_key_col(F.col("content")).alias("_doc_content")
        )
        rescued = (
            residue.filter(F.col("_s_sem") & ~F.col("_o_sem"))
            .filter(
                F.col("predicate").isin("indicates", "associated_with")
                & (F.col("object_type") == "disease")
                & has_ctx
            )
            .join(d, "doc_id", "inner")
            .filter(F.col("_doc_content").contains(F.col(object_col)))
            .drop("_s_sem", "_o_sem", "_doc_content")
        )
        out = out.unionByName(rescued)
    return out


def predicate_semantics_filter(relations: DataFrame) -> DataFrame:
    """F5: polarity sanity — 'treats'/'prevents' evidence must not be
    purely negative; 'causes'/'increases_risk' must not be purely positive
    (relationships.py:293-378). arrays_overlap over evidence tokens."""
    toks = F.split(F.lower(F.coalesce(F.col("evidence"), F.lit(""))), r"\s+")
    has_neg = F.arrays_overlap(toks, F.array(*[F.lit(w) for w in NEGATIVE_MARKERS]))
    has_pos = F.arrays_overlap(toks, F.array(*[F.lit(w) for w in POSITIVE_MARKERS]))
    bad_treats = F.col("predicate").isin("treats", "prevents") & has_neg & ~has_pos
    bad_risk = F.col("predicate").isin("causes", "increases_risk") & has_pos & ~has_neg
    return relations.filter(~(bad_treats | bad_risk))


def repair_evidence_ids(
    df: DataFrame,
    real_paper_id_col: str = "doc_id",
    evidence_id_col: str = "evidence_id",
) -> DataFrame:
    """F13: replace placeholder / hallucinated paper ids in the evidence-id
    format '{paper}:{section}:{para}:{method}' ('PMC_UNKNOWN',
    '==CURRENT_PAPER==', or a PMC-style id that disagrees with the real
    one) with the real paper id (reference extract.py:60-103, 399-407)."""
    eid = F.col(evidence_id_col)
    first = F.substring_index(eid, ":", 1)
    rest = eid.substr(F.length(first) + 1, F.length(eid))  # keeps leading ':'
    is_placeholder = first.isin("PMC_UNKNOWN", "==CURRENT_PAPER==") | (
        first.rlike("^PMC[0-9]+$") & (first != F.col(real_paper_id_col))
    )
    return df.withColumn(
        evidence_id_col,
        F.when(is_placeholder, F.concat(F.col(real_paper_id_col), rest)).otherwise(eid),
    )


def vocab_prepass(mentions: DataFrame) -> DataFrame:
    """C6 vocab pre-pass (Pass 1a): cheap shared-vocabulary aggregation —
    (norm_name, entity_type) with document frequency + totals (reference
    fetch_vocab.py, restated as an aggregation over extracted mentions)."""
    key = (
        F.coalesce(F.col("norm_text"), norm_key_col(F.col("text")))
        if "norm_text" in mentions.columns
        else norm_key_col(F.col("text"))
    )
    return (
        mentions.withColumn("_k", key)
        .groupBy(F.col("_k").alias("norm_name"), "entity_type")
        .agg(
            F.countDistinct("doc_id").alias("doc_frequency"),
            F.count("*").alias("total_mentions"),
            F.max("confidence").alias("max_confidence"),
        )
    )


def infer_entity_types(
    triples: DataFrame,
    types: DataFrame,
    min_votes: int = 1,
) -> DataFrame:
    """Type inference for untyped entities from predicate signatures —
    the schema-induction step a KG-construction pipeline runs after
    linking, when authority lookups typed only part of the graph
    (reference entity classes come from the KB, kgraph/models.py; here we
    propagate them to the residue).

    Two passes, both plain aggregates:
    1. SIGNATURE: per predicate, the dominant subject type and dominant
       object type among ALREADY-TYPED endpoints (majority count,
       tie-break lexicographic min — deterministic argmax via min-of-
       struct on (-count, type)).
    2. VOTE: each untyped entity collects one vote per (predicate,
       position) edge it touches — the predicate's dominant type for that
       position — and takes the same deterministic majority.

    Returns (entity_id, inferred_type, n_votes) for entities ABSENT from
    `types` with n_votes >= min_votes. Integer counts only. Scale: two
    shuffles on predicate (signature is tiny — |predicates| rows,
    broadcast back), one shuffle on entity_id for the vote; hub entities
    salt via AQE."""
    typed_s = triples.join(
        types.select(F.col("entity_id").alias("subject_id"), "type"), "subject_id"
    ).select(F.col("predicate"), F.lit("s").alias("pos"), F.col("type"))
    typed_o = triples.join(
        types.select(F.col("entity_id").alias("object_id"), "type"), "object_id"
    ).select(F.col("predicate"), F.lit("o").alias("pos"), F.col("type"))
    sig = (
        typed_s.unionByName(typed_o)
        .groupBy("predicate", "pos", "type")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .groupBy("predicate", "pos")
        .agg(F.min(F.struct((-F.col("c")).alias("nc"), "type")).alias("w"))
        .select("predicate", "pos", F.col("w.type").alias("dom_type"))
    )
    untyped_s = triples.join(
        types.select(F.col("entity_id").alias("subject_id")), "subject_id", "left_anti"
    ).select(F.col("subject_id").alias("entity_id"), "predicate", F.lit("s").alias("pos"))
    untyped_o = triples.join(
        types.select(F.col("entity_id").alias("object_id")), "object_id", "left_anti"
    ).select(F.col("object_id").alias("entity_id"), "predicate", F.lit("o").alias("pos"))
    votes = (
        untyped_s.unionByName(untyped_o)
        .join(F.broadcast(sig), ["predicate", "pos"])
        .groupBy("entity_id", "dom_type")
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
    )
    return (
        votes.groupBy("entity_id")
        .agg(F.min(F.struct((-F.col("v")).alias("nv"), F.col("dom_type"))).alias("w"))
        .select(
            "entity_id",
            F.col("w.dom_type").alias("inferred_type"),
            (-F.col("w.nv")).cast("long").alias("n_votes"),
        )
        .filter(F.col("n_votes") >= min_votes)
    )


def shacl_report(
    triples: DataFrame,
    types: DataFrame,
    shapes: list[dict],
) -> DataFrame:
    """SHACL-lite validation sweep: one violation table over the whole
    KG — (entity_id, predicate, violation, n). `shapes` is a list of
    constraint dicts, each one of:
      {kind: 'max_count', predicate, max}          — functional cardinality
      {kind: 'min_count', predicate, subject_type, min} — required property
      {kind: 'domain', predicate, subject_type}    — subject must be typed T
      {kind: 'range', predicate, object_type}      — object must be typed T
      {kind: 'closed_object', predicate}           — object must EXIST in types
    The batch restatement of per-commit schema checks (reference
    validates constraints inline during relationship building,
    examples/medlit/pipeline/relationships.py:293-378); as a corpus-wide
    sweep each constraint is one aggregate or anti-join and the union is
    a handful of cheap jobs over the deduped triple table.

    Deterministic, integer-only. Violation rows carry n = the offending
    multiplicity (max_count: observed count; min_count: observed count,
    possibly 0; domain/range/closed_object: offending-triple count per
    entity)."""
    parts: list[DataFrame] = []
    t = triples.select("subject_id", "predicate", "object_id")
    for sh in shapes:
        kind = sh["kind"]
        pred = sh["predicate"]
        tp = t.filter(F.col("predicate") == pred)
        if kind == "max_count":
            v = (
                tp.groupBy("subject_id")
                .agg(F.count_distinct("object_id").cast("long").alias("n"))
                .filter(F.col("n") > int(sh["max"]))
                .select(
                    F.col("subject_id").alias("entity_id"),
                    F.lit(pred).alias("predicate"),
                    F.lit(f"max_count>{sh['max']}").alias("violation"),
                    "n",
                )
            )
        elif kind == "min_count":
            have = tp.groupBy("subject_id").agg(
                F.count_distinct("object_id").cast("long").alias("n")
            )
            v = (
                types.filter(F.col("type") == sh["subject_type"])
                .select(F.col("entity_id").alias("subject_id"))
                .join(have, "subject_id", "left")
                .withColumn("n", F.coalesce("n", F.lit(0)).cast("long"))
                .filter(F.col("n") < int(sh["min"]))
                .select(
                    F.col("subject_id").alias("entity_id"),
                    F.lit(pred).alias("predicate"),
                    F.lit(f"min_count<{sh['min']}").alias("violation"),
                    "n",
                )
            )
        elif kind in ("domain", "range"):
            col = "subject_id" if kind == "domain" else "object_id"
            want = sh["subject_type"] if kind == "domain" else sh["object_type"]
            tagged = tp.join(
                types.select(F.col("entity_id").alias(col), "type"), col, "left"
            )
            v = (
                tagged.filter(
                    F.col("type").isNull() | (F.col("type") != want)
                )
                .groupBy(col)
                .agg(F.count(F.lit(1)).cast("long").alias("n"))
                .select(
                    F.col(col).alias("entity_id"),
                    F.lit(pred).alias("predicate"),
                    F.lit(f"{kind}!={want}").alias("violation"),
                    "n",
                )
            )
        elif kind == "closed_object":
            v = (
                tp.join(
                    types.select(F.col("entity_id").alias("object_id")),
                    "object_id",
                    "left_anti",
                )
                .groupBy("object_id")
                .agg(F.count(F.lit(1)).cast("long").alias("n"))
                .select(
                    F.col("object_id").alias("entity_id"),
                    F.lit(pred).alias("predicate"),
                    F.lit("closed_object").alias("violation"),
                    "n",
                )
            )
        else:
            raise ValueError(f"unknown shape kind {kind!r}")
        parts.append(v)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def rdfs_entailment(
    triples: DataFrame,
    types: DataFrame,
    subclass: DataFrame,
    subprop: DataFrame,
    domains: DataFrame,
    ranges: DataFrame,
    max_depth: int = 8,
) -> DataFrame:
    """RDFS-lite entailment materialization: the full derived rdf:type
    table (entity_id, type, via) under the four instance-visible RDFS
    rules — rdfs7 (subPropertyOf lifts every triple to its
    super-properties), rdfs2 (property domain types the subject), rdfs3
    (range types the object), rdfs9/11 (subClassOf closure lifts every
    type to its ancestors). `via` records the CHEAPEST derivation
    (min over 'asserted' < 'rdfs2' < 'rdfs3' < 'rdfs9'), so asserted
    facts are distinguishable from inferred ones — the KG-construction
    step that turns a partial, extraction-grade type table into a
    closed one (it recovers every deliberately-untyped entity in the
    infer_entity_types fixture through domain/range evidence, with
    provenance).

    Evaluation is the standard stratification (property closure →
    domain/range → class closure), which reaches the RDFS fixpoint in
    one pass — no instance-level iteration.

    Scale: both ontology closures run through
    graph_analytics.transitive_closure on the SCHEMA graph (tiny by
    definition) and come back as broadcasts; the instance table takes
    three broadcast joins and never shuffles until the final
    (entity, type) hash aggregate — whose size is bounded by
    |entities| × |class hierarchy depth|, not by |triples|.

    Reference parity: the reference hard-codes its class hierarchy in
    per-domain Python (examples/medlit/pipeline/entities.py type maps);
    this is the declarative, ontology-driven restatement."""
    from kgraph_spark.operators.graph_analytics import transitive_closure

    pclo = transitive_closure(subprop, max_depth, src="child", dst="parent")
    cclo = transitive_closure(subclass, max_depth, src="child", dst="parent")
    inst = triples.select("subject_id", "predicate", "object_id")
    lifted = inst.join(
        F.broadcast(pclo.select(F.col("src").alias("predicate"),
                                F.col("dst").alias("_super"))),
        "predicate",
    ).select("subject_id", F.col("_super").alias("predicate"), "object_id")
    ext = inst.unionByName(lifted)
    t_asserted = types.select(
        "entity_id", "type", F.lit("asserted").alias("via")
    )
    t_dom = ext.join(F.broadcast(domains), "predicate").select(
        F.col("subject_id").alias("entity_id"),
        F.col("cls").alias("type"),
        F.lit("rdfs2").alias("via"),
    )
    t_rng = ext.join(F.broadcast(ranges), "predicate").select(
        F.col("object_id").alias("entity_id"),
        F.col("cls").alias("type"),
        F.lit("rdfs3").alias("via"),
    )
    base = (
        t_asserted.unionByName(t_dom).unionByName(t_rng)
        .groupBy("entity_id", "type")
        .agg(F.min("via").alias("via"))
    )
    up = base.join(
        F.broadcast(cclo.select(F.col("src").alias("type"),
                                F.col("dst").alias("_anc"))),
        "type",
    ).select(
        "entity_id", F.col("_anc").alias("type"), F.lit("rdfs9").alias("via")
    )
    return (
        base.unionByName(up)
        .groupBy("entity_id", "type")
        .agg(F.min("via").alias("via"))
    )


def fact_fusion(
    claims: DataFrame,
    subject_col: str = "subject_id",
    predicate_col: str = "predicate",
    object_col: str = "object_id",
    source_col: str = "source",
) -> DataFrame:
    """Two-round truth discovery over conflicting multi-source claims
    (the TruthFinder/ACCU shape, one reweighting round, fully
    deterministic): round 1 elects a per-(s,p) majority object
    (count DESC, object ASC); each source's accuracy against that
    majority becomes an integer-micro weight (ONE double division +
    round per source); round 2 re-elects with accuracy-weighted votes
    (exact long sums). Output one row per (s,p): the winning object,
    its weight, how many sources back it, and `flipped` — whether
    reweighting overturned the naive majority (the rows where a
    reliable source outvoted two sloppy ones).

    Determinism: duplicate (source, s, p, o) claims dedup first; both
    elections tie-break on the object string; weights are exact longs
    after the single documented rounding.

    Scale: three hash aggregates on (s,p[,o]) plus a broadcast of the
    per-source accuracy table (|sources| rows — tiny by definition).
    No window over the full claim set, no collect."""
    c = claims.select(
        F.col(subject_col).alias("s"),
        F.col(predicate_col).alias("p"),
        F.col(object_col).alias("o"),
        F.col(source_col).alias("src"),
    ).distinct()
    votes = c.groupBy("s", "p", "o").agg(
        F.count(F.lit(1)).cast("long").alias("n1")
    )
    maj = votes.groupBy("s", "p").agg(
        F.min(F.struct((-F.col("n1")).alias("neg"), F.col("o").alias("o")))
        .alias("w")
    ).select("s", "p", F.col("w.o").alias("maj_o"))
    acc = (
        c.join(maj, ["s", "p"])
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).cast("long").alias("total"),
            F.sum((F.col("o") == F.col("maj_o")).cast("long"))
            .cast("long")
            .alias("agree"),
        )
        .select(
            "src",
            F.round(
                F.col("agree").cast("double") * 1_000_000.0
                / F.col("total").cast("double"),
                0,
            ).cast("long").alias("acc_micro"),
        )
    )
    weighted = (
        c.join(F.broadcast(acc), "src")
        .groupBy("s", "p", "o")
        .agg(
            F.sum("acc_micro").cast("long").alias("w"),
            F.count(F.lit(1)).cast("long").alias("n_sources"),
        )
    )
    win = weighted.groupBy("s", "p").agg(
        F.min(
            F.struct(
                (-F.col("w")).alias("neg"),
                F.col("o").alias("o"),
                F.col("n_sources").alias("ns"),
            )
        ).alias("t")
    )
    return win.join(maj, ["s", "p"]).select(
        F.col("s").alias("subject_id"),
        F.col("p").alias("predicate"),
        F.col("t.o").alias("object_id"),
        F.col("t.neg").cast("long").alias("_negw"),
        F.col("t.ns").alias("n_sources"),
        (F.col("t.o") != F.col("maj_o")).alias("flipped"),
    ).select(
        "subject_id",
        "predicate",
        "object_id",
        (-F.col("_negw")).alias("weight_micro"),
        "n_sources",
        "flipped",
    )


def literal_type_profile(
    triples: DataFrame,
    pred_col: str = "predicate",
    obj_col: str = "object_id",
) -> DataFrame:
    """Lexical-type census of each predicate's object values: (predicate,
    n, n_numeric, n_date, n_id, n_other, dominant, dominant_micro) —
    the literal-vs-entity half of schema induction (infer_entity_types
    does the entity half): a predicate whose objects are 99% ISO dates
    with a 1% 'other' tail is a typed property with dirty rows to
    quarantine, and `dominant` drives the datatype the promoted KG
    declares. Classes: numeric ^[0-9]+$, date ^\\d{4}-\\d{2}-\\d{2},
    id-like ^[A-Z][0-9]+$, other — anchored character-class regexes
    that mean the same thing in every engine.

    Determinism: classes are disjoint, tested in a fixed order; counts
    exact; dominant breaks ties by class name ascending; ONE division
    for the dominant share.

    Scale: one predicate-keyed hash aggregate with map-side partials —
    classification is a JVM regex per row, no UDF."""
    o = F.col(obj_col).cast("string")
    cls = (
        F.when(o.rlike("^[0-9]+$"), F.lit("numeric"))
        .when(o.rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}"), F.lit("date"))
        .when(o.rlike("^[A-Z][0-9]+$"), F.lit("id"))
        .otherwise(F.lit("other"))
    )
    q = triples.filter(o.isNotNull()).select(
        F.col(pred_col).alias("predicate"), cls.alias("_c")
    )
    agg = q.groupBy("predicate").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("_c") == "numeric").cast("long")).cast("long").alias("n_numeric"),
        F.sum((F.col("_c") == "date").cast("long")).cast("long").alias("n_date"),
        F.sum((F.col("_c") == "id").cast("long")).cast("long").alias("n_id"),
        F.sum((F.col("_c") == "other").cast("long")).cast("long").alias("n_other"),
    )
    best = F.array_min(
        F.array(*[
            F.struct((-F.col(c)).alias("neg"), F.lit(name).alias("cls"))
            for name, c in (
                ("date", "n_date"), ("id", "n_id"),
                ("numeric", "n_numeric"), ("other", "n_other"),
            )
        ])
    )
    return agg.select(
        "predicate",
        "n",
        "n_numeric",
        "n_date",
        "n_id",
        "n_other",
        best["cls"].alias("dominant"),
        F.round(
            (-best["neg"]).cast("double") * F.lit(1_000_000.0)
            / F.col("n").cast("double"),
            0,
        ).cast("long").alias("dominant_micro"),
    )
