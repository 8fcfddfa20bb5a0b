"""Interleaved text+media span-sequence analytics.

The pipeline's input rows are (doc_id, spans:array<struct<kind,text,
media_ref,offset>>) — the interleaved document shape (the reference models
documents as ordered (section, content) sequences, kgschema/document.py:
28-87; media spans carry a media_ref instead of text). Before spending
cluster-hours on extraction, a 100-TB job wants corpus-level answers to
"how interleaved is this corpus?" and "which media assets are shared
across documents?" — these two operators answer that.

Scale notes:
- `interleave_stats` is MAP-ONLY: every statistic, including the maximal
  consecutive-media run, is a single JVM-side `F.aggregate` fold over the
  span array — no explode, no window, no shuffle. At 10^12 documents this
  is one pass over the scan.
- `media_coref` explodes only the MEDIA spans (text spans are filtered
  before the explode, so the shuffle carries refs + doc ids, never text)
  and aggregates on media_ref — one shuffle keyed on the asset id. Hot
  assets (a logo referenced by half the corpus) are bounded by the
  min/max/count aggregate shape: state per key is O(1), no collect_list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interleave_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Per-document interleaving profile of a span-sequence corpus.

    Returns one row per document: total span count, text/media split,
    media fraction, number of kind transitions (text→media or media→text
    boundaries walking the sequence in order), the longest run of
    consecutive media spans, and the ordinal position (1-based) of the
    first media span (NULL if the document has no media).

    Everything is computed in ONE fold (`F.aggregate`) over the array with
    a struct accumulator — whole-stage-codegen'd, zero shuffle. The fold
    carries (prev_kind, current_media_run, max_media_run, n_transitions);
    counts and the first-media position come from `filter`/`transform` +
    `array_position` over the same array, evaluated once per row."""
    sp = F.col(spans_col)
    n_spans = F.size(sp)
    n_media = F.size(F.filter(sp, lambda s: s["kind"] == F.lit("media")))
    kinds = F.transform(sp, lambda s: s["kind"])
    first_media = F.array_position(kinds, "media")  # 0 when absent

    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("cur"),
        F.lit(0).alias("maxr"),
        F.lit(0).alias("trans"),
    )

    def step(acc, s):
        is_media = s["kind"] == F.lit("media")
        cur = F.when(is_media, acc["cur"] + 1).otherwise(F.lit(0))
        return F.struct(
            s["kind"].alias("prev"),
            cur.alias("cur"),
            F.greatest(acc["maxr"], cur).alias("maxr"),
            (
                acc["trans"]
                + F.when(
                    acc["prev"].isNotNull() & (acc["prev"] != s["kind"]), 1
                ).otherwise(0)
            ).alias("trans"),
        )

    folded = F.aggregate(sp, acc0, step)
    return docs.select(
        F.col(id_col),
        n_spans.cast("long").alias("n_spans"),
        (n_spans - n_media).cast("long").alias("n_text"),
        n_media.cast("long").alias("n_media"),
        F.round(n_media / F.greatest(n_spans, F.lit(1)), 6).alias("media_fraction"),
        folded["trans"].cast("long").alias("n_transitions"),
        folded["maxr"].cast("long").alias("max_media_run"),
        F.when(first_media > 0, first_media).cast("long").alias("first_media_pos"),
    )


def media_coref(
    docs: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Media co-reference: which assets appear in how many documents.

    Explodes ONLY the media spans (pre-filtered array, so text payloads
    never enter the shuffle) and aggregates per media_ref: total uses,
    distinct documents, and the min/max referencing doc id (a cheap stable
    fingerprint of the usage set that avoids collect_set's unbounded
    per-key state — the full usage list, if needed, is a re-join away).
    Assets shared across many documents are dedup/caching candidates:
    decode once, broadcast the features."""
    media = F.filter(F.col(spans_col), lambda s: s["kind"] == F.lit("media"))
    exploded = docs.select(
        F.col(id_col).alias("_doc"), F.explode(media).alias("sp")
    ).select("_doc", F.col("sp.media_ref").alias("media_ref"))
    return exploded.groupBy("media_ref").agg(
        F.count(F.lit(1)).cast("long").alias("n_uses"),
        F.countDistinct("_doc").cast("long").alias("n_docs"),
        F.min("_doc").alias("first_doc"),
        F.max("_doc").alias("last_doc"),
    )


def entity_media_grounding(
    docs: DataFrame,
    vocab: list[str],
    window: int = 1,
    tokens_per_para: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Entity↔media grounding over the interleaved corpus: which media
    assets appear NEAR which entity mentions — the association a
    multimodal KG needs to attach images to entities (the reference keeps
    text-only evidence; media spans carry refs, kgschema/document.py
    sections + the north-rule span schema). A mention in paragraph p and
    a media span attached to paragraph m associate when |p − m| <= window.

    Deliberately RELATIONAL, not array-shaped: tokens posexplode once to
    (doc, para, token) — para = token_index ÷ tokens_per_para, no span
    array is built, so there is no HOF re-evaluation hazard and every
    stage is a plain equi-join/aggregate. Media placement mirrors
    _docs_to_interleaved_spans' deterministic schedule (one asset after
    every 3rd paragraph, a second after every 6th — shared residue
    formulas), so the association is fully SQL-restatable.

    Scale: the vocab filter lands before the distinct (mention rows are
    |vocab|-bounded per doc-paragraph); the grounding join is doc-keyed
    with a ±window band predicate — 2·window+1 candidate paragraphs per
    media span, never a cross join."""
    d = F.col(id_col)
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    base = docs.select(d.alias("doc_id"), F.posexplode(toks).alias("idx", "token"))
    mentions = (
        base.filter(F.col("token").isin(vocab))
        .select(
            "doc_id",
            (F.col("idx") / F.lit(tokens_per_para)).cast("long").alias("para"),
            "token",
        )
        .distinct()
    )
    n_paras = docs.select(
        d.alias("doc_id"),
        F.greatest(
            F.ceil(F.size(F.split(F.trim(text_col), r"\s+")) / F.lit(tokens_per_para)).cast("int"),
            F.lit(1),
        ).alias("_n"),
    )
    paras = n_paras.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)).alias("para")
    )
    did = F.col("doc_id")
    m1 = F.concat(F.lit("media://asset/"), ((did * 31 + F.col("para")) % 41).cast("string"))
    m2 = F.concat(
        F.lit("media://asset/"), (((did * 17 + F.col("para")) % 37) + 50).cast("string")
    )
    media = paras.filter(F.col("para") % 3 == 2).select(
        "doc_id", "para", m1.alias("media_ref")
    ).unionByName(
        paras.filter(F.col("para") % 6 == 5).select(
            "doc_id", "para", m2.alias("media_ref")
        )
    )
    mm = media.select("doc_id", F.col("para").alias("_mp"), "media_ref")
    assoc = mentions.join(mm, "doc_id").filter(
        F.abs(F.col("para") - F.col("_mp")) <= window
    )
    return assoc.groupBy("token", "media_ref").agg(
        F.count(F.lit(1)).cast("long").alias("n_cooccur"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )


def span_sequence_hash(
    docs: DataFrame, id_col: str = "doc_id", spans_col: str = "spans"
) -> DataFrame:
    """(doc_id, seq_hash, n_spans): md5 of the CANONICAL serialization of
    the span sequence — kind, text, media_ref joined with unit/record
    separators (chr 31/30, which cannot appear in tokenized text) in
    sequence order. This is the executable form of the north rule's
    span-sequence equality contract: two documents are interleaved-equal
    iff their hashes match, so exact dedup of interleaved docs becomes the
    standard 16-byte hash groupBy (dedup_exact's twin for the spans shape
    — text-only dedup would merge docs whose media differ). MAP-ONLY: one
    JVM transform + concat fold per row, no explode, no shuffle."""
    serial = F.concat_ws(
        "\x1e",
        F.transform(
            F.col(spans_col),
            lambda s: F.concat_ws(
                "\x1f",
                s["kind"],
                F.coalesce(s["text"], F.lit("")),
                F.coalesce(s["media_ref"], F.lit("")),
            ),
        ),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(serial).alias("seq_hash"),
        F.size(spans_col).cast("long").alias("n_spans"),
    )


def interleaved_exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", spans_col: str = "spans"
) -> DataFrame:
    """(seq_hash, keep_doc_id, n_dups): exact duplicate groups under
    span-sequence equality — keeper is the min doc id (replayable), n_dups
    counts the group. ONE shuffle on the 16-byte hash; at 100 TB this is
    the same bounded plan as dedup_exact, media-aware."""
    hashed = span_sequence_hash(docs, id_col, spans_col)
    return hashed.groupBy("seq_hash").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).cast("long").alias("n_dups"),
    )


def multimodal_token_cost(
    docs: DataFrame,
    chars_per_token: int = 4,
    media_tokens: int = 256,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """(doc_id, n_text_tokens, n_media_spans, doc_tokens): the training
    token budget of an interleaved document — text spans cost
    1 + len div chars_per_token (the BPE-ish estimate token_stats uses),
    media spans cost a flat `media_tokens` (the vision-encoder patch
    budget, e.g. 256 for a 16×16-patch image). The pre-step for packing
    interleaved sequences into fixed-budget training samples: feed the
    result to layout.compaction_plan(target=context_length) and bins
    become packed samples that never split a document. MAP-ONLY fold —
    exact integer arithmetic, no explode, no shuffle."""
    if chars_per_token < 1 or media_tokens < 0:
        raise ValueError("need chars_per_token >= 1 and media_tokens >= 0")
    text_cost = F.aggregate(
        F.filter(F.col(spans_col), lambda s: s["kind"] == "text"),
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + 1
        + F.floor(F.length(F.coalesce(s["text"], F.lit(""))) / chars_per_token).cast(
            "long"
        ),
    )
    n_media = F.size(F.filter(F.col(spans_col), lambda s: s["kind"] == "media")).cast(
        "long"
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        text_cost.alias("n_text_tokens"),
        n_media.alias("n_media_spans"),
        (text_cost + n_media * F.lit(media_tokens)).cast("long").alias("doc_tokens"),
    )


def media_captions(span_docs: DataFrame) -> DataFrame:
    """Caption mining over interleaved span sequences: each media span is
    paired with the NEAREST PRECEDING text span in document order — the
    image-text pair extraction a multimodal training pipeline runs before
    packing (alt-text/caption heuristics all reduce to "closest text in
    sequence"). Emits (doc_id, span_pos, media_ref, caption, caption_pos,
    caption_distance); media with no preceding text keeps a null caption
    (the pair a curation filter would drop).

    Scale: ONE posexplode rides the scan, ONE shuffle on doc_id for the
    running last-text window (sequences are per-document and bounded, so
    the window state is tiny); no join, no Python."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("doc_id")
        .orderBy("span_pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ex = span_docs.select(
        "doc_id", F.posexplode("spans").alias("span_pos", "_sp")
    ).select(
        "doc_id",
        "span_pos",
        F.col("_sp.kind").alias("kind"),
        F.col("_sp.text").alias("_text"),
        F.col("_sp.media_ref").alias("media_ref"),
    )
    txt = F.when(F.col("kind") == "text", F.col("_text"))
    pos = F.when(F.col("kind") == "text", F.col("span_pos"))
    return (
        ex.withColumn("caption", F.last(txt, ignorenulls=True).over(w))
        .withColumn("caption_pos", F.last(pos, ignorenulls=True).over(w))
        .filter(F.col("kind") == "media")
        .select(
            "doc_id",
            F.col("span_pos").cast("long").alias("span_pos"),
            "media_ref",
            "caption",
            F.col("caption_pos").cast("long").alias("caption_pos"),
            (F.col("span_pos") - F.col("caption_pos")).cast("long").alias("caption_distance"),
        )
    )
